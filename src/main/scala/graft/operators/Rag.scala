package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row}

/** RAG pipeline operators — SURVEY.md §2.9 V2/V4/V5, re-expressing
  * RAG/rag.ipynb's vector store, context assembly and automatic answer
  * metrics.
  */
object Rag {

  /** V2 — vector-store build: the document projection that pairs the
    * embedding text (T20 template) with its metadata and embedding
    * column; persisted as parquet it IS the store (rag.ipynb:446-486 —
    * an in-memory matrix there, a columnar table here).
    */
  def buildStore(docs: DataFrame, id: Column, title: Column, authors: Column,
                 abstractC: Column, embedding: Column): DataFrame =
    docs.select(
      id.as("paper_id"),
      TF.embeddingText(title, authors, abstractC).as("doc_text"),
      title.as("title"),
      embedding.as("embedding"))

  /** V4 — context assembly over the collected top-k rows (k is small by
    * contract; this is the one legitimately driver-side step). Rows must
    * provide (rank, title, doc_text, cosine). Ref: rag.ipynb:720-733.
    */
  def assembleContext(topK: Seq[Row]): String =
    topK.map { r =>
      f"[${r.getAs[Int]("rank")}] (sim ${r.getAs[Double]("cosine")}%.3f) " +
        s"${r.getAs[String]("title")}\n${r.getAs[String]("doc_text")}"
    }.mkString("\n\n")

  /** V5 — automatic answer metrics as pure columns: length/word counts,
    * question-keyword overlap, citation usage, and the weighted auto
    * score (rag.ipynb:770-880). `round4`-stable across engines.
    */
  def autoMetrics(question: Column, answer: Column): Column = {
    val words = TF.wordCount(answer)
    val overlap = TF.keywordOverlap(question, answer)
    val citations = size(TF.citationMatches(answer))
    val score =
      least(lit(1.0), words.cast("double") / 50.0) * 0.3 +
        least(lit(1.0), overlap.cast("double") / 5.0) * 0.4 +
        when(citations > 0, 1.0).otherwise(0.5) * 0.3
    struct(
      length(answer).as("answer_chars"),
      words.as("answer_words"),
      overlap.as("keyword_overlap"),
      citations.as("n_citations"),
      (floor(score * 10000.0 + 0.5) / 10000.0).as("auto_score"))
  }
}
