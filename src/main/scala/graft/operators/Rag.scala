package graft.operators

import graft.functions.{TextAnalysis => TA, TextFunctions => TF}
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

  /** Okapi BM25 lexical retrieval — the sparse complement to the dense
    * cosine family (§2.9 V3*). The reference retrieves by embedding
    * similarity only (RAG/rag.ipynb:488-530); production RAG almost
    * always pairs that with a lexical leg, so this is the
    * beyond-reference seat of keyword search.
    *
    * Scale shape: the query vocabulary is a LITERAL `isin` filter fused
    * into the token explode, so only postings that match some query term
    * ever shuffle — corpus text is scanned once and never moves. Global
    * stats (N, avgdl) are a 1-row broadcast; per-term document
    * frequencies come from the matched-postings sliver (≤ |vocab| rows,
    * broadcast); the query list itself is a broadcast literal table.
    * The one data-sized shuffle is the (doc, term) tf combine, bounded
    * by matched postings — exactly the inverted-index probe cost.
    *
    * Returns (query_id, doc_id, score) with the raw double score;
    * callers round + rank (rounding first keeps cross-engine rank ties
    * deterministic).
    */
  def bm25(docs: DataFrame, id: Column, text: Column,
           queries: Seq[(Int, Seq[String])],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = queries.flatMap(_._2).distinct
    val base = docs.select(id.as("doc_id"), TA.tokens(text).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), col("toks"))
    // One corpus pass for N/avgdl, one for postings: sharing them in a
    // single cached scan would force the full token array through the
    // stats aggregate; two columnar scans are cheaper at any scale.
    val stats = base.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val postings = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(vocab: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = postings.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val q = queries.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")
    postings
      .join(broadcast(dfreq), "term")
      .join(broadcast(q), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        (log(lit(1.0) +
            (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          col("tf") * lit(k1 + 1.0) /
          (col("tf") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("w"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w")).as("score"))
  }

  /** Reciprocal-rank fusion (Cormack et al.): fuse any number of ranked
    * candidate lists into one ranking, `rrf = Σ 1/(k + rank)`. Inputs
    * are (query_id, doc_id, rank) frames — each typically a top-n
    * truncation, so the union is (n · lists · queries) rows: tiny
    * relative to the corpus no matter the corpus size. Union + sum
    * (not an n-way outer join) keeps the plan one combine regardless of
    * how many legs are fused; a doc absent from a leg simply
    * contributes nothing, which IS the RRF contract.
    */
  def rrfFuse(ranked: Seq[DataFrame], k: Int = 60): DataFrame =
    ranked
      .map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(lit(1.0) / (lit(k) + col("rank"))).as("rrf"))

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
