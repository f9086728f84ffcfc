package graft

import graft.operators.{Rag, Similarity}
import org.apache.spark.sql.functions._

class RagSpec extends SparkSpec {
  import spark.implicits._

  test("buildStore pairs embedding text with metadata and vector") {
    val docs = Seq(
      (1L, "Attention Is All You Need", Seq("V", "S"), "We propose the Transformer.",
        Seq(1.0f, 0.0f))).toDF("id", "title", "authors", "abs", "emb")
    val store = Rag.buildStore(docs, $"id", $"title", $"authors", $"abs", $"emb")
    assert(store.columns.toSeq ==
      Seq("paper_id", "doc_text", "title", "embedding"))
    val r = rows(store).head
    assert(r.getAs[String]("doc_text") ==
      "Paper Title: Attention Is All You Need\nAuthors: V, S\nAbstract: We propose the Transformer.")
  }

  test("end-to-end retrieval: store -> topK -> context assembly") {
    val docs = Seq(
      (1L, "Doc A", Seq("X"), "about spark joins", Seq(1.0f, 0.0f)),
      (2L, "Doc B", Seq("Y"), "about cooking pasta", Seq(0.0f, 1.0f))
    ).toDF("id", "title", "authors", "abs", "emb")
    val store = Rag.buildStore(docs, $"id", $"title", $"authors", $"abs", $"emb")
    val queries = Seq((7L, Seq(0.9f, 0.1f))).toDF("qid", "qv")
    val hits = Similarity.topKPerQuery(
        store, $"paper_id", $"embedding", queries, $"qid", $"qv", k = 2)
      .join(store.select($"paper_id".as("doc_id"), $"title", $"doc_text"), "doc_id")
      .orderBy($"rank")
    val ctx = Rag.assembleContext(rows(hits))
    assert(ctx.startsWith("[1] (sim 0.99")) // Doc A leads
    assert(ctx.contains("Doc A") && ctx.contains("Doc B"))
    assert(ctx.indexOf("Doc A") < ctx.indexOf("Doc B"))
  }

  test("autoMetrics computes counts, overlap, citations and bounded score") {
    val df = Seq(
      ("what is attention", "attention mechanisms [1] let models focus; see [2,3]"),
      ("unrelated", "")).toDF("q", "a")
    val got = rows(df.select(Rag.autoMetrics($"q", $"a").as("m")).select("m.*"))
    val r = got.head
    assert(r.getAs[Int]("keyword_overlap") == 1) // "attention"
    assert(r.getAs[Int]("n_citations") == 2)     // [1] and [2,3]
    val s = r.getAs[Double]("auto_score")
    assert(s > 0.0 && s <= 1.0)
    val empty = got(1)
    assert(empty.getAs[Int]("answer_words") == 0)
    assert(empty.getAs[Double]("auto_score") == 0.15) // only the 0.5*0.3 term
  }
}
