package graft

import graft.functions.{TextFunctions => TF}
import graft.operators.{Align, Dedup, Enrich}
import graft.sources.Jsonl
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** SURVEY.md §5.2 golden pipeline: the reference's Collection+Cleaning+
  * Enhancement spine over a handcrafted corpus — merge-union dedup (D1)
  * → title-hash dedup (D3) → text clean (T1-T4) → align (P1) →
  * mock-LLM keyword enrichment (L2) → quality gate (P3) → stats —
  * with every intermediate pinned.
  */
class GoldenPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("ord", LongType),
    StructField("paper_id", StringType),
    StructField("title", StringType),
    StructField("abstract", StringType)))

  private def write(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory(name).toFile
    val f = new java.io.File(dir, "data.jsonl")
    val w = new java.io.PrintWriter(f, "UTF-8")
    lines.foreach(w.println)
    w.close()
    f.getAbsolutePath
  }

  private val longAbs =
    "We propose a novel method for learning representations across domains " +
      "with experiments demonstrating strong benchmark performance overall."

  test("collection->cleaning->enhancement spine produces the pinned result") {
    val fileA = write("srcA", Seq(
      s"""{"ord":1,"paper_id":"p1","title":"Deep Learning Advances","abstract":"$longAbs"}""",
      s"""{"ord":2,"paper_id":"p2","title":"  deep LEARNING advances ","abstract":"$longAbs"}""",
      s"""{"ord":3,"paper_id":"p3","title":"Graph Networks","abstract":"too short"}"""))
    val fileB = write("srcB", Seq(
      s"""{"ord":4,"paper_id":"p1","title":"Deep Learning Advances","abstract":"later duplicate of p1"}""",
      s"""{"ord":5,"paper_id":"p4","title":"Attention Models","abstract":"Inline math $$O(n^2)$$ and \\\\textbf{commands} pollute &amp; this otherwise useful abstract about transformer attention mechanisms and efficient scaling."}"""))

    // D1: union with explicit ingest order, first-wins on paper_id
    val merged = Dedup.dedupFirstWins(
      Jsonl.read(spark, fileA, schema).unionByName(Jsonl.read(spark, fileB, schema)),
      col("paper_id"), col("ord"))
    assert(col0[String](merged.select($"paper_id").orderBy($"ord"))
      == Seq("p1", "p2", "p3", "p4"))

    // D3: title-hash dedup (p2 is a case/whitespace variant of p1)
    val deduped = Dedup.titleHashDedup(merged, col("title"), col("ord"))
    assert(col0[String](deduped.select($"paper_id").orderBy($"ord"))
      == Seq("p1", "p3", "p4"))

    // T1-T4 clean + P1 align to the fixed schema
    val aligned = Align.alignTo(
      deduped.withColumn("abstract", TF.cleanText($"abstract")),
      Seq("ord" -> lit(-1L), "paper_id" -> lit(""), "title" -> lit(""),
        "abstract" -> lit(""), "venue" -> lit("unknown")))
    assert(aligned.columns.toSeq ==
      Seq("ord", "paper_id", "title", "abstract", "venue"))
    val p4abs = col0[String](
      aligned.filter($"paper_id" === "p4").select($"abstract")).head
    assert(p4abs == "Inline math and pollute this otherwise useful abstract " +
      "about transformer attention mechanisms and efficient scaling.")

    // L2: mock keyword enrichment + validation
    val enriched = Enrich.enrichColumn(aligned,
      concat(lit("Extract keywords: "), $"abstract"), "raw_kw",
      new Enrich.MockKeywordClient(12))
      .withColumn("keywords", Enrich.validateKeywords($"raw_kw"))

    // P3: quality gate (abstract length) with drop accounting
    val conds = Seq("abs_len" -> (length($"abstract") >= 50))
    val kept = Align.gate(enriched, conds)
    assert(col0[String](kept.select($"paper_id").orderBy($"ord"))
      == Seq("p1", "p4"))
    val reasons = rows(Align.gateReasons(enriched, conds)).head
    assert(reasons.getLong(0) == 3 && reasons.getLong(1) == 2
      && reasons.getLong(2) == 1)

    // stats over survivors (A1 shape) + keyword sanity
    val stats = rows(kept.agg(
      count(lit(1)).as("n"),
      round(avg(length($"abstract")), 2).as("avg_abs_len"),
      sum(size($"keywords")).as("total_keywords"))).head
    assert(stats.getLong(0) == 2)
    assert(stats.getDouble(1) > 100)
    val p4kw = col0[collection.Seq[String]](
      kept.filter($"paper_id" === "p4").select($"keywords")).head
    assert(p4kw.take(3) == Seq("inline", "math", "pollute"))
    assert(p4kw.size <= 8)
  }
}
