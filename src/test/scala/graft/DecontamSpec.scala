package graft

import graft.operators.Decontam
import org.apache.spark.sql.functions._

class DecontamSpec extends SparkSpec {
  import spark.implicits._

  // train doc 1 contains eval doc 10's opening 3-gram; doc 2 is clean;
  // doc 3 is too short to have any 3-gram; doc 4 repeats a
  // contaminated gram twice (must count once — containment).
  private def train = Seq(
    (1L, "the quick brown fox jumps high"),
    (2L, "entirely different words here now"),
    (3L, "too short"),
    (4L, "alpha beta gamma x alpha beta gamma")
  ).toDF("doc_id", "text")

  private def eval = Seq(
    (10L, "the quick brown dog"),
    (11L, "alpha beta gamma delta")
  ).toDF("doc_id", "text")

  test("tokenNgrams: strict (short text has none), distinct, CJK-aware") {
    val got = rows(Seq("a b c d", "a b", "x y x y x y", "你好世界")
      .toDF("t").select(Decontam.tokenNgrams($"t", 3).as("g")))
      .map(_.getSeq[String](0).toList)
    assert(got(0) == List("a b c", "b c d"))
    assert(got(1) == Nil)
    assert(got(2) == List("x y x", "y x y")) // distinct
    assert(got(3) == List("你 好 世", "好 世 界")) // per-char CJK tokens
  }

  test("hashed probe parity: hash-gram cardinality equals string-gram") {
    val df = train.unionAll(eval)
      .unionAll(Seq((20L, "你好世界你好"), (21L, "a a a a a")).toDF("doc_id", "text"))
    rows(df.select(
      size(Decontam.tokenNgrams($"text", 3)).as("s"),
      size(Decontam.tokenNgramHashes($"text", 3)).as("h")))
      .foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("contaminationReport counts distinct matched grams per doc") {
    val rep = rows(
      Decontam.contaminationReport(train, eval, $"doc_id", $"text", 3)
        .orderBy($"id"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rep(0) == ((1L, 4L, 1L, 0.25))) // "the quick brown"
    assert(rep(1) == ((2L, 3L, 0L, 0.0)))
    assert(rep(2) == ((3L, 0L, 0L, 0.0))) // no grams → 0, not a div error
    // doc 4 has 4 distinct grams; "alpha beta gamma" appears twice but
    // matches once
    assert(rep(3) == ((4L, 4L, 1L, 0.25)))
  }

  test("decontaminate drops flagged docs; threshold is strict-greater") {
    val kept0 = col0[Long](
      Decontam.decontaminate(train, eval, "doc_id", $"text", 3, 0.0)
        .select($"doc_id").orderBy($"doc_id"))
    assert(kept0 == Seq(2L, 3L)) // any hit drops at 0.0
    val keptHalf = col0[Long](
      Decontam.decontaminate(train, eval, "doc_id", $"text", 3, 0.25)
        .select($"doc_id").orderBy($"doc_id"))
    assert(keptHalf == Seq(1L, 2L, 3L, 4L)) // 0.25 > 0.25 is false
  }

  test("contaminationFilter matches batch decontaminate row-for-row") {
    val hashes = Decontam.evalGramHashes(eval, $"text", 3)
    for (thr <- Seq(0.0, 0.25, 0.5)) {
      val batch = col0[Long](
        Decontam.decontaminate(train, eval, "doc_id", $"text", 3, thr)
          .select($"doc_id").orderBy($"doc_id"))
      val perRow = col0[Long](train
        .filter(Decontam.contaminationFilter($"text", 3, hashes, thr))
        .select($"doc_id").orderBy($"doc_id"))
      assert(perRow == batch, s"threshold $thr")
    }
    // null text keeps on both paths
    val nullRow = Seq((9L, null: String)).toDF("doc_id", "text")
    assert(nullRow.filter(
      Decontam.contaminationFilter($"text", 3, hashes, 0.0)).count() == 1)
  }

  test("native contamination fraction matches declarative twin bit-for-bit") {
    val hashes = Decontam.evalGramHashes(eval, $"text", 3)
    // CJK (per-char tokens), repeats (distinct grams), empty, non-BMP
    // (surrogate pairs inside a token), plus the shared corpora
    val df = train.unionAll(eval).unionAll(Seq(
      (20L, "你好世界你好世界"), (21L, "a a a a a"), (22L, ""),
      (23L, "😀😀 b c 😀😀 b c d")).toDF("doc_id", "text"))
    rows(df.select(
      coalesce(graft.expressions.TokenNgramContamination($"text", 3, hashes.sorted),
        lit(0.0)).as("nat"),
      coalesce(Decontam.contaminationFractionDeclarative($"text", 3, hashes),
        lit(0.0)).as("dec")))
      .foreach(r => assert(r.getDouble(0) == r.getDouble(1), r.toString))
  }

  test("contaminationFilter survives pushdown without re-inlining the tokenizer") {
    val hashes = Decontam.evalGramHashes(eval, $"text", 3)
    val plan = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
      .withColumn("keepme", lit(1))
      .filter(Decontam.contaminationFilter($"text", 3, hashes, 0.0))
      .select($"doc_id")
      .queryExecution.optimizedPlan.treeString
    // the whole check is one native expression; the tokenizer regex must
    // not appear inside any lambdafunction in the optimized condition
    assert(plan.contains("token_ngram_contamination"), plan)
    assert(!plan.contains("lambdafunction"), plan)
  }

  test("contaminationFilter gates a stream (stateless, append-safe)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val hashes = Decontam.evalGramHashes(eval, $"text", 3)
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .filter(Decontam.contaminationFilter($"text", 3, hashes, 0.0))
      .writeStream.format("memory").queryName("decon")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps high"), // contaminated
        (2L, "entirely different words here now"),
        (3L, "too short"))
      q.processAllAvailable()
      val got = col0[Long](
        spark.sql("SELECT doc_id FROM decon ORDER BY doc_id"))
      assert(got == Seq(2L, 3L))
    } finally q.stop()
  }

  test("eval gram set broadcast: plan has no shuffle on the train text side") {
    val plan = Decontam.contaminationReport(train, eval, $"doc_id", $"text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast probe in:\n$plan")
  }
}
