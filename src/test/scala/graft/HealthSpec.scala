package graft

import graft.operators.Health
import org.apache.spark.sql.functions._

/** Pins the g7/g7x corpus-health contract: the HLL variant differs from
  * the exact variant ONLY in the distinct-token column (every other
  * column bit-identical — the swap touches one block), and the estimate
  * stays within HLL error of exact.
  */
class HealthSpec extends SparkSpec {
  import spark.implicits._

  // Two strata, three days, repeated phrasing so heavy hitters and
  // quality scores are non-degenerate.
  private def docs = (0 until 600).map { i =>
    val lang = if (i % 3 == 0) "en" else "zh"
    val words = (0 until (5 + i % 40)).map(j => s"w${(i + j) % 90}")
    (i.toLong, lang, ("the common tail. " * (1 + i % 3)) + words.mkString(" "))
  }.toDF("doc_id", "lang", "text")

  private def health(hll: Boolean) =
    Health.corpusHealth(docs, $"lang", pmod($"doc_id", lit(3)), $"text",
      distinctViaHll = hll)

  test("HLL variant matches exact variant on every non-distinct column") {
    val ex = rows(health(hll = false).drop("distinct_toks")
      .orderBy($"stratum", $"day"))
    val ap = rows(health(hll = true).drop("distinct_toks")
      .orderBy($"stratum", $"day"))
    assert(ex.nonEmpty && ex == ap)
  }

  test("HLL distinct estimate within 5% of exact per (stratum, day)") {
    def m(hll: Boolean) = rows(health(hll)
        .select($"stratum", $"day", $"distinct_toks"))
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = m(hll = false)
    val est = m(hll = true)
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, v) =>
      assert(math.abs(est(k).toDouble / v - 1) < 0.05, s"$k: ${est(k)} vs $v")
    }
  }

  test("health store: day-aligned batch appends reproduce the one-shot dashboard") {
    val dir = Scratch.dir("health_store") + "/store"
    Health.initHealthStore(spark, dir)
    // three day-aligned ingest batches (each holds complete days)
    for ((cond, bid) <- Seq(
        (pmod($"doc_id", lit(3)) === 0, 0L),
        (pmod($"doc_id", lit(3)) === 1, 1L),
        (pmod($"doc_id", lit(3)) === 2, 2L)))
      Health.appendHealth(docs.filter(cond), $"lang",
        pmod($"doc_id", lit(3)), $"text", dir, bid)
    val fromStore = rows(Health.corpusHealthFromStore(spark, dir)
      .orderBy($"stratum", $"day"))
    val oneShot = rows(health(hll = true).orderBy($"stratum", $"day"))
    assert(fromStore.size == oneShot.size && fromStore.nonEmpty)
    fromStore.zip(oneShot).foreach { case (a, b) =>
      // integer families and the HLL estimate are exact under the
      // aligned split; avg reassociates within float ulp
      assert(a.getAs[String]("stratum") == b.getAs[String]("stratum"))
      for (c <- Seq("day", "n_docs", "total_tokens", "distinct_toks",
          "p50_tok_lo", "p90_tok_lo", "p99_tok_lo", "p99_tok_hi",
          "top_tok_cnt"))
        assert(a.getAs[Long](c) == b.getAs[Long](c), s"$c: $a vs $b")
      assert(a.getAs[String]("top_tok") == b.getAs[String]("top_tok"))
      assert(math.abs(a.getAs[Double]("avg_quality")
        - b.getAs[Double]("avg_quality")) <= 1e-6, s"$a vs $b")
      assert(a.getAs[Double]("low_quality_share")
        == b.getAs[Double]("low_quality_share"), s"$a vs $b")
    }
  }

  test("health store: replayed appends are no-ops; integer families exact under day-SPLIT batches") {
    val dir = Scratch.dir("health_store_split") + "/store"
    Health.initHealthStore(spark, dir)
    // batches that SPLIT days (every batch holds rows of every day)
    Health.appendHealth(docs.filter($"doc_id" < 300), $"lang",
      pmod($"doc_id", lit(3)), $"text", dir, 0L)
    Health.appendHealth(docs.filter($"doc_id" >= 300), $"lang",
      pmod($"doc_id", lit(3)), $"text", dir, 1L)
    // replay batch 1: committed segment ids make it a no-op
    Health.appendHealth(docs.filter($"doc_id" >= 300), $"lang",
      pmod($"doc_id", lit(3)), $"text", dir, 1L)
    val fromStore = rows(Health.corpusHealthFromStore(spark, dir)
      .orderBy($"stratum", $"day"))
    val oneShot = rows(health(hll = true).orderBy($"stratum", $"day"))
    assert(fromStore.size == oneShot.size && fromStore.nonEmpty)
    fromStore.zip(oneShot).foreach { case (a, b) =>
      // count-shaped families merge exactly however the split fell;
      // the support-pruned top count is a lower bound by contract
      for (c <- Seq("day", "n_docs", "total_tokens", "distinct_toks",
          "p50_tok_lo", "p90_tok_lo", "p99_tok_lo", "p99_tok_hi"))
        assert(a.getAs[Long](c) == b.getAs[Long](c), s"$c: $a vs $b")
      assert(a.getAs[Long]("top_tok_cnt") <= b.getAs[Long]("top_tok_cnt"))
      assert(math.abs(a.getAs[Double]("avg_quality")
        - b.getAs[Double]("avg_quality")) <= 1e-6)
    }
  }

  test("health store compaction: dashboard read invariant, segments retired, appends keep folding") {
    val dir = Scratch.dir("health_compact") + "/store"
    Health.initHealthStore(spark, dir)
    Health.appendHealth(docs.filter($"doc_id" < 200), $"lang",
      pmod($"doc_id", lit(3)), $"text", dir, 0L)
    Health.appendHealth(docs.filter($"doc_id" >= 200 && $"doc_id" < 400),
      $"lang", pmod($"doc_id", lit(3)), $"text", dir, 1L)
    val before = rows(Health.corpusHealthFromStore(spark, dir)
      .orderBy($"stratum", $"day")).map(_.toSeq)
    Health.compactHealthStore(spark, dir)
    val after = rows(Health.corpusHealthFromStore(spark, dir)
      .orderBy($"stratum", $"day")).map(_.toSeq)
    assert(after == before && before.nonEmpty)
    // all four families retired their deltas
    for (fam <- Seq("basestats", "qbuckets", "toks", "hll"))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/$fam/delta")) ||
        new java.io.File(s"$dir/$fam/delta").list().isEmpty,
        s"family $fam kept delta segments")
    // the log keeps absorbing batches after the fold
    Health.appendHealth(docs.filter($"doc_id" >= 400), $"lang",
      pmod($"doc_id", lit(3)), $"text", dir, 2L)
    val full = rows(Health.corpusHealthFromStore(spark, dir))
    assert(full.map(_.getAs[Long]("n_docs")).sum == docs.count())
  }

  test("healthSketchSink: MemoryStream micro-batches land in the store; dashboard reads catch up") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Scratch.dir("health_stream") + "/store"
    Health.initHealthStore(spark, dir)
    val input = MemoryStream[(Long, String, String)]
    val q = graft.streaming.Streams.healthSketchSink(
        input.toDF().toDF("doc_id", "lang", "text")
          .withColumn("day", pmod($"doc_id", lit(2))),
        "lang", "day", "text", dir)
      .option("checkpointLocation", Scratch.dir("health_stream_ckpt"))
      .start()
    try {
      input.addData((1L, "en", "alpha beta gamma delta the epsilon"),
        (2L, "en", "zeta eta theta iota the kappa"))
      q.processAllAvailable()
      val after1 = rows(Health.corpusHealthFromStore(spark, dir))
      assert(after1.map(_.getAs[Long]("n_docs")).sum == 2L)
      input.addData((3L, "zh", "lambda mu nu xi the omicron pi"))
      q.processAllAvailable()
      val after2 = rows(Health.corpusHealthFromStore(spark, dir))
      assert(after2.map(_.getAs[Long]("n_docs")).sum == 3L)
      assert(after2.map(_.getAs[String]("stratum")).toSet == Set("en", "zh"))
    } finally q.stop()
  }

  test("dashboard invariants: shares in [0,1], quantile bounds ordered, top token is support-heavy") {
    rows(health(hll = false)).foreach { r =>
      val lo = r.getAs[Double]("low_quality_share")
      assert(lo >= 0.0 && lo <= 1.0)
      val p50 = r.getAs[Long]("p50_tok_lo")
      val p90 = r.getAs[Long]("p90_tok_lo")
      val p99 = r.getAs[Long]("p99_tok_lo")
      assert(p50 <= p90 && p90 <= p99 && p99 < r.getAs[Long]("p99_tok_hi"))
      // 1/200 support on a corpus stuffed with "the": top token exists
      // and its count clears the support threshold on its day's mass.
      assert(r.getAs[String]("top_tok") != null)
      assert(r.getAs[Long]("top_tok_cnt") > 0L)
    }
  }
}
