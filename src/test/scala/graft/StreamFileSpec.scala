package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming over the real parquet testdata with Trigger.AvailableNow —
  * the incremental catch-up mode the reference's checkpoint/resume
  * pattern maps to (SURVEY.md §2.11). The streaming result must equal
  * the batch result over the same closed input.
  */
class StreamFileSpec extends SparkSpec {

  test("AvailableNow file stream equals the batch aggregate on closed input") {
    val dir = "/root/testdata/sf0.001"
    // the file-stream source wants a DIRECTORY; link the table file in
    val streamDir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    // raw parquet carries ts as TIMESTAMP_MICROS (isAdjustedToUTC=0,
    // the 2026-08-13 regen encoding) -> TIMESTAMP_NTZ; stream with that
    // schema and normalize exactly like Tables.load (UTC session makes
    // the cast instant-identical).
    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(streamDir.toString)
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = Streams.windowedTypeCounts(stream, "10 minutes", "1 hour")
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val q = agg.writeStream
      .format("memory").queryName("file_wtc").outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = rows(spark.sql(
      """SELECT event_type, sum(n_events) AS n, round(sum(sum_value), 2) AS v
         FROM file_wtc GROUP BY event_type ORDER BY event_type"""))
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

    val batch = rows(
      Streams.windowedTypeCounts(
        Tables.load(spark, dir, "events"), "10 minutes", "1 hour")
        .groupBy(col("event_type"))
        .agg(sum(col("n_events")).as("n"),
          round(sum(col("sum_value")), 2).as("v"))
        .orderBy(col("event_type")))
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

    assert(streamed.nonEmpty)
    assert(streamed == batch)
    assert(streamed.map(_._2).sum == 1000L)
  }

  test("streaming g2 front half (decontam+gate+drift) equals the batch twin") {
    import graft.operators.Decontam
    val dir = "/root/testdata/sf0.001"
    val batchDocs = Tables.load(spark, dir, "documents")
    val evalGrams = Decontam.evalGramHashes(
      batchDocs.filter(col("doc_id") < 50), col("text"), 5)
    def pipeline(docs: org.apache.spark.sql.DataFrame) =
      Streams.gatedCorpusDrift(
        docs.filter(col("doc_id") >= 50).withColumn("ts",
          expr("timestampadd(MINUTE, doc_id, TIMESTAMP '2024-01-01 00:00:00')")),
        col("ts"), col("text"), evalGrams, ngram = 5,
        maxContamination = 0.0, qualityGate = 0.55,
        windowLen = "1 hour", qualityFloor = 0.5)

    val streamDir = java.nio.file.Files.createTempDirectory("docstream")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .parquet(streamDir.toString)
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt_g2s").toString
    val q = pipeline(stream).writeStream
      .format("memory").queryName("g2_stream").outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = rows(spark.sql(
      "SELECT * FROM g2_stream ORDER BY window_start")).map(_.toSeq)
    val batch = rows(pipeline(batchDocs).orderBy(col("window_start")))
      .map(_.toSeq)
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("chunk + NFC normalize are stateless: streaming rows equal the batch twin") {
    import graft.functions.{TextFunctions => TF}
    import graft.operators.Packing
    val dir = "/root/testdata/sf0.001"
    // both ops are narrow projections/generators — they must run in
    // append mode with NO aggregation state and match batch bit-for-bit
    def pipeline(docs: org.apache.spark.sql.DataFrame) =
      Packing.chunkWindows(
        docs.select(col("doc_id"), TF.nfcNormalize(col("text")).as("text")),
        col("doc_id"), col("text"), maxTokens = 32, stride = 24)
    val streamDir = java.nio.file.Files.createTempDirectory("chunkstream")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .parquet(streamDir.toString)
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt_chunks").toString
    val q = pipeline(stream).writeStream
      .format("memory").queryName("chunk_stream").outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = rows(spark.sql(
      "SELECT * FROM chunk_stream ORDER BY doc_id, chunk_idx")).map(_.toSeq)
    val batch = rows(pipeline(Tables.load(spark, dir, "documents"))
      .orderBy(col("doc_id"), col("chunk_idx"))).map(_.toSeq)
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("stream-stream interval join equals the batch twin on closed input") {
    val dir = "/root/testdata/sf0.001"
    def halves(e: org.apache.spark.sql.DataFrame) = (
      e.filter(pmod(col("event_id"), lit(2)) === 0)
        .select(col("user_id").as("a_user"), col("ts").as("a_ts")),
      e.filter(pmod(col("event_id"), lit(2)) === 1)
        .select(col("user_id").as("b_user"), col("ts").as("b_ts")))
    def paired(e: org.apache.spark.sql.DataFrame) = {
      val (a, b) = halves(e)
      Streams.intervalJoin(a, b, "a_user = b_user", "a_ts", "b_ts",
        "10 MINUTES")
    }
    val streamDir = java.nio.file.Files.createTempDirectory("sjstream")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(streamDir.toString)
      .withColumn("ts", col("ts").cast("timestamp"))
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt_sj").toString
    val q = paired(stream).writeStream
      .format("memory").queryName("sj_stream").outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = rows(spark.sql(
      "SELECT a_user, a_ts, b_ts FROM sj_stream ORDER BY a_user, a_ts, b_ts"))
      .map(_.toSeq)
    val batch = rows(paired(Tables.load(spark, dir, "events"))
      .select(col("a_user"), col("a_ts"), col("b_ts"))
      .orderBy(col("a_user"), col("a_ts"), col("b_ts"))).map(_.toSeq)
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("productionIngestSink: dedup → gate → drift → MergeLog land, end-to-end, replay idempotent") {
    import graft.operators.{Classify, Dedup, MergeLog}
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val idx = Scratch.dir("ping_idx") + "/lsh"
    val corpusDir = Scratch.dir("ping_corpus") + "/log"
    val driftDir = Scratch.dir("ping_drift")
    val origin = "TIMESTAMP '2024-01-01 00:00:00'"

    // Trained gate: clearly separated vocabularies, exact NB training.
    val labeled = Seq(
      (1L, true, "completely novel content about adaptive query execution today"),
      (2L, true, "rain in spain falls mainly on the plain every single year"),
      (3L, true, "novel content about query execution rain plain mainly"),
      (4L, false, "buy cheap pills spam offer click here discount"),
      (5L, false, "spam offer buy pills cheap click discount here deal"),
      (6L, false, "cheap spam deal pills discount offer click buy")
    ).toDF("doc_id", "y", "text")
    val gate = Classify.collectWeights(Classify.trainModel(
      labeled, col("y"), col("text"), buckets = 4096))
    def score(s: String): Double =
      Seq(s).toDF("text").select(Classify.scoreColumn(col("text"), gate, 4096))
        .head().getDouble(0)
    // the crafted docs must separate, or the later asserts are vacuous
    assert(score("completely novel content about adaptive query execution now") > 0)
    assert(score("buy cheap pills spam offer click here friend") < 0)

    // Bootstrap: index + MergeLog base hold one landed doc.
    val boot = Seq((1L, "the quick brown fox jumps over the lazy dog again today ok"))
      .toDF("doc_id", "text")
      .withColumn("ts", expr(s"timestampadd(MINUTE, 0, $origin)"))
    Dedup.saveLshBandIndex(boot, $"doc_id", $"text", idx, buckets = 8)
    MergeLog.init(boot, corpusDir)

    val healthDir = Scratch.dir("ping_health") + "/store"
    graft.operators.Health.initHealthStore(spark, healthDir)
    val input = MemoryStream[(Long, String, Int)]
    val docs = input.toDF().toDF("doc_id", "text", "mins")
      .withColumn("ts", expr(s"timestampadd(MINUTE, mins, $origin)"))
      .select($"doc_id", $"text", $"ts")
    val q = Streams.productionIngestSink(docs, "doc_id", "text", "ts",
        idx, corpusDir, driftDir, nearDupThreshold = 0.4,
        gate = gate, gateBuckets = 4096, gateMin = 0.0, buckets = 8,
        healthDir = Some(healthDir))
      .option("checkpointLocation", Scratch.dir("ping_ckpt"))
      .start()
    def landed(): Seq[Long] = col0[Long](
      MergeLog.read(spark, corpusDir, "doc_id")
        .select($"doc_id").orderBy($"doc_id"))
    val b0 = Seq(
      (10L, "completely novel content about adaptive query execution now", 10),
      (11L, "completely novel content about adaptive query execution now indeed", 11),
      (12L, "buy cheap pills spam offer click here friend", 12),
      (13L, "rain in spain falls mainly on the plain every single year", 13))
    val b1 = Seq(
      (20L, "completely novel content about adaptive query execution ok", 70),
      (21L, "buy cheap pills spam offer click here friend maybe", 71),
      (22L, "rain in spain falls mainly on the plain every even month", 72))
    try {
      // batch 0: 10/11 collapse intra-batch (canonical 10 lands), 12
      // fails the gate (and must NOT enter the index), 13 lands
      input.addData(b0: _*)
      q.processAllAvailable()
      assert(landed() == Seq(1L, 10L, 13L))
      // batch 1: 20 is a near-dup of LANDED 10 (dropped by the probe);
      // 21 is a near-dup of REJECTED 12 — not in the index, so it
      // reaches the gate and is dropped on its own merits; 22 is a
      // near-dup of LANDED 13 (dropped)
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(landed() == Seq(1L, 10L, 13L))
    } finally q.stop()

    // drift partitions: one window row per batch over the GATED rows
    val d0 = rows(spark.read.parquet(s"$driftDir/b=0"))
    assert(d0.map(_.getAs[Long]("n_docs")).sum == 2L)
    assert(spark.read.parquet(s"$driftDir/b=1").isEmpty) // nothing landed
    // the health store tracked exactly what LANDED (10 and 13)
    val health = rows(
      graft.operators.Health.corpusHealthFromStore(spark, healthDir))
    assert(health.map(_.getAs[Long]("n_docs")).sum == 2L)

    // replay the LAST batch at any crash point: same kept set (the
    // probe excludes sb=1), and the batch-id-keyed delta append is a
    // committed no-op — state unchanged.
    val (gatedReplay, _) = Streams.productionIngestBatch(spark,
      b1.toDF("doc_id", "text", "mins")
        .withColumn("ts", expr(s"timestampadd(MINUTE, mins, $origin)"))
        .select($"doc_id", $"text", $"ts"),
      "doc_id", "text", $"ts", idx, nearDupThreshold = 0.4,
      gate = gate, gateBuckets = 4096, gateMin = 0.0, batchId = 1L,
      buckets = 8)
    assert(col0[Long](gatedReplay.select($"doc_id")).isEmpty)
    MergeLog.appendDelta(
      gatedReplay.withColumn("version", lit(1L))
        .withColumn("deleted", lit(false)),
      corpusDir, Some(1L))
    assert(landed() == Seq(1L, 10L, 13L))
  }
}
