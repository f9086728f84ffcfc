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
    // raw parquet has ts as TIMESTAMP(NANOS) -> long under nanosAsLong;
    // stream with the long schema and convert exactly like Tables.load.
    val stream = spark.readStream
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(streamDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
}
