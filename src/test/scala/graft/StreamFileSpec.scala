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
}
