package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Diagnostic (r19 optimization round): Spark JOBS per query — the
  * driver round-trip count that walls the scheduler-bound lifecycle
  * class (wall ≈ Σ dependent-job latencies at ~1 busy core). Used to
  * measure the marker/manifest round-trip cuts: each removed
  * `spark.range(1).write.parquet` commit marker or one-row manifest
  * read/write is one fewer job. Prints one line per query:
  * name, job count, wall seconds.
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())
    val jobs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(ev: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
    })
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      org.apache.spark.graftbridge.Bus.drain(spark.sparkContext)
      jobs.set(0L)
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.foreachPartition(
        (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) =>
          it.foreach(_ => ()))
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.Bus.drain(spark.sparkContext)
      println(f"JOBCOUNT $name%-24s jobs=${jobs.get()}%4d wall=$dt%7.3f")
      Frames.scrubSession(spark)
    }
    spark.stop()
  }
}
