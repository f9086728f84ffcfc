package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Pins the r19 lifecycle round-trip cuts (VERDICT r18 next-round #2):
  * commit/hwm markers became FS-direct (no spark.range(1) write job),
  * the FileManifest and BM25 meta became driver-side text IO, and the
  * s19 tick report returns literal rows — each removed round trip is
  * one fewer Spark job. Measured at sf0.01/local[8] (JobCountProbe):
  *
  *   s19_incremental_listing  24 -> 14
  *   v17_bm25_indexed         50 -> 39
  *   d15_lsh_index_probe      26 -> 22
  *   v14_ivf_recenter         43 -> 39
  *   g12_vector_tick          38 -> 35
  *   d18_neardup_ingest       37 -> 36
  *
  * The bounds below carry headroom (+4..5) for SF/core/AQE variance
  * while still failing if a marker/manifest job class returns (each
  * class re-adds 3-11 jobs). sf0.001 keeps the spec cheap.
  */
class JobCountSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def jobsOf(name: String): Long = {
    val ctr = new AtomicLong(0L)
    val l = new SparkListener {
      override def onJobStart(ev: SparkListenerJobStart): Unit = {
        ctr.incrementAndGet(): Unit
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd
        .foreachPartition(
          (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) =>
            it.foreach(_ => ()))
      org.apache.spark.graftbridge.Bus.drain(spark.sparkContext)
      ctr.get()
    } finally {
      spark.sparkContext.removeSparkListener(l)
      Frames.scrubSession(spark)
    }
  }

  for ((name, bound) <- Seq(
      "s19_incremental_listing" -> 19L,
      "v17_bm25_indexed" -> 44L,
      "d15_lsh_index_probe" -> 27L,
      "v14_ivf_recenter" -> 44L,
      "g12_vector_tick" -> 40L)) {
    test(s"$name runs within its post-r19 job budget (<= $bound)") {
      val n = jobsOf(name)
      assert(n <= bound,
        s"$name ran $n jobs (> $bound) — a lifecycle round-trip class " +
          "(marker write job / manifest parquet job / tick stage write) " +
          "has returned")
    }
  }
}
