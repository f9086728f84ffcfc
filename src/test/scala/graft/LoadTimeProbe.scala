package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic (r18): cost of repeated spark.read.parquet construction
  * (file listing + footer/schema read) per table at sf0.1 — the fixed
  * driver-side cost every query pays per referenced table.
  */
object LoadTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm: first touch pays codec/jit init
    Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())
    Tables.names.foreach { t =>
      val t0 = System.nanoTime()
      var i = 0
      while (i < 20) { Tables.load(spark, sfDir, t).queryExecution.analyzed; i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9 / 20
      println(f"LOADTIME $t%-12s ${dt * 1000}%8.1f ms/load")
    }
    spark.stop()
  }
}
