package graft
object ProbeFan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())
    for (name <- args.toSeq) {
      val ts = collection.mutable.ArrayBuffer[Double]()
      for (_ <- 1 to 5) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.toRdd.foreachPartition(_.foreach(_ => ()))
        ts += (System.nanoTime()-t0)/1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        System.gc()
      }
      println(f"[ab] $name MIN=${ts.min}%.2f MED=${ts.sorted.apply(2)}%.2f reps=${ts.map(t=>f"$t%.1f").mkString(",")}")
    }
    spark.stop()
  }
}
