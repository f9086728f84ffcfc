package graft
import org.apache.spark.sql.functions._
import graft.operators.Similarity
object ProbeV20 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())
    def time[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ab] $l: ${(System.nanoTime()-t0)/1e9}%.2f"); r
    }
    for (rep <- 1 to 3) {
      val e = Tables.load(spark, sfDir, "embeddings")
      val docs = e.filter(col("vec_id") >= 13)
      val cents = time(s"rep$rep cents") {
        e.filter(col("vec_id") < 8)
          .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
          .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).sortBy(_._1).toSeq
      }
      val books = time(s"rep$rep books")(
        Similarity.pqCodebooks(docs, col("vec_id"), col("embedding"), 4, 16, 8, 2))
      // decompose one iteration: plan-time vs run-time
      val d2 = docs.select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("v")).localCheckpoint(false)
      val seeds = time(s"rep$rep seeds")(d2.orderBy(col("id")).limit(8).collect())
      val bks = books
      val subCols = (0 until 4).map { ss =>
        val sv = slice(col("v"), ss * 16 + 1, 16)
        struct(lit(ss).as("s"),
          (-Similarity.centroidArgmax(sv, bks(ss)).getField("ncid")).cast("long").as("cid"),
          sv.as("sv"))
      }
      val fr = d2.select(explode(array(subCols: _*)).as("a"))
        .select(col("a.s").as("s"), col("a.cid").as("cid"),
          posexplode(col("a.sv")).as(Seq("pos", "x")))
        .groupBy(col("s"), col("cid"), col("pos"))
        .agg(avg(col("x").cast("double")).as("m"))
      time(s"rep$rep iter-plan")(fr.queryExecution.executedPlan)
      time(s"rep$rep iter-exec")(fr.collect())
      val fr2 = fr.filter(lit(true))
      time(s"rep$rep iter2-plan")(fr2.queryExecution.executedPlan)
      time(s"rep$rep iter2-exec")(fr2.collect())
      val idx = graft.Scratch.dir("graft_probe_v20") + "/ivfpq"
      time(s"rep$rep save")(
        Similarity.saveIvfPqIndex(docs, col("vec_id"), col("embedding"),
          cents, books, 16, idx, targetRows = 10000L, spread = 2))
      time(s"rep$rep probe") {
        Similarity.ivfPqTopK(spark, idx, docs, col("vec_id"), col("embedding"),
          e.filter(col("vec_id") >= 8 && col("vec_id") < 13),
          col("vec_id"), col("embedding"), k = 5, nprobe = 2, rerank = 20)
          .queryExecution.toRdd.foreachPartition(_.foreach(_ => ()))
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    spark.stop()
  }
}
