package graft

import graft.sources.FooterStats
import org.apache.spark.sql.functions._

/** S15 — DSv2 parquet aggregate pushdown: COUNT/MIN/MAX answered from
  * file footers (row-group statistics), zero data pages read. The spec
  * pins (a) the `PushedAggregation` marker in the planned scan, (b) value
  * equality with the ordinary full-scan aggregate, and (c) conf hygiene —
  * the planning-time knobs are restored even though execution happened
  * under them.
  */
class FooterStatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val path: String = {
    val p = Scratch.dir("graft_footerstats")
    Seq.tabulate(257)(i => (i.toLong, (i % 37) * 0.5, s"s${i % 5}"))
      .toDF("id", "x", "tag")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$p/t")
    s"$p/t"
  }

  private def aggs = Seq(
    count(lit(1)).as("n_rows"),
    min(col("x")).as("min_x"), max(col("x")).as("max_x"),
    min(col("id")).as("min_id"), max(col("id")).as("max_id"))

  test("planned scan carries PushedAggregation (footer-only read)") {
    val plan = FooterStats.pushedPlanString(spark, path, aggs)
    assert(plan.contains("PushedAggregation"),
      s"aggregate did not push to the scan:\n$plan")
    assert(plan.contains("COUNT(*)"), plan)
    assert(plan.contains("MIN(x)") && plan.contains("MAX(x)"), plan)
  }

  test("footer aggregate equals the full-scan aggregate") {
    val pushed = FooterStats.aggregate(spark, path, aggs).collect()(0)
    val full = spark.read.parquet(path).agg(aggs.head, aggs.tail: _*)
      .collect()(0)
    assert(pushed == full, s"pushed=$pushed full=$full")
    assert(pushed.getAs[Long]("n_rows") == 257L)
    assert(pushed.getAs[Double]("max_x") == 18.0)
  }

  test("pushdown confs are restored after aggregate()") {
    val v1Before = spark.conf.get("spark.sql.sources.useV1SourceList")
    val pdBefore = spark.conf.get("spark.sql.parquet.aggregatePushdown")
    FooterStats.aggregate(spark, path, aggs).collect(): Unit
    assert(spark.conf.get("spark.sql.sources.useV1SourceList") == v1Before)
    assert(spark.conf.get("spark.sql.parquet.aggregatePushdown") == pdBefore)
  }

  test("COUNT(col) with nulls is footer-answerable and correct") {
    val p = Scratch.dir("graft_footernull")
    // one file: a file whose column is ENTIRELY null carries no min/max
    // statistics, and the footer reader fails the MIN/MAX read outright
    // (FooterStats scaladoc caveat) — mixed-value files are the contract
    Seq[(java.lang.Long, java.lang.Double)]((1L, 1.0), (2L, null),
      (3L, 3.0), (4L, null), (5L, 5.0))
      .toDF("id", "x").repartition(1)
      .write.mode("overwrite").parquet(s"$p/t")
    val out = FooterStats.aggregate(spark, s"$p/t",
      Seq(count(col("x")).as("n_x"), min(col("x")).as("min_x")))
      .collect()(0)
    assert(out.getAs[Long]("n_x") == 3L)
    assert(out.getAs[Double]("min_x") == 1.0)
  }
}
