package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def data = (1L to 1000L).map { i =>
    (i, s"k${i % 13}", (i * 37 % 1000) / 1000.0)
  }.toDF("id", "key", "score")

  test("matches the window-function formulation row-for-row") {
    // distinct scores per key -> deterministic result on both paths
    val viaOp = rows(TopKPerKey(data, $"key", $"score", 5)
      .select($"key", $"id").orderBy($"key", $"id"))
      .map(r => (r.getString(0), r.getLong(1)))
    val w = Window.partitionBy($"key").orderBy($"score".desc)
    val viaWindow = rows(data
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"key", $"id").orderBy($"key", $"id"))
      .map(r => (r.getString(0), r.getLong(1)))
    assert(viaOp == viaWindow)
    assert(viaOp.size == 13 * 5)
  }

  test("plans as partial+final with exactly one exchange between them") {
    val df = TopKPerKey(data.repartition(4), $"key", $"score", 3)
    df.collect()
    // nodes print as "TopKPerKey ..., false|true" (partial flag last)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head // final AQE plan only
    val finalIdx = plan.indexOf("TopKPerKey ")
    val partialIdx = plan.lastIndexOf("TopKPerKey ")
    assert(finalIdx >= 0 && partialIdx > finalIdx,
      s"expected two TopKPerKey nodes:\n$plan")
    val between = plan.substring(finalIdx, partialIdx)
    assert(between.contains("Exchange hashpartitioning"),
      s"expected a hash exchange between partial and final:\n$plan")
  }

  test("null order rows drop; k larger than group passes everything") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("b", Some(2.0)))
      .toDF("key", "score")
    val out = rows(TopKPerKey(df, $"key", $"score", 10)
      .orderBy($"key")).map(r => (r.getString(0), r.getDouble(1)))
    assert(out == Seq(("a", 1.0), ("b", 2.0)))
  }
}
