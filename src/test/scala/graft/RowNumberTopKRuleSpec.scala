package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RowNumberTopKRuleSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    ("a", 1L, 10), ("a", 2L, 30), ("a", 3L, 20), ("a", 4L, 40),
    ("b", 5L, 5), ("b", 6L, 15), ("c", 7L, 1)).toDF("key", "id", "score")

  private val w = Window.partitionBy($"key").orderBy($"s".desc)

  test("rewrites filter(row_number <= k) over a non-nullable double order") {
    val out = base.withColumn("s", $"score".cast("double"))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    assert(out.queryExecution.optimizedPlan.toString.contains("TopKPerKey"),
      out.queryExecution.optimizedPlan.toString)
    val physical = out.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerKey"), physical)
    // the final stage's hash exchange serves the window too — no second
    // shuffle on the same key
    assert("Exchange hashpartitioning".r.findAllIn(physical).size == 1,
      physical)
    val got = rows(out.select($"key", $"id", $"rn").orderBy($"key", $"rn"))
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got == Seq(("a", 4L, 1), ("a", 2L, 2),
      ("b", 6L, 1), ("b", 5L, 2), ("c", 7L, 1)))
  }

  test("does not fire on a nullable order key") {
    val out = base
      .withColumn("s", when($"score" > 3, $"score".cast("double")))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    assert(!out.queryExecution.optimizedPlan.toString.contains("TopKPerKey"))
    // and row_number semantics keep the null-order row rankable
    val got = rows(out.filter($"key" === "c").select($"id"))
    assert(got.map(_.getLong(0)) == Seq(7L))
  }

  test("does not fire on rn === 1 (first-wins dedup shape) or ascending order") {
    val eq = base.withColumn("s", $"score".cast("double"))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    assert(!eq.queryExecution.optimizedPlan.toString.contains("TopKPerKey"))
    val asc = base.withColumn("s", $"score".cast("double"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"key").orderBy($"s".asc))).filter($"rn" <= 2)
    assert(!asc.queryExecution.optimizedPlan.toString.contains("TopKPerKey"))
  }
}
