package graft

import graft.expressions.CosineSim
import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._

class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
    (Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")

  test("native expression matches the higher-order-function formulation bit-for-bit") {
    val got = rows(vecs.select(
      CosineSim($"a", $"b").as("native"), VF.cosine($"a", $"b").as("hof")))
    got.take(2).foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // identical doubles, not ~=
    }
    // zero vector: native -> null (pinned non-ANSI division semantics)
    assert(got(2).isNullAt(0))
  }

  test("registered in SQL as cosine_sim via GraftExtensions") {
    vecs.createOrReplaceTempView("cs_vecs")
    val out = rows(spark.sql(
      "SELECT cosine_sim(a, b) FROM cs_vecs WHERE size(a) = 3"))
    assert(math.abs(out.head.getDouble(0) -
      32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
  }

  test("null inputs propagate null") {
    val df = Seq((Option.empty[Seq[Float]], Option(Seq(1.0f)))).toDF("a", "b")
    assert(rows(df.select(CosineSim($"a", $"b"))).head.isNullAt(0))
  }

  test("participates in whole-stage codegen") {
    // LocalTableScan short-circuits codegen; go through an exchange, and
    // execute first so AQE materializes the final plan.
    val df = vecs.repartition(2).select(CosineSim($"a", $"b"))
    df.collect()
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string.
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }
}
