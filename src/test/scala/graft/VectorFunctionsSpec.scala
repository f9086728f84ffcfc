package graft

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-9

  test("dot / l2Norm / cosine on known vectors") {
    val in = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val r = rows(in.select(VF.dot($"a", $"b"), VF.l2Norm($"a"),
      VF.cosine($"a", $"b"), VF.l2Distance($"a", $"b"))).head
    assert(math.abs(r.getDouble(0) - 32.0) < eps)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < eps)
    assert(math.abs(r.getDouble(2) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < eps)
    assert(math.abs(r.getDouble(3) - math.sqrt(27.0)) < eps)
  }

  test("cosine of identical vectors is 1; orthogonal is 0") {
    val in = Seq(
      (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b")
    val out = col0[Double](in.select(VF.cosine($"a", $"b")))
    assert(math.abs(out(0) - 1.0) < eps && math.abs(out(1)) < eps)
  }

  test("normalize yields unit norm; zero vector unchanged") {
    val in = Seq(Seq(3.0f, 4.0f), Seq(0.0f, 0.0f)).toDF("a")
    val norms = col0[Double](in.select(VF.l2Norm(VF.normalize($"a"))))
    assert(math.abs(norms(0) - 1.0) < eps)
    assert(norms(1) == 0.0)
  }
}
