package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (0L until 2000L)
    .map(i => (i, if (i % 2 == 0) "en" else "de")).toDF("id", "lang")

  test("hashSample is deterministic, repartition-stable, ~at rate") {
    val a = col0[Long](Sampling.hashSample(df, $"id", 0.5, "s1").select($"id")).toSet
    val b = col0[Long](Sampling.hashSample(df.repartition(7), $"id", 0.5, "s1")
      .select($"id")).toSet
    assert(a == b, "sample must not depend on partitioning")
    assert(math.abs(a.size - 1000) < 150, s"got ${a.size} of 2000 at rate 0.5")
  }

  test("monotone thresholds nest: the 0.2 sample is a subset of the 0.5 sample") {
    val small = col0[Long](Sampling.hashSample(df, $"id", 0.2, "s1").select($"id")).toSet
    val big = col0[Long](Sampling.hashSample(df, $"id", 0.5, "s1").select($"id")).toSet
    assert(small.subsetOf(big))
  }

  test("different salts decorrelate samples") {
    val a = col0[Long](Sampling.hashSample(df, $"id", 0.5, "s1").select($"id")).toSet
    val b = col0[Long](Sampling.hashSample(df, $"id", 0.5, "s2").select($"id")).toSet
    assert(a != b)
    // independent 0.5 samples overlap on ~25% of the population
    val overlap = (a intersect b).size
    assert(overlap > 300 && overlap < 700, s"overlap $overlap")
  }

  test("stratifiedSample applies per-stratum rates with default fallback") {
    val out = Sampling.stratifiedSample(df, $"lang", $"id",
      Map("en" -> 0.9), defaultRate = 0.1, salt = "s1")
      .groupBy($"lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1000 en at 0.9 and 1000 de at 0.1
    assert(out("en") > 800 && out("en") <= 1000, out.toString)
    assert(out("de") < 200, out.toString)
  }
}
