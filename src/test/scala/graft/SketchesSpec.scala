package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // two strata with known distinct counts and heavy repetition
  private def data = (0 until 20000).map { i =>
    val stratum = if (i % 4 == 0) "a" else "b"
    val key = if (stratum == "a") s"k${i % 500}" else s"k${i % 3000}"
    (stratum, (i % 7).toLong, key)
  }.toDF("s", "d", "k")

  test("union of daily sketches estimates the true distinct count within HLL error") {
    val est = rows(Sketches.unionEstimates(
        Sketches.dailySketches(data, $"s", $"d", $"k"))
        .orderBy($"stratum"))
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(math.abs(est("a").toDouble / 125.0 - 1) < 0.05, est)   // gcd(4,500)=4: 125 residues
    assert(math.abs(est("b").toDouble / 2250.0 - 1) < 0.05, est)  // 3000 minus the 750 multiples of 4
  }

  test("merge law: union of per-day sketches == one sketch over everything") {
    val daily = rows(Sketches.unionEstimates(
        Sketches.dailySketches(data, $"s", $"d", $"k")).orderBy($"stratum"))
      .map(r => (r.getString(0), r.getLong(1)))
    val direct = rows(Sketches.unionEstimates(
        Sketches.dailySketches(data, $"s", lit(0L), $"k")).orderBy($"stratum"))
      .map(r => (r.getString(0), r.getLong(1)))
    assert(daily == direct)
  }

  test("sketch rows from separate batches union-merge (the incremental read)") {
    val b1 = Sketches.dailySketches(data.where($"d" < 3), $"s", $"d", $"k")
    val b2 = Sketches.dailySketches(data.where($"d" >= 3), $"s", $"d", $"k")
    val merged = rows(Sketches.unionEstimates(b1.unionAll(b2))
        .orderBy($"stratum"))
      .map(r => (r.getString(0), r.getLong(1)))
    val whole = rows(Sketches.unionEstimates(
        Sketches.dailySketches(data, $"s", $"d", $"k")).orderBy($"stratum"))
      .map(r => (r.getString(0), r.getLong(1)))
    assert(merged == whole)
  }
}
