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

  // ── log-linear quantile sketch ─────────────────────────────────────

  // skewed positive longs with a known exact distribution per stratum
  private def qdata = (0 until 10000).map { i =>
    val stratum = if (i % 3 == 0) "x" else "y"
    val v = ((i * 2654435761L) % 100003) * ((i % 17) + 1) % 1000000 + 1
    (stratum, (i % 5).toLong, v)
  }.toDF("s", "d", "v")

  private def quantiles(df: org.apache.spark.sql.DataFrame) =
    rows(Sketches.mergeQuantiles(
        Sketches.quantileSketch(df, $"s", $"d", $"v"), Seq(50, 90, 99)))
      .map(r => ((r.getString(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
      .toMap

  test("quantile containment: the exact percentile lies in [q_lo, q_hi)") {
    val q = quantiles(qdata)
    val byStratum = qdata.collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).map { case (s, vs) => (s, vs.map(_._2).sorted) }
    for (s <- Seq("x", "y"); p <- Seq(50, 90, 99)) {
      val vs = byStratum(s)
      // smallest value whose rank covers p% — same ≥ convention as the walk
      val exact = vs((vs.length * p + 99) / 100 - 1)
      val (lo, hi) = q((s, p))
      assert(lo <= exact && exact < hi, s"$s p$p exact=$exact not in [$lo,$hi)")
      // log-linear width bound: hi/lo ≤ 1 + 2^-subBits for lo ≥ 2^subBits
      assert(hi - lo <= math.max(lo / 32, 1), s"$s p$p bucket too wide [$lo,$hi)")
    }
  }

  test("quantile merge law: day-split sketch rows == one sketch over everything") {
    val split = Sketches.quantileSketch(qdata.where($"d" < 2), $"s", $"d", $"v")
      .unionAll(Sketches.quantileSketch(qdata.where($"d" >= 2), $"s", $"d", $"v"))
    val direct = Sketches.quantileSketch(qdata, $"s", lit(0L), $"v")
    assert(rows(Sketches.mergeQuantiles(split, Seq(50, 90, 99))
        .orderBy($"stratum", $"p")) ==
      rows(Sketches.mergeQuantiles(direct, Seq(50, 90, 99))
        .orderBy($"stratum", $"p")))
  }

  test("small values bucket exactly (lo == v, width 1) below 2^(subBits+1)") {
    val small = (1 to 63).map(v => ("s", 0L, v.toLong)).toDF("s", "d", "v")
    val sk = rows(Sketches.quantileSketch(small, $"s", $"d", $"v")
      .orderBy($"lo"))
    assert(sk.map(_.getLong(2)) == (1L to 63L))
    val q = quantiles(small.union(small)) // duplicates don't widen buckets
    assert(q(("s", 50)) == (32L, 33L))
  }
}
