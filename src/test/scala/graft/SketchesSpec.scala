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

  test("HLL inclusion-exclusion recovers the overlap of two strata within compounded error") {
    // A = k0..k999, B = k500..k1499: exact overlap 500, union 1500
    val d = ((0 until 1000).map(i => ("A", s"k$i")) ++
      (500 until 1500).map(i => ("B", s"k$i"))).toDF("s", "k")
    val sk = d.groupBy($"s").agg(expr("hll_sketch_agg(k, 12)").as("sk"))
    val got = sk.agg(expr(
      """hll_sketch_estimate(max(CASE WHEN s = 'A' THEN sk END))
         + hll_sketch_estimate(max(CASE WHEN s = 'B' THEN sk END))
         - hll_sketch_estimate(hll_union(
             max(CASE WHEN s = 'A' THEN sk END),
             max(CASE WHEN s = 'B' THEN sk END)))""")).head().getLong(0)
    // three ±1.6%σ estimates compound: allow 10% of the union
    assert(math.abs(got - 500L) <= 150L, s"overlap estimate $got")
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

  // ── threshold-pruned frequency sketch ──────────────────────────────

  // zipf-ish key stream over 2 strata and 4 days: k0 dominates, a long
  // tail of singletons pads the mass
  private def fdata = (0 until 8000).map { i =>
    val stratum = if (i % 2 == 0) "x" else "y"
    val key = if (i % 10 < 3) "k0" else if (i % 10 < 5) s"k${i % 7}"
              else s"tail$i"
    (stratum, (i % 4).toLong, key)
  }.toDF("s", "d", "k")

  test("heavy hitters: no false negatives, true count inside [lo, hi]") {
    val out = rows(Sketches.mergeHeavyHitters(
        Sketches.freqSketch(fdata, $"s", $"d", $"k", 1L, 50L), 1L, 50L))
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    val exact = fdata.collect().map(r => ((r.getString(0), r.getString(2)), 1L))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val totals = exact.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    for (((s, k), t) <- exact if t * 50L >= totals(s)) {
      val (lo, hi) = out.getOrElse((s, k),
        fail(s"theta-heavy key ($s,$k) t=$t missing"))
      assert(lo <= t && t <= hi, s"($s,$k) t=$t outside [$lo,$hi]")
    }
    // and every reported key's bounds contain its true count too
    for (((s, k), (lo, hi)) <- out; t = exact((s, k)))
      assert(lo <= t && t <= hi, s"($s,$k) t=$t outside [$lo,$hi]")
  }

  test("heavy hitters merge law: batch-split sketch rows == direct") {
    val s1 = Sketches.freqSketch(fdata.where($"d" < 2), $"s", $"d", $"k", 1L, 50L)
    val s2 = Sketches.freqSketch(fdata.where($"d" >= 2), $"s", $"d", $"k", 1L, 50L)
    val merged = rows(Sketches.mergeHeavyHitters(s1.unionAll(s2), 1L, 50L)
      .orderBy($"stratum", $"key"))
    val direct = rows(Sketches.mergeHeavyHitters(
        Sketches.freqSketch(fdata, $"s", $"d", $"k", 1L, 50L), 1L, 50L)
      .orderBy($"stratum", $"key"))
    assert(merged == direct)
  }

  test("single-batch sketch is exact: hi == lo == true count") {
    val one = fdata.where($"d" === 0)
    val out = rows(Sketches.mergeHeavyHitters(
        Sketches.freqSketch(one, $"s", lit(0L), $"k", 1L, 50L), 1L, 50L))
    assert(out.nonEmpty)
    val exact = one.collect().map(r => ((r.getString(0), r.getString(2)), 1L))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    for (r <- out) {
      assert(r.getLong(2) == r.getLong(3), r.toString)
      assert(r.getLong(2) == exact((r.getString(0), r.getString(1))), r.toString)
    }
  }

  test("a key at exactly the global threshold always surfaces") {
    // "h" hits total/den exactly but hides one under the per-day bar
    // (9 < ceil(500/50) = 10) in three of four days — the adversarial
    // shape for a pruned sketch: only day 0 keeps it, and the
    // guarantee must recover t = 40 from hi = 13 + 3·slack = 40
    val den = 50L
    val perDay = Map(0L -> 13, 1L -> 9, 2L -> 9, 3L -> 9)
    val df = (0L to 3L).flatMap { d => // every day exactly rows_d = 500
      Seq.fill(perDay(d))(("s", d, "h")) ++
        (0 until 500 - perDay(d)).map(i => ("s", d, s"t${d}_$i"))
    }.toDF("s", "d", "k") // total 2000, h = 40 = total/den exactly
    val out = rows(Sketches.mergeHeavyHitters(
        Sketches.freqSketch(df, $"s", $"d", $"k", 1L, den), 1L, den))
      .map(r => (r.getString(1), (r.getLong(2), r.getLong(3)))).toMap
    val (lo, hi) = out.getOrElse("h", fail("threshold key h missing"))
    assert(lo == 13L && hi == 40L, s"[$lo,$hi]") // bound exactly tight
  }

  private def ksOf(data: Seq[(String, Long)]): Map[String, Double] =
    rows(Sketches.ksDistance(data.toDF("s", "v"), $"s", $"v", "ref"))
      .map(r => r.getString(0) -> r.getAs[Double]("ks")).toMap

  test("ksDistance: identical distributions give 0, disjoint supports give 1") {
    val same = Seq("a", "ref").flatMap(s => Seq(1L, 2L, 3L).map(s -> _))
    assert(ksOf(same)("a") == 0.0)
    val disjoint = Seq("a" -> 1L, "a" -> 1L, "a" -> 2L,
      "ref" -> 5L, "ref" -> 6L)
    assert(ksOf(disjoint)("a") == 1.0)
  }

  test("ksDistance matches the hand-computed sup and handles many strata") {
    // a=[1,2] vs ref=[2,3]: merged axis {1,2,3}, F_a=(.5,1,1),
    // F_ref=(0,.5,1) → sup .5 (at v=1 or v=2);
    // b=[3,3] vs ref: axis {2,3}, F_b=(0,1), F_ref=(.5,1) → sup .5
    val got = ksOf(Seq("a" -> 1L, "a" -> 2L, "b" -> 3L, "b" -> 3L,
      "ref" -> 2L, "ref" -> 3L))
    assert(math.abs(got("a") - 0.5) < 1e-15)
    assert(math.abs(got("b") - 0.5) < 1e-15)
    // the reference stratum itself never appears in the output
    assert(!got.contains("ref"))
  }

  test("ksFromDistribution on batch-folded counts == direct ksDistance") {
    val b1 = Seq(("a", 1L), ("a", 2L), ("ref", 2L), ("ref", 9L))
    val b2 = Seq(("a", 2L), ("b", 5L), ("ref", 3L), ("ref", 2L))
    val folded = Sketches
      .distributionCounts(b1.toDF("s", "v"), $"s", $"v")
      .unionByName(Sketches.distributionCounts(b2.toDF("s", "v"), $"s", $"v"))
      .groupBy("stratum", "v").agg(sum($"c").as("c"))
    val inc = rows(Sketches.ksFromDistribution(folded, "ref"))
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Double]("ks")))
      .toSet
    val direct = rows(Sketches.ksDistance(
        (b1 ++ b2).toDF("s", "v"), $"s", $"v", "ref"))
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Double]("ks")))
      .toSet
    assert(inc == direct && inc.map(_._1) == Set("a", "b"))
  }

  test("ksDriftSink: micro-batches fold into the store; ksFromStore == direct; replay no-op") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Scratch.dir("ks_stream") + "/dist"
    Sketches.initDistributionStore(spark, dir)
    val input = MemoryStream[(String, Long)]
    val q = graft.streaming.Streams.ksDriftSink(
        input.toDF().toDF("lang", "ntok"), "lang", "ntok", dir)
      .option("checkpointLocation", Scratch.dir("ks_stream_ckpt"))
      .start()
    val all = Seq("a" -> 1L, "a" -> 2L, "ref" -> 2L, "ref" -> 9L,
      "a" -> 2L, "b" -> 5L, "ref" -> 3L)
    try {
      input.addData(all.take(4): _*)
      q.processAllAvailable()
      input.addData(all.drop(4): _*)
      q.processAllAvailable()
      val store = rows(Sketches.ksFromStore(spark, dir, "ref"))
        .map(r => (r.getString(0), r.getAs[Long]("n"),
          r.getAs[Double]("ks"))).toSet
      val direct = rows(Sketches.ksDistance(
          all.toDF("s", "v"), $"s", $"v", "ref"))
        .map(r => (r.getString(0), r.getAs[Long]("n"),
          r.getAs[Double]("ks"))).toSet
      assert(store == direct && store.map(_._1) == Set("a", "b"))
      // replaying an already-landed batch id is a no-op (idempotence)
      Sketches.appendDistribution(all.drop(4).toDF("s", "v"),
        $"s", $"v", dir, Some(1L))
      val replayed = rows(Sketches.ksFromStore(spark, dir, "ref"))
        .map(r => (r.getString(0), r.getAs[Long]("n"),
          r.getAs[Double]("ks"))).toSet
      assert(replayed == store)
    } finally q.stop()
  }

  test("ksCritical: the Smirnov alert rule separates same from shifted samples") {
    // c(0.05) = sqrt(-ln(0.025)/2) ≈ 1.3581; equal n=100 → ≈ 0.19206
    val t = Sketches.ksCritical(100, 100, 0.05)
    assert(math.abs(t - 1.3581015 * math.sqrt(0.02)) < 1e-6)
    // tighter alpha → higher bar; more data → lower bar
    assert(Sketches.ksCritical(100, 100, 0.01) > t)
    assert(Sketches.ksCritical(1000, 1000, 0.05) < t)
    // identical large samples never alert (ks = 0), disjoint ones do:
    // n=200 each → threshold ≈ 0.136 < 1
    val same = (1 to 200).flatMap(i => Seq("a" -> i.toLong, "ref" -> i.toLong))
    assert(ksOf(same)("a") <= Sketches.ksCritical(200, 200, 0.05))
    val far = (1 to 200).flatMap(i => Seq("a" -> i.toLong, "ref" -> (i + 500).toLong))
    assert(ksOf(far)("a") > Sketches.ksCritical(200, 200, 0.05))
    intercept[IllegalArgumentException](Sketches.ksCritical(0, 10, 0.05))
    intercept[IllegalArgumentException](Sketches.ksCritical(10, 10, 1.5))
  }

  test("ksDistance: n is the compared stratum's row count; ks within [0,1]") {
    val out = rows(Sketches.ksDistance(
      Seq(("a", 1L), ("a", 7L), ("a", 7L), ("ref", 2L))
        .toDF("s", "v"), $"s", $"v", "ref"))
    assert(out.size == 1)
    assert(out.head.getAs[Long]("n") == 3L)
    val ks = out.head.getAs[Double]("ks")
    assert(ks >= 0.0 && ks <= 1.0)
    // exact: F_a jumps to 1/3 at 1, ref jumps to 1 at 2 → sup at v=2
    // is |1/3 − 1| = 2/3
    assert(math.abs(ks - 2.0 / 3.0) < 1e-15)
  }
}
