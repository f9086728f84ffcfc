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

  // skewed corpus: en 1600 docs × 100 tokens, de 400 × 100 — a 50%
  // token budget with α=0.5 weights must keep a HIGHER rate of de
  // (upsampled tail) than of en, and land near the budget overall.
  private lazy val mixDf = (0L until 2000L)
    .map(i => (i, if (i % 5 == 4) "de" else "en", 100))
    .toDF("id", "lang", "ntok")

  test("tokenBudgetMix hits the token budget with temperature-tilted rates") {
    val kept = Sampling.tokenBudgetMix(mixDf, $"lang", $"id", $"ntok",
      budgetPct = 50, salt = "m1")
      .groupBy($"lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact rates: W_en=√160000·1e6, W_de=√40000·1e6 → en 2/3·½·(T/T_en)…
    // en rate = B·W_en/(S·T_en) = 0.4167, de rate = 0.8333
    assert(kept("en") > 550 && kept("en") < 780, kept.toString)
    assert(kept("de") > 280 && kept("de") < 390, kept.toString)
    val totalTokens = (kept("en") + kept("de")) * 100.0
    assert(math.abs(totalTokens / 200000.0 - 0.5) < 0.06,
      s"kept ${totalTokens} of 200000 tokens")
    // tail language keeps a strictly higher fraction than the head
    assert(kept("de") / 400.0 > kept("en") / 1600.0)
  }

  test("tokenBudgetMix caps tiny-stratum rates at 1 (no row replication)") {
    val tiny = (0L until 1000L).map(i => (i, "en", 1000)) ++
      Seq((5000L, "rare", 1), (5001L, "rare", 1))
    val out = Sampling.tokenBudgetMix(tiny.toDF("id", "lang", "ntok"),
      $"lang", $"id", $"ntok", budgetPct = 50, salt = "m1")
    val rare = out.filter($"lang" === "rare").count()
    assert(rare == 2, s"rare stratum must keep all rows, got $rare")
    assert(out.count() <= 1002)
  }

  test("tokenBudgetMix is deterministic and partitioning-stable") {
    val a = col0[Long](Sampling.tokenBudgetMix(mixDf, $"lang", $"id", $"ntok",
      50, "m1").select($"id")).toSet
    val b = col0[Long](Sampling.tokenBudgetMix(mixDf.repartition(7), $"lang",
      $"id", $"ntok", 50, "m1").select($"id")).toSet
    assert(a == b)
  }

  test("epochShuffle: a permutation — dense per-shard positions, stable across partitionings") {
    val df = (0L until 400L).toDF("id")
    def run(d: org.apache.spark.sql.DataFrame) =
      rows(Sampling.epochShuffle(d, $"id", epoch = 1, numShards = 4)
        .orderBy($"shard", $"pos"))
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val a = run(df)
    // every row appears exactly once; positions are dense 0..n-1 per shard
    assert(a.map(_._1).sorted == (0L until 400L))
    a.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted == (0L until rs.size.toLong))
    }
    // shards are contiguous hash ranges → roughly uniform (no shard
    // under a quarter of its fair share on 400 keys)
    val sizes = a.groupBy(_._2).view.mapValues(_.size)
    assert(sizes.size == 4 && sizes.values.forall(_ > 25), sizes.toMap)
    // bit-stable under repartitioning (the reproducibility contract)
    assert(run(df.repartition(7)) == a)
  }

  test("epochShuffle: different epochs give independent permutations") {
    val df = (0L until 200L).toDF("id")
    def order(ep: Int) =
      rows(Sampling.epochShuffle(df, $"id", ep, numShards = 1)
        .orderBy($"pos")).map(_.getLong(0))
    val e1 = order(1)
    val e2 = order(2)
    assert(e1 != e2)
    assert(e1.sorted == e2.sorted)
    // neither epoch is the identity (the hash actually shuffles)
    assert(e1 != (0L until 200L) && e2 != (0L until 200L))
  }

  test("weightedSample: deterministic, partitioning-stable, k-bounded") {
    val w = df.withColumn("w", lit(1.0) + (col("id") % 5).cast("double"))
    val a = col0[Long](Sampling.weightedSample(w, $"id", $"w", 50, "ws")
      .select($"id"))
    val b = col0[Long](
      Sampling.weightedSample(w.repartition(7), $"id", $"w", 50, "ws")
        .select($"id"))
    assert(a == b && a.size == 50)
    assert(Sampling.weightedSample(w.limit(10), $"id", $"w", 50, "ws")
      .count() == 10, "k beyond population returns everything")
  }

  test("weightedTokenSample == naive global-sort cumsum cut (and is partitioning-stable)") {
    import org.apache.spark.sql.expressions.Window
    val w = df.withColumn("w", lit(1.0) + (col("id") % 5).cast("double"))
      .withColumn("n_tok", lit(10L) + (col("id") % 37))
    val got = rows(Sampling.weightedTokenSample(w, $"id", $"w", $"n_tok",
        budgetPct = 30, salt = "wt").select($"id", $"start_tok"))
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // Naive twin: one global sort by (sel_key asc, id), running token
    // offset, keep start < 30% of total. Same selection key expression.
    val naive = Sampling.withSelectionKey(w, $"id", $"w", "wt")
      .withColumn("start_tok",
        coalesce(sum($"n_tok").over(
          Window.orderBy($"sel_key", $"id")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val tot = w.agg(sum($"n_tok")).head().getLong(0)
    val expect = rows(naive.filter($"start_tok" < lit(tot * 30 / 100))
        .select($"id", $"start_tok"))
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expect && got.nonEmpty)
    val rep = rows(Sampling.weightedTokenSample(w.repartition(7), $"id",
        $"w", $"n_tok", budgetPct = 30, salt = "wt")
        .select($"id", $"start_tok"))
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rep == got, "cut must not depend on partitioning")
  }

  test("weightedTokenSample budgets nest: the 20% selection is a prefix of the 40% selection") {
    val w = df.withColumn("w", lit(1.0) + (col("id") % 5).cast("double"))
      .withColumn("n_tok", lit(10L) + (col("id") % 37))
    def sel(pct: Int) = rows(Sampling.weightedTokenSample(w, $"id", $"w",
        $"n_tok", budgetPct = pct, salt = "nest").select($"id", $"start_tok"))
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val small = sel(20)
    val big = sel(40)
    assert(small.nonEmpty && big.size > small.size)
    // serve order is budget-independent, so a smaller budget is a strict
    // prefix: same docs, same offsets
    small.foreach { case (id, st) => assert(big.get(id).contains(st)) }
  }

  test("weightedSample with equal weights ranks exactly like the raw hash") {
    val w = df.limit(200).withColumn("w", lit(1.0))
    val sampled = col0[Long](
      Sampling.weightedSample(w, $"id", $"w", 30, "eq").select($"id")).toSet
    // u^(1/1) = u: the top-30 by hash directly
    val expect = w.withColumn("h", Sampling.keyHash($"id", "eq"))
      .orderBy($"h".desc, $"id").limit(30)
    assert(sampled == col0[Long](expect.select($"id")).toSet)
  }

  test("weightedSample favors heavy rows at the E-S proportion") {
    // Two rows, weights 9:1. P(heavy ranks first) = 9/10 under
    // Efraimidis–Spirakis; over 60 fixed salts the deterministic
    // count must sit near 54, certainly above 45 (and below 60 —
    // the light row does sometimes win).
    val two = Seq((1L, 9.0), (2L, 1.0)).toDF("id", "w")
    val wins = (0 until 60).count { s =>
      col0[Long](Sampling.weightedSample(two, $"id", $"w", 1, s"p$s")
        .select($"id")).head == 1L
    }
    assert(wins > 45 && wins < 60, s"heavy row won $wins/60")
  }

  test("curriculumSchedule: exact quantile phases, monotone in score") {
    // 400 rows with distinct scores 0..399 → 4 phases of exactly 100,
    // and a higher score never lands in a later phase than a lower one
    val d = (0L until 400L).map(i => (i, i)).toDF("id", "sc")
    val got = Sampling.curriculumSchedule(d, $"id", $"sc", 4, 1, 8)
      .select($"score", $"phase").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map(0L -> 100, 1L -> 100, 2L -> 100, 3L -> 100))
    got.sortBy(-_._1).sliding(2).foreach { case Array(hi, lo) =>
      assert(hi._2 <= lo._2, s"$hi before $lo")
    }
    // phase 0 holds the TOP scores (easy-first contract)
    assert(got.filter(_._2 == 0L).map(_._1).min == 300L)
  }

  test("curriculumSchedule: ties share a phase; tie mass widens it") {
    // 90 rows of score 5 (45%) + 110 distinct lower scores: the tie
    // block crosses the 25% boundary but must stay one phase
    val d = ((0L until 90L).map(i => (i, 5L)) ++
      (90L until 200L).map(i => (i, -i))).toDF("id", "sc")
    val byScore = Sampling.curriculumSchedule(d, $"id", $"sc", 4, 1, 4)
      .select($"score", $"phase").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byScore(5L) == 0L)
    assert(byScore.count(_._2 == 0L) == 1, "tie block fills phase 0 alone")
  }

  test("curriculumSchedule: within-phase order is the epoch permutation") {
    // dense per-(phase, shard) positions; the whole schedule is a
    // permutation of ids; a different epoch reorders within phases but
    // never moves a row across phases
    val d = (0L until 500L).map(i => (i, i % 7)).toDF("id", "sc")
    def run(ep: Int) = Sampling.curriculumSchedule(d, $"id", $"sc", 3, ep, 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val a = run(1)
    assert(a.map(_._1).toSet == (0L until 500L).toSet)
    a.groupBy(t => (t._2, t._3)).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (0L until rows.length).toSeq)
    }
    val b = run(2)
    assert(a.map(t => t._1 -> t._2).toMap == b.map(t => t._1 -> t._2).toMap,
      "phases must not depend on epoch")
    assert(a.map(t => t._1 -> (t._3, t._4)).toMap !=
      b.map(t => t._1 -> (t._3, t._4)).toMap,
      "epoch must reshuffle within phases")
    // partitioning-stability: the schedule is a pure function of keys
    val c = Sampling.curriculumSchedule(d.repartition(13), $"id", $"sc",
      3, 1, 4).collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(c.toSeq == a.sortBy(_._1).toSeq)
  }

  private val cuts = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("curriculumScheduleFromSketch == exact schedule on bucket-aligned scores; merged batch sketches too") {
    import graft.operators.Sketches
    // scores pre-quantized to their log-linear bucket floor: the sketch
    // sees the distribution losslessly, so phases must match exactly
    val raw = df.withColumn("s0",
      (lit(3L) + (col("id") % 97) * (col("id") % 11)).cast("long"))
    val d = raw.select($"id",
      Sketches.logLinearLo($"s0").as("sc")).persist()
    val exact = rows(Sampling.curriculumSchedule(d, $"id", $"sc",
        phases = 4, epoch = 1, numShards = 4)).map(_.toSeq).toSet
    val sketch = Sketches.quantileSketch(d, lit("all"), lit(0L), $"sc")
    val viaSketch = rows(Sampling.curriculumScheduleFromSketch(d, $"id",
        $"sc", sketch, phases = 4, epoch = 1, numShards = 4))
      .map(_.toSeq).toSet
    assert(viaSketch == exact && exact.nonEmpty)
    // the incremental path: per-batch sketches merged by row union give
    // the identical schedule — re-phasing never rescans history
    val s1 = Sketches.quantileSketch(d.where($"id" < 1000), lit("all"),
      lit(0L), $"sc")
    val s2 = Sketches.quantileSketch(d.where($"id" >= 1000), lit("all"),
      lit(1L), $"sc")
    val viaMerged = rows(Sampling.curriculumScheduleFromSketch(d, $"id",
        $"sc", s1.unionAll(s2), phases = 4, epoch = 1, numShards = 4))
      .map(_.toSeq).toSet
    assert(viaMerged == exact)
    d.unpersist()
  }

  test("curriculumScheduleFromSketch on raw scores: total, monotone, phase sizes within bucket tolerance") {
    import graft.operators.Sketches
    val d = df.select($"id",
      (lit(3L) + (col("id") % 97) * (col("id") % 11)).cast("long").as("sc"))
    val sketch = Sketches.quantileSketch(d, lit("all"), lit(0L), $"sc")
    val got = rows(Sampling.curriculumScheduleFromSketch(d, $"id", $"sc",
      sketch, phases = 4, epoch = 1, numShards = 4))
    assert(got.size == d.count(), "every row gets a phase")
    // rows sharing a bucket share a phase; going down in bucket floor,
    // the phase never decreases (the curriculum stays monotone at the
    // sketch's granularity)
    val byBucket = got
      .map(r => (Sketches.logLinearLoValue(r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    byBucket.foreach { case (lo, ps) =>
      assert(ps.size == 1, s"bucket $lo spans phases $ps")
    }
    byBucket.toSeq.sortBy(-_._1).map(_._2.head)
      .sliding(2).foreach {
        case Seq(p1, p2) => assert(p1 <= p2, s"phase regressed: $p1 -> $p2")
        case _ =>
      }
  }

  test("clusterSplit: every cluster lands whole on one side — zero leakage") {
    // 2000 docs in 400 clusters of 5: members must never straddle a cut
    val labeled = df.withColumn("cluster_id", $"id" % 400)
    val out = Sampling.clusterSplit(labeled, $"cluster_id", cuts, "spl")
    val perCluster = out.groupBy($"cluster_id")
      .agg(countDistinct($"split").as("k"))
    assert(col0[Long](perCluster.select($"k")).forall(_ == 1L),
      "a cluster straddled the split")
    // and the fractions are respected at the CLUSTER level
    val byName = out.select($"cluster_id", $"split").distinct()
      .groupBy($"split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byName("train") - 320L) < 40, byName.toString)
    assert(byName.keySet == Set("train", "val", "test"))
  }

  test("clusterSplit: total, deterministic, partitioning-stable") {
    val labeled = df.withColumn("cluster_id", $"id" % 400)
    val a = Sampling.clusterSplit(labeled, $"cluster_id", cuts, "spl")
      .select($"id", $"split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.size == 2000 && !a.values.exists(_ == null),
      "every row must get a split")
    val b = Sampling.clusterSplit(labeled.repartition(11), $"cluster_id",
      cuts, "spl").select($"id", $"split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "split must not depend on partitioning")
  }

  test("clusterSplit: the last cut absorbs the threshold remainder") {
    // a single full-width cut maps EVERY hash value; and with two cuts
    // the complement of the first is exactly the second
    val labeled = df.withColumn("cluster_id", $"id")
    val whole = Sampling.clusterSplit(labeled, $"cluster_id",
      Seq("all" -> 1.0), "spl")
    assert(col0[String](whole.select($"split")).forall(_ == "all"))
    val two = Sampling.clusterSplit(labeled, $"cluster_id",
      Seq("a" -> 0.7, "b" -> 0.3), "spl")
    val aSide = two.filter($"split" === "a").count()
    val kept = Sampling.hashSample(labeled, $"cluster_id", 0.7, "spl").count()
    assert(aSide == kept, "cut 'a' must equal the 0.7 hashSample exactly")
  }

  test("clusterSplit rejects fractions that do not sum to 1") {
    val labeled = df.withColumn("cluster_id", $"id")
    intercept[IllegalArgumentException] {
      Sampling.clusterSplit(labeled, $"cluster_id",
        Seq("a" -> 0.5, "b" -> 0.3), "spl")
    }
  }

  test("driftGatedRates: breached stratum re-derives its rate, stable strata keep the served one") {
    import graft.operators.Sketches
    // ref A uniform 0..99; B same shape (no breach); C shifted +80
    // (ks ≈ 0.8, far over the α=0.05 Smirnov bound); D stable but
    // previously unserved.
    def mk(st: String, vs: Seq[Int]) = vs.map(v => (st, v.toLong))
    val data = (mk("A", 0 until 100) ++ mk("B", 0 until 100) ++
      mk("C", (0 until 100).map(_ + 80)) ++ mk("D", 0 until 100))
      .toDF("s", "v")
    val counts = Sketches.distributionCounts(data, $"s", $"v")
    val fresh = Sampling.ratesFromDistribution(counts, 25)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val prev = Seq(("A", 111L), ("B", 222L), ("C", 333L))
      .toDF("stratum", "thr")
    val out = Sampling.driftGatedRates(counts, prev, "A", 25, 0.05)
      .collect()
      .map(r => r.getString(0) -> ((r.getBoolean(3), r.getLong(4)))).toMap
    assert(!out("A")._1 && out("A")._2 == 111L, "ref never breaches, keeps served")
    assert(!out("B")._1 && out("B")._2 == 222L, "stable stratum keeps served")
    assert(out("C")._1 && out("C")._2 == fresh("C"), "drifted stratum re-mixes")
    assert(!out("D")._1 && out("D")._2 == fresh("D"), "unserved stratum gets fresh")
    assert(out.keySet == Set("A", "B", "C", "D"))
  }

  /** Pure-Scala replay of the integer selection-key chain — the same
    * op sequence as [[Sampling.withSelectionKey]] and its DuckDB twin:
    * exact IEEE ×,÷,−,floor plus [[graft.expressions.DetLn.compute]]
    * (itself fixed-order exact-IEEE arithmetic).
    */
  private def refSelKey(hash: Long, w: Double): Long = {
    val m = math.min(1L << 26,
      math.max(1L, math.floor((1L << 20).toDouble / w + 0.5).toLong))
    val l = math.floor(
      (Sampling.LnMaxHash - graft.expressions.DetLn.compute(hash + 1)) *
        (1L << 20).toDouble + 0.5).toLong
    m * l
  }

  test("selection key matches the pure-IEEE integer reference, incl. boundary weights") {
    // Weights chosen to sit ON or NEXT TO the exponent's discretization
    // boundaries: w = 1 (m lands exactly on 2^20), powers of two
    // (single-bit m), w = 2^20/(n − 0.5) (m's floor input exactly
    // integral), the clamp edges, and detExp-derived DSIR weights.
    val boundary = Seq(
      1.0, 2.0, 0.5, 0.25, 64.0, 1.0 / 64.0,               // single-bit m + clamp
      (1L << 20).toDouble / (1048576.5),                   // floor input = integer
      (1L << 20).toDouble / (524288.5),                    //   "
      1e-9, 1e9,                                           // far past the clamp
      3.7, 0.315)                                          // generic
    val dsir = Seq(-2.0, -0.75, -1e-6, 0.0, 1e-6, 0.4, 2.0)
      .map(lr => graft.expressions.DetExp.compute(2.0 * lr))
    val base = spark.range(0, 400).toDF("id")
    for (wv <- boundary ++ dsir) {
      val got = rows(Sampling.withSelectionKey(
          base.withColumn("w", lit(wv)), $"id", $"w", "bnd")
        .select($"id", $"sel_key", Sampling.keyHash($"id", "bnd").as("h")))
      got.foreach { r =>
        val exp = refSelKey(r.getLong(2), wv)
        assert(r.getLong(1) == exp,
          s"id=${r.getLong(0)} w=$wv got=${r.getLong(1)} want=$exp")
        assert(r.getLong(1) >= 0L, s"sel_key must be non-negative")
      }
    }
  }

  test("soft-dedup weight 1/c yields m = c·2^20 exactly: sel_key scales integrally with cluster size") {
    // x11's determinism claim: for every cluster size c ≤ 64 the two
    // IEEE divides 1.0/c then 2^20/(1.0/c) land within 1/2 of the
    // integer c·2^20, so m is exact and sel_key(1/c) = c·sel_key(1).
    val df = (1L to 64L).map(c => (c, c)).toDF("id", "c")
    val base = Sampling.withSelectionKey(df, $"id", lit(1.0), "sd12")
      .select($"id", col("sel_key").as("k1"))
    val soft = Sampling.withSelectionKey(
        df, $"id", lit(1.0) / $"c".cast("double"), "sd12")
      .select($"id", $"c", col("sel_key").as("kc"))
    rows(base.join(soft, "id")).foreach { r =>
      val (c, k1, kc) = (r.getLong(2), r.getLong(1), r.getLong(3))
      assert(kc == c * k1, s"c=$c k1=$k1 kc=$kc")
    }
  }

  test("integer key ranks order-equivalently to the continuous E-S score away from quantization ties") {
    // The r12 integer key m·⌊−ln(u)·2²⁰+½⌋ ascending is order-
    // equivalent to ranking descending by u^(m/2^20) — i.e. ascending
    // by the continuous score m·(−ln u)·2²⁰ — except where two rows'
    // continuous scores sit within the quantization of L, which rounds
    // each score by at most m/2 (plus negligible detln series error).
    // Check pairwise over mixed weights: any inversion between integer
    // and continuous order must sit inside that bound.
    val base = spark.range(0, 300).toDF("id")
      .withColumn("w", lit(0.25) + ($"id" % 7).cast("double"))
    val got = rows(Sampling.withSelectionKey(base, $"id", $"w", "oeq")
        .select($"id", $"w", $"sel_key",
          Sampling.keyHash($"id", "oeq").as("h")))
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    def scoreAndM(h: Long, w: Double): (Double, Long) = {
      val m = math.min(1L << 26,
        math.max(1L, math.floor((1L << 20).toDouble / w + 0.5).toLong))
      (m.toDouble * (Sampling.LnMaxHash -
        graft.expressions.DetLn.compute(h + 1)) * (1L << 20).toDouble, m)
    }
    var inversions = 0
    for (a <- got; b <- got if a._1 < b._1) {
      val (sa, ma) = scoreAndM(a._4, a._2)
      val (sb, mb) = scoreAndM(b._4, b._2)
      val tol = 0.5 * (ma + mb) + 1.0
      if (a._3 < b._3) {
        if (sa >= sb) inversions += 1
        assert(sa < sb + tol, s"inversion beyond quantization: $a vs $b")
      }
      if (b._3 < a._3) {
        if (sb >= sa) inversions += 1
        assert(sb < sa + tol, s"inversion beyond quantization: $a vs $b")
      }
    }
    // and the orders must OVERWHELMINGLY agree (quantization flips are
    // a vanishing fraction of the ~45k pairs)
    assert(inversions < 50, s"$inversions pair inversions")
  }

  test("detExp matches the bound-squaring declarative twin bit-for-bit and approximates exp") {
    // declarative twin: the Horner polynomial then 5 withColumn-bound
    // squarings (the same op sequence the SQL twin's text replays)
    val xs = spark.range(-300, 301).toDF("i")
      .withColumn("x", $"i".cast("double") / 75.0)
    val y = $"x" / lit(graft.expressions.DetExp.Grain)
    val twin = (1 to 5).foldLeft(
        xs.withColumn("b",
          lit(1.0) + y * (lit(1.0) + y * (lit(0.5) +
            y * (lit(1.0 / 6.0) + y * lit(1.0 / 24.0)))))) {
        (d, _) => d.withColumn("b", $"b" * $"b")
      }.withColumnRenamed("b", "want")
    val both = rows(twin.withColumn("got", Sampling.detExp($"x"))
      .select($"x", $"want", $"got"))
    both.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        s"x=${r.getDouble(0)}")
      assert(math.abs(r.getDouble(2) - math.exp(r.getDouble(0))) <=
        2e-5 * math.exp(r.getDouble(0)), s"x=${r.getDouble(0)} drifts from exp")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(
          graft.expressions.DetExp.compute(r.getDouble(0))))
    }
  }

  test("domainReweight: normalized weights, distinct domain gains, partition-invariant") {
    // a and c share vocabulary (both near the mixture); b is disjoint —
    // DoReMi's worst-case emphasis must upweight b
    val docs = (Seq.fill(20)(("a", "alpha beta gamma")) ++
      Seq.fill(20)(("c", "alpha beta delta")) ++
      Seq.fill(20)(("b", "omega psi chi"))).toDF("d", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      rows(Sampling.domainReweight(df, $"d", $"text",
          buckets = 64, eta = 4.0, iters = 5).orderBy($"d"))
        .map(r => (r.getString(0), r.getDouble(3), r.getDouble(2)))
    val out = run(docs)
    val alpha = out.map(t => t._1 -> t._2).toMap
    assert(math.abs(out.map(_._2).sum - 1.0) < 1e-5, out.toString)
    assert(alpha("b") > alpha("a") && alpha("b") > alpha("c"), out.toString)
    // multiplicative updates moved the mixture off uniform
    assert(alpha("b") > 0.34, out.toString)
    // 6dp-rounded ticks make the fit summation-order invariant
    assert(run(docs.repartition(7)) == out)
  }

  test("mixByWeights allocates the token budget proportional to the weights") {
    // equal token mass per domain, α = 0.8 / 0.2: at budget 50% the
    // kept token mass must split ~4:1 (hash noise aside)
    val docs = Seq.tabulate(400)(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", 10L)).toDF("id", "d", "ntok")
    val w = Seq(("a", 0.8), ("b", 0.2)).toDF("stratum", "alpha")
    val out = rows(Sampling.mixByWeights(docs, $"d", $"id", $"ntok", w,
        budgetPct = 50, salt = "t9")
      .groupBy($"d").agg(sum($"ntok").as("t")))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(out("a") - 1600L) < 300, out.toString)
    assert(math.abs(out("b") - 400L) < 200, out.toString)
    // a domain absent from the weight table gets no budget at all
    val w2 = Seq(("a", 1.0)).toDF("stratum", "alpha")
    val only = rows(Sampling.mixByWeights(docs, $"d", $"id", $"ntok", w2,
      budgetPct = 50, salt = "t9")).map(_.getString(1)).toSet
    assert(only == Set("a"), only.toString)
  }

  test("temperatureMix: exact integer allocation via the detln/detexp kernels; partitioning-stable") {
    import graft.expressions.{DetExp, DetLn}
    // 160:40 and alpha=0.5 → weights ∝ sqrt → exact 2:1 share (and both
    // allocations stay under their stratum size, so the exact-count
    // contract is exercised, not the keep-all cap)
    val docs = ((1 to 160).map(i => (i.toLong, "hi")) ++
      (161 to 200).map(i => (i.toLong, "lo"))).toDF("id", "lang")
    val got = rows(Sampling.temperatureMix(docs, $"lang", $"id",
      alpha = 0.5, target = 50, salt = "tm").orderBy($"id"))
    // expected allocation replayed through the SAME kernels driver-side
    def wq(n: Long) =
      math.floor(DetExp.compute(0.5 * DetLn.compute(n)) *
        (1L << 20).toDouble + 0.5).toLong
    val (wHi, wLo) = (wq(160L), wq(40L))
    val expHi = 50L * wHi / (wHi + wLo)
    val expLo = 50L * wLo / (wHi + wLo)
    assert(expHi + expLo >= 49L) // sanity: floor allocation near target
    val byLang = got.groupBy(_.getString(1)).view.mapValues(_.size).toMap
    assert(byLang == Map("hi" -> expHi.toInt, "lo" -> expLo.toInt))
    // lrank is the contiguous within-language hash-order prefix
    got.groupBy(_.getString(1)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(2)).sorted == (1L to rs.size).toSeq)
    }
    // partitioning-stable
    val got2 = rows(Sampling.temperatureMix(docs.repartition(7), $"lang",
      $"id", alpha = 0.5, target = 50, salt = "tm").orderBy($"id"))
    assert(got.map(_.toSeq) == got2.map(_.toSeq))
    // temperature law: alpha → 0 flattens the mix toward uniform
    val flat = rows(Sampling.temperatureMix(docs, $"lang", $"id",
        alpha = 0.1, target = 50, salt = "tm"))
      .groupBy(_.getString(1)).view.mapValues(_.size).toMap
    assert(flat("lo") > byLang("lo"))
  }
}
