package graft

import graft.expressions.{SelExpQ20, SelKeyFixed, SelLnDraw}
import graft.operators.Sampling
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The r13 pure-BIGINT selection-key kernels: constants, accuracy vs
  * true math, native-expression == Scala-ref == shared-template parity
  * (the SparkSql rendering of the same template whose Duck rendering
  * the oracle replays — so cross-engine agreement reduces to integer
  * arithmetic, which cannot be contracted, reordered, or rounded).
  */
class FixedPointSpec extends SparkSpec {
  import SelKeyFixed.{Q, Ln2Q, MMax}
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private val vSweep: Seq[Long] =
    (Seq(1L, 2L, 3L, 5L, 1L << 28) ++
      (1 to 27).flatMap(e => Seq((1L << e) - 1, 1L << e, (1L << e) + 1)) ++
      Seq.fill(3000)(1L + (rng.nextLong().abs % (1L << 28)))).distinct
  private val lwSweep: Seq[Long] =
    (Seq(0L, 1L, -1L, 4900000L, -4900000L, 14600000L, -14600000L,
      20000000L, -20000000L, Long.MaxValue / 4, -(Long.MaxValue / 4)) ++
      Seq.fill(3000)(rng.nextLong() % 20000000L)).distinct

  test("constants are the pinned roundings of their definitions") {
    assert(Ln2Q == math.round(math.log(2.0) * Q))
    assert(SelKeyFixed.K ==
      math.round((1L << 40).toDouble / (1e6 * math.log(2.0))))
    assert(SelKeyFixed.EBase == 24 * Q - (14600000L * SelKeyFixed.K) / Q)
    for (k <- 1 to 7)
      assert(SelKeyFixed.ExpC(k - 1) ==
        math.round(math.pow(math.log(2.0), k) /
          (1 to k).product.toDouble * Q), s"ExpC($k)")
  }

  test("lnDraw: exact anchors, non-negative, accurate to <=16 Q20 ulps") {
    assert(SelKeyFixed.lnDraw(1L << 28) == 0L)
    assert(SelKeyFixed.lnDraw(1L) == 28L * Ln2Q)
    for (v <- vSweep) {
      val got = SelKeyFixed.lnDraw(v)
      val truth = (28.0 * math.log(2.0) - math.log(v.toDouble)) * Q
      assert(got >= 0L, s"lnDraw($v) negative")
      assert(math.abs(got - truth) <= 16.0, s"lnDraw($v)=$got vs $truth")
    }
  }

  test("lnDraw is monotone non-increasing across ranges incl. octave boundaries") {
    for (base <- Seq(1L, 1000L, (1L << 20) - 100, (1L << 27) - 100)) {
      var prev = SelKeyFixed.lnDraw(base)
      for (v <- base + 1 to base + 300) {
        val cur = SelKeyFixed.lnDraw(v)
        assert(cur <= prev, s"lnDraw not monotone at $v")
        prev = cur
      }
    }
  }

  test("expQ20: exact at 0, clamped to [1, 2^26], monotone in weight, accurate") {
    assert(SelKeyFixed.expQ20(0L) == Q)
    assert(SelKeyFixed.expQ20(30000000L) == 1L)    // w huge -> m floor
    assert(SelKeyFixed.expQ20(-30000000L) == MMax) // w tiny -> m ceiling
    for (lw <- lwSweep) {
      val m = SelKeyFixed.expQ20(lw)
      assert(m >= 1L && m <= MMax, s"expQ20($lw)=$m out of range")
      // monotone non-increasing in lw (heavier weight ranks earlier)
      assert(SelKeyFixed.expQ20(lw + 1000) <= m, s"not monotone at $lw")
      val target = Q.toDouble * math.exp(-lw.toDouble / 1e6)
      if (target >= 4096.0 && target <= 0.9 * MMax)
        assert(math.abs(m - target) / target <= 2e-4,
          s"expQ20($lw)=$m vs $target")
    }
  }

  private def applySteps(df: DataFrame,
                         steps: Seq[(String, String)]): DataFrame =
    steps.foldLeft(df) { case (d, (a, e)) => d.withColumn(a, expr(e)) }

  test("native SelLnDraw == Scala ref == SparkSql template rendering") {
    val df = vSweep.toDF("v")
    val got = rows(applySteps(df, SelKeyFixed.lnDrawSteps("v", SelKeyFixed.SparkSql))
      .select($"v", SelLnDraw($"v").as("native"), $"_sk_l"))
    assert(got.size == vSweep.size)
    got.foreach { r =>
      val (v, native, tmpl) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(native == SelKeyFixed.lnDraw(v), s"native != ref at v=$v")
      assert(tmpl == native, s"template != native at v=$v")
    }
  }

  test("native SelExpQ20 == Scala ref == SparkSql template rendering") {
    val df = lwSweep.toDF("lw")
    val got = rows(applySteps(df, SelKeyFixed.expSteps("lw", SelKeyFixed.SparkSql))
      .select($"lw", SelExpQ20($"lw").as("native"), $"_sk_m"))
    assert(got.size == lwSweep.size)
    got.foreach { r =>
      val (lw, native, tmpl) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(native == SelKeyFixed.expQ20(lw), s"native != ref at lw=$lw")
      assert(tmpl == native, s"template != native at lw=$lw")
    }
  }

  test("withSelKeyPartsLogW: sel_key = sk_m * ln_draw, bounded, partition-stable") {
    val df = (0L until 500L).map(i => (i, (i % 37) * 100000L - 1800000L))
      .toDF("id", "lw")
    val keyed = Sampling.withSelKeyPartsLogW(df, $"id", $"lw", "fp")
    rows(keyed.select($"sk_m", $"ln_draw", $"sel_key")).foreach { r =>
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1))
      assert(r.getLong(2) >= 0L && r.getLong(2) < (1L << 51))
    }
    val a = rows(keyed.select($"id", $"sel_key")).map(r =>
      r.getLong(0) -> r.getLong(1)).toMap
    val b = rows(Sampling.withSelKeyPartsLogW(df.repartition(7), $"id",
      $"lw", "fp").select($"id", $"sel_key")).map(r =>
      r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "key must not depend on partitioning")
    // the key-only variant drops the stage columns
    val cols = Sampling.withSelectionKeyLogW(df, $"id", $"lw", "fp").columns
    assert(cols.contains("sel_key") && !cols.contains("sk_m") &&
      !cols.contains("ln_draw"))
  }

  test("LogW chain favors heavy rows like the double-weight E-S chain") {
    // two rows, weight ratio e^2 (~7.4): the heavy row (lw = +10^6,
    // i.e. w = e) wins the 1-slot sample in roughly e²/(e²+1) ≈ 88%
    // of salts (same contract the double-path spec pins).
    val two = Seq((1L, -1000000L), (2L, 1000000L)).toDF("id", "lw")
    val wins = (1 to 60).map { s =>
      rows(Sampling.withSelectionKeyLogW(two, $"id", $"lw", s"p$s")
        .orderBy($"sel_key", $"id").limit(1).select($"id"))
        .head.getLong(0)
    }.count(_ == 2L)
    assert(wins > 40 && wins < 60, s"heavy row won $wins/60")
  }
}
