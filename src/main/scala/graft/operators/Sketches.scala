package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Mergeable distinct-count sketches (beyond the reference) — the
  * incremental corpus-statistics pattern: at 100 TB you cannot re-scan
  * history to answer "how many distinct tokens/urls/docs so far", so
  * each ingest batch folds into a tiny HLL sketch (Apache DataSketches,
  * built into Spark 4) keyed by (stratum, day), sketches land as plain
  * binary parquet, and any slice union-merges in milliseconds — the
  * sketch cousin of the d9 bloom and d15 band-index lifecycles
  * (build-per-batch, combine-at-read; history never rescans).
  *
  * Estimates are approximate (~1.6%/√2^lgK rel. std. error) — the
  * a6x/a7x precedent: no cross-engine oracle (sketch internals are
  * engine-specific), correctness pinned by spec against exact counts
  * and by the union-vs-direct equality law.
  */
object Sketches {

  /** One HLL sketch per (stratum, day) over `key` — the mergeable unit
    * an ingest batch appends. Map-side partial aggregation applies (the
    * sketch IS the aggregation buffer), so the shuffle carries one
    * sketch per (stratum, day, task), never raw keys.
    */
  def dailySketches(df: DataFrame, stratum: Column, day: Column,
                    key: Column, lgK: Int = 12): DataFrame =
    df.select(stratum.as("stratum"), day.as("day"), key.as("_k"))
      .groupBy(col("stratum"), col("day"))
      .agg(expr(s"hll_sketch_agg(_k, $lgK)").as("sketch"))

  /** Union the per-day sketches of each stratum and estimate — the
    * read side: runs over sketch rows (bytes per stratum-day), not
    * over data.
    */
  def unionEstimates(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("stratum"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch, true))")
        .as("est_distinct"))

  // ── Deterministic log-linear quantile sketch ───────────────────────
  //
  // The quantile cousin of the HLL lifecycle above, but with a crucial
  // difference: the sketch is DETERMINISTIC (no hashing, no random
  // compaction like KLL/t-digest), so the whole lifecycle — bucketing,
  // merge, quantile walk — replays bit-for-bit in DuckDB and gets a
  // full oracle, not just an accuracy spec. An HdrHistogram-style
  // layout: keep the top `subBits`+1 significant bits of the value,
  // zero the rest. Values below 2^(subBits+1) bucket exactly; above,
  // the bucket width is ≤ 2^-subBits of the value (3.1% at the default
  // subBits=5), which bounds the quantile estimate's relative error.
  // Bucket count is capped at ~(64-subBits)·2^subBits ≈ 1.9k per
  // stratum regardless of data volume — only the first groupBy ever
  // touches raw rows; everything downstream is sketch-sized.

  /** Lower bound of the log-linear bucket holding non-negative BIGINT
    * `v`. Pure integer arithmetic — bit length via `bin()` string
    * length (both engines agree exactly; no floating log2, whose
    * rounding at power-of-2 boundaries differs cross-engine).
    */
  def logLinearLo(v: Column, subBits: Int = 5): Column = {
    val sh = greatest(length(bin(v)) - lit(1 + subBits), lit(0))
    call_function("shiftleft", call_function("shiftright", v, sh), sh)
  }

  /** Driver-side twin of [[logLinearLo]] for plain Longs (spec/boundary
    * arithmetic; keep in lockstep with the Column version).
    */
  def logLinearLoValue(v: Long, subBits: Int = 5): Long = {
    require(v >= 0L, s"log-linear domain is non-negative, got $v")
    val bitLen = if (v == 0L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(v)
    val sh = math.max(bitLen - (1 + subBits), 0)
    (v >> sh) << sh
  }

  /** Exclusive upper bound of the bucket whose lower bound is `lo`.
    * Recoverable from `lo` alone: zeroing low bits preserves the top
    * bit, so bit_length(lo) == bit_length(v) for every v in the bucket.
    */
  def logLinearHi(lo: Column, subBits: Int = 5): Column = {
    val sh = greatest(length(bin(lo)) - lit(1 + subBits), lit(0))
    lo + call_function("shiftleft", lit(1L), sh)
  }

  /** One bucket-count row per (stratum, day, bucket) — the mergeable
    * unit an ingest batch appends. Map-side partial aggregation makes
    * the shuffle carry at most ~1.9k rows per (stratum, day, task),
    * never raw values; sketch rows land as plain parquet and any
    * slice merges by summing counts.
    */
  def quantileSketch(df: DataFrame, stratum: Column, day: Column,
                     value: Column, subBits: Int = 5): DataFrame =
    df.select(stratum.as("stratum"), day.as("day"),
        logLinearLo(value, subBits).as("lo"))
      .groupBy(col("stratum"), col("day"), col("lo"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge sketch rows across days and walk the cumulative counts to
    * the requested percentiles. Returns (stratum, p, q_lo, q_hi): the
    * true p-th percentile lies in [q_lo, q_hi). Selection is exact
    * integer arithmetic (`cum·100 ≥ p·total`, no float ratio), so the
    * oracle replays it; cum·100 stays in BIGINT below ~9·10^16 rows
    * per stratum. Runs entirely over sketch rows: the windows and the
    * broadcast percentile cross-join see ≤ ~1.9k rows per stratum.
    */
  def mergeQuantiles(sketch: DataFrame, pcts: Seq[Int],
                     subBits: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = sketch.sparkSession
    import spark.implicits._
    val cumW = Window.partitionBy(col("stratum")).orderBy(col("lo"))
    val totW = Window.partitionBy(col("stratum"))
    val cum = sketch.groupBy(col("stratum"), col("lo"))
      .agg(sum(col("cnt")).as("cnt"))
      .select(col("stratum"), col("lo"),
        sum(col("cnt")).over(cumW).as("cum"),
        sum(col("cnt")).over(totW).as("total"))
    cum.crossJoin(broadcast(pcts.toDF("p")))
      .filter(col("cum") * lit(100L) >= col("p") * col("total"))
      .groupBy(col("stratum"), col("p"))
      .agg(min(col("lo")).as("q_lo"))
      .select(col("stratum"), col("p"), col("q_lo"),
        logLinearHi(col("q_lo"), subBits).as("q_hi"))
  }

  // ── Threshold-pruned frequency sketch (mergeable heavy hitters) ────
  //
  // The frequency member of the sketch family (distinct = HLL above,
  // quantiles = the log-linear sketch): per-ingest-batch exact key
  // counts pruned at support num/den, plus one mass row recording the
  // batch's total. Like the quantile sketch — and unlike SpaceSaving /
  // Misra-Gries, whose merge order changes the counters — every step
  // is exact integer arithmetic, so the whole lifecycle replays in
  // DuckDB and gets a full oracle.
  //
  // No-false-negative guarantee: a key dropped in a batch had
  // cnt ≤ slack_d := ceil(num·rows_d/den) − 1 < (num/den)·rows_d, so a
  // key absent from EVERY batch sketch has true count < (num/den)·total
  // — every globally θ-heavy key surfaces, with its true count pinned
  // inside [lo_cnt, hi_cnt].

  /** One sketch row per (stratum, day, kept key) — kept iff
    * cnt·den ≥ num·rows_d — plus a null-key mass row per (stratum,
    * day) carrying rows_d. Raw rows are touched only by the first
    * groupBy (map-side partial count); the threshold filter joins the
    * counts against the broadcast-tiny per-batch mass table, never a
    * window over the vocabulary.
    */
  def freqSketch(df: DataFrame, stratum: Column, day: Column, key: Column,
                 num: Long, den: Long): DataFrame = {
    val counts = df
      .select(stratum.as("stratum"), day.as("day"),
        key.cast("string").as("key"))
      .groupBy(col("stratum"), col("day"), col("key"))
      .agg(count(lit(1)).as("cnt"))
    val mass = counts.groupBy(col("stratum"), col("day"))
      .agg(sum(col("cnt")).as("rows_d"))
    counts.join(broadcast(mass), Seq("stratum", "day"))
      .filter(col("cnt") * lit(den) >= col("rows_d") * lit(num))
      .select(col("stratum"), col("day"), col("key"), col("cnt"))
      .unionByName(mass.select(col("stratum"), col("day"),
        lit(null).cast("string").as("key"), col("rows_d").as("cnt")))
  }

  /** Merge sketch rows and bound each surviving key's true global
    * count: lo = sum of kept counts; hi adds each absent batch's
    * slack (ceil(num·rows_d/den) − 1, the most a dropped key can
    * hide). Keys whose hi clears the support threshold are reported —
    * a superset of the true θ-heavy set, never missing one. Runs
    * entirely over sketch rows; the mass/slack side tables are
    * broadcast-tiny (one row per stratum-day).
    */
  def mergeHeavyHitters(sketch: DataFrame, num: Long, den: Long): DataFrame = {
    val slack = sketch.filter(col("key").isNull)
      .select(col("stratum"), col("day"), col("cnt").as("rows_d"))
      .withColumn("slack",
        expr(s"(rows_d * $num + ${den - 1}) div $den") - lit(1L))
    val tot = slack.groupBy(col("stratum"))
      .agg(sum(col("rows_d")).as("total"), sum(col("slack")).as("total_slack"))
    sketch.filter(col("key").isNotNull)
      .join(broadcast(slack), Seq("stratum", "day"))
      .groupBy(col("stratum"), col("key"))
      .agg(sum(col("cnt")).as("lo_cnt"), sum(col("slack")).as("present_slack"))
      .join(broadcast(tot), Seq("stratum"))
      .select(col("stratum"), col("key"), col("lo_cnt"),
        (col("lo_cnt") + col("total_slack") - col("present_slack")).as("hi_cnt"),
        col("total"))
      .filter(col("hi_cnt") * lit(den) >= col("total") * lit(num))
      .select(col("stratum"), col("key"), col("lo_cnt"), col("hi_cnt"))
  }

  /** Population Stability Index of every stratum's `value` distribution
    * against `refStratum`'s (the model-monitoring industry standard
    * next to [[ksDistance]]'s shape test: Σ (p_i − q_i)·ln(p_i/q_i)
    * over bins, with the conventional ≥ 0.2 "significant shift"
    * reading). Bins are integer log₂ buckets of the positive BIGINT
    * `value` (`length(bin(v)) − 1` — exact and identical on both
    * engines, no libm), add-1 smoothed over the corpus-wide bucket
    * axis so empty bins stay finite. Each term computes ln via
    * [[graft.expressions.DetLnD]] (libm-free) and quantizes onto the
    * fine 2⁻⁴⁰ grid — terms are non-negative (p−q and ln p−ln q share
    * sign), integral-double partial sums are exact, so the PSI is
    * ORDER-EXACT (the ta14 discipline). Scale: one map-side-combined
    * (stratum, bucket) count; everything after runs on strata ×
    * ~60 bucket rows.
    * Returns (stratum, n_rows, psi).
    */
  def psiDrift(df: DataFrame, stratum: Column, value: Column,
               refStratum: String): DataFrame = {
    val v = df.select(stratum.as("stratum"), value.cast("long").as("v"))
      .filter(col("v") >= 1L)
      .select(col("stratum"), expr("length(bin(v)) - 1").as("b"))
    val sc = v.groupBy(col("stratum"), col("b")).agg(count(lit(1)).as("c"))
    val st = sc.groupBy(col("stratum")).agg(sum(col("c")).as("n"))
    val axis = sc.select(col("b")).distinct()
    val nb = axis.agg(count(lit(1)).as("nb"))
    val refc = sc.filter(col("stratum") === refStratum)
      .select(col("b"), col("c").as("cr"))
    val refn = st.filter(col("stratum") === refStratum)
      .select(col("n").as("nr"))
    import graft.expressions.{DetLn, DetLnD}
    val pairs = st.crossJoin(broadcast(axis))
      .join(sc, Seq("stratum", "b"), "left")
      .join(broadcast(refc), Seq("b"), "left")
      .crossJoin(broadcast(nb)).crossJoin(broadcast(refn))
      .withColumn("p",
        (coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
          (col("n") + col("nb")).cast("double"))
      .withColumn("q",
        (coalesce(col("cr"), lit(0L)) + lit(1L)).cast("double") /
          (col("nr") + col("nb")).cast("double"))
    val term = (col("p") - col("q")) * (DetLnD(col("p")) - DetLnD(col("q")))
    val termQ = floor(term * lit(DetLn.TermGrid) + lit(0.5))
    pairs.groupBy(col("stratum"))
      .agg(max(col("n")).as("n_rows"),
        (sum(termQ).cast("double") / lit(DetLn.TermGrid)).as("psi"))
  }

  /** Two-sample Kolmogorov–Smirnov distance of every stratum's `value`
    * distribution against `refStratum`'s — the nonparametric
    * distribution-drift statistic (sup |F_s − F_ref|), complementing
    * ta14's token-level JS divergence with a shape test over any
    * per-document scalar (length, score, …).
    *
    * Exact, and scale-bounded by construction: everything past the
    * first combine operates on the (stratum, value) DISTRIBUTION table,
    * so callers must pass a discretized value (an integer count, or a
    * score pre-rounded to k decimals — the same bounded-axis contract
    * as the a15 log-linear buckets). The per-stratum CDF window then
    * ranges over that bounded merged axis, never over rows. The
    * reference stratum's distribution replicates once per compared
    * stratum (strata count × axis — tiny); counts stay integers until
    * the final two divisions, so the sup is reached at identical
    * points in any engine.
    *
    * Returns (stratum, n, ks) for every stratum ≠ refStratum, with the
    * raw double ks; callers round.
    */
  def ksDistance(df: DataFrame, stratum: Column, value: Column,
                 refStratum: String, scale: Int = 0): DataFrame =
    ksFromDistribution(
      distributionCounts(df, stratum, value, scale), refStratum)

  /** The (stratum, v, c) distribution table [[ksFromDistribution]]
    * consumes — and the ADDITIVE state that makes KS incrementally
    * maintainable: counts sum across batches (fold appended tables
    * with a `groupBy(stratum, v).sum(c)`), so an ingest pipeline keeps
    * one bounded-axis table per stratum and answers drift questions
    * without ever rescanning history — the same history-never-rescans
    * law as the HLL/quantile/heavy-hitter families.
    *
    * `v` is the value DISCRETIZED at `scale` decimals — ⌊x·10^scale +
    * 0.5⌋, the fround contract integerized — so a fractional scalar
    * (a quality score) keeps `scale` decimals of axis resolution
    * instead of silently truncating to its integer part; integral
    * inputs at the default scale 0 are unchanged. Callers comparing
    * across batches must fix one scale per store. NULL values carry no
    * distribution mass and are dropped (engines disagree on NULL
    * ordering inside the CDF window, so keeping them would also break
    * the cross-engine sup).
    */
  def distributionCounts(df: DataFrame, stratum: Column, value: Column,
                         scale: Int = 0): DataFrame = {
    require(scale >= 0 && scale <= 9, s"scale in [0,9], got $scale")
    val v = floor(value.cast("double") * math.pow(10.0, scale) + 0.5)
      .cast("long")
    df.select(stratum.cast("string").as("stratum"), v.as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("stratum"), col("v"))
      .agg(count(lit(1)).as("c"))
  }

  /** Create a persisted distribution store (a [[CountLog]] over the
    * (stratum, v) key): the additive state behind KS-on-ingest. Each
    * micro-batch appends its own [[distributionCounts]] as a batch-id-
    * keyed segment (idempotent replay); [[ksFromStore]] answers drift
    * from folded counts alone — history never rescans.
    */
  def initDistributionStore(spark: org.apache.spark.sql.SparkSession,
                            dir: String): Unit =
    CountLog.init(spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType
        .fromDDL("stratum STRING, v LONG, c LONG")), dir)

  /** Fold one batch into the store — O(batch), batch-id idempotent.
    * `scale` must match the store's (one discretization per store).
    */
  def appendDistribution(batch: DataFrame, stratum: Column, value: Column,
                         dir: String, batchId: Option[Long] = None,
                         scale: Int = 0): Long =
    CountLog.append(distributionCounts(batch, stratum, value, scale), dir,
      batchId)

  /** KS vs `refStratum` from the persisted store's folded counts —
    * equals [[ksDistance]] over every ingested row, without reading
    * any of them again.
    */
  def ksFromStore(spark: org.apache.spark.sql.SparkSession, dir: String,
                  refStratum: String): DataFrame =
    ksFromDistribution(
      CountLog.read(spark, dir, Seq("stratum", "v")), refStratum)

  /** Smirnov asymptotic critical value: reject "same distribution" at
    * significance `alpha` when the observed KS statistic exceeds
    * c(α)·√((n₁+n₂)/(n₁·n₂)), c(α) = √(−ln(α/2)/2). This is the alert
    * rule that turns [[ksFromStore]]'s number into a decision — e.g.
    * `ks.filter(col("ks") > lit(Sketches.ksCritical(n, nRef, 0.01)))`
    * as the re-mix/investigate trigger on an ingest dashboard. Valid
    * for the asymptotic regime (both n over a few dozen); discretized
    * values make the test conservative (ties can only lower the sup).
    */
  def ksCritical(nCompared: Long, nRef: Long, alpha: Double): Double = {
    require(nCompared > 0 && nRef > 0, "both sample sizes must be positive")
    smirnovC(alpha) *
      math.sqrt((nCompared + nRef).toDouble /
        (nCompared.toDouble * nRef.toDouble))
  }

  /** The Smirnov coefficient c(α) = √(−ln(α/2)/2) alone — the one libm
    * term in the drift rule, computed DRIVER-SIDE so per-row breach
    * predicates ([[Sampling.driftGatedRates]] and its oracle) embed the
    * identical literal in both engines.
    */
  def smirnovC(alpha: Double): Double = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1), got $alpha")
    math.sqrt(-math.log(alpha / 2.0) / 2.0)
  }

  /** KS over a pre-aggregated (possibly batch-folded) distribution
    * table — identical to [[ksDistance]] on the union of the
    * contributing batches (count additivity is exact, spec-pinned).
    */
  def ksFromDistribution(counts: DataFrame,
                         refStratum: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val refC = counts.filter(col("stratum") === refStratum)
      .select(col("v"), col("c").as("cr"))
    val othC = counts.filter(col("stratum") =!= refStratum)
    val strata = othC.select(col("stratum")).distinct()
    val nO = othC.groupBy(col("stratum")).agg(sum(col("c")).as("n_o"))
    val nR = refC.agg(sum(col("cr")).as("n_r"))
    val merged = othC
      .select(col("stratum"), col("v"), col("c").as("d_o"),
        lit(0L).as("d_r"))
      .unionByName(refC.crossJoin(broadcast(strata))
        .select(col("stratum"), col("v"), lit(0L).as("d_o"),
          col("cr").as("d_r")))
      .groupBy(col("stratum"), col("v"))
      .agg(sum(col("d_o")).as("d_o"), sum(col("d_r")).as("d_r"))
    val w = Window.partitionBy(col("stratum")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("cum_o", sum(col("d_o")).over(w))
      .withColumn("cum_r", sum(col("d_r")).over(w))
      .join(broadcast(nO), "stratum")
      .crossJoin(broadcast(nR))
      .groupBy(col("stratum"))
      .agg(max(abs(col("cum_o").cast("double") / col("n_o") -
          col("cum_r").cast("double") / col("n_r"))).as("ks"),
        max(col("n_o")).as("n"))
      .select(col("stratum"), col("n"), col("ks"))
  }
}
