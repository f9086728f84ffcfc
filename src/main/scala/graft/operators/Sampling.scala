package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sampling for training-data curation (beyond the
  * reference's surface; a standard corpus-pipeline need). Decisions hash
  * a stable record key instead of drawing from an RNG, so a sample is
  * reproducible across runs, cluster sizes, and repartitionings —
  * `DataFrame.sample`'s per-partition seeds are none of those. The hash
  * is md5-derived, so the DuckDB oracle replicates it bit-for-bit.
  *
  * At 100 TB the filter is a pure per-row expression fused into the
  * scan: no shuffle, no state, and the same row always lands on the
  * same side of the cut (stable train/eval splits, resumable jobs).
  */
object Sampling {

  /** 28-bit uniform hash of (salt, key) in [0, 2²⁸): first 7 hex chars
    * of md5. The salt separates independent samples over the same keys
    * (e.g. train/eval splits that must not correlate).
    */
  def keyHash(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), key.cast("string"))), 1, 7), 16, 10)
      .cast("long")

  /** Integer acceptance threshold for a rate in [0, 1]. */
  def threshold(rate: Double): Long = math.round(rate * (1L << 28))

  /** Keep ~`rate` of rows, deterministically by key. */
  def hashSample(df: DataFrame, key: Column, rate: Double,
                 salt: String): DataFrame =
    df.filter(keyHash(key, salt) < threshold(rate))

  /** Stratified variant: per-stratum rates (e.g. per-language corpus
    * rebalancing), unlisted strata fall back to `defaultRate`. One
    * when-chain threshold — still a single scan-fused predicate.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(threshold(defaultRate))) {
      case (acc, (s, r)) => when(stratum === s, lit(threshold(r))).otherwise(acc)
    }
    df.filter(keyHash(key, salt) < thr)
  }

  /** DuckDB twin of [[keyHash]] — same first-7-hex-chars-of-md5 28-bit
    * integer. `keyExpr` must already be VARCHAR (cast the way keyHash's
    * `.cast("string")` renders, e.g. `doc_id::VARCHAR`). Keep in
    * lockstep with [[keyHash]].
    */
  def sqlKeyHash(keyExpr: String, salt: String): String =
    s"('0x' || substr(md5('$salt:' || ($keyExpr)), 1, 7))::BIGINT"

  /** Leakage-safe train/val/test split: the cut is keyed by the NEAR-DUP
    * CLUSTER label, not the document id, so every member of a near-dup
    * cluster lands on the same side — a doc-keyed split leaks eval
    * content into training whenever a near-duplicate pair straddles the
    * cut (the contamination d6/d14 exist to catch, silently
    * reintroduced at split time). Compose: dupClusters (or any
    * labeling) → clusterSplit on `cluster_id`.
    *
    * `cuts` are (name, fraction) in order, e.g. ("train", .8),
    * ("val", .1), ("test", .1); fractions must sum to 1 (±1e-9). The
    * assignment compares the cluster hash against cumulative integer
    * thresholds, and the LAST cut absorbs the threshold remainder so
    * every hash value maps to exactly one split.
    *
    * Scale shape: a pure scan-fused when-chain projection over the
    * labeled frame — the split itself adds zero exchanges (the cluster
    * labeling already paid for its own); singleton docs hash their own
    * id (their cluster label), preserving [[hashSample]]'s stability
    * guarantees.
    */
  def clusterSplit(labeled: DataFrame, clusterId: Column,
                   cuts: Seq[(String, Double)], salt: String): DataFrame = {
    require(cuts.nonEmpty, "cuts must be non-empty")
    require(math.abs(cuts.map(_._2).sum - 1.0) < 1e-9,
      s"cut fractions must sum to 1, got ${cuts.map(_._2).sum}")
    val h = keyHash(clusterId, salt)
    val cum = cuts.scanLeft(0.0)(_ + _._2).tail
    val assign = cuts.init.zip(cum.init).foldRight(lit(cuts.last._1)) {
      case (((name, _), c), acc) => when(h < threshold(c), name).otherwise(acc)
    }
    labeled.withColumn("split", assign)
  }

  /** DuckDB twin of [[clusterSplit]]'s when-chain (same cumulative
    * integer thresholds from [[threshold]]). Keep in lockstep.
    */
  def sqlClusterSplit(clusterExpr: String, cuts: Seq[(String, Double)],
                      salt: String): String = {
    val cum = cuts.scanLeft(0.0)(_ + _._2).tail
    val whens = cuts.init.zip(cum.init).map { case ((name, _), c) =>
      s"WHEN ${sqlKeyHash(clusterExpr, salt)} < ${threshold(c)} THEN '$name'"
    }.mkString(" ")
    s"CASE $whens ELSE '${cuts.last._1}' END"
  }

  /** Temperature-weighted corpus mixing to a token budget (the UniMax /
    * multilingual-pretraining rebalance): sample each stratum (domain,
    * language) so the kept corpus totals ~`budgetPct`% of the tokens,
    * with per-stratum shares ∝ √(stratum tokens) — temperature α = 0.5,
    * which upsamples tails relative to proportional and caps any
    * stratum at rate 1 (never replicates rows).
    *
    * Per-stratum keep rate: r = min(1, B·W / (S·T)) where T = stratum
    * tokens, W = ⌊√T·10⁶⌋, S = ΣW, B = total·budgetPct div 100. Sums
    * are exact BIGINTs; each factor is cast to binary64 INDIVIDUALLY
    * before the multiplies (B·W as a BIGINT product overflows Long once
    * the corpus passes ~4·10⁸ tokens — an ANSI ArithmeticException at
    * exactly the corpus scale this targets). The oracle mirrors the
    * same cast-then-multiply tree ([[sqlMixThr]]), so the IEEE ops
    * replay bit-for-bit — no order-dependent accumulation anywhere.
    *
    * Scale shape: one partial-aggregated pass for stats (stratum-count
    * rows), a broadcast of the tiny rate table back onto the scan, and
    * the same scan-fused hash predicate as [[hashSample]]. The corpus
    * never shuffles.
    */
  def tokenBudgetMix(df: DataFrame, stratum: Column, key: Column,
                     tokenCount: Column, budgetPct: Int,
                     salt: String): DataFrame = {
    val rates = ratesFromStats(
      df.groupBy(stratum.as("_stratum"))
        .agg(sum(tokenCount.cast("long")).as("_t")), budgetPct)
    df.join(broadcast(rates), stratum === col("_stratum"))
      .filter(keyHash(key, salt) < col("_thr"))
      .drop("_stratum", "_thr")
  }

  /** The tokenBudgetMix rate table from per-stratum token totals
    * `(_stratum, _t)` — shared by the corpus pass above and the
    * distribution-store path ([[ratesFromDistribution]]); one
    * expression tree so both replay bit-for-bit against [[sqlMixThr]].
    */
  private def ratesFromStats(stats0: DataFrame, budgetPct: Int): DataFrame =
    ratesFromWeighted(
      stats0.withColumn("_w", floor(sqrt(col("_t")) * 1e6).cast("long")),
      budgetPct)

  /** The thr computation over `(_stratum, _t, _w)` — the √T temperature
    * default ([[ratesFromStats]]) and the externally-weighted path
    * ([[mixByWeights]]) share this one expression tree, so both replay
    * bit-for-bit against [[sqlMixThr]].
    */
  private def ratesFromWeighted(stats: DataFrame,
                                budgetPct: Int): DataFrame = {
    val maxHash = 1L << 28
    val totals = stats.agg(sum(col("_t")).as("_tot"), sum(col("_w")).as("_s"))
    stats.crossJoin(broadcast(totals))
      .withColumn("_b", expr(s"_tot * $budgetPct div 100"))
      .withColumn("_thr", when(col("_t") > 0,
        least(lit(maxHash),
          floor(col("_b").cast("double") * col("_w").cast("double")
            / (col("_s").cast("double") * col("_t").cast("double"))
            * lit(maxHash.toDouble))))
        .otherwise(lit(maxHash)))
      .select(col("_stratum"), col("_thr"))
  }

  /** [[tokenBudgetMix]] with the stratum weights supplied EXTERNALLY —
    * the consumption side of [[domainReweight]]: the optimized mixture
    * α becomes the weight table (w = ⌊α·10⁶ + ½⌋, exact integers from
    * the 6dp-rounded α), so the token budget allocates ∝ α instead of
    * the √T temperature default. Same keyHash keep-decision, same thr
    * expression tree, so the α-built corpus replays bit-for-bit in
    * SQL. `weights` is a (stratum, alpha) table; strata absent from it
    * are dropped (an un-weighted domain has no budget).
    */
  def mixByWeights(df: DataFrame, stratum: Column, key: Column,
                   tokenCount: Column, weights: DataFrame,
                   budgetPct: Int, salt: String): DataFrame = {
    val stats = df.groupBy(stratum.as("_stratum"))
      .agg(sum(tokenCount.cast("long")).as("_t"))
      .join(weights.select(col("stratum").as("_stratum"),
        floor(col("alpha") * 1e6 + 0.5).cast("long").as("_w")), "_stratum")
    val rates = ratesFromWeighted(stats, budgetPct)
    df.join(broadcast(rates), stratum === col("_stratum"))
      .filter(keyHash(key, salt) < col("_thr"))
      .drop("_stratum", "_thr")
  }

  /** [[tokenBudgetMix]]'s rate table derived from a persisted
    * (stratum, v, c) DISTRIBUTION table (value = per-doc token count,
    * the [[Sketches.distributionCounts]] state) instead of a corpus
    * pass: stratum token mass T = Σ v·c, so the SAME additive store
    * that answers KS drift questions re-derives the mix rates with no
    * history rescan — the state the drift→action loop runs on.
    */
  def ratesFromDistribution(counts: DataFrame, budgetPct: Int): DataFrame =
    ratesFromStats(
      counts.groupBy(col("stratum").as("_stratum"))
        .agg(sum(col("v") * col("c")).as("_t")), budgetPct)
      .select(col("_stratum").as("stratum"), col("_thr").as("thr"))

  /** The a20 drift ALERT wired to an ACTION (the way
    * [[Similarity.maintainIvfIndex]] gates re-centering): a Smirnov KS
    * breach on a stratum's ingest distribution triggers recomputing
    * THAT stratum's token-budget mix rate from the same persisted
    * distribution store; undrifted strata keep serving their current
    * rate (rate churn re-shuffles the downstream sample — don't pay it
    * without evidence). `counts` is the folded (stratum, v, c) store,
    * `prevRates` the currently-served (stratum, thr) table. Output per
    * stratum: n, ks (raw), breached, thr (fresh where breached or
    * previously unserved, previous otherwise); the reference stratum
    * reports ks = 0 / breached = false.
    *
    * Cross-engine: the KS statistic and rates are integer-derived +
    * exact divides; the one libm term — the Smirnov constant c(α) —
    * is computed driver-side and enters both engines as the same
    * literal. Scale shape: everything runs on the bounded distribution
    * axis and stratum-count tables; the corpus never rescans.
    */
  def driftGatedRates(counts: DataFrame, prevRates: DataFrame,
                      refStratum: String, budgetPct: Int,
                      alpha: Double): DataFrame = {
    val cAlpha = Sketches.smirnovC(alpha)
    val fresh = ratesFromDistribution(counts, budgetPct)
    val ks = Sketches.ksFromDistribution(counts, refStratum)
    val nRef = counts.filter(col("stratum") === refStratum)
      .agg(sum(col("c")).as("_nr"))
    fresh
      .join(broadcast(ks), Seq("stratum"), "left")
      .crossJoin(broadcast(nRef))
      .join(broadcast(prevRates.select(col("stratum"),
        col("thr").as("_prev"))), Seq("stratum"), "left")
      .withColumn("n", coalesce(col("n"), col("_nr")))
      .withColumn("ks", coalesce(col("ks"), lit(0.0)))
      .withColumn("breached",
        col("ks") > lit(cAlpha) *
          sqrt((col("n") + col("_nr")).cast("double") /
            (col("n").cast("double") * col("_nr").cast("double"))))
      .select(col("stratum"), col("n"), col("ks"), col("breached"),
        when(col("breached") || col("_prev").isNull, col("thr"))
          .otherwise(col("_prev")).as("thr"))
  }

  /** DuckDB twin of the `_thr` expression above — same cast-to-double-
    * then-multiply tree, so the one rate divide replays bit-for-bit.
    * `t`/`wgt`/`tot`/`s` are the caller's column names for stratum
    * tokens, ⌊√T·10⁶⌋, Σtokens and Σweights. Keep in lockstep with
    * [[tokenBudgetMix]].
    */
  def sqlMixThr(t: String, wgt: String, tot: String, s: String,
                budgetPct: Int): String = {
    val maxHash = 1L << 28
    s"""CASE WHEN $t > 0 THEN least($maxHash,
         floor(($tot * $budgetPct // 100)::DOUBLE * $wgt::DOUBLE
           / ($s::DOUBLE * $t::DOUBLE) * $maxHash.0)::BIGINT)
       ELSE $maxHash END"""
  }

  // ---- libm-free weighted-selection key ---------------------------
  //
  // The Efraimidis–Spirakis key u^(1/w) is textbook-computed with libm
  // `pow` (and DSIR's weight with libm `exp`) — but libm results differ
  // by a ulp across engines, and under the floor(x·10⁶ + 0.5) rounding
  // contract a one-ulp difference at a bucket edge flips the 6-decimal
  // key; weightedTokenSample then prefix-sums over the key spine, so one
  // flipped key perturbs every downstream offset (the round-9 x5
  // cross-engine hash failure). The round-11 answer (a 27-factor
  // sqrt-chain product for u^(m/2^20)) was exact-IEEE per factor yet
  // STILL produced one driver-red round — a 27-deep float product whose
  // 6-dp rounding sits on a bucket edge is an unbounded audit surface.
  // The round-12 fix removes the float entirely: rank on the LOG-DOMAIN
  // INTEGER key
  //
  //   skey = m · L,   L = ⌊(28·ln2 − detln(h+1)) · 2²⁰ + ½⌋
  //
  // where h = keyHash(id, salt) ∈ [0, 2²⁸) and m = ⌊2²⁰/w + ½⌋ clamped
  // to [1, 2²⁶] as before. Since u = (h+1)/2²⁸, −ln u = 28·ln2 −
  // ln(h+1), and u^(m/2^20) is monotone decreasing in m·(−ln u):
  // ASCENDING skey is order-equivalent to the old DESCENDING float key,
  // up to the 2⁻²⁰ quantization of L — which changes tie structure
  // identically on both engines because L is the same integer there.
  // detln(2²⁸) = 28·ln2 EXACTLY (z = 0 branch), L ≥ 0 always (the
  // series error ~9·10⁻¹³ is far below the smallest true gap ~3.7·10⁻⁹
  // at h+1 = 2²⁸−1), and m·L ≤ 2²⁶·⌊19.41·2²⁰+½⌋ < 2⁵¹ — exact BIGINT.
  // Weights that come from an exponential (DSIR's exp(logratio/T)) use
  // [[detExp]] instead of libm exp, so the whole chain is integer or
  // fixed-order exact-IEEE arithmetic with identical text on both
  // engines: there is no float cell left in any ranked output whose
  // bits could flake.

  /** Deterministic exponential `p(x/32)^32` (p = degree-4 Taylor of
    * exp) — bit-equal on any IEEE engine (see
    * [[graft.expressions.DetExp]]); relative error vs true exp
    * ≤ ~10⁻⁵ for |x| ≤ 4, always > 0. Use for sampling weights of the
    * form exp(·) so the selection key stays cross-engine exact.
    */
  def detExp(x: Column): Column = graft.expressions.DetExp(x)

  /** DuckDB twin of [[detExp]] as ONE self-contained expression: the
    * same Horner polynomial, squared 5 times textually (2^5 base
    * copies — bounded on purpose; a deeper chain would double the
    * binder's tree per level). Keep in lockstep with
    * [[graft.expressions.DetExp.compute]].
    */
  def sqlDetExp(xExpr: String): String = {
    val y = s"(($xExpr) / ${graft.expressions.DetExp.Grain})"
    val p = s"(1.0 + $y * (1.0 + $y * (0.5 + $y * (1.0 / 6.0 + $y * (1.0 / 24.0)))))"
    (1 to 5).foldLeft(p)((acc, _) => s"($acc * $acc)")
  }

  /** Dyadic exponent numerator: m = ⌊2^20/w + 0.5⌋ ∈ [1, 2^26]. One
    * exact divide + exact add + floor — deterministic given `weight`.
    */
  private def selExponent(weight: Column): Column =
    least(lit(1L << 26), greatest(lit(1L),
      floor(lit((1L << 20).toDouble) / weight + lit(0.5)).cast("long")))

  /** 28·ln2 = detln(2²⁸) exactly: the e·Ln2 branch with z = 0. One
    * IEEE multiply of identical doubles on both engines. */
  val LnMaxHash: Double = 28.0 * graft.expressions.DetLn.Ln2
  private val LnMaxHashSql =
    s"(28.0::DOUBLE * ${graft.expressions.DetLn.Ln2Literal})"

  /** The quantized negative-log draw L = ⌊(28·ln2 − detln(h+1))·2²⁰+½⌋
    * ∈ [0, ~2·10⁷] — exact integer on both engines given the hash. */
  private def selLogDraw(hashPlus1: Column): Column =
    floor((lit(LnMaxHash) - graft.expressions.DetLn(hashPlus1)) *
      lit((1L << 20).toDouble) + lit(0.5)).cast("long")

  /** Adds the INTEGER Efraimidis–Spirakis `sel_key` column (BIGINT,
    * ASCENDING = most preferred): skey = m·L with m the dyadic weight
    * exponent ([[selExponent]]) and L the quantized −ln u of the keyed
    * md5 draw ([[selLogDraw]]) — order-equivalent to ranking descending
    * by u^(1/w) (see the block comment above). `weight` must be
    * strictly positive and itself cross-engine deterministic (use
    * [[detExp]] for exponential weights). Scan-fused projection; no
    * float reaches the output.
    */
  def withSelectionKey(df: DataFrame, id: Column, weight: Column,
                       salt: String): DataFrame =
    df.withColumn("_sk_h", keyHash(id, salt) + lit(1L))
      .withColumn("_sk_m", selExponent(weight))
      .withColumn("sel_key", col("_sk_m") * selLogDraw(col("_sk_h")))
      .drop("_sk_h", "_sk_m")

  // ---- round-13 PURE-INTEGER key chain ----------------------------
  //
  // The r12 integer key still computed m and L THROUGH double Horner
  // chains (DetExp/DetLn) before the final floor — exact-IEEE in op
  // order, but a DuckDB build may contract a·b+c to FMA inside those
  // chains, which is exactly the locally-bit-exact-yet-driver-red
  // signature x5 showed for four rounds. The LogW path below has no
  // double anywhere between the md5 hash and the key: both stages are
  // [[graft.expressions.SelKeyFixed]] BIGINT kernels, and the oracle
  // replays the same integer algorithm ([[sqlSelKeyColsLogW]]), so
  // reproducibility no longer depends on any engine's float behavior.

  /** The dyadic weight exponent m from a LOG-domain micro-unit weight:
    * callers pass lwMicro = ⌊ln(w)·10⁶⌉ (for DSIR: 2·logratio_micro,
    * an exact integer multiply) and m = ⌊2²⁰/w⌉ computes as
    * [[graft.expressions.SelKeyFixed.expQ20]] — pure BIGINT.
    */
  def selExponentLogW(lwMicro: Column): Column =
    graft.expressions.SelExpQ20(lwMicro)

  /** The quantized negative-log draw L of the md5 draw — pure BIGINT
    * ([[graft.expressions.SelKeyFixed.lnDraw]]).
    */
  def selLnDraw(hashPlus1: Column): Column =
    graft.expressions.SelLnDraw(hashPlus1)

  /** [[withSelectionKey]] with the pure-integer kernels, KEEPING the
    * per-stage columns `sk_m` and `ln_draw` alongside `sel_key` — a
    * cross-engine mismatch can be bisected to the exact stage by
    * selecting one of them (the retired r13 x5 diagnostics did).
    */
  def withSelKeyPartsLogW(df: DataFrame, id: Column, lwMicro: Column,
                          salt: String): DataFrame =
    df.withColumn("_sk_h", keyHash(id, salt) + lit(1L))
      .withColumn("sk_m", selExponentLogW(lwMicro))
      .withColumn("ln_draw", selLnDraw(col("_sk_h")))
      .withColumn("sel_key", col("sk_m") * col("ln_draw"))
      .drop("_sk_h")

  /** [[withSelectionKey]]'s integer-weight twin: adds only `sel_key`.
    * Same bound as the double-weight path (key < 2⁵¹), so the
    * [[SelBucketShift]] census spine contract is unchanged.
    */
  def withSelectionKeyLogW(df: DataFrame, id: Column, lwMicro: Column,
                           salt: String): DataFrame =
    withSelKeyPartsLogW(df, id, lwMicro, salt).drop("sk_m", "ln_draw")

  /** DuckDB twin of [[withSelKeyPartsLogW]] as SELECT-list items:
    * lateral aliases `_sk_h`, the [[graft.expressions.SelKeyFixed]]
    * integer steps (`_sk_m`, `_sk_l` among them — diagnostics read
    * them as sk_m/ln_draw), then `sel_key = _sk_m · _sk_l`. Every
    * divide is truncating with non-negative operands, so `//` here and
    * `div` on the Spark side agree unconditionally.
    */
  def sqlSelKeyColsLogW(idExpr: String, lwMicroExpr: String,
                        salt: String): String = {
    import graft.expressions.SelKeyFixed
    val h = s"(${sqlKeyHash(idExpr, salt)} + 1)"
    val steps = SelKeyFixed.expSteps(lwMicroExpr, SelKeyFixed.Duck) ++
      SelKeyFixed.lnDrawSteps("_sk_h", SelKeyFixed.Duck)
    (Seq(s"$h AS _sk_h") ++ steps.map { case (a, e) => s"$e AS $a" } :+
      "(_sk_m * _sk_l) AS sel_key").mkString(", ")
  }

  /** Deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis): each row draws u ∈ (0, 1] from its keyed
    * md5 hash and ranks by selection key u^(1/w) — the top-k by that
    * key IS a weight-proportional sample without replacement. With the
    * uniform draw keyed instead of random, the sample is reproducible
    * across runs, partitionings and cluster sizes, like every sampler
    * here — this is the resampling step DSIR needs downstream of
    * [[Classify.dsirWeights]] (weight = exp(logratio/T), computed via
    * [[detExp]] so the key chain stays libm-free end to end).
    *
    * Returned with `sel_key` = the INTEGER selection key
    * ([[withSelectionKey]], ASCENDING = preferred): ranking on the
    * quantized integer with an `id` tiebreak keeps the top-k boundary
    * engine-independent. `weight` must be strictly positive.
    *
    * Scale shape: the key is a scan-fused projection; top-k plans as
    * TakeOrderedAndProject (per-partition heaps + one k-row merge),
    * never a global sort.
    */
  def weightedSample(df: DataFrame, id: Column, weight: Column, k: Int,
                     salt: String): DataFrame =
    withSelectionKey(df, id, weight, salt)
      .orderBy(col("sel_key"), id)
      .limit(k)

  /** DuckDB twin of [[withSelectionKey]] as SELECT-list items: lateral
    * aliases `_sk_h` (the md5 draw + 1) and `_sk_m` (each referencing
    * only base columns), then the integer `sel_key` = _sk_m · L where
    * L inlines [[graft.operators.Classify.sqlDetLnInline]] over
    * `_sk_h` — alias substitution copies `_sk_h`'s md5 text ~90×,
    * which is linear, not the exponential alias-CHAIN blowup (learned
    * the hard way). `idExpr` must cast to VARCHAR the way [[keyHash]]
    * renders; `wExpr` must be the SAME deterministic weight as the
    * Spark side (see [[sqlDetExp]]). Keep in lockstep with
    * [[selLogDraw]]/[[selExponent]].
    */
  def sqlSelKeyCols(idExpr: String, wExpr: String, salt: String): String = {
    val h = s"(${sqlKeyHash(idExpr, salt)} + 1)"
    val m = s"least(${1L << 26}, greatest(1, " +
      s"floor(${(1L << 20).toDouble} / ($wExpr) + 0.5)::BIGINT))"
    val l = s"floor(($LnMaxHashSql - ${Classify.sqlDetLnInline("_sk_h")})" +
      s" * ${(1L << 20).toDouble} + 0.5)::BIGINT"
    Seq(s"$h AS _sk_h", s"$m AS _sk_m",
      s"(_sk_m * ($l)) AS sel_key").mkString(", ")
  }

  /** [[weightedSample]] to a TOKEN budget instead of a row count — the
    * published DSIR recipe's actual stopping rule (Xie et al. 2023
    * resample to a target token count, not a document count): rank by
    * the same integer Efraimidis–Spirakis key (ascending), keep each
    * document whose serve-order token offset starts before
    * `budgetPct`% of the corpus' total tokens (the packing
    * start-before-budget convention, so the boundary doc is included
    * and the cut is deterministic).
    *
    * Scale shape — the corpus never globally sorts: the serve rank
    * decomposes onto the BOUNDED bucket spine `sel_key >> 31` (skey
    * < 2⁵¹ ⇒ ≤ 2²⁰ buckets): (a) a census of per-bucket token mass
    * with a cumulative window over that spine (the tq6
    * thresholdForKeepRate shape), broadcast-joined back, and (b) a
    * within-bucket prefix sum partitioned by bucket, ordered by
    * (sel_key, id) — parallel across buckets, never one partition.
    * Output rows carry `sel_key` and `start_tok` (the doc's global
    * token offset in serve order), so the result doubles as the serve
    * schedule.
    *
    * `weight` must be strictly positive; `nTok` non-negative BIGINT.
    */
  def weightedTokenSample(df: DataFrame, id: Column, weight: Column,
                          nTok: Column, budgetPct: Int,
                          salt: String): DataFrame =
    tokenBudgetCut(withSelectionKey(df, id, weight, salt), id, nTok,
      budgetPct)

  /** The bucket width of the token-offset census spine: skey < 2⁵¹, so
    * `sel_key >> 31` has ≤ 2²⁰ distinct values — the bounded spine the
    * cumulative window runs over. */
  val SelBucketShift: Int = 31

  /** Serve-order token offsets over an ALREADY-KEYED frame (a
    * `sel_key` column as [[withSelectionKey]] emits): adds `start_tok`
    * for EVERY row — the global token offset in (sel_key asc, id asc)
    * serve order — without applying any budget (the census-amplified
    * stage: one mid-rank key flip shifts every later doc's start_tok).
    * Leaves a `_nt` (long token count) column for [[tokenBudgetCut]]
    * to reuse.
    */
  def withTokenOffsets(keyedIn: DataFrame, id: Column,
                       nTok: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = keyedIn.withColumn("_nt", nTok.cast("long"))
      .withColumn("_skb", shiftright(col("sel_key"), SelBucketShift))
    // Bounded bucket spine: tokens per bucket, cumulative mass of all
    // STRICTLY earlier (smaller-key) buckets = the bucket's global
    // start offset.
    val census = keyed.groupBy(col("_skb"))
      .agg(sum(col("_nt")).as("_kt"))
      .withColumn("_key_start",
        coalesce(sum(col("_kt")).over(
          Window.orderBy(col("_skb"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_kt")
    val withinW = Window.partitionBy(col("_skb"))
      .orderBy(col("sel_key"), id)
    keyed
      .join(broadcast(census), Seq("_skb"))
      .withColumn("start_tok",
        col("_key_start") + sum(col("_nt")).over(withinW) - col("_nt"))
      .drop("_skb", "_key_start")
  }

  /** The token-budget cut alone, over an ALREADY-KEYED frame. Split
    * out because the cut consumes the keyed frame three times (census,
    * total, prefix): callers that stage the keyed frame first (x5's
    * scratch landing — at corpus scale the keyed table is an artifact
    * you land anyway) pay the md5 + detln key projection ONCE instead
    * of once per consumer.
    */
  def tokenBudgetCut(keyedIn: DataFrame, id: Column, nTok: Column,
                     budgetPct: Int): DataFrame = {
    val total = keyedIn.agg(sum(nTok.cast("long")).as("_tot"))
    withTokenOffsets(keyedIn, id, nTok)
      .crossJoin(broadcast(total))
      .filter(col("start_tok") < expr(s"_tot * $budgetPct div 100"))
      .drop("_nt", "_tot")
  }

  /** DuckDB twin of [[withTokenOffsets]]: CTE text ending in
    * `pos`(…, start_tok) over a `sel`(…, sel_key, n_tok) relation.
    * Keep in lockstep with the Scala shape.
    */
  def sqlTokenOffsets(selRel: String, idExpr: String): String =
    s"""census AS (
           SELECT sel_key >> $SelBucketShift AS skb,
                  sum(n_tok)::BIGINT AS kt
           FROM $selRel GROUP BY 1),
         cum AS (
           SELECT skb,
             coalesce(sum(kt) OVER (ORDER BY skb
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS key_start
           FROM census),
         pos AS (
           SELECT s.*, (c.key_start
               + sum(s.n_tok) OVER (PARTITION BY s.sel_key >> $SelBucketShift
                   ORDER BY s.sel_key, $idExpr) - s.n_tok)::BIGINT AS start_tok
           FROM $selRel s JOIN cum c
             ON s.sel_key >> $SelBucketShift = c.skb)"""

  /** DuckDB twin of [[weightedTokenSample]]'s offset-and-cut:
    * [[sqlTokenOffsets]] plus the budget predicate, ending in `cut`.
    */
  def sqlTokenBudgetCut(selRel: String, idExpr: String,
                        budgetPct: Int): String =
    s"""${sqlTokenOffsets(selRel, idExpr)},
         cut AS (
           SELECT pos.* FROM pos
           CROSS JOIN (SELECT sum(n_tok)::BIGINT AS tot FROM $selRel) t
           WHERE pos.start_tok < t.tot * $budgetPct // 100)"""

  /** Deterministic per-epoch corpus shuffle: the global-random training
    * order every pretraining loader needs, computed as a keyed hash
    * sort instead of an RNG so epoch E's order is bit-reproducible
    * across runs, partitionings, and cluster sizes (and trivially
    * resumable from any position). Each row gets an epoch-salted 28-bit
    * hash; `shard` is the hash's contiguous range bucket (so shards are
    * uniformly sized with no extra pass) and `pos` the dense 0-based
    * rank within the shard by (hash, key). Reading shards in id order,
    * each sorted by `pos`, replays one global permutation; a different
    * `epoch` yields an independent permutation over the same rows.
    *
    * Scale shape: the hash and shard are scan-fused projections; the
    * only exchange is the hash partition by `shard` — exactly the
    * shuffle a sharded write needs anyway — and `pos` is a per-shard
    * window, parallel across shards, never a global sort.
    */
  def epochShuffle(df: DataFrame, key: Column, epoch: Int,
                   numShards: Int, salt: String = "ep"): DataFrame = {
    require(numShards > 0, s"numShards must be > 0, got $numShards")
    val sharded = df
      .withColumn("_h", keyHash(key, s"$salt:$epoch"))
      .withColumn("shard", expr(s"_h * $numShards div ${1L << 28}"))
    sharded
      .withColumn("pos",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("_h"), key)) - 1)
          .cast("long"))
      .drop("_h")
  }

  /** Curriculum serve schedule (Bengio et al. 2009 easiness ordering,
    * the curriculum-learning seat): rows split into `phases` exact
    * score-quantile phases — phase 0 is the highest-scoring (serve
    * first) fraction ~1/phases, and so on — and within each phase the
    * serve order is the [[epochShuffle]] permutation, so training walks
    * easy→hard across phases but unordered within one (ordering WITHIN
    * a phase would un-shuffle the data and hurt SGD).
    *
    * Phase assignment is exact and tie-stable: phase(s) =
    * (count of rows with score > s) · phases div total, so equal
    * scores always share a phase (a heavy tie mass widens its phase
    * rather than splitting nondeterministically). `score` should be
    * rounded/bucketed by the caller (the tq6 convention) so the
    * distinct-score census stays bounded.
    *
    * Scale shape: the census aggregates distinct scores with map-side
    * partial aggregation (shuffle footprint = distinct scores, not
    * rows); its cumulative window runs over that bounded table; the
    * phase table broadcast-joins back, so the corpus itself never
    * shuffles for the assignment — its only exchange is epochShuffle's
    * own shard partition. Long arithmetic: cum·phases ≤ 9·10¹⁸ needs
    * phases ≤ ~10⁶ at 10¹² rows — require'd far below that.
    *
    * Output: (id, score, phase, shard, pos); serve in (phase, shard,
    * pos) order.
    */
  def curriculumSchedule(df: DataFrame, id: Column, score: Column,
                         phases: Int, epoch: Int, numShards: Int,
                         salt: String = "cur"): DataFrame = {
    require(phases > 0 && phases <= 1000000,
      s"phases must be in [1, 1e6], got $phases")
    require(numShards > 0, s"numShards must be > 0, got $numShards")
    val d = df.select(id.as("id"), score.as("s"))
    val wDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col("s").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val phaseTab = d.groupBy(col("s")).agg(count(lit(1)).as("n"))
      .withColumn("cum", coalesce(sum(col("n")).over(wDesc), lit(0L)))
      .crossJoin(broadcast(d.agg(count(lit(1)).as("tot"))))
      .select(col("s"), expr(s"cum * $phases div tot").as("phase"))
    d.join(broadcast(phaseTab), Seq("s"))
      .withColumn("_h", keyHash(col("id"), s"$salt:$epoch"))
      .withColumn("shard", expr(s"_h * $numShards div ${1L << 28}"))
      .withColumn("pos",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("phase"), col("shard"))
          .orderBy(col("_h"), col("id"))) - 1).cast("long"))
      .select(col("id"), col("s").as("score"), col("phase"), col("shard"),
        col("pos"))
  }

  /** [[curriculumSchedule]] with phase boundaries taken from an a15
    * log-linear quantile sketch of the score column instead of an exact
    * distinct-score census — the 100 TB path: the exact census is a
    * corpus pass whose spine is unbounded for high-cardinality scores,
    * while the sketch is mergeable state an ingest pipeline already
    * maintains incrementally ([[Sketches.quantileSketch]] rows summed
    * across batches, ≤ ~1.9k buckets per stratum), so the curriculum
    * re-phases after every batch WITHOUT rescanning history.
    *
    * Semantics: rows bucket by [[Sketches.logLinearLo]]; a bucket's
    * phase is `cum·phases div tot` over the counts of strictly-higher
    * buckets — exactly [[curriculumSchedule]]'s rule applied at bucket
    * granularity. For scores already bucket-aligned (score ==
    * logLinearLo(score)) the two schedules are IDENTICAL (spec-pinned);
    * otherwise boundaries move by at most one bucket (≤ 2^-subBits
    * relative). Scores must be non-negative BIGINT (the sketch domain);
    * `sketch` must cover every score present in `df` (it is built from
    * the same distribution).
    */
  def curriculumScheduleFromSketch(df: DataFrame, id: Column, score: Column,
                                   sketch: DataFrame, phases: Int,
                                   epoch: Int, numShards: Int,
                                   salt: String = "cur",
                                   subBits: Int = 5): DataFrame = {
    require(phases > 0 && phases <= 1000000,
      s"phases must be in [1, 1e6], got $phases")
    require(numShards > 0, s"numShards must be > 0, got $numShards")
    val wDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col("lo").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    // bounded bucket spine: merge sketch rows across batches/days first
    val buckets = sketch.groupBy(col("lo")).agg(sum(col("cnt")).as("n"))
    val phaseTab = buckets
      .withColumn("cum", coalesce(sum(col("n")).over(wDesc), lit(0L)))
      .crossJoin(broadcast(buckets.agg(sum(col("n")).as("tot"))))
      .select(col("lo"), expr(s"cum * $phases div tot").as("phase"))
    df.select(id.as("id"), score.as("s"))
      .withColumn("lo", Sketches.logLinearLo(col("s"), subBits))
      .join(broadcast(phaseTab), Seq("lo"))
      .withColumn("_h", keyHash(col("id"), s"$salt:$epoch"))
      .withColumn("shard", expr(s"_h * $numShards div ${1L << 28}"))
      .withColumn("pos",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("phase"), col("shard"))
          .orderBy(col("_h"), col("id"))) - 1).cast("long"))
      .select(col("id"), col("s").as("score"), col("phase"), col("shard"),
        col("pos"))
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    * optimize the domain mixture α by multiplicative-weights updates
    * α_d ← normalize(α_d · exp(η · excess_d)). The published recipe's
    * excess signal is a proxy model's per-domain loss; the proxy-free
    * deterministic seat here is each domain's total-variation distance
    * from the CURRENT α-mixture over hashed-unigram distributions —
    * the same worst-case-domain emphasis (distinct/underserved domains
    * gain weight until the mixture includes them), and the fixed point
    * is genuinely iterative: the mixture chases the weights and the
    * distances chase the mixture.
    *
    * Scale shape: ONE corpus token pass builds the (domain, bucket)
    * count table — ≤ domains × `buckets` rows of exact longs, the
    * model, not the corpus — and every iteration is arithmetic over
    * it; the corpus is never rescanned. Determinism: counts are exact
    * integers, q = c/n is one IEEE divide, per-iteration TV and α
    * round to 6 decimals (summation-order noise collapses, the kmeans
    * discipline), and the update exponential is [[detExp]] — so the
    * unrolled SQL oracle replays every iteration bit-for-bit. Driver
    * state is the model table (bounded by `buckets`, the NB-model
    * precedent) plus `domains` scalars.
    *
    * Returns one row per domain: (d, n_tok, tv, alpha) with `tv` from
    * the final iteration.
    */
  def domainReweight(df: DataFrame, domain: Column, text: Column,
                     buckets: Int, eta: Double, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = df.sparkSession
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val cnt = df
      .select(domain.cast("string").as("d"),
        explode(graft.functions.TextAnalysis.tokens(text)).as("tok"))
      .select(col("d"), Classify.featHash(col("tok"), buckets).as("b"))
      .groupBy(col("d"), col("b")).agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ds = cnt.map(_._1).distinct.sorted.toSeq
    require(ds.nonEmpty, "domainReweight needs at least one domain with tokens")
    val bs = cnt.map(_._2).distinct.sorted.toSeq
    val n: Map[String, Long] =
      cnt.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val c: Map[(String, Long), Long] =
      cnt.map(t => (t._1, t._2) -> t._3).toMap
    val q: Map[(String, Long), Double] = (for {
      d <- ds; b <- bs
    } yield (d, b) -> c.getOrElse((d, b), 0L).toDouble / n(d).toDouble).toMap
    var alpha: Map[String, Double] = ds.map(_ -> r6(1.0 / ds.size)).toMap
    var tv: Map[String, Double] = ds.map(_ -> 0.0).toMap
    for (_ <- 0 until iters) {
      val p: Map[Long, Double] = bs.map { b =>
        b -> ds.map(d => alpha(d) * q((d, b))).sum
      }.toMap
      tv = ds.map { d =>
        d -> r6(0.5 * bs.map(b => math.abs(q((d, b)) - p(b))).sum)
      }.toMap
      val raw = ds.map(d =>
        d -> alpha(d) * graft.expressions.DetExp.compute(eta * tv(d))).toMap
      val s = ds.map(raw).sum
      alpha = ds.map(d => d -> r6(raw(d) / s)).toMap
    }
    spark.createDataFrame(
        ds.map(d => (d, n(d), tv(d), alpha(d))))
      .toDF("d", "n_tok", "tv", "alpha")
  }

  /** Temperature-resampled multilingual mix (XLM-R / mT5: Conneau et
    * al. 2020, Xue et al. 2021): language l's mixture share is
    * p_l ∝ n_l^α with sampling temperature α ∈ (0, 1] — α = 1 keeps the
    * natural distribution, smaller α upweights low-resource languages —
    * and the output takes EXACTLY (target·wq_l) div Σwq documents per
    * language: the exact-count cousin of rate-based [[tokenBudgetMix]]
    * (which keeps a hash-rate FRACTION, so its output size is only
    * expected, not pinned).
    *
    * Cross-engine determinism (the x5 discipline): n_l^α = exp(α·ln n_l)
    * computes as detexp(α·detln(n_l)) — both exact-IEEE-step kernels —
    * with α an exact decimal literal and ONE multiply between them;
    * the result quantizes onto the 2⁻²⁰ dyadic grid as BIGINT
    * micro-weights wq_l, so the normalizing sum is an exact integer
    * sum in any order and each allocation is pure integer arithmetic.
    * Selection within a language is the salted 28-bit [[keyHash]]
    * order with id tie-break (rank ≤ c_l) — reproducible under any
    * partitioning. α·ln n_l must stay in detexp's accurate range
    * (|x| ≲ 7 covers n_l up to 10¹⁰ at α = 0.3 — fine at 100 TB).
    *
    * Scale shape: the weight/allocation table is ≤ |langs| rows
    * (broadcast back); the corpus is touched by one scan-fused hash
    * projection plus one rank window partitioned by language — the
    * only shuffle, and it moves ids + hashes, not documents.
    *
    * Returns the kept documents: (id, stratum, lrank) with the
    * within-language hash rank. A stratum whose allocation exceeds its
    * size emits all its rows — upsampling is the TRAINING loop's
    * repeat-epochs job, not the mix's (no row replication here).
    */
  def temperatureMix(df: DataFrame, stratum: Column, id: Column,
                     alpha: Double, target: Long, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(stratum.as("_l")).agg(count(lit(1)).as("_n"))
    val wq = counts.select(col("_l"),
      floor(detExp(lit(alpha) * graft.expressions.DetLn(col("_n"))) *
        lit((1L << 20).toDouble) + lit(0.5)).cast("long").as("_wq"))
    val alloc = wq.crossJoin(broadcast(wq.agg(sum(col("_wq")).as("_s"))))
      .select(col("_l"), expr(s"($target * _wq) div _s").as("_cl"))
    val w = Window.partitionBy(col("_l")).orderBy(col("_hh"), col("_id"))
    df.select(stratum.as("_l"), id.as("_id"), keyHash(id, salt).as("_hh"))
      .join(broadcast(alloc), "_l")
      .withColumn("lrank", row_number().over(w).cast("long"))
      .filter(col("lrank") <= col("_cl"))
      .select(col("_id").as("id"), col("_l").as("stratum"), col("lrank"))
  }
}
