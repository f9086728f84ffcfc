package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Corpus-health dashboard (beyond the reference) — the composition the
  * round-8 sketch families were built for: one row per (stratum, day)
  * joining document volume and quality drift (the w4 signals), the
  * log-linear quantile sketch of per-doc token counts (a15 lifecycle),
  * the threshold-pruned heavy-hitter top token (a16 lifecycle), and a
  * distinct-token count — exact, or the mergeable HLL estimate (a14
  * lifecycle) on the scale path.
  *
  * Shapes at 100 TB: raw rows are touched exactly TWICE — once by the
  * doc-level select (tokenize + quality, all scan-fused) and once by the
  * exploded token stream's map-side-combined first groupBys. Everything
  * after the first aggregation is sketch-sized (≤ strata × days × ~1.9k
  * bucket rows for quantiles, support-pruned keys for heavy hitters, one
  * sketch/count row per group otherwise), so every join onto the base
  * table broadcasts — the dashboard assembles with zero large shuffles
  * beyond the two first-pass aggregations.
  */
object Health {

  /** Per-(stratum, day) health row. `distinctViaHll = false` keeps every
    * column deterministic integer/4-6dp-floored arithmetic (full DuckDB
    * oracle, g7); `true` swaps the distinct-token column for the HLL
    * union estimate (the 100 TB path — approximate, rows-check + spec,
    * g7x), leaving every other column bit-identical.
    */
  def corpusHealth(docs: DataFrame, stratum: Column, day: Column,
                   text: Column, qualityFloor: Double = 0.5,
                   hhNum: Long = 1L, hhDen: Long = 200L,
                   subBits: Int = 5,
                   distinctViaHll: Boolean = false): DataFrame = {
    import graft.functions.{TextAnalysis => TA}
    def fr6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

    // One tokenization, bound at a select boundary (never inside a HOF
    // lambda); every doc-level signal derives from it.
    val scored = docs
      .select(stratum.as("stratum"), day.as("day"), text.as("_text"),
        TA.tokens(text).as("_toks"))
      .select(col("stratum"), col("day"),
        TA.qualityScoreFromTokens(col("_toks"), col("_text")).as("_q"),
        size(col("_toks")).cast("long").as("_ntok"),
        col("_toks"))

    // Drift block (w4 signals, batch frame): first raw-row aggregation.
    val base = scored
      .groupBy(col("stratum"), col("day"))
      .agg(count(lit(1)).as("n_docs"),
        fr6(avg(col("_q"))).as("avg_quality"),
        fr6(avg(when(col("_q") < qualityFloor, 1.0).otherwise(0.0)))
          .as("low_quality_share"),
        sum(col("_ntok")).as("total_tokens"))

    // Quantile block: log-linear sketch of per-doc token counts. The
    // sketch API keys by one stratum column, so (stratum, day) packs
    // into a '#'-joined key and unpacks after the merge walk.
    val packed = scored.select(
      concat_ws("#", col("stratum"), col("day")).as("_sd"),
      col("day"), col("_ntok"))
    val quant = Sketches.mergeQuantiles(
        Sketches.quantileSketch(packed, col("_sd"), col("day"),
          col("_ntok"), subBits),
        Seq(50, 90, 99), subBits)
      .groupBy(col("stratum"))
      .agg(max(when(col("p") === 50, col("q_lo"))).as("p50_tok_lo"),
        max(when(col("p") === 90, col("q_lo"))).as("p90_tok_lo"),
        max(when(col("p") === 99, col("q_lo"))).as("p99_tok_lo"),
        max(when(col("p") === 99, col("q_hi"))).as("p99_tok_hi"))
      .select(split(col("stratum"), "#").getItem(0).as("stratum"),
        split(col("stratum"), "#").getItem(1).cast("long").as("day"),
        col("p50_tok_lo"), col("p90_tok_lo"),
        col("p99_tok_lo"), col("p99_tok_hi"))

    // Token stream: second raw-row pass, shared by the frequency and
    // distinct blocks. Explodes AFTER the quality select so the
    // tokenizer still runs once per doc.
    val toks = scored.select(col("stratum"), col("day"),
      explode(col("_toks")).as("tok"))

    // Heavy-hitter block: the support-pruned per-batch sketch rows ARE
    // the per-day topline — top token by (count desc, token desc), a
    // deterministic two-step argmax both engines replay exactly.
    val kept = Sketches.freqSketch(toks, col("stratum"), col("day"),
        col("tok"), hhNum, hhDen)
      .filter(col("key").isNotNull)
    val mx = kept.groupBy(col("stratum"), col("day"))
      .agg(max(col("cnt")).as("top_tok_cnt"))
    val top = kept.join(mx, Seq("stratum", "day"))
      .filter(col("cnt") === col("top_tok_cnt"))
      .groupBy(col("stratum"), col("day"), col("top_tok_cnt"))
      .agg(max(col("key")).as("top_tok"))

    // Distinct block: exact (oracle path) or HLL estimate (scale path —
    // the per-(stratum, day) sketch is the mergeable unit; any coarser
    // slice would union the same rows).
    val dist =
      if (distinctViaHll)
        Sketches.dailySketches(toks, col("stratum"), col("day"), col("tok"))
          .select(col("stratum"), col("day"),
            expr("cast(hll_sketch_estimate(sketch) as bigint)")
              .as("distinct_toks"))
      else
        toks.groupBy(col("stratum"), col("day"))
          .agg(countDistinct(col("tok")).as("distinct_toks"))

    // Assembly: every non-base side is post-aggregation sketch-sized —
    // broadcast, no shuffle of the base.
    base
      .join(broadcast(quant), Seq("stratum", "day"))
      .join(broadcast(dist), Seq("stratum", "day"))
      .join(broadcast(top), Seq("stratum", "day"), "left")
      .select(col("stratum"), col("day"), col("n_docs"),
        col("avg_quality"), col("low_quality_share"), col("total_tokens"),
        col("distinct_toks"),
        col("p50_tok_lo"), col("p90_tok_lo"),
        col("p99_tok_lo"), col("p99_tok_hi"),
        col("top_tok"), col("top_tok_cnt"))
  }
}
