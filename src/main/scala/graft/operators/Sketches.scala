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
}
