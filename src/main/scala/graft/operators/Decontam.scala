package graft.operators

import graft.functions.{TextAnalysis => TA}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Benchmark decontamination (beyond the reference — the eval-overlap
  * gate every LLM training corpus needs; the reference's dedup passes
  * are all train-vs-train): flag training documents that contain any
  * token n-gram from an evaluation set.
  *
  * The scale asymmetry is the design: eval benchmarks are MBs while the
  * training corpus is TBs, so the eval n-gram set ALWAYS fits in a
  * broadcast. The corpus side is one narrow scan — tokenize, strict
  * n-grams, explode — probed against the broadcast hash set with a
  * partial-aggregated per-doc count on top. The corpus never shuffles
  * its text; only (doc_id, matched-gram) survive past the probe. For a
  * truly huge eval union (or fpp tolerance), [[Dedup.corpusBloom]]
  * composes in front of this as a pre-filter, same as d9.
  */
object Decontam {

  /** Strict token n-grams (distinct, space-joined). Unlike
    * [[Dedup.shingles]] there is NO short-text fallback: a document
    * with fewer than n tokens has no n-grams, so it can never be
    * flagged by containment — the right semantics for a gate, where
    * the fallback shingle could only produce spurious full-text hits.
    * The empty-guard matters: Spark's `sequence(1, 0)` counts down.
    */
  def tokenNgramsFromTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))))

  /** Single-shot wrapper — see the capture caveat on
    * [[tokenNgramHashesFromTokens]]; bulk paths should tokenize in
    * their own projection and call the FromTokens form.
    */
  def tokenNgrams(text: Column, n: Int): Column =
    tokenNgramsFromTokens(TA.tokens(text), n)

  /** Hashed twin of [[tokenNgrams]] for the probe path: xxhash64 over
    * the token slice directly, so no per-gram string ever
    * materializes — the probe joins 8-byte longs, not ~n-word strings.
    * Distinct-by-hash equals distinct-by-gram up to a 2⁻⁶⁴ collision
    * (~10⁻⁹ across a 10⁶-gram corpus probe — below any oracle's noise
    * floor; the exact-string [[tokenNgrams]] stays the reference
    * semantics and the parity spec pins the counts equal).
    *
    * `toks` must be a MATERIALIZED column (a bound attribute), not an
    * inline `TA.tokens(...)` tree: an expression captured inside the
    * transform lambda re-evaluates once per array element, which for an
    * inline tokenizer means re-running the regex once per gram —
    * O(grams · doc length) per row. [[contaminationReport]] projects
    * the token array first for exactly this reason.
    */
  def tokenNgramHashesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<long>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => xxhash64(slice(toks, i, lit(n))))))

  /** Convenience wrapper over [[tokenNgramHashesFromTokens]] — only for
    * single-shot column use where the quadratic capture cost cannot
    * bite (tiny arrays, specs).
    */
  def tokenNgramHashes(text: Column, n: Int): Column =
    tokenNgramHashesFromTokens(TA.tokens(text), n)

  /** Per-train-doc contamination report against `eval`'s n-gram set.
    *
    * Returns one row per train doc: `id, n_grams, n_matched,
    * contamination` (matched / total distinct grams, 0 when the doc is
    * too short to have grams — ANSI-guarded), ordered by nothing (the
    * caller sorts). `n_matched` counts DISTINCT matched grams, so a
    * gram repeated in the doc is one hit — containment, not frequency.
    *
    * The train text tokenizes ONCE: `explode_outer` keeps gram-less
    * docs as a single null-gram row (so they report 0/0 instead of
    * vanishing), the broadcast probe left-joins a hit marker, and one
    * partial-aggregated count pass produces both the total and the
    * matched count. No second scan for totals, no post-agg join.
    */
  def contaminationReport(train: DataFrame, eval: DataFrame,
                          id: Column, text: Column, n: Int): DataFrame = {
    // tokenize in a SEPARATE projection: the token array must be a
    // bound attribute by the time the gram lambda slices it, or the
    // regex re-runs once per gram (CollapseProject keeps multi-use,
    // non-cheap aliases materialized, so the split survives Catalyst)
    val evalGrams = eval
      .select(TA.tokens(text).as("_toks"))
      .select(explode(tokenNgramHashesFromTokens(col("_toks"), n)).as("gram"))
      .distinct()
    train
      .select(id.as("id"), TA.tokens(text).as("_toks"))
      .select(col("id"),
        explode_outer(tokenNgramHashesFromTokens(col("_toks"), n)).as("gram"))
      .join(broadcast(evalGrams.withColumn("_hit", lit(1))), Seq("gram"), "left")
      .groupBy(col("id"))
      .agg(count(col("gram")).as("n_grams"), count(col("_hit")).as("n_matched"))
      .select(col("id"), col("n_grams"), col("n_matched"),
        when(col("n_grams") > 0,
          col("n_matched").cast("double") / col("n_grams"))
          .otherwise(lit(0.0)).as("contamination"))
  }

  /** Driver-side eval gram-hash set for [[contaminationFilter]]. Eval
    * benchmarks are contract-tiny (MBs), so the set collects to the
    * driver and ships inside the filter expression as a literal —
    * the streaming-safe analogue of the batch broadcast.
    */
  def evalGramHashes(eval: DataFrame, text: Column, n: Int): Array[Long] =
    eval.select(TA.tokens(text).as("_toks"))
      .select(explode(tokenNgramHashesFromTokens(col("_toks"), n)).as("g"))
      .distinct().collect().map(_.getLong(0)).sorted

  /** Stateless per-row keep-predicate: true iff the document's
    * contamination (matched/total distinct grams) does NOT exceed
    * `maxFraction`. No aggregation, no join, no state — so it drops
    * straight into a Structured Streaming pipeline (`readStream
    * .filter(...)`), where the batch [[decontaminate]]'s per-doc
    * groupBy cannot run mid-stream. Matches [[decontaminate]]'s keep
    * set row-for-row (pinned in DecontamSpec).
    *
    * Backed by the native [[graft.expressions.TokenNgramContamination]]
    * — ONE tokenize + hash pass per row. A declarative gram chain
    * cannot live safely inside a filter predicate: there is no select
    * boundary to bind the token array to, and even with one,
    * PushPredicateThroughNonJoin substitutes projection aliases back
    * into the pushed condition, re-inlining the tokenizer inside the
    * transform lambda (O(grams · doc length) per row — measured in the
    * optimized plan). The declarative formula survives only as the
    * parity twin [[contaminationFractionDeclarative]].
    *
    * Scale note: the per-row binary search against the shipped sorted
    * array is right for real eval sets (≤10⁶ grams). If the union of
    * benchmarks ever outgrows a comfortable broadcast-in-expression,
    * compose [[Dedup.corpusBloom]] in front exactly as d9 does and
    * keep this as the exact check on the maybe-hit sliver.
    */
  def contaminationFilter(text: Column, n: Int, evalGrams: Array[Long],
                          maxFraction: Double): Column =
    // null text → null fraction; batch decontaminate keeps such rows
    // (0/0 report), so the predicate must too
    coalesce(
      graft.expressions.TokenNgramContamination(text, n, evalGrams.sorted),
      lit(0.0)) <= maxFraction

  /** Declarative twin of the native contamination fraction — spec-only
    * (DecontamSpec pins bit-equality, CJK included). NOT for production
    * filters: see the capture caveat on [[contaminationFilter]].
    */
  def contaminationFractionDeclarative(text: Column, n: Int,
                                       evalGrams: Array[Long]): Column = {
    val lits = array(evalGrams.map(lit): _*)
    val counts = {
      val grams = tokenNgramHashesFromTokens(TA.tokens(text), n)
      struct(size(array_intersect(grams, lits)).as("m"),
        size(grams).as("t"))
    }
    when(counts.getField("t") > 0,
      counts.getField("m").cast("double") / counts.getField("t"))
      .otherwise(lit(0.0))
  }

  /** The gate itself: drop train docs whose contamination exceeds
    * `maxFraction` (strictly greater — 0.0 drops any doc with a hit).
    * Anti-join on the flagged id set; the corpus scan that produces the
    * report and the one that survives are the same cached/lazy frame.
    */
  def decontaminate(train: DataFrame, eval: DataFrame, idName: String,
                    text: Column, n: Int, maxFraction: Double): DataFrame = {
    val flagged = contaminationReport(train, eval, col(idName), text, n)
      .filter(col("contamination") > maxFraction)
      .select(col("id").as("_flagged_id"))
    train.join(broadcast(flagged), col(idName) === col("_flagged_id"),
      "left_anti")
  }
}
