package graft.operators

import graft.functions.{TextAnalysis => TA}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed byte-pair-encoding merge training (beyond the reference —
  * the tokenizer-training seat of an LLM data pipeline; the reference
  * counts whitespace tokens only, RAG/rag.ipynb:783).
  *
  * The scale shape is the point: the 100 TB corpus is touched EXACTLY
  * once, by [[wordFreqs]] (tokenize → groupBy word, map-side combined).
  * Training then iterates on the compressed (word, freq) table — vocab-
  * sized, millions of rows not billions — and each ROUND is one
  * partial-aggregated pair count plus one projection, landing a whole
  * batch of provably-independent merges ([[trainMergesBatched]]).
  * Nothing in the loop rescans text; driver traffic per round is one
  * small top-K pair listing.
  *
  * Determinism: ties on pair count break lexicographically (a, then b),
  * so the learned merge list is engine-independent and the JVM twin
  * [[jvmSegment]] reproduces segmentation bit-for-bit (pinned in
  * BpeSpec).
  */
object Bpe {

  /** One corpus pass: lowercase whitespace/CJK tokens → (word, freq).
    * This is the ONLY stage that reads text; everything downstream is
    * vocab-sized.
    */
  // NO Frames.fan (r17 A/B revert): ta10 measured 1.67/1.99 s
  // (quiet/loaded-med) without the fan vs 1.93/2.58 with — the
  // explode feeds a map-side-combined groupBy whose shuffle already
  // spreads the downstream, so the extra exchange only adds task
  // constants to the many small merge-step jobs that follow.
  def wordFreqs(df: DataFrame, text: Column): DataFrame =
    df.select(explode(TA.tokens(text)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Split a word into its initial character symbols. Empty-string
    * guard matters: `sequence(1, 0)` counts DOWN in Spark, it is not
    * empty.
    */
  private def charSymbols(word: Column): Column =
    when(length(word) === 0, array().cast("array<string>"))
      .otherwise(
        transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))))

  /** Left-to-right non-overlapping replacement of the adjacent pair
    * (a, b) with the merged symbol, as a single linear fold.
    */
  private def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms,
      array().cast("array<string>"),
      (out, x) =>
        when(size(out) > 0 &&
            element_at(out, -1) === lit(a) && x === lit(b),
          concat(slice(out, lit(1), size(out) - 1), array(lit(a + b))))
          .otherwise(concat(out, array(x))))

  /** Train `numMerges` BPE merges over a (word, freq) table, ONE merge
    * per Spark cycle — the small-N reference implementation and parity
    * twin of the production [[trainMergesBatched]] (which lands many
    * merges per cycle and is what real training should call).
    *
    * Each step: count adjacent symbol pairs weighted by word frequency
    * (one partial-aggregated shuffle over the vocab table), pick the
    * most frequent pair (ties → lexicographic), rewrite the symbol
    * arrays. The evolving vocab table re-materializes each step
    * (localCheckpoint) so lineage stays flat across iterations instead
    * of nesting `numMerges` fold expressions into one plan. Stops early
    * when no pair repeats.
    */
  def trainMerges(freqs: DataFrame, numMerges: Int): Seq[(String, String)] = {
    var words = freqs
      .select(charSymbols(col("word")).as("syms"),
        col("freq").cast("long").as("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    for (_ <- 1 to numMerges if !done) {
      val n = size(col("syms"))
      val best = words
        .filter(n >= 2)
        .select(explode(zip_with(
          slice(col("syms"), lit(1), n - 1),
          slice(col("syms"), lit(2), n - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"),
          col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .filter(col("cnt") >= 2)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      best.headOption match {
        case None => done = true
        case Some(r) =>
          val (a, b) = (r.getString(0), r.getString(1))
          merges += ((a, b))
          val prev = words
          words = words
            .select(mergePair(col("syms"), a, b).as("syms"), col("freq"))
            .localCheckpoint()
          graft.Frames.free(prev)
      }
    }
    graft.Frames.free(words)
    merges.toSeq
  }

  /** Batched [[trainMerges]]: per ROUND, one pair-count aggregation +
    * one driver collect of the top-`batchSize` pairs + one composed
    * rewrite + one localCheckpoint — instead of one full cycle per
    * merge. At a production 32k-merge vocabulary the sequential loop is
    * 32k driver-bound Spark jobs; this costs one cycle per round with
    * typically tens of merges landing per round.
    *
    * The selection is SEQUENTIAL-EXACT, not approximate — pinned
    * against [[trainMerges]] in BpeSpec. Walking the collected pairs in
    * (count desc, a, b) order, a pair is selected iff (1) it shares no
    * symbol with — and its merged symbol collides with nothing in — the
    * already-selected set (a non-overlapping pair's count is invariant
    * under the others' rewrites), and (2) its count strictly exceeds
    * the barrier: the max count over skipped-for-overlap pairs and,
    * when the listing filled, the tail count bounding every uncollected
    * pair. Any pair a selected rewrite creates or boosts descends from
    * a pair overlapping a selected symbol, so its count is ≤ the
    * barrier — meaning the sequential algorithm could never have
    * ranked it above a selected pair. Selection stops at the first
    * candidate at/below the barrier (the list is sorted). The batch
    * then applies as [[mergePair]] folds composed in selection order —
    * literally the sequential rewrites, fused into one projection.
    */
  def trainMergesBatched(freqs: DataFrame, numMerges: Int,
                         batchSize: Int = 64): Seq[(String, String)] =
    trainMergesBatchedWithRounds(freqs, numMerges, batchSize)._1

  /** [[trainMergesBatched]] plus the round count, for specs/telemetry. */
  private[graft] def trainMergesBatchedWithRounds(
      freqs: DataFrame, numMerges: Int,
      batchSize: Int): (Seq[(String, String)], Int) = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    var words = freqs
      .select(charSymbols(col("word")).as("syms"),
        col("freq").cast("long").as("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    var done = false
    while (merges.length < numMerges && !done) {
      val n = size(col("syms"))
      val top = words
        .filter(n >= 2)
        .select(explode(zip_with(
          slice(col("syms"), lit(1), n - 1),
          slice(col("syms"), lit(2), n - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"),
          col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .filter(col("cnt") >= 2)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(batchSize)
        .collect()
      if (top.isEmpty) done = true
      else {
        rounds += 1
        // pairs below the collected listing are bounded by its tail
        val uncollectedBound =
          if (top.length == batchSize) top.last.getLong(2) else Long.MinValue
        val used = scala.collection.mutable.HashSet.empty[String]
        val sel = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        var barrier = Long.MinValue
        var stop = false
        val room = numMerges - merges.length
        val it = top.iterator
        while (!stop && it.hasNext && sel.length < room) {
          val r = it.next()
          val (a, b, c) = (r.getString(0), r.getString(1), r.getLong(2))
          val floor =
            if (sel.isEmpty) Long.MinValue
            else math.max(barrier, uncollectedBound)
          if (c <= floor) stop = true
          else if (used(a) || used(b) || used(a + b))
            barrier = math.max(barrier, c)
          else {
            sel += ((a, b)); used += a; used += b; used += (a + b)
          }
        }
        merges ++= sel
        val prev = words
        words = words
          .select(sel.foldLeft(col("syms")) {
            case (s, (a, b)) => mergePair(s, a, b)
          }.as("syms"), col("freq"))
          .localCheckpoint()
        graft.Frames.free(prev)
      }
    }
    graft.Frames.free(words)
    (merges.toSeq, rounds)
  }

  /** Segment a word column with a learned merge list: char split, then
    * the merges applied in training order. Expression depth grows with
    * the merge count — fine for the bounded lists trained here; a
    * serving-path tokenizer with 10⁴+ merges belongs in a native
    * expression (the [[jvmSegment]] loop), not a nested fold.
    */
  def segment(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(charSymbols(word)) {
      case (syms, (a, b)) => mergePair(syms, a, b)
    }

  /** Declarative whole-document encode: tokenize, segment each token,
    * flatten. Plan depth grows with the merge count, so this is the
    * PARITY TWIN of the native [[graft.expressions.BpeEncode]] kernel
    * (one JVM pass, flat plan at any merge-list size) — use the native
    * expression in real plans. `toks` must be a materialized column
    * (CLAUDE.md lambda-capture contract).
    */
  def encodeDeclarative(toks: Column, merges: Seq[(String, String)]): Column =
    flatten(transform(toks, w => segment(w, merges)))

  /** DuckDB twin of [[trainMerges]] for the ta9/ta10 oracles: the
    * training loop UNROLLED into a CTE chain (`numMerges` is a bounded
    * demo constant, so "iterative ≠ SQL" doesn't apply — each step is
    * pair-count → argmax → greedy rewrite, all expressible). The greedy
    * left-to-right non-overlapping rewrite maps to windows: candidate
    * positions (pair matches) group into runs of CONSECUTIVE indices
    * (only possible when a = b), the 1st/3rd/5th… of each run merge,
    * and the position after a chosen one is consumed. Chains from a
    * `baseCte(word, freq)`; step k's tables are `m{k}` (the chosen
    * pair, empty after early stop) and `s{k}` (the rewritten vocab).
    * Keep in lockstep with [[trainMerges]]/[[mergePair]].
    */
  def sqlTrainChain(numMerges: Int, baseCte: String): String = {
    val head = s"""s0 AS (
      SELECT word, freq, regexp_extract_all(word, '.') AS syms FROM $baseCte)"""
    val steps = (1 to numMerges).map { k =>
      val p = k - 1
      s"""pc$k AS (
      SELECT syms[i] AS a, syms[i+1] AS b, sum(freq)::BIGINT AS cnt
      FROM (SELECT syms, freq, unnest(generate_series(1, len(syms)-1)) AS i
            FROM s$p WHERE len(syms) >= 2)
      GROUP BY 1, 2 HAVING sum(freq) >= 2),
    m$k AS (SELECT a, b FROM pc$k ORDER BY cnt DESC, a, b LIMIT 1),
    pos$k AS (
      SELECT s.word, s.freq, s.syms, u.i, s.syms[u.i] AS sym, m.a, m.b,
        (m.a IS NOT NULL AND u.i < len(s.syms)
          AND s.syms[u.i] = m.a AND s.syms[u.i+1] = m.b) AS is_cand
      FROM s$p s
      CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(s.syms))) AS i) u
      LEFT JOIN m$k m ON TRUE),
    runs$k AS (
      SELECT *, i - row_number() OVER (PARTITION BY word, is_cand ORDER BY i) AS run
      FROM pos$k),
    sel$k AS (
      SELECT *, is_cand AND
        (row_number() OVER (PARTITION BY word, is_cand, run ORDER BY i) % 2 = 1) AS ch
      FROM runs$k),
    cons$k AS (
      SELECT *, coalesce(lag(ch) OVER (PARTITION BY word ORDER BY i), FALSE) AS consumed
      FROM sel$k),
    s$k AS (
      SELECT word, freq, list(CASE WHEN ch THEN a || b ELSE sym END ORDER BY i) AS syms
      FROM cons$k WHERE NOT consumed GROUP BY word, freq)"""
    }
    (head +: steps).mkString(",\n    ")
  }

  /** Companion of [[sqlTrainChain]]: the learned merge list in ta9's
    * output shape (early-stopped steps contribute no row; stop is
    * monotone, so step numbering stays contiguous like the Scala loop).
    */
  def sqlMergesSelect(numMerges: Int): String = {
    val union = (1 to numMerges)
      .map(k => s"SELECT ${k - 1} AS step, a, b FROM m$k")
      .mkString(" UNION ALL ")
    s"""SELECT step::BIGINT AS step, a AS "left", b AS "right", a || b AS merged
      FROM ($union) ORDER BY step"""
  }

  /** JVM twin of [[segment]] — same left-to-right non-overlapping rule,
    * for parity specs and driver-side use. Splits by CODE POINTS, not
    * UTF-16 code units: [[charSymbols]]'s `substr` counts code points
    * and BpeEncode.compute walks codePointAt/charCount, so a UTF-16
    * split would hand non-BMP text (emoji, CJK extensions) lone
    * surrogates that can never match trained merges.
    */
  def jvmSegment(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Vector[String] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        val w = Character.charCount(cp)
        buf += word.substring(i, i + w)
        i += w
      }
      buf.toVector
    }
    merges.foreach { case (a, b) =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      syms.foreach { x =>
        if (buf.nonEmpty && buf.last == a && x == b) {
          buf.remove(buf.length - 1)
          buf += (a + b)
        } else buf += x
      }
      syms = buf.toVector
    }
    syms
  }
}
