package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Ruler-based (heuristic) quality scoring — SURVEY.md §2.7 R1–R11,
  * re-expressing Data_Analysis/evaluation/quality_scoring.py:98-406 as
  * pure column arithmetic. Everything is codegen'd `when`/`least`
  * chains: per-row cost only, no shuffle, fused with the scan.
  *
  * Determinism: the reference calls `datetime.now()` inside recency
  * scoring (quality_scoring.py:173) — here "now" is an injected `asOf`
  * column so results are reproducible (SURVEY.md §7.4 risk 3).
  *
  * Rounding: reference rounds with Python `round` (banker's); we pin
  * floor(x·10³+½)/10³ (half-up on the exact double) on BOTH engine and
  * oracle sides — cross-engine identical (see TextAnalysis.qualityScore).
  */
object Ruler {

  /** Keyword groups driving R4–R6 (quality_scoring.py:190-304). */
  val innovationWords: Seq[String] =
    Seq("novel", "new", "propose", "introduce", "first", "improve")
  val evaluationWords: Seq[String] =
    Seq("experiment", "evaluate", "benchmark", "result", "performance")
  val theoryWords: Seq[String] =
    Seq("theorem", "proof", "theory", "analysis", "bound")
  val methodWords: Seq[String] =
    Seq("method", "algorithm", "approach", "framework", "model")
  val metricWords: Seq[String] =
    Seq("accuracy", "precision", "recall", "f1", "score", "error")
  val applicationWords: Seq[String] =
    Seq("application", "deploy", "system", "production", "real-world")

  /** round(x, 3) as exact-double half-up — engine-independent. */
  def round3(c: Column): Column = floor(c * 1000.0 + 0.5) / 1000.0

  /** Number of `words` that occur as substrings of lower(`text`). */
  def keywordHits(text: Column, words: Seq[String]): Column = {
    val lc = lower(text)
    size(filter(array(words.map(lit): _*), w => lc.contains(w)))
  }

  /** R2 — completeness: hard gates on title/abstract/authors (any missing
    * ⇒ 0.0), then graded bonuses capped at 1.0.
    * Ref: quality_scoring.py:135-164.
    */
  def completenessScore(title: Column, abstractC: Column,
                        authorCount: Column, optionalFields: Column): Column = {
    val missing = title.isNull || trim(title) === "" ||
      abstractC.isNull || trim(abstractC) === "" || authorCount <= 0
    when(missing, 0.0).otherwise(least(lit(1.0),
      when(length(abstractC) > 100, 0.3).otherwise(0.0) +
        when(length(title) > 10, 0.25).otherwise(0.0) +
        lit(0.25) + // authors present (gated above)
        optionalFields.cast("double") * 0.05))
  }

  /** R3 — recency: piecewise decay over days between `publishDate` and the
    * injected `asOf`; unparseable/null date ⇒ 0.3.
    * Ref: quality_scoring.py:166-188.
    */
  def recencyScore(publishDate: Column, asOf: Column): Column = {
    val days = datediff(asOf, publishDate)
    when(publishDate.isNull || days.isNull, 0.3)
      .when(days <= 7, 1.0)
      .when(days <= 30, 0.9)
      .when(days <= 90, 0.8)
      .when(days <= 180, 0.7)
      .when(days <= 365, 0.5)
      .otherwise(greatest(lit(0.1), lit(1.0) - days.cast("double") / 3650.0))
  }

  /** R4 — academic substance: tiered technical-term count + innovation /
    * evaluation / theory keyword-group hits, capped at 1.0.
    * Ref: quality_scoring.py:190-235.
    */
  def substanceScore(abstractC: Column, techTermCount: Column): Column = {
    val termTier = when(techTermCount >= 8, 0.4)
      .when(techTermCount >= 5, 0.3)
      .when(techTermCount >= 3, 0.2)
      .when(techTermCount >= 1, 0.1).otherwise(0.0)
    val innov = keywordHits(abstractC, innovationWords)
    val innovTier = when(innov >= 3, 0.3).when(innov >= 2, 0.2)
      .when(innov >= 1, 0.1).otherwise(0.0)
    val ev = keywordHits(abstractC, evaluationWords)
    val evTier = when(ev >= 2, 0.2).when(ev >= 1, 0.1).otherwise(0.0)
    val theory = when(keywordHits(abstractC, theoryWords) >= 1, 0.1).otherwise(0.0)
    least(lit(1.0), termTier + innovTier + evTier + theory)
  }

  /** R5 — methodological rigor: method/metric keyword groups.
    * Ref: quality_scoring.py:237-272.
    */
  def rigorScore(abstractC: Column): Column = {
    val m = keywordHits(abstractC, methodWords)
    val mt = when(m >= 3, 0.5).when(m >= 2, 0.35).when(m >= 1, 0.2).otherwise(0.0)
    val k = keywordHits(abstractC, metricWords)
    val kt = when(k >= 3, 0.5).when(k >= 2, 0.35).when(k >= 1, 0.2).otherwise(0.0)
    least(lit(1.0), mt + kt)
  }

  /** R6 — impact potential: application keyword group + length signal.
    * Ref: quality_scoring.py:274-304.
    */
  def impactScore(abstractC: Column): Column = {
    val a = keywordHits(abstractC, applicationWords)
    val at = when(a >= 3, 0.6).when(a >= 2, 0.4).when(a >= 1, 0.2).otherwise(0.0)
    least(lit(1.0), at + when(length(abstractC) > 500, 0.2).otherwise(0.1))
  }

  /** Topic terms driving R7. The reference receives these from the
    * search query (quality_scoring.py:306); here a pinned list chosen so
    * the corpus exercises every branch: common terms, a rare term
    * ("dup"), and one that never occurs ("quantum").
    */
  val topicTerms: Seq[String] =
    Seq("vector", "stream", "window", "join", "dup", "quantum")

  /** R7 — domain relevance: topic-term match ratio over title+abstract
    * (substring containment, as the reference), cs.* category bonus,
    * capped title-match bonus. Empty term list ⇒ neutral 0.5.
    * Ref: quality_scoring.py:306-327.
    */
  def relevanceScore(title: Column, abstractC: Column, categories: Column,
                     terms: Seq[String] = topicTerms): Column =
    if (terms.isEmpty) lit(0.5)
    else {
      val matchRatio =
        keywordHits(concat(title, lit(" "), abstractC), terms)
          .cast("double") / terms.size
      val catScore =
        when(exists(categories, c => lower(c).contains("cs.")), 0.3)
          .otherwise(0.1)
      val titleScore =
        least(lit(0.2), keywordHits(title, terms).cast("double") * 0.1)
      least(lit(1.0), matchRatio * 0.5 + catScore + titleScore)
    }

  /** R8 — penalty: short abstract/title, suspicious patterns, duplicate
    * flag; capped at 0.5. The reference's `<50 ⇒ 0.4` branch is
    * unreachable after `<100` (quality_scoring.py:329-361) — pinned as-is
    * by checking `<100` first.
    */
  def penalty(title: Column, abstractC: Column, isDuplicate: Column): Column =
    least(lit(0.5),
      when(length(abstractC) < 100, 0.2).otherwise(0.0) +
        when(length(title) < 10, 0.1).otherwise(0.0) +
        when(abstractC.rlike("(?i)(lorem ipsum|xxx+|\\btodo\\b)"), 0.15).otherwise(0.0) +
        when(isDuplicate, 0.3).otherwise(0.0))

  /** R1 — weighted total score, clamped ≥ 0, round3.
    * Ref weights: quality_scoring.py:98-133.
    */
  def totalScore(completeness: Column, recency: Column, substance: Column,
                 rigor: Column, impact: Column, relevance: Column,
                 pen: Column): Column =
    round3(greatest(lit(0.0),
      completeness * 0.15 + recency * 0.20 + substance * 0.30 +
        rigor * 0.25 + impact * 0.10 + relevance * 0.15 - pen))

  /** R10 — tier bucketing. Ref: quality_scoring.py:393-406. */
  def tierOf(score: Column): Column =
    when(score >= 0.8, "Excellent")
      .when(score >= 0.6, "Good")
      .when(score >= 0.4, "Moderate")
      .otherwise("Low")

  /** R9 — confidence: mean of three bounded signals, round3.
    * Ref: quality_scoring.py:363-391.
    */
  def confidence(completeness: Column, abstractC: Column,
                 techTermCount: Column): Column = {
    val absTier = when(length(abstractC) > 300, 1.0)
      .when(length(abstractC) > 100, 0.7).otherwise(0.3)
    val termTier = when(techTermCount >= 5, 1.0)
      .when(techTermCount >= 2, 0.7).otherwise(0.3)
    round3((least(lit(1.0), completeness / 0.15) + absTier + termTier) / 3.0)
  }
}
