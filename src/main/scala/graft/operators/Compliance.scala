package graft.operators

import graft.functions.{TextFunctions => TF, TextAnalysis => TA}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Provenance / PII / compliance operators — SURVEY.md §2.10 C1–C5,
  * re-expressing Data_Analysis/provenance_compliance.py:91-336. All pure
  * column expressions (regex detectors + when-chains): per-row cost,
  * shuffle-free, safe to fuse into a 100 TB scan.
  */
object Compliance {

  /** C1 — record fingerprint: md5 over a fixed field order. The reference
    * hashes sorted-key JSON (provenance_compliance.py:91-102); the stable
    * contract is "fixed serialization of the identity fields", pinned here
    * as `|`-joined values (null ⇒ empty).
    */
  def fingerprint(fields: Column*): Column =
    md5(concat_ws("|", fields: _*))

  /** C3 — per-type PII hit counts over a text column. */
  def piiCount(text: Column, kind: String): Column =
    size(TF.piiMatches(text, kind))

  /** C3 — risk level from per-type counts (max-severity wins).
    * Ref: provenance_compliance.py:245-265.
    */
  def riskLevel(nEmail: Column, nPhone: Column, nIp: Column,
                nSsn: Column, nCred: Column): Column =
    when(nSsn > 0 || nCred > 0, "critical")
      .when(nEmail + nPhone > 2, "high")
      .when(nEmail + nPhone > 0 || nIp > 0, "medium")
      .otherwise("low")

  /** C3 — pii_density = total hits / word count (0 when no words).
    * Ref: provenance_compliance.py:258-263.
    */
  def piiDensity(totalHits: Column, wordCount: Column): Column =
    when(wordCount > 0, totalHits.cast("double") / wordCount).otherwise(lit(0.0))

  /** C2 — the reference's paper fingerprint: md5 over the exact
    * `json.dumps(..., sort_keys=True)` serialization of the four
    * identity fields (keys sorted: arxiv_id, first_author,
    * publish_date, title). Callers pass clean derived fields — values
    * must not require JSON string escaping.
    * Ref: provenance_compliance.py:91-102.
    */
  def paperFingerprint(title: Column, firstAuthor: Column,
                       publishDate: Column, arxivId: Column): Column =
    md5(concat(
      lit("{\"arxiv_id\": \""), arxivId,
      lit("\", \"first_author\": \""), firstAuthor,
      lit("\", \"publish_date\": \""), publishDate,
      lit("\", \"title\": \""), title, lit("\"}")))

  /** C2 — provenance struct append. The reference stamps
    * `datetime.now()` (provenance_compliance.py:106); determinism here
    * comes from the injected `asOf`.
    * Ref: provenance_compliance.py:104-146.
    */
  def provenance(paperId: Column, url: Column, fp: Column,
                 asOf: Column): Column =
    struct(
      struct(lit("arXiv").as("platform"), paperId.as("identifier"),
        url.as("url"), lit("arxiv-py API").as("retrieval_method"))
        .as("source"),
      struct(lit("1.0.0").as("pipeline_version"),
        asOf.as("processing_date"),
        typedLit(Seq("arxiv_crawling", "text_cleaning", "quality_scoring",
          "provenance_tracking")).as("processing_steps"),
        fp.as("fingerprint")).as("processing"),
      struct(asOf.as("original_crawl_time"), asOf.as("enhancement_date"),
        lit(1).as("version")).as("history"),
      struct(lit("JSONL").as("format"), lit("UTF-8").as("encoding"),
        lit("1.0").as("schema_version")).as("metadata"))

  /** License restrictiveness ladder, least → most restrictive — the
    * lattice the c8 rollup maxes over (a packed training sequence
    * inherits its most restrictive member's license; index ≥ 5 ⇒
    * restricted for commercial training). Shared by the Spark query
    * and the DuckDB oracle so the two cannot drift.
    */
  val licenseLadder: Seq[String] = Seq("public-domain", "mit",
    "apache-2.0", "cc-by", "cc-by-sa", "cc-by-nc", "proprietary")

  /** C2 — licensing struct append. Ref: provenance_compliance.py:148-185. */
  def licensing(paperId: Column): Column =
    struct(
      lit("arXiv.org perpetual, non-exclusive license").as("source_license"),
      struct(lit("arXiv.org License").as("name"),
        lit("https://arxiv.org/licenses/nonexclusive-distrib/1.0/license.html")
          .as("url"),
        lit("1.0").as("version")).as("license_details"),
      typedLit(Seq("academic_research", "text_analysis",
        "machine_learning_training", "non_commercial_analysis"))
        .as("allowed_uses"),
      typedLit(Seq("commercial_use_may_require_additional_permissions",
        "no_redistribution_as_is", "attribution_required"))
        .as("restrictions"),
      struct(lit(true).as("required"),
        lit("Cite original arXiv publication and mention data processing")
          .as("format"),
        concat(lit("Data sourced from arXiv paper "), paperId,
          lit(", processed via AI Research Pipeline")).as("suggested_format"))
        .as("attribution_requirements"),
      struct(lit(true).as("source_compliant"),
        lit(true).as("data_use_compliant"),
        lit(false).as("attribution_satisfied")).as("compliance_status"))

  /** C4 — copyright heuristics: platform and journal-mention flags.
    * Ref: provenance_compliance.py:267-293.
    */
  def isArxivUrl(url: Column): Column = url.contains("arxiv.org")
  def mentionsJournal(comments: Column): Column =
    lower(comments).contains("journal")

  /** C5 — quality-issue list: build the (possibly empty) issues array from
    * independent checks; nulls compacted away.
    * Ref: provenance_compliance.py:295-336.
    */
  def qualityIssues(title: Column, abstractC: Column, dateStr: Column): Column =
    array_compact(array(
      when(title.isNull || trim(title) === "", "missing_title"),
      when(length(title) < 8, "title_too_short"),
      when(abstractC.isNull || trim(abstractC) === "", "missing_abstract"),
      when(length(abstractC) < 120, "abstract_too_short"),
      when(dateStr.isNotNull &&
        try_to_timestamp(dateStr, lit("yyyy-MM-dd")).isNull,
        "invalid_date")))

  /** C5 — severity rollup over the issues array. */
  def severity(issues: Column): Column =
    when(array_contains(issues, "missing_title") ||
      array_contains(issues, "missing_abstract"), "high")
      .when(size(issues) >= 2, "medium")
      .when(size(issues) === 1, "low")
      .otherwise("none")
}
