package graft

import graft.operators.{Align, Compliance, Ruler}
import org.apache.spark.sql.functions._

class RulerComplianceSpec extends SparkSpec {
  import spark.implicits._

  test("completenessScore gates on missing title/abstract/authors") {
    val df = Seq(
      ("A sufficiently long title", "x" * 150, 2, 2), // full bonuses
      ("", "x" * 150, 2, 2),                          // missing title
      ("A sufficiently long title", "x" * 150, 0, 0)  // no authors
    ).toDF("title", "abs", "n_auth", "n_opt")
    val out = col0[Double](df.select(Ruler.completenessScore(
      $"title", $"abs", $"n_auth", $"n_opt")))
    assert(out(0) == 0.9) // 0.3 + 0.25 + 0.25 + 2*0.05
    assert(out(1) == 0.0 && out(2) == 0.0)
  }

  test("recencyScore piecewise decay with null fallback") {
    val asOf = lit("2026-08-12").cast("date")
    val df = Seq("2026-08-10", "2026-07-20", "2020-01-01", null)
      .toDF("d")
    val out = col0[Double](df.select(
      Ruler.recencyScore($"d".cast("date"), asOf)))
    assert(out(0) == 1.0) // 2 days
    assert(out(1) == 0.9) // 23 days
    assert(out(2) > 0.1 && out(2) < 0.5) // ~2415 days: 1 - d/3650
    assert(out(3) == 0.3) // null date
  }

  test("penalty caps at 0.5 and pins the reference's <100-first branch") {
    val df = Seq(
      ("short", "tiny abstract", true),     // 0.2 + 0.1 + 0.3 -> capped 0.5
      ("a proper title here", "y" * 200, false)
    ).toDF("title", "abs", "dup")
    val out = col0[Double](df.select(Ruler.penalty($"title", $"abs", $"dup")))
    assert(out == Seq(0.5, 0.0))
  }

  test("totalScore clamps at zero; tierOf buckets") {
    val df = Seq((0.0, 0.3, 0.0, 0.0, 0.1, 0.5, 0.5)).toDF("c", "r", "s", "g", "i", "rel", "p")
    val out = col0[Double](df.select(Ruler.totalScore(
      $"c", $"r", $"s", $"g", $"i", $"rel", $"p")))
    assert(out.head == 0.0) // 0.06+0.01+0.075-0.5 < 0 -> clamped
    val tiers = col0[String](Seq(0.85, 0.65, 0.45, 0.1).toDF("s")
      .select(Ruler.tierOf($"s")))
    assert(tiers == Seq("Excellent", "Good", "Moderate", "Low"))
  }

  test("relevanceScore: term ratio, cs.* bonus, capped title matches") {
    val terms = Seq("vector", "stream", "quantum")
    val df = Seq(
      // 2/3 terms in text, both in title, cs category:
      // 2/3*0.5 + 0.3 + min(0.2, 2*0.1) = 0.8333...
      ("vector stream title", "vector stream body", Seq("cs.DB", "x")),
      // no terms, no cs: 0 + 0.1 + 0 = 0.1
      ("plain title", "plain body", Seq("stat.ME")),
      // all 3 in text, 3 title matches capped at 0.2, no cs:
      // 0.5 + 0.1 + 0.2 = 0.8
      ("vector stream quantum", "vector stream quantum", Seq("math.ST"))
    ).toDF("title", "abs", "cats")
    val out = col0[Double](df.select(
      Ruler.relevanceScore($"title", $"abs", $"cats", terms)))
    assert(math.abs(out(0) - (2.0 / 3 * 0.5 + 0.3 + 0.2)) < 1e-12)
    assert(out(1) == 0.1)
    assert(out(2) == 0.8)
    // empty term list => neutral 0.5
    val neutral = col0[Double](df.select(
      Ruler.relevanceScore($"title", $"abs", $"cats", Nil)))
    assert(neutral.forall(_ == 0.5))
  }

  test("keywordHits counts distinct group members present") {
    val df = Seq("We propose a novel method with experiments").toDF("t")
    assert(col0[Int](df.select(
      Ruler.keywordHits($"t", Ruler.innovationWords))).head == 2) // novel, propose
  }

  test("riskLevel escalates correctly") {
    val df = Seq(
      (0, 0, 0, 1, 0), (2, 1, 0, 0, 0), (1, 0, 0, 0, 0), (0, 0, 0, 0, 0)
    ).toDF("e", "p", "i", "s", "c")
    val out = col0[String](df.select(
      Compliance.riskLevel($"e", $"p", $"i", $"s", $"c")))
    assert(out == Seq("critical", "high", "medium", "low"))
  }

  test("qualityIssues builds compacted issue arrays; severity rolls up") {
    val df = Seq(
      ("ok title long", "x" * 200, "2026-01-01"),
      ("", "x" * 200, "2026-01-01"),
      ("tiny", "short", "bad-date")
    ).toDF("title", "abs", "ds")
    val issues = df.select(
      Compliance.qualityIssues($"title", $"abs", $"ds").as("iss"))
    val out = col0[collection.Seq[String]](issues)
    assert(out(0) == Seq.empty)
    assert(out(1).contains("missing_title"))
    assert(out(2).toSet ==
      Set("title_too_short", "abstract_too_short", "invalid_date"))
    val sev = col0[String](issues.select(Compliance.severity($"iss")))
    assert(sev == Seq("none", "high", "medium"))
  }

  test("alignTo projects to fixed schema with defaults") {
    val df = Seq((1L, Some("en")), (2L, None)).toDF("id", "lang")
    val out = Align.alignTo(df, Seq(
      "id" -> lit(-1L), "lang" -> lit("und"), "extra" -> lit("d")))
    assert(out.columns.toSeq == Seq("id", "lang", "extra"))
    assert(rows(out.orderBy($"id")).map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      == Seq((1L, "en", "d"), (2L, "und", "d")))
  }

  test("gate keeps only all-pass rows; gateReasons counts per condition") {
    val df = Seq((10, "a"), (200, "a"), (300, "b")).toDF("n", "s")
    val conds = Seq("big" -> ($"n" >= 100), "is_a" -> ($"s" === "a"))
    assert(col0[Int](Align.gate(df, conds).select($"n")) == Seq(200))
    val r = rows(Align.gateReasons(df, conds)).head
    assert(r.getLong(0) == 3 && r.getLong(1) == 1) // total, kept
    assert(r.getLong(2) == 1 && r.getLong(3) == 1) // drop_big, drop_is_a
  }
}
