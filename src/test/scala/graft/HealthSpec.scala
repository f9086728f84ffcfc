package graft

import graft.operators.Health
import org.apache.spark.sql.functions._

/** Pins the g7/g7x corpus-health contract: the HLL variant differs from
  * the exact variant ONLY in the distinct-token column (every other
  * column bit-identical — the swap touches one block), and the estimate
  * stays within HLL error of exact.
  */
class HealthSpec extends SparkSpec {
  import spark.implicits._

  // Two strata, three days, repeated phrasing so heavy hitters and
  // quality scores are non-degenerate.
  private def docs = (0 until 600).map { i =>
    val lang = if (i % 3 == 0) "en" else "zh"
    val words = (0 until (5 + i % 40)).map(j => s"w${(i + j) % 90}")
    (i.toLong, lang, ("the common tail. " * (1 + i % 3)) + words.mkString(" "))
  }.toDF("doc_id", "lang", "text")

  private def health(hll: Boolean) =
    Health.corpusHealth(docs, $"lang", pmod($"doc_id", lit(3)), $"text",
      distinctViaHll = hll)

  test("HLL variant matches exact variant on every non-distinct column") {
    val ex = rows(health(hll = false).drop("distinct_toks")
      .orderBy($"stratum", $"day"))
    val ap = rows(health(hll = true).drop("distinct_toks")
      .orderBy($"stratum", $"day"))
    assert(ex.nonEmpty && ex == ap)
  }

  test("HLL distinct estimate within 5% of exact per (stratum, day)") {
    def m(hll: Boolean) = rows(health(hll)
        .select($"stratum", $"day", $"distinct_toks"))
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = m(hll = false)
    val est = m(hll = true)
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, v) =>
      assert(math.abs(est(k).toDouble / v - 1) < 0.05, s"$k: ${est(k)} vs $v")
    }
  }

  test("dashboard invariants: shares in [0,1], quantile bounds ordered, top token is support-heavy") {
    rows(health(hll = false)).foreach { r =>
      val lo = r.getAs[Double]("low_quality_share")
      assert(lo >= 0.0 && lo <= 1.0)
      val p50 = r.getAs[Long]("p50_tok_lo")
      val p90 = r.getAs[Long]("p90_tok_lo")
      val p99 = r.getAs[Long]("p99_tok_lo")
      assert(p50 <= p90 && p90 <= p99 && p99 < r.getAs[Long]("p99_tok_hi"))
      // 1/200 support on a corpus stuffed with "the": top token exists
      // and its count clears the support threshold on its day's mass.
      assert(r.getAs[String]("top_tok") != null)
      assert(r.getAs[Long]("top_tok_cnt") > 0L)
    }
  }
}
