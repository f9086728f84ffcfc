package graft

import graft.expressions.TokenFingerprint
import graft.functions.{TextAnalysis => TA}
import org.apache.spark.sql.functions._

class TokenFingerprintSpec extends SparkSpec {
  import spark.implicits._

  test("native fingerprint is bit-identical to the declarative chain") {
    val texts = Seq(
      "alpha beta gamma", "  spaced   out  tokens ", "MIXED Case Words",
      "one", "", "a b c d e f g h i j k l m n o p",
      "我在中国大学学习", "mixed 中文 and english了text")
    val got = rows(texts.toDF("t").select(
      TokenFingerprint($"t"), TA.fingerprint($"t")))
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("null input yields null; bounded below the modulus") {
    val df = Seq(Option("x y z"), None).toDF("t")
    val got = rows(df.select(TokenFingerprint($"t")))
    assert(got(0).getLong(0) >= 0 && got(0).getLong(0) < 1000000007L)
    assert(got(1).isNullAt(0))
  }
}
