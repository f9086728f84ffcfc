package graft

import graft.expressions.SimHash16
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class SimHash16Spec extends SparkSpec {
  import spark.implicits._

  test("native simhash is bit-identical to the declarative chain") {
    val texts = Seq(
      "alpha beta gamma", "  spaced   out  tokens ", "MIXED Case Words",
      "alpha alpha alpha beta", "one", "", "   ",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z",
      "我在中国大学学习", "mixed 中文 and english了text")
    val got = rows(texts.toDF("t").select(
      SimHash16($"t"), Dedup.simhash16($"t")))
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r))
  }

  test("null passes through; fingerprint fits in 16 bits") {
    val df = Seq(Option("x y z"), None).toDF("t")
    val got = rows(df.select(SimHash16($"t")))
    assert(got(0).getInt(0) >= 0 && got(0).getInt(0) < 65536)
    assert(got(1).isNullAt(0))
  }

  test("near-duplicate texts land at small Hamming distance") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = a + " tonight"  // one extra token
    val got = rows(Seq((a, b)).toDF("a", "b").select(
      bit_count(SimHash16($"a").bitwiseXOR(SimHash16($"b")).cast("long"))))
    assert(got(0).getInt(0) <= 4)
  }
}
