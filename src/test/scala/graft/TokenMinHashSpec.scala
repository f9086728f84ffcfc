package graft

import graft.expressions.TokenMinHash
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class TokenMinHashSpec extends SparkSpec {
  import spark.implicits._

  test("native minhash signature is bit-identical to the declarative chain") {
    val texts = Seq(
      "spark is a unified analytics engine for large scale data",
      "short text", "one", "",
      "repeat repeat repeat repeat repeat",
      "  padded   whitespace   tokens everywhere  ",
      // CJK: no-whitespace runs tokenize per-character; glued ASCII
      // stays its own token
      "我在中国大学学习",
      "mixed 中文 and english了text")
    val df = texts.toDF("t")
    val native = df.select(
      TokenMinHash($"t", 3, Dedup.minhashCoeffs(16)).as("sig"))
    val declarative = df.select(
      Dedup.minhashSignature(Dedup.shingles($"t", 3), 16).as("sig"))
    val a = col0[collection.Seq[Long]](native)
    val b = col0[collection.Seq[Long]](declarative)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("null input yields null signature") {
    val df = Seq(Option("x"), None).toDF("t")
    val got = rows(df.select(TokenMinHash($"t", 3, Dedup.minhashCoeffs(4))))
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0))
  }
}
