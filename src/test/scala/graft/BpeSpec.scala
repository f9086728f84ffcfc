package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic Sennrich et al. BPE example corpus (word, freq)
  private def freqs = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)
  ).toDF("word", "freq")

  test("trainMerges learns the textbook merge sequence deterministically") {
    val merges = Bpe.trainMerges(freqs, 4)
    // (e,s) and (s,t) tie at 9 — lexicographic tiebreak picks (e,s);
    // then (es,t) 9; (l,o) and (o,w) tie at 7 — (l,o); then (lo,w) 7.
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    // deterministic across runs
    assert(Bpe.trainMerges(freqs, 4) == merges)
  }

  test("trainMerges stops early when no pair repeats") {
    val f = Seq(("abc", 1L), ("def", 1L)).toDF("word", "freq")
    assert(Bpe.trainMerges(f, 10).isEmpty)
  }

  test("segment == jvmSegment across edge cases (parity)") {
    val merges = Bpe.trainMerges(freqs, 4)
    val words = Seq("newest", "lowest", "low", "wider", "x", "", "aaa",
      "estest", "ees")
    val got = rows(words.toDF("w")
      .select(Bpe.segment($"w", merges).as("s")))
      .map(_.getSeq[String](0).toList)
    val expected = words.map(w => Bpe.jvmSegment(w, merges).toList)
    assert(got == expected)
    // spot-check the semantics, not just parity
    assert(Bpe.jvmSegment("newest", merges) == Seq("n", "e", "w", "est"))
    assert(Bpe.jvmSegment("low", merges) == Seq("low"))
  }

  test("left-to-right non-overlapping merge: aaa + (a,a) -> [aa, a]") {
    val m = Seq(("a", "a"))
    assert(Bpe.jvmSegment("aaa", m) == Seq("aa", "a"))
    val got = rows(Seq("aaa").toDF("w")
      .select(Bpe.segment($"w", m).as("s"))).head.getSeq[String](0)
    assert(got == Seq("aa", "a"))
  }

  test("wordFreqs is one corpus pass producing the training table") {
    val df = Seq("the cat sat", "the cat").toDF("t")
    val f = rows(Bpe.wordFreqs(df, $"t").orderBy($"word"))
      .map(r => (r.getString(0), r.getLong(1)))
    assert(f == Seq(("cat", 2L), ("sat", 1L), ("the", 2L)))
  }
}
