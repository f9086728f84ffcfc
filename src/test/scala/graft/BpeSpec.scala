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
    assert(Bpe.trainMergesBatched(f, 10).isEmpty)
  }

  test("batched == sequential on the textbook corpus, at every batch size") {
    val seqMerges = Bpe.trainMerges(freqs, 4)
    for (m <- Seq(1, 2, 4, 64))
      assert(Bpe.trainMergesBatched(freqs, 4, m) == seqMerges, s"batchSize $m")
  }

  test("batched == sequential on a multi-round real corpus, in fewer rounds") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val wf = Bpe.wordFreqs(docs, col("text")).localCheckpoint()
    try {
      val seqMerges = Bpe.trainMerges(wf, 12)
      assert(seqMerges.length == 12) // corpus genuinely has 12 merges
      val (batched, rounds) = Bpe.trainMergesBatchedWithRounds(wf, 12, 64)
      assert(batched == seqMerges)
      // the whole point: many merges land per cycle
      assert(rounds < seqMerges.length, s"rounds=$rounds")
    } finally { wf.unpersist(): Unit }
  }

  test("batched barrier: dependent pairs wait for the round that creates them") {
    // (a,b) dominates; its descendants must not jump the queue. "xaby"
    // corpus: (a,b):12, then the merges (ab,y) and (x,aby) only exist
    // after the previous one lands, forcing 3 rounds.
    val f = Seq(("xaby", 8L), ("ab", 4L)).toDF("word", "freq")
    val seqMerges = Bpe.trainMerges(f, 3)
    assert(seqMerges == Seq(("a", "b"), ("ab", "y"), ("x", "aby")))
    val (batched, rounds) = Bpe.trainMergesBatchedWithRounds(f, 3, 64)
    assert(batched == seqMerges)
    assert(rounds == 3)
  }

  test("segment == jvmSegment across edge cases (parity, incl. non-BMP)") {
    val merges = Bpe.trainMerges(freqs, 4)
    // 😀/𝕏 are surrogate pairs: a UTF-16 code-unit split would produce
    // lone surrogates here and diverge from the code-point substr path
    val words = Seq("newest", "lowest", "low", "wider", "x", "", "aaa",
      "estest", "ees", "😀😀est", "a𝕏b", "😀")
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
    // same rule on surrogate-pair symbols
    val me = Seq(("😀", "😀"))
    assert(Bpe.jvmSegment("😀😀😀", me) == Seq("😀😀", "😀"))
    val gotE = rows(Seq("😀😀😀").toDF("w")
      .select(Bpe.segment($"w", me).as("s"))).head.getSeq[String](0)
    assert(gotE == Seq("😀😀", "😀"))
  }

  test("native BpeEncode == declarative encode == per-token jvmSegment") {
    val merges = Bpe.trainMerges(freqs, 4)
    val docs = Seq("the newest widest thing", "lower low lowest",
      "你好 newest 世界", "", "  ", "aaa estest").toDF("text")
    val bound = docs.select($"text",
      graft.functions.TextAnalysis.tokens($"text").as("toks"))
    val got = rows(bound.select(
      graft.expressions.BpeEncode($"text", merges).as("n"),
      Bpe.encodeDeclarative($"toks", merges).as("d")))
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString)
    }
    // and against the JVM twin token-by-token
    val enc = rows(docs.select(
      graft.expressions.BpeEncode($"text", merges).as("n"), $"text"))
    enc.foreach { r =>
      val expected = graft.functions.TextAnalysis.jvmTokens(r.getString(1))
        .toSeq.flatMap(t => Bpe.jvmSegment(t, merges))
      assert(r.getSeq[String](0) == expected, r.getString(1))
    }
  }

  test("BpeEncode handles null, codegen and interpreted paths agree") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    val df = Seq(Some("abc abx"), None).toDF("text")
    val out = rows(df.select(
      graft.expressions.BpeEncode($"text", merges).as("p")))
    assert(out(0).getSeq[String](0) == Seq("abc", "ab", "x"))
    assert(out(1).isNullAt(0))
    // interpreted (no-codegen) path
    val interp = graft.expressions.BpeEncode.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc abx"),
      Array("a", "ab"), Array("b", "c"), Array("ab", "abc"))
    assert(interp.map(_.toString).toSeq == Seq("abc", "ab", "x"))
  }

  test("wordFreqs is one corpus pass producing the training table") {
    val df = Seq("the cat sat", "the cat").toDF("t")
    val f = rows(Bpe.wordFreqs(df, $"t").orderBy($"word"))
      .map(r => (r.getString(0), r.getLong(1)))
    assert(f == Seq(("cat", 2L), ("sat", 1L), ("the", 2L)))
  }
}
