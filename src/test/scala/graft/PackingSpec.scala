package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  // Skewed-language corpus: one dominant language (85% of docs), a tail,
  // gappy non-contiguous ids, and token counts spanning 0..~bin size so
  // bins split mid-doc both ways.
  private def corpus = {
    val rnd = new scala.util.Random(7)
    Seq.tabulate(600) { i =>
      val lang = if (rnd.nextInt(100) < 85) "en"
                 else Seq("zh", "de", "fr")(rnd.nextInt(3))
      (i.toLong * 3 + rnd.nextInt(2), lang, rnd.nextInt(300).toLong)
    }.toDF("doc_id", "lang", "n_tok")
  }

  test("bucketed starts equal single-window starts across bucket widths") {
    val d = corpus
    val want = Packing.packedStarts(d, $"lang", $"doc_id", $"n_tok")
      .collect().map(_.toString).sorted.toSeq
    for (w <- Seq(1L, 7L, 64L, 512L, 100000L)) {
      val got = Packing
        .packedStartsBucketed(d, $"lang", $"doc_id", $"n_tok", w)
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, s"bucketWidth=$w diverged")
    }
  }

  test("packBins rolls up identically on both paths") {
    val d = corpus
    val a = Packing.packBins(
      Packing.packedStarts(d, $"lang", $"doc_id", $"n_tok"), 256L)
      .collect().map(_.toString).sorted.toSeq
    val b = Packing.packBins(
      Packing.packedStartsBucketed(d, $"lang", $"doc_id", $"n_tok", 32L), 256L)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("start offsets are the prefix sums in doc_id order per language") {
    val got = Packing
      .packedStartsBucketed(corpus, $"lang", $"doc_id", $"n_tok", 16L)
      .orderBy($"lang", $"doc_id")
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    got.groupBy(_._1).foreach { case (_, rows) =>
      var run = 0L
      rows.sortBy(_._2).foreach { case (_, _, n, start) =>
        assert(start == run)
        run += n
      }
    }
  }

  test("zero-token and empty-group edges") {
    val d = Seq((1L, "en", 0L), (2L, "en", 5L), (3L, "en", 0L))
      .toDF("doc_id", "lang", "n_tok")
    val got = Packing.packedStartsBucketed(d, $"lang", $"doc_id", $"n_tok", 2L)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    // zero-length docs occupy no tokens: starts are 0, 0, 5
    assert(got.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 5L)))
  }
}
