package graft

import graft.functions.{TextAnalysis => TA}
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("languageId recognizes real-language snippets by marker stopwords") {
    val in = Seq(
      "the cat sat on the mat and it is happy",
      "der Hund ist nicht mit der Katze auf dem Sofa",
      "le chat est dans la maison et les souris dansent",
      "el perro es una mascota con los gatos para el parque",
      "机器学习是人工智能的一个分支",
      "xyzzy plugh").toDF("t")
    val out = col0[String](in.select(TA.languageId($"t")))
    assert(out == Seq("en", "de", "fr", "es", "zh", "und"))
  }

  test("tokenCount / bpeTokenCount / ratios on a known sentence") {
    val in = Seq("The quick, brown fox! It is fast.").toDF("t")
    val r = rows(in.select(
      TA.tokenCount($"t"), TA.bpeTokenCount($"t"),
      round(TA.stopwordRatio($"t"), 4), round(TA.punctRatio($"t"), 4),
      round(TA.typeTokenRatio($"t"), 4))).head
    assert(r.getInt(0) == 7)
    // 'The',' quick',',',' brown',' fox','!',' It',' is',' fast','.'
    assert(r.getInt(1) == 10)
    assert(r.getDouble(2) == 0.4286) // the, it, is / 7
    assert(r.getDouble(3) == 0.0909) // , ! . = 3 of 33 chars
    assert(r.getDouble(4) == 1.0)
  }

  test("CJK text tokenizes per-character; glued ASCII stays its own token") {
    val in = Seq(
      "我在中国",                 // pure CJK run → 4 per-char tokens
      "学中文mix中文 words",      // ASCII glued between CJK runs
      "plain ascii words").toDF("t")
    val out = col0[collection.Seq[String]](in.select(TA.tokens($"t")))
    assert(out(0) == Seq("我", "在", "中", "国"))
    assert(out(1) == Seq("学", "中", "文", "mix", "中", "文", "words"))
    assert(out(2) == Seq("plain", "ascii", "words"))
    // word counts no longer degenerate to ~1 token per CJK doc
    val n = col0[Int](in.select(TA.tokenCount($"t")))
    assert(n == Seq(4, 7, 3))
  }

  test("empty text yields zeros and 'und'") {
    val in = Seq("").toDF("t")
    val r = rows(in.select(TA.tokenCount($"t"), TA.stopwordRatio($"t"),
      TA.punctRatio($"t"), TA.languageId($"t"))).head
    assert(r.getInt(0) == 0 && r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
    assert(r.getString(3) == "und")
  }

  test("qualityScore ranks prose above keyword soup and repetition") {
    val prose = "The experiment shows that the model is robust, and it " +
      "generalizes well to unseen data with small variance in the results."
    val soup = "spark hash join merge sort agg scan filter window batch"
    val repeat = "data data data data data data data data data data"
    val in = Seq(prose, soup, repeat).toDF("t")
    val out = col0[Double](in.select(TA.qualityScore($"t")))
    assert(out(0) > out(1) && out(1) > out(2))
    assert(out.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("fingerprint is order-sensitive and stable") {
    val in = Seq("alpha beta gamma", "alpha beta gamma", "gamma beta alpha").toDF("t")
    val out = col0[Long](in.select(TA.fingerprint($"t")))
    assert(out(0) == out(1))
    assert(out(0) != out(2))
    assert(out.forall(h => h >= 0 && h < 1000000007L))
  }

  test("charNgrams and ngramJaccard") {
    val in = Seq(("abcd", "abcd"), ("abcd", "bcde"), ("ab", "zz")).toDF("a", "b")
    val grams = col0[collection.Seq[String]](in.limit(1).select(TA.charNgrams($"a", 3)))
    assert(grams.head == Seq("abc", "bcd"))
    val sims = col0[Double](in.select(TA.ngramJaccard($"a", $"b", 3)))
    assert(sims(0) == 1.0)
    assert(math.abs(sims(1) - 1.0 / 3.0) < 1e-12) // {abc,bcd} vs {bcd,cde}
    assert(sims(2) == 0.0)
  }

  test("repetition signals: top-token and duplicate-bigram fractions") {
    val df = Seq("a a a b", "x", "", "w w w w").toDF("t")
      .select(TA.tokens($"t").as("toks"))
    val got = rows(df.select(
      TA.topTokenFraction($"toks"), TA.dupBigramFraction($"toks")))
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(got(0)._1 == 0.75)
    assert(math.abs(got(0)._2 - 1.0 / 3.0) < 1e-12) // aa, aa, ab → 1 repeat of 3
    assert(got(1) == (1.0, 0.0))
    assert(got(2) == (0.0, 0.0))
    assert(got(3) == (1.0, 1.0 - 1.0 / 3.0)) // all bigrams identical
  }

  test("unigramLogProb: hand-computed corpus model, tokenless docs drop") {
    val df = Seq((1L, "a a b"), (2L, "b c"), (3L, "")).toDF("id", "t")
    // corpus: a×2, b×2, c×1, total 5
    val out = rows(TA.unigramLogProb(df, $"id", $"t", "id")
      .orderBy($"id"))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(x => (x._1, x._2)) == Seq((1L, 3L), (2L, 2L)))
    val exp1 = (2 * math.log(2 / 5.0) + math.log(2 / 5.0)) / 3
    val exp2 = (math.log(2 / 5.0) + math.log(1 / 5.0)) / 2
    // tolerance = the 2^-20 per-entry quantization grid that makes the
    // per-doc sum order-exact (r11), plus detLn's ~1e-12 series error
    assert(math.abs(out(0)._3 - exp1) < 1.5e-6)
    assert(math.abs(out(1)._3 - exp2) < 1.5e-6)
    // repeated rare-token soup scores strictly below common prose
    assert(exp2 < exp1)
  }

  test("bigramLogProb: hand-computed interpolated model, short docs drop") {
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x"), (4L, ""))
      .toDF("id", "t")
    // bigram table: (a,b)=3, (b,a)=1; ctx a=3, b=1; cont b=3, a=1; tot=4
    val out = rows(TA.bigramLogProb(df, $"id", $"t", 0.75, "id")
      .orderBy($"id"))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(x => (x._1, x._2)) == Seq((1L, 3L), (2L, 1L)))
    val pab = 0.75 * (3 / 3.0) + 0.25 * (3 / 4.0)
    val pba = 0.75 * (1 / 1.0) + 0.25 * (1 / 4.0)
    val exp1 = (2 * math.log(pab) + math.log(pba)) / 3
    val exp2 = math.log(pab)
    // 2^-20 grid tolerance (see unigramLogProb)
    assert(math.abs(out(0)._3 - exp1) < 1.5e-6)
    assert(math.abs(out(1)._3 - exp2) < 1.5e-6)
    // the unseen-context penalty: doc 1 carries the rarer (b,a) bigram
    assert(exp1 < exp2)
  }

  test("topTokenFraction: linear sorted-run form == brute-force twin") {
    val texts = Seq(
      "a a a b",                                     // simple repetition
      "the quick brown fox jumps over the lazy dog", // prose, one repeat
      "机器学习是机器智能的分支 机器 learning",         // CJK per-char + ASCII mix
      "data data data data data data data data",     // degenerate repeat
      "x",                                           // single token
      "",                                            // empty
      "z y x w v u t s r q p o n m l k j i h g")     // all-distinct, reverse-sorted
    val df = texts.toDF("t").select(TA.tokens($"t").as("toks"))
    val got = rows(df.select(
      TA.topTokenFraction($"toks"), TA.topTokenFractionBrute($"toks")))
    got.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"linear ${r.getDouble(0)} != brute ${r.getDouble(1)}")
    }
  }

  test("charDiversity: known entropies and exact Simpson values") {
    def d(t: String): (Long, Double, Double) = {
      val r = rows(Seq(t).toDF("t")
        .select(TA.charDiversity($"t").as("x"))
        .select($"x.n_chars", $"x.entropy", $"x.simpson")).head
      (r.getLong(0), r.getDouble(1), r.getDouble(2))
    }
    assert(d("aaaa") == ((4L, 0.0, 1.0)))            // one symbol
    assert(d("abab") == ((4L, 1.0, 1.0 / 3)))        // two symbols 2+2
    assert(d("abcd") == ((4L, 2.0, 0.0)))            // uniform distinct
    // 1 char: entropy 0, simpson guard (n>1) → 0
    assert(d("q") == ((1L, 0.0, 0.0)))
    // mixed: entropy of {a:2, b:1, c:1} = 1.5 bits
    assert(d("abca") == ((4L, 1.5, 2.0 / 12)))
    // empty text has zero chars (split("") would claim one)
    assert(d("") == ((0L, 0.0, 0.0)))
  }

  test("corpusDivergence: zero for identical strata, symmetric and positive for disjoint") {
    // identical distributions: p == q bitwise → JS exactly 0
    val same = Seq(("x", "a b c a"), ("y", "a b c a")).toDF("s", "t")
    val js0 = rows(TA.corpusDivergence(same, $"s", $"t").orderBy($"stratum"))
      .map(r => (r.getString(0), r.getDouble(2)))
    assert(js0 == Seq(("x", 0.0), ("y", 0.0)))
    // equal-size disjoint vocabularies: both strata sit at the same
    // analytic distance from the mixture:
    // 0.5·log2(4/3) + 0.25·log2(2/3) + 0.25
    val disj = Seq(("x", "a b c d"), ("y", "e f g h")).toDF("s", "t")
    val js1 = rows(TA.corpusDivergence(disj, $"s", $"t").orderBy($"stratum"))
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expected = 0.5 * math.log(4.0 / 3) / math.log(2) +
      0.25 * math.log(2.0 / 3) / math.log(2) + 0.25
    js1.foreach { case (_, n, js) =>
      assert(n == 4L && math.abs(js - expected) < 1e-12, js1)
    }
    assert(js1.head._3 == js1.last._3)
  }

  test("CharDiversity native == declarative bit-for-bit") {
    val texts = Seq("the quick brown fox", "aaaa bbbb", "", "x",
      "机器学习是机器智能的分支 机器 learning",
      "mixed CASE with   spaces\tand\nnewlines 12345!!")
    val df = texts.toDF("t")
    val native = rows(df.select(
      graft.expressions.CharDiversity($"t").as("x"))
      .select($"x.n_chars", $"x.entropy", $"x.simpson"))
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val decl = rows(df.select(TA.charDiversity($"t").as("x"))
      .select($"x.n_chars", $"x.entropy", $"x.simpson"))
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(native == decl)
  }

  test("TokenCount native == declarative size(tokens) incl. nulls") {
    val texts = Seq("the quick brown fox", "", "   \t\n ", "x",
      "机器学习是机器智能的分支 机器 learning",
      "İstanbul STRASSE ß İİ", // case-fold length changes (İ → i̇)
      "a-b c_d e.f 1,2", null)
    val df = texts.toDF("t")
    val native = rows(df.select(TA.tokenCount($"t").as("n")))
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    val decl = rows(df.select(TA.tokenCountDecl($"t").as("n")))
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(native == decl)
    assert(native.contains(None), "null text must stay null")
    // and on real corpus text, row-for-row
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cmp = d.select(
      TA.tokenCount($"text").as("a"), TA.tokenCountDecl($"text").as("b"))
      .filter($"a" =!= $"b").count()
    assert(cmp == 0L)
  }

  test("syllableCount: vowel-group runs, case-folded; text-wide == per-word sum") {
    val got = rows(Seq(
      "The quick brown fox",    // e + ui + o + o = 4 runs
      "BEAUTIFUL day",          // eau + i + u (+ ay) = 4 runs, case-folded
      "xkcd 123",               // no vowels
      ""
    ).toDF("t").select(TA.syllableCount($"t"))).map(_.getInt(0))
    assert(got == Seq(4, 4, 0, 0))
    // per-word sum equals the text-wide count (runs can't span spaces)
    val text = "some reasonably varied sentence with words"
    val whole = rows(Seq(text).toDF("t")
      .select(TA.syllableCount($"t"))).head.getInt(0)
    val perWord = text.split(" ").map(w =>
      "[aeiouy]+".r.findAllIn(w.toLowerCase).size).sum
    assert(whole == perWord)
  }

  test("duplicate-unit fractions: hand-computed lines and paragraphs") {
    def stats(text: String, delim: String) = rows(
      Seq(text).toDF("t")
        .select(TA.textUnits($"t", delim).as("us"))
        .select(size($"us"), TA.dupUnitFraction($"us"),
          TA.dupUnitCharFraction($"us")))
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).head
    // 4 lines, "dup" twice: line frac 1/4; chars 3+6+3+4=16, dup 3
    assert(stats("dup\nunique\ndup\ntail", "\n") == (4, 0.25, 3.0 / 16))
    // blank + whitespace-only lines are not units
    assert(stats("a\n\n   \na", "\n") == (2, 0.5, 0.5))
    // no duplicates → both zero
    assert(stats("a\nbb\nccc", "\n") == (3, 0.0, 0.0))
    // empty text → zero units, guarded fractions
    assert(stats("", "\n") == (0, 0.0, 0.0))
    // one huge paragraph twice: para frac 1/2 but char frac dominates
    val para = "long paragraph " * 10
    val (n, uf, cf) = stats(s"$para\n\n$para\n\nx", "\n{2,}")
    assert(n == 3 && math.abs(uf - 1.0 / 3) < 1e-12)
    assert(cf > 0.45 && cf < 0.5, s"char frac $cf")
    // trim before comparing: padded copies are still duplicates
    assert(stats("  x\nx  ", "\n") == (2, 0.5, 0.5))
  }
  test("ta21 code detector: symbol class + whole-token keywords separate code from prose") {
    val df = Seq(
      "def main ( ) { return 0 ; } import sys ; class a { var x = 1 ; }",
      "the quick brown fox jumps over the lazy dog",
      "classical reasoning defies imported returns").toDF("text")
    val out = rows(df.select(TA.codeSymbolCount($"text").as("s"),
      TA.markerHits($"text", TA.codeKeywords).as("k")))
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(out(0)._1 == 10 && out(0)._2 == 5)
    assert(out(1) == ((0, 0)))
    // keyword hits are whole tokens: classical/defies/imported do not count
    assert(out(2) == ((0, 0)))
  }

  test("gopherCounts/gopherLineCounts: hand-computed integer counts") {
    val text = "the cat... sat # on be mats\n- bullet one\nplain..."
    val df = Seq(text).toDF("t")
      .select($"t", TA.tokens($"t").as("toks"))
    val g = rows(df.select(TA.gopherCounts($"t", $"toks").as("g"))
      .select($"g.n_words", $"g.sum_word_len", $"g.n_alpha",
        $"g.n_req_stops", $"g.n_symbols")).head
    // tokens: the cat... sat # on be mats - bullet one plain...
    assert(g.getLong(0) == 11L)
    assert(g.getLong(1) == 3 + 6 + 3 + 1 + 2 + 2 + 4 + 1 + 6 + 3 + 8)
    assert(g.getLong(2) == 9L) // all but '#' and '-'
    assert(g.getLong(3) == 2L)  // the, be; none of the other six
    assert(g.getLong(4) == 3L)  // one '#', two '...'
    val l = rows(df.select(TA.gopherLineCounts($"t").as("l"))
      .select($"l.n_lines", $"l.n_bullet", $"l.n_ellipsis_end")).head
    assert((l.getLong(0), l.getLong(1), l.getLong(2)) == ((3L, 1L, 1L)))
    // '....' counts ONE ellipsis (non-overlapping); '…' counts too;
    // '•' bullets and '…'-ended lines count
    val g2 = rows(Seq("w.... x… y\n• z…").toDF("t")
      .select($"t", TA.tokens($"t").as("toks"))
      .select(TA.gopherCounts($"t", $"toks").as("g"),
        TA.gopherLineCounts($"t").as("l"))
      .select($"g.n_symbols", $"l.n_bullet", $"l.n_ellipsis_end")).head
    assert((g2.getLong(0), g2.getLong(1), g2.getLong(2)) == ((3L, 1L, 1L)))
  }
}
