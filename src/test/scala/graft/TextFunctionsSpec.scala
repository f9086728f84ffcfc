package graft

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("cleanText strips latex, entities, non-ascii, collapses whitespace") {
    val in = Seq(
      "\\textbf{Attention} is $O(n^2)$ &amp; café   neat",
      "plain  text",
      "").toDF("t")
    val out = col0[String](in.select(TF.cleanText($"t")))
    // \textbf{Attention} -> " ", $O(n^2)$ -> " ", &amp; -> " ", café é -> " "
    assert(out == Seq("is caf neat", "plain text", ""))
  }

  test("stripLatex removes braced commands and bare commands") {
    val in = Seq("\\cite{x} and \\alpha rest $a+b$ end").toDF("t")
    val out = col0[String](in.select(TF.normalizeWhitespace(TF.stripLatex($"t"))))
    assert(out == Seq("and rest end"))
  }

  test("wordCount counts \\w+ runs; sentenceCount splits on [.!?]+") {
    val in = Seq(("one two three", "A. B! C? "), ("", "")).toDF("w", "s")
    val got = rows(in.select(TF.wordCount($"w"), TF.sentenceCount($"s")))
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(got == Seq((3, 3), (0, 0)))
  }

  test("tokenSet lowercases, distincts, keeps first occurrence order") {
    val in = Seq("B b a A c").toDF("t")
    val out = col0[collection.Seq[String]](in.select(TF.tokenSet($"t")))
    assert(out.head == Seq("b", "a", "c"))
  }

  test("truncateEllipsis appends ... only past the limit") {
    val in = Seq("abcdef", "abc").toDF("t")
    val out = col0[String](in.select(TF.truncateEllipsis($"t", 4)))
    assert(out == Seq("abcd...", "abc"))
  }

  test("clamp bounds values; scoreOfString parses '5.21/10'") {
    val in = Seq((-1.0, "5.21/10"), (11.0, "7/10"), (5.0, "x")).toDF("v", "s")
    val got = rows(in.select(TF.clamp($"v", 0, 10), TF.scoreOfString($"s")))
      .map(r => (r.getDouble(0), Option(r.get(1))))
    assert(got == Seq((0.0, Some(5.21)), (10.0, Some(7.0)), (5.0, None)))
  }

  test("titleHash is md5 of lower(trim())") {
    val in = Seq("  Hello World  ", "hello world").toDF("t")
    val out = col0[String](in.select(TF.titleHash($"t")))
    assert(out.distinct.size == 1)
    assert(out.head == "5eb63bbbe01eeed093cb22bb8f5acdc3")
  }

  test("citationMatches finds bracketed digit refs") {
    val in = Seq("as shown in [12] and [3,4] but not [ref]").toDF("t")
    val out = col0[collection.Seq[String]](in.select(TF.citationMatches($"t")))
    assert(out.head == Seq("[12]", "[3,4]"))
  }

  test("keywordOverlap counts shared distinct tokens") {
    val in = Seq(("what is attention", "attention is all you need")).toDF("q", "a")
    val out = col0[Int](in.select(TF.keywordOverlap($"q", $"a")))
    assert(out.head == 2) // attention, is
  }

  test("piiMatches detects emails and maskPii hides the middle") {
    val in = Seq("contact a.user@example.com or x@y.io now").toDF("t")
    val hits = col0[collection.Seq[String]](in.select(TF.piiMatches($"t", "email")))
    assert(hits.head == Seq("a.user@example.com", "x@y.io"))
    val masked = col0[String](
      in.select(TF.maskPii(element_at(TF.piiMatches($"t", "email"), 1))))
    assert(masked.head == "a.***om")
  }

  test("embeddingText builds the labeled multi-field doc") {
    val in = Seq(("T", Seq("A", "B"), "abs")).toDF("title", "authors", "abstract")
    val out = col0[String](in.select(TF.embeddingText($"title", $"authors", $"abstract")))
    assert(out.head == "Paper Title: T\nAuthors: A, B\nAbstract: abs")
  }

  test("urlHost / urlNormalize: case, tracking params, fragments, slashes, no-host passthrough") {
    def norm(u: String): String = col0[String](
      Seq(u).toDF("u").select(TF.urlNormalize($"u"))).head
    def host(u: String): Option[String] = rows(
      Seq(u).toDF("u").select(TF.urlHost($"u"))).headOption
      .flatMap(r => Option(r.getString(0)))
    assert(host("HTTPS://Ads.Example.COM/x") == Some("ads.example.com"))
    assert(host("not a url") == None)
    // scheme+host lowercase, path case preserved
    assert(norm("HTTPS://Ex.ORG/Path") == "https://ex.org/Path")
    // tracking params stripped wherever they sit; real params survive
    assert(norm("http://a.b/p?utm_source=x&id=7") == "http://a.b/p?id=7")
    assert(norm("http://a.b/p?id=7&utm_campaign=x&fbclid=9") == "http://a.b/p?id=7")
    assert(norm("http://a.b/p?gclid=1") == "http://a.b/p")
    // fragment and trailing slashes go
    assert(norm("http://a.b/deep/path//#frag") == "http://a.b/deep/path")
    // no host → returned untouched
    assert(norm("not a url") == "not a url")
  }

  test("hostBlocked: exact and subdomain suffix match only; NULL host never blocked") {
    val bl = Seq("tracker.com", "spam.example.net")
    val in = Seq(Some("tracker.com"), Some("ads.tracker.com"),
      Some("xtracker.com"), Some("spam.example.net"),
      Some("example.net"), None).toDF("h")
    val out = col0[Boolean](in.select(TF.hostBlocked($"h", bl)))
    assert(out == Seq(true, true, false, true, false, false))
  }

  test("nfcNormalize composes; nfkcNormalize also folds compatibility forms") {
    val cases = Seq(
      "cafe\u0301",        // e + combining acute: NFC composes to \u00e9
      "nai\u0308ve",       // i + combining diaeresis
      "\ufb01le",          // fi ligature (NFKC folds to "file"; NFC keeps)
      "\uff21\uff22\uff23", // fullwidth ABC (NFKC folds to ASCII)
      "x\u00b2",           // superscript two (NFKC folds to x2)
      "already plain ascii",
      "",
      "\ud83d\ude00 emoji\u0301" // non-BMP + trailing combining mark
    )
    val df = cases.toDF("s")
    val nfc = col0[String](df.select(TF.nfcNormalize($"s")))
    val nfkc = col0[String](df.select(TF.nfkcNormalize($"s")))
    import java.text.Normalizer
    cases.zipWithIndex.foreach { case (s, i) =>
      assert(nfc(i) == Normalizer.normalize(s, Normalizer.Form.NFC), s"NFC $s")
      assert(nfkc(i) == Normalizer.normalize(s, Normalizer.Form.NFKC),
        s"NFKC $s")
    }
    assert(nfc(0) == "caf\u00e9") // composed, one code point
    assert(nfkc(2) == "file" && nfc(2) == "\ufb01le")
    assert(nfkc(3) == "ABC" && nfkc(4) == "x2")
    // idempotence and null passthrough
    val twice = col0[String](df.select(TF.nfkcNormalize(TF.nfkcNormalize($"s"))))
    assert(twice == nfkc)
    val n = col0[String](Seq(Option.empty[String]).toDF("s")
      .select(TF.nfcNormalize($"s")))
    assert(n == Seq(null))
  }
}
