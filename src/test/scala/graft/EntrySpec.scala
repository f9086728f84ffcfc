package graft

/** Guards the driver's smoke contract: entry() on sf0.001 returns rows. */
class EntrySpec extends SparkSpec {
  test("flagship entry query returns non-empty per-language stats") {
    val out = SparkEntry.entry(spark)
    assert(out.columns.toSeq ==
      Seq("lang", "n_docs", "avg_words", "avg_chars"))
    val n = out.count()
    assert(n > 0 && n <= 10)
  }
}
