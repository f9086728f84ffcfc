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

  test("bench mins line stays tail-safe at 220 queries (and beyond)") {
    // The driver keeps only the last ~2000 chars of stdout and parses
    // the FINAL line; the mins line sits directly above it, so their
    // combined length must stay under the tail at any suite size. Pin
    // the self-bounding encoder at 220 synthetic queries with
    // realistic ids/timings, and at the real suite's names.
    def fake(n: Int): Seq[(String, Double)] =
      (0 until n).map(i => (s"tq${i}_some_long_query_name", i * 0.137))
    val at220 = Bench.minsLine(fake(220))
    assert(at220.length < 1800, s"len=${at220.length}")
    assert(at220.contains("\"fmt\":\"csv\""), at220.take(80))
    // small suites keep the self-describing packed pairs
    val at100 = Bench.minsLine(fake(100))
    assert(at100.contains("\"fmt\":\"packed\"") && at100.length < 1750)
    // the real suite, whatever its current size
    val real = Bench.minsLine(
      SparkEntry.queries.keys.toSeq.map(k => (k, 5.0)))
    assert(real.length < 1800, s"len=${real.length}")
    // short ids must be unique or the packed/csv keying is ambiguous
    val shorts = SparkEntry.queries.keys.toSeq.map(Bench.short)
    assert(shorts.distinct.size == shorts.size, "short ids must be unique")
  }
}
