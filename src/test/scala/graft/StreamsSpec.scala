package graft

import graft.streaming.Streams
import graft.streaming.Streams.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val evs = Seq(
    Event(1, ts("2026-01-01 10:00:00"), 1, "click", 1.0),
    Event(2, ts("2026-01-01 10:10:00"), 1, "click", 2.0),
    Event(3, ts("2026-01-01 11:30:00"), 1, "view", 4.0), // >30min gap: new session
    Event(4, ts("2026-01-01 10:05:00"), 2, "click", 8.0))

  test("dedupStream keeps first arrival per key across batches within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streams.dedupStream(input.toDF(), Seq("event_id"), "10 minutes")
      .writeStream.format("memory").queryName("dds").outputMode("append").start()
    try {
      input.addData(evs: _*)
      q.processAllAvailable()
      // same keys again, different values: duplicates within the
      // watermark must not re-emit
      input.addData(evs.map(e => e.copy(value = e.value + 100)): _*)
      q.processAllAvailable()
      val got = rows(spark.sql(
        "SELECT event_id, value FROM dds ORDER BY event_id"))
        .map(r => (r.getLong(0), r.getDouble(1)))
      assert(got == Seq((1L, 1.0), (2L, 2.0), (3L, 4.0), (4L, 8.0)))
    } finally q.stop()
  }

  test("windowedTypeCounts aggregates a memory stream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streams.windowedTypeCounts(input.toDF(), "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("wtc").outputMode("complete").start()
    try {
      input.addData(evs: _*)
      q.processAllAvailable()
      val got = rows(spark.sql(
        "SELECT event_type, n_events, sum_value FROM wtc ORDER BY event_type"))
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      // 10:00 window: 3 clicks (1+2+8); 11:00 window: 1 view
      assert(got == Seq(("click", 3L, 11.0), ("view", 1L, 4.0)))
    } finally q.stop()
  }

  test("sessionWindowAgg closes sessions after the gap (streaming)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streams.sessionWindowAgg(input.toDF(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("swa").outputMode("complete").start()
    try {
      input.addData(evs: _*)
      q.processAllAvailable()
      val got = rows(spark.sql(
        "SELECT user_id, n_events, sum_value FROM swa ORDER BY user_id, n_events DESC"))
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got == Seq((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)))
    } finally q.stop()
  }

  test("sessionizeStreaming closes sessions inline and via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streams.sessionizeStreaming(input.toDS(), gapMs = 30 * 60 * 1000, "10 minutes")
      .toDF().writeStream
      .format("memory").queryName("sss").outputMode("append").start()
    try {
      // batch 1: user 1 open session; user 2 single-event session
      input.addData(
        Event(1, ts("2026-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2026-01-01 10:10:00"), 1, "click", 2.0),
        Event(3, ts("2026-01-01 10:05:00"), 2, "view", 8.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM sss").head().getLong(0) == 0)

      // batch 2: user 1 event far beyond the gap -> closes session inline;
      // also advances the watermark past user 2's timeout
      input.addData(Event(4, ts("2026-01-01 14:00:00"), 1, "click", 4.0))
      q.processAllAvailable()
      // empty batch lets the timeout fire for user 2
      input.addData(Event(5, ts("2026-01-01 15:00:00"), 3, "click", 0.5))
      q.processAllAvailable()

      val got = rows(spark.sql(
        "SELECT user_id, n_events, sum_value FROM sss ORDER BY user_id"))
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.contains((1L, 2L, 3.0)))  // user 1 first session, closed inline
      assert(got.contains((2L, 1L, 8.0)))  // user 2, closed by timeout
    } finally q.stop()
  }

  test("qualityDrift: streaming windows equal the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (ts("2024-01-01 10:05:00"), "the quick brown fox jumps over the lazy dog again and again today"),
      (ts("2024-01-01 10:20:00"), "x"),
      (ts("2024-01-01 11:10:00"), "a much longer and perfectly reasonable document with the usual share of common words in it"),
      (ts("2024-01-01 11:40:00"), "zz qq pp"))
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val q = Streams.qualityDrift(
        input.toDF().toDF("ts", "text"), $"ts", $"text",
        windowLen = "1 hour", qualityFloor = 0.5)
      .writeStream.format("memory").queryName("qd")
      .outputMode("complete").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val stream = rows(spark.sql(
        "SELECT * FROM qd ORDER BY window_start"))
      val batch = rows(Streams.qualityDrift(
          docs.toDF("ts", "text"), $"ts", $"text",
          windowLen = "1 hour", qualityFloor = 0.5)
        .orderBy($"window_start"))
      assert(stream == batch)
      assert(stream.size == 2)
      // the 10:00 window carries the degenerate "x" doc below the floor
      assert(stream.head.getLong(1) == 2L)
      assert(stream.head.getDouble(4) == 0.5)
    } finally q.stop()
  }

  test("sessionizeStateful matches sessionizeBatch on the same input") {
    val ds = evs.toDS()
    val stateful = rows(Streams.sessionizeStateful(ds, gapMs = 30 * 60 * 1000).toDF()
      .select($"user_id", $"start_us", $"end_us", $"n_events", $"sum_value")
      .orderBy($"user_id", $"start_us"))
    val batch = rows(Streams.sessionizeBatch(ds.toDF(), gapSeconds = 30 * 60)
      .select($"user_id", $"start_us", $"end_us", $"n_events", $"sum_value")
      .orderBy($"user_id", $"start_us"))
    assert(stateful == batch)
    assert(stateful.size == 3)
  }

  test("annIngestSink: lands corpus, commit-gated append, recall-gated rebuild tick") {
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    def v(a: Double, b: Double, c: Double, d: Double) =
      Seq(a, b, c, d).map(_.toFloat)
    // the IVF-PQ maintenance geometry: base cluster + stale k=1 books
    // (every code collapses, ADC degenerates to lowest-doc_id picks)
    val baseData = Seq((1L, v(0.9, 0.1, 0.8, 0.2)),
      (2L, v(0.88, 0.12, 0.82, 0.18)), (3L, v(0.92, 0.08, 0.78, 0.22)))
    val driftData = Seq((10L, v(0.12, 0.88, 0.18, 0.82)),
      (11L, v(0.1, 0.9, 0.2, 0.8)), (12L, v(0.08, 0.92, 0.22, 0.78)))
    val base = baseData.toDF("id", "vec")
    val cents = Seq((0L, Seq(0.9, 0.1, 0.8, 0.2)),
      (1L, Seq(0.1, 0.9, 0.2, 0.8)))
    val staleBooks = Similarity.pqCodebooks(base, $"id", $"vec",
      m = 2, subDim = 2, k = 1, iters = 2)
    val root = Scratch.dir("ann_sink")
    val idx = s"$root/ivfpq"
    val corpusDir = s"$root/corpus"
    val ticksDir = s"$root/ticks"
    val rebuildBase = s"$root/rebuilds"
    Similarity.saveIvfPqIndex(base, $"id", $"vec", cents, staleBooks, 2,
      idx, targetRows = 100L, spread = 2)
    // the base corpus lands BEFORE streaming starts: the exact recall
    // pass reads corpusDir as the raw-vector source of truth
    base.select($"id".cast("long").as("doc_id"),
        $"vec".cast("array<float>").as("dv"))
      .write.parquet(s"$corpusDir/b=-1")
    val input = MemoryStream[(Long, Seq[Float])]
    val q = Streams.annIngestSink(input.toDF().toDF("id", "vec"),
      "id", "vec", idx, corpusDir, ticksDir, rebuildBase,
      k = 2, nprobe = 2, rerank = 3, recallFloor = 0.9,
      m = 2, subDim = 2, kCodes = 2, iters = 2,
      targetRows = 100L, spread = 2).start()
    val lateData = Seq((20L, v(0.11, 0.91, 0.21, 0.79)),
      (21L, v(0.09, 0.89, 0.17, 0.83)))
    try {
      input.addData(driftData.map { case (i, vv) => (i, vv.toSeq) }: _*)
      q.processAllAvailable()
      // batch 1: the sink must FOLLOW its own tick — append and probe
      // the REBUILT index, not the stale original
      input.addData(lateData.map { case (i, vv) => (i, vv.toSeq) }: _*)
      q.processAllAvailable()
    } finally q.stop()
    // the batch landed and the index appended one committed segment
    assert(spark.read.parquet(s"$corpusDir/b=0").count() == 3L)
    // the tick measured the stale-book collapse and rebuilt
    val tick = rows(spark.read.parquet(s"$ticksDir/b=0")).head
    assert(tick.getAs[Boolean]("rebuilt"), tick.toString)
    assert(tick.getAs[Double]("mean_recall") < 0.9, tick.toString)
    val servePath = tick.getAs[String]("serve_path")
    assert(servePath == s"$rebuildBase/b=0", servePath)
    // batch 1 CUT OVER to its own tick's serve path: its segment landed
    // in the REBUILT index — base build is seg -1, batch 0 appended
    // seg 0 to the original, batch 1 appended seg 1 to the rebuild —
    // and its tick probed the rebuild (its serve path continues the
    // rebuild lineage whatever the recall verdict; ADC ties on this
    // tiny two-cluster geometry make the verdict itself unpinned)
    val tick1 = rows(spark.read.parquet(s"$ticksDir/b=1")).head
    assert(Set(servePath, s"$rebuildBase/b=1")
      .contains(tick1.getAs[String]("serve_path")), tick1.toString)
    def segs(p: String) = Option(new java.io.File(s"$p/commits").listFiles)
      .toSeq.flatten.map(_.getName).filter(_.startsWith("k="))
      .map(_.drop(2).toLong).toSet
    assert(segs(servePath) == Set(-1L, 1L), segs(servePath).toString)
    assert(segs(idx) == Set(-1L, 0L), segs(idx).toString)
    // the rebuilt index reaches full recall over the WHOLE landed
    // corpus (base + both batches) once rerank covers the tied
    // candidate lists — the ADC chooses candidates, exact orders them
    val corpus = spark.read.parquet(corpusDir)
    val queries = driftData.toDF("qid", "qv")
    val approx = Similarity.ivfPqTopK(spark, servePath, corpus,
      $"doc_id", $"dv", queries, $"qid", $"qv",
      k = 2, nprobe = 2, rerank = 8)
    val exact = Similarity.topKPerQuery(corpus, $"doc_id", $"dv",
      queries, $"qid", $"qv", k = 2)
    val rec = rows(Similarity.recallAtK(approx, exact, 2))
      .map(_.getDouble(3))
    assert(rec.nonEmpty && rec.forall(_ == 1.0), rec.toString)
  }
}
