package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private def noisy(base: Array[Float], eps: Float): Seq[Float] =
    base.map(x => x + eps * rnd.nextFloat()).toSeq

  // two well-separated cluster centers in 16-d
  private val b1 = Array.tabulate(16)(i => if (i < 8) 1.0f else 0.0f)
  private val b2 = Array.tabulate(16)(i => if (i >= 8) 1.0f else 0.0f)

  private lazy val corpusData = Seq(
    (1L, noisy(b1, 0.001f)), (2L, noisy(b1, 0.001f)), (3L, noisy(b1, 0.001f)),
    (4L, noisy(b2, 0.001f)), (5L, noisy(b2, 0.001f)))
  private def corpus = corpusData.toDF("id", "v")
  private lazy val queryData =
    Seq((100L, noisy(b1, 0.001f)), (200L, noisy(b2, 0.001f)))

  test("hyperplanes are deterministic and in [-1,1)") {
    val p1 = Similarity.hyperplanes(4, 8)
    val p2 = Similarity.hyperplanes(4, 8)
    assert(p1 == p2)
    assert(p1.flatten.forall(x => x >= -1.0 && x < 1.0))
    // not degenerate: mixed signs
    assert(p1.flatten.exists(_ > 0) && p1.flatten.exists(_ < 0))
  }

  test("nearDupPairsExact finds exactly the intra-cluster pairs") {
    val pairs = rows(Similarity.nearDupPairsExact(corpus, $"id", $"v", 0.99)
      .select($"id_a", $"id_b").orderBy($"id_a", $"id_b"))
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs == Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
  }

  test("nearDupPairsLsh matches the exact baseline on near-identical vectors") {
    val exact = rows(Similarity.nearDupPairsExact(corpus, $"id", $"v", 0.99)
      .select($"id_a", $"id_b").orderBy($"id_a", $"id_b"))
      .map(r => (r.getLong(0), r.getLong(1)))
    val lsh = rows(Similarity.nearDupPairsLsh(corpus, $"id", $"v", 0.99, dim = 16)
      .select($"id_a", $"id_b").orderBy($"id_a", $"id_b"))
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(lsh == exact)
  }

  test("ivfTopK achieves full recall when clusters align with centroids") {
    // centroids ARE the cluster bases; docs are noisy cluster members
    val centroids = Seq((0L, b1.toSeq), (1L, b2.toSeq)).toDF("cid", "cv")
    val queries = queryData.toDF("qid", "qv")
    val ivf = rows(Similarity.ivfTopK(
      corpus, $"id", $"v", queries, $"qid", $"qv",
      centroids, $"cid", $"cv", k = 3, nprobe = 1)
      .orderBy($"query_id", $"rank"))
      .map(r => (r.getLong(0), r.getLong(1)))
    // query 100 probes only cluster b1 -> finds exactly docs 1-3
    assert(ivf.filter(_._1 == 100L).map(_._2).toSet == Set(1L, 2L, 3L))
    assert(ivf.filter(_._1 == 200L).map(_._2).toSet == Set(4L, 5L))
    // nprobe = all centroids degenerates to brute force
    val brute = rows(Similarity.topKPerQuery(
      corpus, $"id", $"v", queries, $"qid", $"qv", k = 3)
      .orderBy($"query_id", $"rank")).map(r => (r.getLong(0), r.getLong(1)))
    val full = rows(Similarity.ivfTopK(
      corpus, $"id", $"v", queries, $"qid", $"qv",
      centroids, $"cid", $"cv", k = 3, nprobe = 2)
      .orderBy($"query_id", $"rank")).map(r => (r.getLong(0), r.getLong(1)))
    assert(full == brute)
  }

  test("persisted IVF index probes match ivfTopK and prune unprobed lists") {
    val cents = Seq((0L, b1.map(_.toDouble).toSeq), (1L, b2.map(_.toDouble).toSeq))
    val queries = queryData.toDF("qid", "qv")
    val idx = Scratch.dir("ivf_idx") + "/ivf"
    Similarity.saveIvfIndex(corpus, $"id", $"v", cents, idx,
      targetRows = 100L, spread = 2)
    val centroids = cents.toDF("cid", "cv")
    def proj(df: org.apache.spark.sql.DataFrame) =
      rows(df.orderBy($"query_id", $"rank"))
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val live = proj(Similarity.ivfTopK(
      corpus, $"id", $"v", queries, $"qid", $"qv",
      centroids, $"cid", $"cv", k = 3, nprobe = 1))
    val indexed = Similarity.ivfTopKIndexed(
      spark, idx, queries, $"qid", $"qv", k = 3, nprobe = 1)
    assert(proj(indexed) == live)
    // single-cluster query set: the list scan must PRUNE to the probed
    // partition — the cid IN (…) literal shows up as a PartitionFilter,
    // and only cluster-0 docs can come back
    val oneQuery = Seq((100L, noisy(b1, 0.001f))).toDF("qid", "qv")
    val pruned = Similarity.ivfTopKIndexed(
      spark, idx, oneQuery, $"qid", $"qv", k = 3, nprobe = 1)
    assert(rows(pruned).map(_.getLong(1)).toSet == Set(1L, 2L, 3L))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"), plan)
  }

  test("filtered IVF probe: allow-set pre-filters candidates, equals filtered brute top-k") {
    val cents = Seq((0L, b1.map(_.toDouble).toSeq),
      (1L, b2.map(_.toDouble).toSeq))
    val idx = Scratch.dir("ivf_filt") + "/ivf"
    Similarity.saveIvfIndex(corpus, $"id", $"v", cents, idx,
      targetRows = 100L, spread = 2)
    val queries = queryData.toDF("qid", "qv")
    val allow = Set(2L, 3L, 5L)
    val got = rows(Similarity.ivfTopKIndexed(spark, idx, queries,
        $"qid", $"qv", k = 3, nprobe = 2,
        allowed = Some(allow.toSeq.toDF("doc_id")))
      .orderBy($"query_id", $"rank")).map(r => (r.getLong(0), r.getLong(1)))
    // nprobe = all lists ⇒ pre-filtered probe must equal brute top-k
    // over the allowed subset exactly
    val brute = rows(Similarity.topKPerQuery(
        corpus.filter($"id".isin(allow.toSeq: _*)), $"id", $"v",
        queries, $"qid", $"qv", k = 3)
      .orderBy($"query_id", $"rank")).map(r => (r.getLong(0), r.getLong(1)))
    assert(got == brute)
    assert(got.map(_._2).toSet.subsetOf(allow),
      "a disallowed doc leaked through the filter")
    // plan guard: cid directory pruning survives the allow-set join
    val plan = Similarity.ivfTopKIndexed(spark, idx, queries, $"qid",
        $"qv", k = 3, nprobe = 1, allowed = Some(allow.toSeq.toDF("doc_id")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // query 100's nearest raw neighbor (doc 1) is disallowed: the
    // filtered ranks 1-2 must be the OTHER cluster-1 members, never
    // doc 1 (the third slot falls across to cluster 2's allowed doc)
    assert(got.filter(_._1 == 100L).take(2).map(_._2).toSet == Set(2L, 3L))
    assert(got.filter(_._1 == 100L).map(_._2) == Seq(2L, 3L, 5L))
  }

  test("IVF-PQ index: codes-only lists, self-describing books, pruned probe, exact rerank") {
    val cents = Seq((0L, b1.map(_.toDouble).toSeq), (1L, b2.map(_.toDouble).toSeq))
    val books = Similarity.pqCodebooks(corpus, $"id", $"v",
      m = 2, subDim = 8, k = 2, iters = 2)
    val idx = Scratch.dir("ivfpq_idx") + "/ivfpq"
    Similarity.saveIvfPqIndex(corpus, $"id", $"v", cents, books, 8, idx,
      targetRows = 100L, spread = 2)
    // the index self-describes: books round-trip exactly
    assert(Similarity.loadPqBooks(spark, idx) == books)
    // lists store the code + norm, NEVER the raw vector (the memory
    // win); seg is the commit-gated append dimension
    assert(spark.read.parquet(s"$idx/lists").schema.fieldNames.toSet ==
      Set("doc_id", "code", "rnorm", "cid", "seg"))
    val queries = queryData.toDF("qid", "qv")
    def proj(df: org.apache.spark.sql.DataFrame) =
      rows(df.orderBy($"query_id", $"rank"))
        .map(r => (r.getLong(0), r.getLong(1)))
    val got = proj(Similarity.ivfPqTopK(spark, idx, corpus, $"id", $"v",
      queries, $"qid", $"qv", k = 3, nprobe = 1, rerank = 3))
    // nprobe=1 on separable clusters: each query sees only its cluster,
    // and the exact rerank orders it identically to brute top-k
    assert(got.filter(_._1 == 100L).map(_._2).toSet == Set(1L, 2L, 3L))
    assert(got.filter(_._1 == 200L).map(_._2).toSet == Set(4L, 5L))
    val brute = proj(Similarity.topKPerQuery(
      corpus, $"id", $"v", queries, $"qid", $"qv", k = 3))
    assert(got.filter(_._1 == 100L) == brute.filter(_._1 == 100L))
    // the probe prunes at the directory level: cid PartitionFilters
    val one = Seq((100L, noisy(b1, 0.001f))).toDF("qid", "qv")
    val plan = Similarity.ivfPqTopK(spark, idx, corpus, $"id", $"v",
        one, $"qid", $"qv", k = 3, nprobe = 1, rerank = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"), plan)
  }

  test("IVF-PQ append is batch-id idempotent and torn segments stay invisible") {
    val cents = Seq((0L, b1.map(_.toDouble).toSeq), (1L, b2.map(_.toDouble).toSeq))
    val books = Similarity.pqCodebooks(corpus, $"id", $"v",
      m = 2, subDim = 8, k = 2, iters = 2)
    val idx = Scratch.dir("ivfpq_idem") + "/ivfpq"
    Similarity.saveIvfPqIndex(corpus.filter($"id" <= 3), $"id", $"v",
      cents, books, 8, idx, targetRows = 100L, spread = 2)
    val batch = corpus.filter($"id" > 3)
    val queries = queryData.toDF("qid", "qv")
    def probe() = rows(Similarity.ivfPqTopK(spark, idx, corpus, $"id",
        $"v", queries, $"qid", $"qv", k = 3, nprobe = 2, rerank = 5)
      .orderBy($"query_id", $"rank"))
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(Similarity.appendIvfPqIndex(spark, idx, batch, $"id", $"v",
      targetRows = 100L, spread = 2, batchId = Some(7L)) == 7L)
    val after = probe()
    def listRows() = spark.read.parquet(s"$idx/lists").count()
    val n1 = listRows()
    // replaying the SAME batch id is a complete no-op
    assert(Similarity.appendIvfPqIndex(spark, idx, batch, $"id", $"v",
      targetRows = 100L, spread = 2, batchId = Some(7L)) == 7L)
    assert(listRows() == n1)
    assert(probe() == after)
    // a torn (uncommitted) segment never reaches readers
    corpus.limit(2).select($"id".as("doc_id"),
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit(0L)).as("code"),
        org.apache.spark.sql.functions.lit(1.0).as("rnorm"))
      .write.parquet(s"$idx/lists/seg=9/cid=0")
    assert(probe() == after)
  }

  test("IVF-PQ maintenance: stale books trip the rebuild; fresh books restore recall") {
    def v(a: Double, b: Double, c: Double, d: Double) =
      Seq(a, b, c, d).map(_.toFloat)
    // base: one tight cluster; kCodes=1 books are the stale-quantizer
    // extreme — EVERY doc encodes to the same code, so ADC ties
    // everywhere and candidate choice degenerates to lowest doc_id
    val baseData = Seq((1L, v(0.9, 0.1, 0.8, 0.2)),
      (2L, v(0.88, 0.12, 0.82, 0.18)), (3L, v(0.92, 0.08, 0.78, 0.22)))
    // appended cluster, far from the books' training data; 12 is its
    // deliberate outlier so exact top-2 = {10, 11}
    val driftData = Seq((10L, v(0.12, 0.88, 0.18, 0.82)),
      (11L, v(0.1, 0.9, 0.2, 0.8)), (12L, v(0.3, 0.7, 0.4, 0.6)))
    val base = baseData.toDF("id", "v")
    val union = (baseData ++ driftData).toDF("id", "v")
    val cents = Seq((0L, Seq(0.9, 0.1, 0.8, 0.2)),
      (1L, Seq(0.1, 0.9, 0.2, 0.8)))
    val staleBooks = Similarity.pqCodebooks(base, $"id", $"v",
      m = 2, subDim = 2, k = 1, iters = 2)
    val idx = Scratch.dir("ivfpq_m1") + "/ivfpq"
    Similarity.saveIvfPqIndex(base, $"id", $"v", cents, staleBooks, 2,
      idx, targetRows = 100L, spread = 2)
    Similarity.appendIvfPqIndex(spark, idx, driftData.toDF("id", "v"),
      $"id", $"v", targetRows = 100L, spread = 2)
    val q = Seq((500L, v(0.11, 0.89, 0.19, 0.81))).toDF("qid", "qv")
    // tick 1: all-tied ADC picks doc_ids 1,2 as rerank candidates while
    // exact wants {10, 11} -> recall 0, floor trips, books retrain
    val out = Scratch.dir("ivfpq_m2") + "/ivfpq"
    def tick(from: String, to: String) =
      Similarity.maintainIvfPqIndex(spark, from, to, union, $"id", $"v",
        q, $"qid", $"qv", k = 2, nprobe = 2, rerank = 2,
        recallFloor = 0.9, m = 2, subDim = 2, kCodes = 2, iters = 2,
        targetRows = 100L, spread = 2)
    val t1 = tick(idx, out)
    assert(t1.rebuilt && t1.servePath == out, t1.toString)
    assert(t1.meanRecall < 0.9, t1.toString)
    // tick 2 against the rebuilt index: kCodes=2 books separate the two
    // clusters, ADC surfaces the drift docs, exact rerank restores
    // recall -> no trigger, serve path unchanged
    val out2 = Scratch.dir("ivfpq_m3") + "/ivfpq"
    val t2 = tick(out, out2)
    assert(!t2.rebuilt && t2.servePath == out, t2.toString)
    assert(t2.meanRecall == 1.0, t2.toString)
    // replayable: the same tick on the same state repeats bit-for-bit
    val out3 = Scratch.dir("ivfpq_m4") + "/ivfpq"
    assert(tick(out, out3) == t2.copy())
  }

  test("maintenance: an empty probe batch is a no-evidence no-op, not a crash") {
    // the annIngestSink recovery/no-data-trigger path: a tick probed
    // with zero queries must neither NPE on avg(recall)=null nor
    // trigger a rebuild on no evidence
    def v(a: Double, b: Double) = Seq(a, b, 0.0, 0.0).map(_.toFloat)
    val base = Seq((1L, v(1, 0)), (2L, v(0, 1)), (3L, v(0.9, 0.1)))
      .toDF("id", "v")
    val cents = Seq((0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0, 0.0)))
    val noQ = Seq.empty[(Long, Seq[Float])].toDF("qid", "qv")
    val idx = Scratch.dir("ivf_mt_e") + "/ivf"
    Similarity.saveIvfIndex(base, $"id", $"v", cents, idx,
      targetRows = 100L, spread = 2)
    val out = Scratch.dir("ivf_mt_eo") + "/ivf"
    val t = Similarity.maintainIvfIndex(spark, idx, out, noQ, $"qid",
      $"qv", k = 2, nprobe = 1, recallFloor = 0.99, kCentroids = 2,
      iters = 2, targetRows = 100L, spread = 2)
    assert(!t.recentered && t.servePath == idx && t.meanRecall == 1.0)
    val books = Similarity.pqCodebooks(base, $"id", $"v",
      m = 2, subDim = 2, k = 2, iters = 2)
    val pidx = Scratch.dir("ivfpq_mt_e") + "/ivfpq"
    Similarity.saveIvfPqIndex(base, $"id", $"v", cents, books, 2, pidx,
      targetRows = 100L, spread = 2)
    val pout = Scratch.dir("ivfpq_mt_eo") + "/ivfpq"
    val tp = Similarity.maintainIvfPqIndex(spark, pidx, pout, base,
      $"id", $"v", noQ, $"qid", $"qv", k = 2, nprobe = 1, rerank = 2,
      recallFloor = 0.99, m = 2, subDim = 2, kCodes = 2, iters = 2,
      targetRows = 100L, spread = 2)
    assert(!tp.rebuilt && tp.servePath == pidx && tp.meanRecall == 1.0)
  }

  test("a replayed triggered tick serves the committed rebuild without touching its files") {
    // streaming replay of a batch whose first attempt COMPLETED the
    // rebuild: external readers may already follow serve_path into
    // outPath, so the replay must cut over again, not delete+rewrite
    def v(a: Double, b: Double, c: Double, d: Double) =
      Seq(a, b, c, d).map(_.toFloat)
    val baseData = Seq((1L, v(0.9, 0.1, 0.8, 0.2)),
      (2L, v(0.88, 0.12, 0.82, 0.18)), (3L, v(0.92, 0.08, 0.78, 0.22)))
    val driftData = Seq((10L, v(0.12, 0.88, 0.18, 0.82)),
      (11L, v(0.1, 0.9, 0.2, 0.8)), (12L, v(0.3, 0.7, 0.4, 0.6)))
    val base = baseData.toDF("id", "v")
    val union = (baseData ++ driftData).toDF("id", "v")
    val cents = Seq((0L, Seq(0.9, 0.1, 0.8, 0.2)),
      (1L, Seq(0.1, 0.9, 0.2, 0.8)))
    val staleBooks = Similarity.pqCodebooks(base, $"id", $"v",
      m = 2, subDim = 2, k = 1, iters = 2)
    val idx = Scratch.dir("ivfpq_rp1") + "/ivfpq"
    Similarity.saveIvfPqIndex(base, $"id", $"v", cents, staleBooks, 2,
      idx, targetRows = 100L, spread = 2)
    Similarity.appendIvfPqIndex(spark, idx, driftData.toDF("id", "v"),
      $"id", $"v", targetRows = 100L, spread = 2)
    val q = Seq((500L, v(0.11, 0.89, 0.19, 0.81))).toDF("qid", "qv")
    val out = Scratch.dir("ivfpq_rp2") + "/ivfpq"
    def tick() =
      Similarity.maintainIvfPqIndex(spark, idx, out, union, $"id", $"v",
        q, $"qid", $"qv", k = 2, nprobe = 2, rerank = 2,
        recallFloor = 0.9, m = 2, subDim = 2, kCodes = 2, iters = 2,
        targetRows = 100L, spread = 2)
    def snapshot(dir: String): Seq[(String, Long, Long)] = {
      val root = java.nio.file.Paths.get(dir)
      val s = java.nio.file.Files.walk(root)
      try s.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => (root.relativize(p).toString,
          java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toSeq.sortBy(_._1)
      finally s.close()
    }
    val t1 = tick()
    assert(t1.rebuilt && t1.servePath == out, t1.toString)
    val before = snapshot(out)
    val t2 = tick()
    assert(t2 == t1, "replay must reach the same decision")
    assert(snapshot(out) == before,
      "replay must not rewrite the committed rebuild")
  }

  test("IVF/IVF-PQ compaction: probe-invariant, one negative generation, append id unpoisoned") {
    val cents = Seq((0L, b1.map(_.toDouble).toSeq),
      (1L, b2.map(_.toDouble).toSeq))
    val queries = queryData.toDF("qid", "qv")
    // IVF flavor
    val idx = Scratch.dir("ivf_compact") + "/ivf"
    Similarity.saveIvfIndex(corpus.filter($"id" <= 3), $"id", $"v", cents,
      idx, targetRows = 100L, spread = 2)
    assert(Similarity.appendIvfIndex(spark, idx, corpus.filter($"id" > 3),
      $"id", $"v", targetRows = 100L, spread = 2, batchId = Some(0L)) == 0L)
    def probe() = rows(Similarity.ivfTopKIndexed(spark, idx, queries,
        $"qid", $"qv", k = 3, nprobe = 2).orderBy($"query_id", $"rank"))
      .map(r => (r.getLong(0), r.getLong(1)))
    val before = probe()
    assert(Similarity.compactIvfIndex(spark, idx, upTo = 0L,
      targetRows = 100L, spread = 2) == Some(-2L))
    assert(probe() == before, "IVF compaction must be probe-invariant")
    assert(new java.io.File(s"$idx/lists").listFiles().map(_.getName)
      .toSet == Set("seg=-2"))
    // nothing left to fold; auto append id clamps past the negative gen
    assert(Similarity.compactIvfIndex(spark, idx, upTo = 99L).isEmpty)
    assert(Similarity.appendIvfIndex(spark, idx,
      Seq((9L, noisy(b1, 0.001f))).toDF("id", "v"), $"id", $"v",
      targetRows = 100L, spread = 2) == 1L)
    // IVF-PQ flavor
    val books = Similarity.pqCodebooks(corpus, $"id", $"v",
      m = 2, subDim = 8, k = 2, iters = 2)
    val pidx = Scratch.dir("ivfpq_compact") + "/ivfpq"
    Similarity.saveIvfPqIndex(corpus.filter($"id" <= 3), $"id", $"v",
      cents, books, 8, pidx, targetRows = 100L, spread = 2)
    assert(Similarity.appendIvfPqIndex(spark, pidx,
      corpus.filter($"id" > 3), $"id", $"v",
      targetRows = 100L, spread = 2, batchId = Some(0L)) == 0L)
    def pqProbe() = rows(Similarity.ivfPqTopK(spark, pidx, corpus, $"id",
        $"v", queries, $"qid", $"qv", k = 3, nprobe = 2, rerank = 5)
      .orderBy($"query_id", $"rank"))
      .map(r => (r.getLong(0), r.getLong(1)))
    val pqBefore = pqProbe()
    assert(Similarity.compactIvfPqIndex(spark, pidx, upTo = 0L,
      targetRows = 100L, spread = 2) == Some(-2L))
    assert(pqProbe() == pqBefore, "IVF-PQ compaction must be probe-invariant")
    assert(Similarity.appendIvfPqIndex(spark, pidx,
      Seq((9L, noisy(b2, 0.001f))).toDF("id", "v"), $"id", $"v",
      targetRows = 100L, spread = 2) == 1L)
  }

  test("compaction racing a same-tick append: late append fully visible, folded-id replay a no-op") {
    // The two halves of the compact-vs-append race, emulated at their
    // deterministic interleaving points (the r11 verdict's task 5):
    // (a) an append whose id is ABOVE the compaction watermark lands
    //     while the compact runs — compact only touches segments ≤
    //     upTo, so the append's segment must survive retirement fully
    //     visible, never silently dropped;
    // (b) a replay of an id the compact already FOLDED arrives after
    //     retirement deleted its commit marker — the hwm water line
    //     must make it a no-op (fully replayed: its rows live in the
    //     merged generation), not a double-append.
    val cents = Seq((0L, b1.map(_.toDouble).toSeq),
      (1L, b2.map(_.toDouble).toSeq))
    val queries = queryData.toDF("qid", "qv")
    val idx = Scratch.dir("ivf_race") + "/ivf"
    Similarity.saveIvfIndex(corpus.filter($"id" <= 2), $"id", $"v", cents,
      idx, targetRows = 100L, spread = 2)
    assert(Similarity.appendIvfIndex(spark, idx,
      corpus.filter($"id" === 3L || $"id" === 4L), $"id", $"v",
      targetRows = 100L, spread = 2, batchId = Some(0L)) == 0L)
    // the "same-tick" append: id 1 > the watermark the compact will use
    assert(Similarity.appendIvfIndex(spark, idx,
      corpus.filter($"id" === 5L), $"id", $"v",
      targetRows = 100L, spread = 2, batchId = Some(1L)) == 1L)
    def indexed() = col0[Long](Similarity.ivfIndexedRows(spark, idx)
      .select($"doc_id").orderBy($"doc_id"))
    val before = indexed()
    // compact folds {-1, 0} only; batch 1 raced in and must survive
    assert(Similarity.compactIvfIndex(spark, idx, upTo = 0L,
      targetRows = 100L, spread = 2) == Some(-2L))
    assert(indexed() == before,
      "an append above the watermark must stay fully visible")
    assert(new java.io.File(s"$idx/lists").listFiles().map(_.getName)
      .toSet == Set("seg=-2", "seg=1"))
    // (b) blind replay of FOLDED batch 0 — marker gone, hwm remembers
    assert(Similarity.appendIvfIndex(spark, idx,
      corpus.filter($"id" === 3L || $"id" === 4L), $"id", $"v",
      targetRows = 100L, spread = 2, batchId = Some(0L)) == 0L)
    assert(indexed() == before, "folded-id replay must not double-append")
    // replay of the still-committed batch 1: the classic marker no-op
    assert(Similarity.appendIvfIndex(spark, idx,
      corpus.filter($"id" === 5L), $"id", $"v",
      targetRows = 100L, spread = 2, batchId = Some(1L)) == 1L)
    assert(indexed() == before)
    // fresh auto id is the water line's successor (monotone), never a
    // reused folded id
    assert(Similarity.appendIvfIndex(spark, idx,
      Seq((9L, noisy(b1, 0.001f))).toDF("id", "v"), $"id", $"v",
      targetRows = 100L, spread = 2) == 2L)
    assert(indexed() == before :+ 9L)
  }

  test("appendIvfIndex: append == rebuild on the union, old files untouched") {
    val cents = Seq((0L, b1.map(_.toDouble).toSeq), (1L, b2.map(_.toDouble).toSeq))
    val queries = queryData.toDF("qid", "qv")
    val batchA = corpusData.take(3).toDF("id", "v")
    val batchB = (corpusData.drop(3) ++
      Seq((6L, noisy(b1, 0.002f)), (7L, noisy(b2, 0.002f)))).toDF("id", "v")
    val union = (corpusData ++
      Seq((6L, noisy(b1, 0.002f)), (7L, noisy(b2, 0.002f)))).toDF("id", "v")
    val inc = Scratch.dir("ivf_inc") + "/ivf"
    val full = Scratch.dir("ivf_full") + "/ivf"
    Similarity.saveIvfIndex(batchA, $"id", $"v", cents, inc,
      targetRows = 100L, spread = 2)
    val listFiles = new java.io.File(s"$inc/lists")
    def files(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(listFiles).map(_.getPath).filter(_.endsWith(".parquet")).toSet
    }
    val before = files()
    Similarity.appendIvfIndex(spark, inc, batchB, $"id", $"v",
      targetRows = 100L, spread = 2)
    // append only ADDS files — the existing list files are immutable
    assert(before.subsetOf(files()), "append must not rewrite old list files")
    Similarity.saveIvfIndex(union, $"id", $"v", cents, full,
      targetRows = 100L, spread = 2)
    def probe(path: String) = rows(Similarity.ivfTopKIndexed(
      spark, path, queries, $"qid", $"qv", k = 4, nprobe = 1)
      .orderBy($"query_id", $"rank"))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(probe(inc) == probe(full))
  }

  test("recallAtK: frozen-centroid append keeps recall 1.0 on separable data") {
    val cents = Seq((0L, b1.map(_.toDouble).toSeq), (1L, b2.map(_.toDouble).toSeq))
    val queries = queryData.toDF("qid", "qv")
    val batchA = corpusData.take(3).toDF("id", "v")
    val batchB = (corpusData.drop(3) ++
      Seq((6L, noisy(b1, 0.002f)), (7L, noisy(b2, 0.002f)))).toDF("id", "v")
    val union = (corpusData ++
      Seq((6L, noisy(b1, 0.002f)), (7L, noisy(b2, 0.002f)))).toDF("id", "v")
    val idx = Scratch.dir("ivf_recall") + "/ivf"
    Similarity.saveIvfIndex(batchA, $"id", $"v", cents, idx,
      targetRows = 100L, spread = 2)
    Similarity.appendIvfIndex(spark, idx, batchB, $"id", $"v",
      targetRows = 100L, spread = 2)
    val approx = Similarity.ivfTopKIndexed(
      spark, idx, queries, $"qid", $"qv", k = 3, nprobe = 1)
    val exact = Similarity.topKPerQuery(
      union, $"id", $"v", queries, $"qid", $"qv", k = 3)
    val rec = rows(Similarity.recallAtK(approx, exact, k = 3)
      .orderBy($"query_id"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // appended batch stays near the frozen centroids → nothing lost
    assert(rec.nonEmpty)
    rec.foreach { case (q, nExact, nHit, recall) =>
      assert(nExact == 3L && nHit == 3L && recall == 1.0, s"query $q: $rec")
    }
    // and the metric actually moves: probing zero lists of the other
    // cluster with a cross-cluster exact set must drop below 1
    val recHalf = rows(Similarity.recallAtK(
      approx.filter($"doc_id" =!= 1L && $"doc_id" =!= 4L), exact, k = 3))
      .map(_.getDouble(3))
    assert(recHalf.exists(_ < 1.0))
  }

  test("recenterIvfIndex restores recall after distribution drift") {
    def v(a: Double, b: Double) = Seq(a, b, 0.0, 0.0).map(_.toFloat)
    // base: two clean clusters matching the frozen centroids
    val base = Seq((1L, v(1, 0)), (2L, v(0, 1)), (4L, v(0.99, 0.01)),
      (5L, v(0.98, 0.02)), (6L, v(0.01, 0.99))).toDF("id", "v")
    // drifted append: a NEW cluster between them — its members split
    // across both frozen lists
    val drift = Seq((3L, v(0.8, 0.75)), (7L, v(0.75, 0.8)),
      (8L, v(0.78, 0.77))).toDF("id", "v")
    val cents = Seq((0L, Seq(1.0, 0.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0, 0.0)))
    val idx = Scratch.dir("ivf_rc") + "/ivf"
    Similarity.saveIvfIndex(base, $"id", $"v", cents, idx,
      targetRows = 100L, spread = 2)
    Similarity.appendIvfIndex(spark, idx, drift, $"id", $"v",
      targetRows = 100L, spread = 2)
    val q = Seq((500L, v(0.77, 0.78))).toDF("qid", "qv")
    val exact = Similarity.topKPerQuery(
      base.unionAll(drift), $"id", $"v", q, $"qid", $"qv", k = 3)
    def recall(path: String): Double = rows(Similarity.recallAtK(
      Similarity.ivfTopKIndexed(spark, path, q, $"qid", $"qv", k = 3, nprobe = 1),
      exact, k = 3)).head.getDouble(3)
    // the v13 signal fires: frozen centroids miss the straddling cluster
    assert(recall(idx) < 1.0)
    val out = Scratch.dir("ivf_rc2") + "/ivf"
    val newCents = Similarity.recenterIvfIndex(spark, idx, out, k = 3, iters = 3)
    assert(newCents.length == 3)
    // re-centered index isolates the new cluster — recall back to 1
    assert(recall(out) == 1.0)
    // old index stayed readable and unchanged throughout
    assert(recall(idx) < 1.0)
  }

  test("maintainIvfIndex: the recall floor gates the re-center; ticks are replayable") {
    def v(a: Double, b: Double) = Seq(a, b, 0.0, 0.0).map(_.toFloat)
    // the recenterIvfIndex drift geometry: a straddling cluster appends
    // against frozen centroids, so the nprobe=1 probe misses part of it
    val base = Seq((1L, v(1, 0)), (2L, v(0, 1)), (4L, v(0.99, 0.01)),
      (5L, v(0.98, 0.02)), (6L, v(0.01, 0.99))).toDF("id", "v")
    val drift = Seq((3L, v(0.8, 0.75)), (7L, v(0.75, 0.8)),
      (8L, v(0.78, 0.77))).toDF("id", "v")
    val cents = Seq((0L, Seq(1.0, 0.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0, 0.0)))
    val idx = Scratch.dir("ivf_pol") + "/ivf"
    Similarity.saveIvfIndex(base, $"id", $"v", cents, idx,
      targetRows = 100L, spread = 2)
    Similarity.appendIvfIndex(spark, idx, drift, $"id", $"v",
      targetRows = 100L, spread = 2)
    val q = Seq((500L, v(0.77, 0.78))).toDF("qid", "qv")
    def tick(path: String, out: String, floor: Double) =
      Similarity.maintainIvfIndex(spark, path, out, q, $"qid", $"qv",
        k = 3, nprobe = 1, recallFloor = floor, kCentroids = 3, iters = 3,
        targetRows = 100L, spread = 2)

    // recall is degraded but clears a lax floor: measure, do NOT rebuild
    val out1 = Scratch.dir("ivf_pol_o1") + "/ivf"
    val lazyTick = tick(idx, out1, floor = 0.1)
    assert(!lazyTick.recentered && lazyTick.servePath == idx
      && lazyTick.centroids.isEmpty)
    assert(lazyTick.meanRecall < 1.0 && lazyTick.meanRecall >= 0.1)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out1)),
      "a no-trigger tick must not write the new index")

    // a strict floor trips: re-center fires, serving cuts over by path
    val out2 = Scratch.dir("ivf_pol_o2") + "/ivf"
    val hot = tick(idx, out2, floor = 0.99)
    assert(hot.recentered && hot.servePath == out2
      && hot.centroids.get.length == 3)
    // the measurement half is deterministic: same index + same probe
    // batch gives the same number regardless of the floor
    assert(hot.meanRecall == lazyTick.meanRecall)

    // the re-centered index isolates the drifted cluster: the next tick
    // clears the same strict floor and leaves it alone
    val out3 = Scratch.dir("ivf_pol_o3") + "/ivf"
    val after = tick(out2, out3, floor = 0.99)
    assert(!after.recentered && after.meanRecall == 1.0
      && after.servePath == out2)
  }

  test("topKPerQuery returns k ranked neighbors per query") {
    val queries = Seq((100L, b1.toSeq), (200L, b2.toSeq)).toDF("qid", "qv")
    val got = rows(Similarity.topKPerQuery(
      corpus, $"id", $"v", queries, $"qid", $"qv", k = 3)
      .orderBy($"query_id", $"rank"))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(got.map(_._1) == Seq(100L, 100L, 100L, 200L, 200L, 200L))
    // b1-cluster docs for query 100, b2-cluster docs lead for query 200
    assert(got.take(3).map(_._2).toSet == Set(1L, 2L, 3L))
    assert(got.drop(3).map(_._2).take(2).toSet == Set(4L, 5L))
    assert(got.map(_._3) == Seq(1, 2, 3, 1, 2, 3))
  }

  test("matryoshkaTopK: full-prefix and full-depth degenerate to exact; prefix routes clusters") {
    val queries = Seq((100L, b1.toSeq), (200L, b2.toSeq)).toDF("qid", "qv")
    val exact = rows(Similarity.topKPerQuery(
      corpus, $"id", $"v", queries, $"qid", $"qv", k = 3)
      .select($"query_id", $"doc_id", $"rank")
      .orderBy($"query_id", $"rank"))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // prefixDim = dim: approx == exact cosine, so any rerank depth works
    val fullPrefix = rows(Similarity.matryoshkaTopK(
      corpus, $"id", $"v", queries, $"qid", $"qv",
      k = 3, rerank = 3, prefixDim = 16)
      .select($"query_id", $"doc_id", $"rank")
      .orderBy($"query_id", $"rank"))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(fullPrefix == exact)
    // rerank = corpus: the candidate stage cannot lose the true top-k
    val fullDepth = rows(Similarity.matryoshkaTopK(
      corpus, $"id", $"v", queries, $"qid", $"qv",
      k = 3, rerank = 5, prefixDim = 4)
      .select($"query_id", $"doc_id", $"rank")
      .orderBy($"query_id", $"rank"))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(fullDepth == exact)
    // b1 lives entirely in dims 0..7: a 8-dim prefix still routes
    // query 100 to the b1 cluster with a shallow rerank
    val routed = rows(Similarity.matryoshkaTopK(
      corpus, $"id", $"v", queries, $"qid", $"qv",
      k = 3, rerank = 3, prefixDim = 8)
      .filter($"query_id" === 100L))
      .map(_.getLong(1)).toSet
    assert(routed == Set(1L, 2L, 3L))
  }

  test("mmrTopK: diversity weight demotes near-duplicates; zero diversity = plain ranking") {
    val dir = java.nio.file.Files.createTempDirectory("mmr").toString
    val queries = Seq((100L, b1.toSeq)).toDF("qid", "qv")
    Similarity.mmrCandidateSims(corpus, $"id", $"v",
        queries, $"qid", $"qv", kCand = 5)
      .write.mode("overwrite").parquet(s"$dir/cands")
    val cs = spark.read.parquet(s"$dir/cands")
    Similarity.mmrPairSims(cs, corpus, $"id", $"v")
      .write.mode("overwrite").parquet(s"$dir/pairs")
    val ps = spark.read.parquet(s"$dir/pairs")
    val mmr = rows(Similarity.mmrTopK(cs, ps, kOut = 3,
        wRel = 1L, wDiv = 9L, s"$dir/selDiv")
      .orderBy($"mmr_rank")).map(r => (r.getInt(3), r.getLong(1)))
    assert(mmr.map(_._1) == Seq(1, 2, 3))
    // rank 1 is the pure relevance argmax (a b1-cluster doc); rank 2
    // must JUMP CLUSTERS — the remaining b1 twins are near-dups of
    // the first pick and the 0.1-relevance mix can't save them
    assert(Set(1L, 2L, 3L).contains(mmr(0)._2))
    assert(Set(4L, 5L).contains(mmr(1)._2))
    // wDiv = 0 degrades to the plain quantized-relevance ranking —
    // stated at the 1e-6 grid MMR operates on (the b1 twins' raw
    // cosines differ only below it, so they are squ-ties broken by
    // doc_id, not a raw-cosine ordering)
    val plain = rows(Similarity.mmrTopK(cs, ps, kOut = 3,
        wRel = 1L, wDiv = 0L, s"$dir/selPlain")
      .orderBy($"mmr_rank")).map(_.getLong(1))
    val topk = rows(cs.orderBy($"squ".desc, $"doc_id").limit(3))
      .map(_.getLong(1))
    assert(plain == topk)
  }

  // PQ spec corpus: interleaved patterns so EVERY 4-dim subspace
  // carries nonzero, orthogonal cluster signal (a half-zero block
  // pattern like b1/b2 leaves some subspaces pure noise, where cosine
  // codes are meaningless by construction); the two smallest ids sit
  // in DIFFERENT clusters, so the smallest-id k-means seed starts one
  // centroid per cluster and every codebook converges to the cluster
  // means.
  private val pq1 = Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else 0.0f)
  private val pq2 = Array.tabulate(16)(i => if (i % 2 == 1) 1.0f else 0.0f)
  private lazy val pqData = Seq(
    (1L, noisy(pq1, 0.001f)), (2L, noisy(pq2, 0.001f)),
    (3L, noisy(pq1, 0.001f)), (4L, noisy(pq2, 0.001f)),
    (5L, noisy(pq1, 0.001f)), (6L, noisy(pq2, 0.001f)))
  private def pqCorpus = pqData.toDF("id", "v")

  test("pqTopK: full-depth rerank reproduces the exact ranking; codes bounded") {
    val queries = Seq((100L, pq1.toSeq), (200L, pq2.toSeq)).toDF("qid", "qv")
    val books = Similarity.pqCodebooks(pqCorpus, $"id", $"v",
      m = 4, subDim = 4, k = 2, iters = 2)
    assert(books.size == 4 && books.forall(_.size == 2))
    val exact = rows(Similarity.topKPerQuery(
      pqCorpus, $"id", $"v", queries, $"qid", $"qv", k = 3)
      .orderBy($"query_id", $"rank"))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // rerank = |corpus|: whatever the ADC approximation does, the exact
    // rerank must reproduce the brute-force ranking bit-for-bit
    val pq = rows(Similarity.pqTopK(pqCorpus, $"id", $"v",
      queries, $"qid", $"qv", books, subDim = 4, k = 3, rerank = 6)
      .orderBy($"query_id", $"rank"))
    assert(pq.map(r => (r.getLong(0), r.getLong(1), r.getInt(4))) == exact)
    val codes = rows(pqCorpus.select(
      Similarity.pqCode($"v", books, 4).as("c"))).map(_.getSeq[Long](0))
    assert(codes.forall(c => c.size == 4 && c.forall(x => x >= 0 && x < 2)))
  }

  test("pqCodebooks are deterministic across runs and partitionings") {
    val a = Similarity.pqCodebooks(pqCorpus, $"id", $"v", 4, 4, 2, 2)
    val b = Similarity.pqCodebooks(pqCorpus.repartition(7), $"id", $"v",
      4, 4, 2, 2)
    assert(a == b)
  }

  test("pqTopK: truncated ADC candidate selection recalls the separable clusters") {
    // rerank < corpus: the 4-lookup approximate score alone must
    // surface the right cluster's members as candidates
    val queries = Seq((100L, pq1.toSeq), (200L, pq2.toSeq)).toDF("qid", "qv")
    val books = Similarity.pqCodebooks(pqCorpus, $"id", $"v", 4, 4, 2, 2)
    val pq = rows(Similarity.pqTopK(pqCorpus, $"id", $"v",
      queries, $"qid", $"qv", books, 4, k = 3, rerank = 3)
      .orderBy($"query_id", $"rank"))
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pq.filter(_._1 == 100L).map(_._2).toSet == Set(1L, 3L, 5L))
    assert(pq.filter(_._1 == 200L).map(_._2).toSet == Set(2L, 4L, 6L))
  }

  test("quantizedTopK matches exact top-k when rerank covers the corpus") {
    val queries = Seq((100L, b1.toSeq), (200L, b2.toSeq)).toDF("qid", "qv")
    val exact = rows(Similarity.topKPerQuery(
      corpus, $"id", $"v", queries, $"qid", $"qv", k = 3)
      .orderBy($"query_id", $"rank"))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val quant = rows(Similarity.quantizedTopK(
      corpus, $"id", $"v", queries, $"qid", $"qv", k = 3, rerank = 5)
      .orderBy($"query_id", $"rank"))
    assert(quant.map(r => (r.getLong(0), r.getLong(1), r.getInt(4))) == exact,
      "full-depth rerank must reproduce the exact ranking")
    // int8 approximation stays close to the exact cosine on unit-scale data
    quant.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 0.02,
        s"approx drifted: $r")
    }
  }

  test("quantizedTopK tolerates zero vectors (null scores rank last)") {
    val data = Seq((1L, b1.toSeq), (2L, Seq.fill(16)(0.0f))).toDF("id", "v")
    val queries = Seq((100L, b1.toSeq)).toDF("qid", "qv")
    val got = rows(Similarity.quantizedTopK(
      data, $"id", $"v", queries, $"qid", $"qv", k = 2, rerank = 2))
    assert(got.map(_.getLong(1)).toSet == Set(1L, 2L))
    val zeroRow = got.find(_.getLong(1) == 2L).get
    assert(zeroRow.isNullAt(2) && zeroRow.isNullAt(3))
  }

  test("signBits packs 32 dims per word; hammingDistance counts sign flips") {
    import graft.functions.{VectorFunctions => VF}
    // 40-dim: positives at 0, 5, 31 (word 0) and 32, 39 (word 1);
    // zeros and negatives both clear
    val a = Array.tabulate(40)(i =>
      if (Set(0, 5, 31, 32, 39)(i)) 1.0f else if (i % 2 == 0) -1.0f else 0.0f)
    // flip the sign class at dims 5, 31, and 39 relative to a
    val b = a.clone(); b(5) = -1.0f; b(31) = 0.0f; b(39) = -2.0f
    val df = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
    val got = rows(df.select(
      VF.signBits($"a").as("wa"), VF.signBits($"b").as("wb"),
      VF.hammingDistance(VF.signBits($"a"), VF.signBits($"b")).as("h")))
    assert(got.head.getSeq[Long](0) ==
      Seq((1L << 0) + (1L << 5) + (1L << 31), (1L << 0) + (1L << 7)))
    assert(got.head.getSeq[Long](1) == Seq(1L << 0, 1L << 0))
    assert(got.head.getLong(2) == 3L)
  }

  // ±1 antipodal clusters for the sign-quantized path (the all-positive
  // noisy() fixtures share one sign pattern, which is exactly what
  // binary codes cannot distinguish)
  private val s1 = Array.tabulate(16)(i => if (i < 8) 1.0f else -1.0f)
  private val s2 = s1.map(x => -x)
  private lazy val signCorpus = Seq(
    (1L, noisy(s1, 0.001f)), (2L, noisy(s1, 0.001f)),
    (3L, noisy(s1, 0.001f)), (4L, noisy(s2, 0.001f)),
    (5L, noisy(s2, 0.001f))).toDF("id", "v")

  test("binaryTopK matches exact top-k when rerank covers the corpus") {
    val queries = Seq((100L, s1.toSeq), (200L, s2.toSeq)).toDF("qid", "qv")
    val exact = rows(Similarity.topKPerQuery(
      signCorpus, $"id", $"v", queries, $"qid", $"qv", k = 3)
      .orderBy($"query_id", $"rank"))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val bin = rows(Similarity.binaryTopK(
      signCorpus, $"id", $"v", queries, $"qid", $"qv", k = 3, rerank = 5)
      .orderBy($"query_id", $"rank"))
    assert(bin.map(r => (r.getLong(0), r.getLong(1), r.getInt(4))) == exact,
      "full-depth rerank must reproduce the exact ranking")
    // sign patterns separate the antipodal clusters: intra-cluster
    // Hamming 0, cross-cluster all 16 dims flip
    bin.foreach { r =>
      val sameCluster = (r.getLong(0) == 100L) == (r.getLong(1) <= 3L)
      assert(r.getLong(3) == (if (sameCluster) 0L else 16L), s"hamming: $r")
    }
  }

  test("binaryTopK: Hamming-truncated candidates recall the separable clusters") {
    val queries = Seq((100L, s1.toSeq), (200L, s2.toSeq)).toDF("qid", "qv")
    val got = rows(Similarity.binaryTopK(
      signCorpus, $"id", $"v", queries, $"qid", $"qv", k = 3, rerank = 3)
      .orderBy($"query_id", $"rank"))
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.filter(_._1 == 100L).map(_._2).toSet == Set(1L, 2L, 3L))
    // query 200's 3-deep candidate cut keeps both cluster-2 docs at the
    // top; the third slot is Hamming-16 filler ranked below them
    assert(got.filter(_._1 == 200L).map(_._2).take(2).toSet == Set(4L, 5L))
  }

  test("kmeansCentroids separates clusters and is bit-deterministic") {
    // ids ordered so the smallest-id init seeds one vector per cluster
    val data = Seq(
      (1L, noisy(b1, 0.001f)), (2L, noisy(b2, 0.001f)),
      (3L, noisy(b1, 0.001f)), (4L, noisy(b1, 0.001f)),
      (5L, noisy(b2, 0.001f)), (6L, noisy(b2, 0.001f))).toDF("id", "v")
    val c = Similarity.kmeansCentroids(data, $"id", $"v", 2, 3)
    assert(c.map(_._1) == Seq(0L, 1L))
    assert(c(0)._2.take(8).forall(_ > 0.9) && c(0)._2.drop(8).forall(_ < 0.1))
    assert(c(1)._2.drop(8).forall(_ > 0.9) && c(1)._2.take(8).forall(_ < 0.1))
    // per-step floor-stable rounding pins fp noise: reruns are identical
    assert(c == Similarity.kmeansCentroids(data, $"id", $"v", 2, 3))
  }

  test("semanticDupPairs: full recall vs exact when clusters are separable") {
    // 6 vectors, two tight clusters; all near-dup pairs are
    // intra-cluster, so SemDeDup recall against the exact O(n²)
    // baseline is 1.0 and precision is exact by construction
    val data = Seq(
      (1L, noisy(b1, 0.001f)), (2L, noisy(b2, 0.001f)),
      (3L, noisy(b1, 0.001f)), (4L, noisy(b1, 0.001f)),
      (5L, noisy(b2, 0.001f)), (6L, noisy(b2, 0.001f))).toDF("id", "v")
    val cents = Similarity.kmeansCentroids(data, $"id", $"v", 2, 2)
    val sem = rows(Similarity
      .semanticDupPairs(data, $"id", $"v", cents, 0.99)
      .select($"id_a", $"id_b").orderBy($"id_a", $"id_b"))
      .map(r => (r.getLong(0), r.getLong(1)))
    val exact = rows(Similarity.nearDupPairsExact(data, $"id", $"v", 0.99)
      .select($"id_a", $"id_b").orderBy($"id_a", $"id_b"))
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sem == exact)
    assert(sem == Seq((1L, 3L), (1L, 4L), (2L, 5L), (2L, 6L), (3L, 4L), (5L, 6L)))
  }

  test("semanticDupPairs misses only boundary-straddling pairs (subset of exact)") {
    // a 45-degree vector sits between the clusters: its near-dup twin
    // may land in the other cluster, but emitted pairs are always a
    // subset of the exact pair set at the same threshold
    val mid = Array.tabulate(16)(_ => 0.5f)
    val data = Seq(
      (1L, noisy(b1, 0.001f)), (2L, noisy(b1, 0.001f)),
      (3L, noisy(b2, 0.001f)), (4L, noisy(b2, 0.001f)),
      (7L, noisy(mid, 0.001f)), (8L, noisy(mid, 0.001f))).toDF("id", "v")
    val cents = Similarity.kmeansCentroids(data, $"id", $"v", 2, 2)
    val sem = rows(Similarity
      .semanticDupPairs(data, $"id", $"v", cents, 0.9)
      .select($"id_a", $"id_b"))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = rows(Similarity.nearDupPairsExact(data, $"id", $"v", 0.9)
      .select($"id_a", $"id_b"))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.subsetOf(exact))
    // intra-cluster near-dups are always kept
    assert(sem.contains((1L, 2L)) && sem.contains((3L, 4L)))
    // the mid-pair lands wherever its cluster is — but both members
    // share a cluster here (same direction), so it must be found too
    assert(sem.contains((7L, 8L)))
  }

  test("kmeansCentroids tolerates empty clusters (ties assign to lowest cid)") {
    // identical vectors seed identical centroids; the cosine tie sends
    // every row to cid 0, so cid 1 goes empty and must keep its seed
    val data = Seq((1L, b1.toSeq), (2L, b1.toSeq), (3L, b1.toSeq))
      .toDF("id", "v")
    val c = Similarity.kmeansCentroids(data, $"id", $"v", 2, 2)
    assert(c.map(_._1) == Seq(0L, 1L))
    val r6b1 = b1.map(f => math.floor(f.toDouble * 1e6 + 0.5) / 1e6).toSeq
    assert(c(0)._2 == r6b1 && c(1)._2 == r6b1)
  }
}
