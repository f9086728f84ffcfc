package graft.operators

import graft.functions.{TextAnalysis => TA, TextFunctions => TF}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row}

/** RAG pipeline operators — SURVEY.md §2.9 V2/V4/V5, re-expressing
  * RAG/rag.ipynb's vector store, context assembly and automatic answer
  * metrics.
  */
object Rag {

  /** V2 — vector-store build: the document projection that pairs the
    * embedding text (T20 template) with its metadata and embedding
    * column; persisted as parquet it IS the store (rag.ipynb:446-486 —
    * an in-memory matrix there, a columnar table here).
    */
  def buildStore(docs: DataFrame, id: Column, title: Column, authors: Column,
                 abstractC: Column, embedding: Column): DataFrame =
    docs.select(
      id.as("paper_id"),
      TF.embeddingText(title, authors, abstractC).as("doc_text"),
      title.as("title"),
      embedding.as("embedding"))

  /** V4 — context assembly over the collected top-k rows (k is small by
    * contract; this is the one legitimately driver-side step). Rows must
    * provide (rank, title, doc_text, cosine). Ref: rag.ipynb:720-733.
    */
  def assembleContext(topK: Seq[Row]): String =
    topK.map { r =>
      f"[${r.getAs[Int]("rank")}] (sim ${r.getAs[Double]("cosine")}%.3f) " +
        s"${r.getAs[String]("title")}\n${r.getAs[String]("doc_text")}"
    }.mkString("\n\n")

  /** V4 at serving scale — context assembly as a GROUPED COLUMN, the
    * distributed twin of [[assembleContext]] (which is driver-side by
    * contract: ONE query's k rows). Input: one row per (query,
    * candidate) with (query_id, rank, cosine, title, doc_text).
    *
    * The 3-decimal similarity renders from integer milli-units
    * (`floor(cos·10³+½)` — the fround contract), so the digits are
    * byte-identical cross-engine and agree with [[assembleContext]]'s
    * Java `%.3f` (HALF_UP) whenever the cosine sits on the milli grid
    * (AssembleSpec pins the parity). Entries order by rank INSIDE the
    * aggregate via `array_sort` over (rank, entry) structs —
    * `collect_list` order is partition-dependent; the in-row sort
    * restores determinism without a global sort.
    *
    * Scale shape: one shuffle on query_id with ≤ k rows per group — a
    * billion queries assemble embarrassingly parallel, and the corpus
    * is never touched (callers join titles/texts from the top-k's own
    * bounded candidate rows).
    *
    * Returns (query_id, n_ctx, context).
    */
  def assembleContexts(topK: DataFrame): DataFrame =
    topK
      .withColumn("_smu",
        floor(col("cosine") * lit(1000.0) + lit(0.5)).cast("long"))
      .withColumn("_entry", concat(
        lit("["), col("rank").cast("string"), lit("] (sim "),
        when(col("_smu") < 0, lit("-")).otherwise(lit("")),
        expr("abs(_smu) div 1000").cast("string"), lit("."),
        lpad(expr("abs(_smu) % 1000").cast("string"), 3, "0"),
        lit(") "), col("title"), lit("\n"), col("doc_text")))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).cast("long").as("n_ctx"),
        array_join(transform(
          array_sort(collect_list(struct(col("rank"), col("_entry")))),
          e => e.getField("_entry")), "\n\n").as("context"))

  /** Okapi BM25 lexical retrieval — the sparse complement to the dense
    * cosine family (§2.9 V3*). The reference retrieves by embedding
    * similarity only (RAG/rag.ipynb:488-530); production RAG almost
    * always pairs that with a lexical leg, so this is the
    * beyond-reference seat of keyword search.
    *
    * Scale shape: the query vocabulary is a LITERAL `isin` filter fused
    * into the token explode, so only postings that match some query term
    * ever shuffle — corpus text is scanned once and never moves. Global
    * stats (N, avgdl) are a 1-row broadcast; per-term document
    * frequencies come from the matched-postings sliver (≤ |vocab| rows,
    * broadcast); the query list itself is a broadcast literal table.
    * The one data-sized shuffle is the (doc, term) tf combine, bounded
    * by matched postings — exactly the inverted-index probe cost.
    *
    * Returns (query_id, doc_id, score) with the raw double score;
    * callers round + rank (rounding first keeps cross-engine rank ties
    * deterministic).
    */
  def bm25(docs: DataFrame, id: Column, text: Column,
           queries: Seq[(Int, Seq[String])],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = queries.flatMap(_._2).distinct
    val base = docs.select(id.as("doc_id"), TA.tokens(text).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), col("toks"))
    // One corpus pass for N/avgdl, one for postings: sharing them in a
    // single cached scan would force the full token array through the
    // stats aggregate; two columnar scans are cheaper at any scale.
    val stats = base.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val postings = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(vocab: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = postings.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val q = queries.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")
    scoreBm25(postings, dfreq, q, stats, k1, b)
  }

  /** The shared Okapi scoring tail: postings ⨝ broadcast df ⨝ broadcast
    * query terms × broadcast 1-row stats → per-(query, doc) Σw. Both the
    * direct [[bm25]] and the indexed [[bm25Indexed]] paths end here, so
    * their scores are computed by the IDENTICAL expression tree (the
    * index round trip must be bit-lossless).
    */
  private def scoreBm25(postings: DataFrame, dfreq: DataFrame, q: DataFrame,
                        stats: DataFrame, k1: Double, b: Double): DataFrame = {
    // ORDER-EXACT scoring (the r11 x5 discipline): the idf
    // ln(1 + (N−df+½)/(df+½)) = ln((N+1)/(df+½)) computes as
    // detln(2N+2) − detln(2df+1) — integer arguments, libm-free,
    // bit-identical on any IEEE engine — and each term weight
    // quantizes onto the integer 2⁻²⁰ grid, so the per-(query, doc)
    // sum is exact BIGINT arithmetic in any order; one final divide
    // restores the score scale.
    import graft.expressions.DetLn
    val idf = DetLn(lit(2L) * col("n_docs") + lit(2L)) -
      DetLn(lit(2L) * col("df") + lit(1L))
    postings
      .join(broadcast(dfreq), "term")
      .join(broadcast(q), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        floor((idf *
          col("tf") * lit(k1 + 1.0) /
          (col("tf") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))) *
          lit(Classify.WeightGrid) + lit(0.5))
          .as("wi"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg((sum(col("wi")).cast("double") / lit(Classify.WeightGrid))
        .as("score"))
  }

  /** Directory bucket of a term — the hive partition column of the
    * persisted inverted index (Dedup.bandBucket's md5 recipe, so the
    * probe can reconstruct it engine-side).
    */
  private def termBucket(term: Column, buckets: Int): Column =
    Dedup.bandBucket(term, buckets)

  // read schemas carry BOTH partition columns (seg from the commit
  // discipline, tp from the term bucketing) — reads pass basePath so
  // the per-segment roots parse as one partitioned table
  private val postingsSchema = org.apache.spark.sql.types.StructType
    .fromDDL("doc_id LONG, term STRING, tf LONG, dl LONG, tp BIGINT, seg BIGINT")
  private val dfSchema = org.apache.spark.sql.types.StructType
    .fromDDL("term STRING, df LONG, tp BIGINT, seg BIGINT")
  private val statsSchema = org.apache.spark.sql.types.StructType
    .fromDDL("src LONG, n_docs LONG, sum_dl LONG, seg BIGINT")

  /** Persist a BM25 inverted index — the lexical seat of the engine's
    * build-once/probe-many lifecycle family (d9 bloom, v11 IVF, d15 LSH
    * bands). Layout under `path`:
    *   `meta/`                 — the bucket count, one `_SUCCESS`-gated
    *     text file: the index is SELF-DESCRIBING, probes read the
    *     bucket count here (a probe guessing a different count would
    *     silently prune to the wrong partitions — the saveIvfIndex
    *     centroid precedent);
    *   `postings/seg=K/tp=N/`  — (doc_id, term, tf, dl) via the sized
    *     sink (hot term buckets still write in parallel, no small-file
    *     spray; dl is denormalized per posting, the Lucene "norms"
    *     trade: one long per posting buys a join-free probe);
    *   `df/seg=K/tp=N/`        — (term, df), bucketed the same way so a
    *     probe prunes BOTH reads to the touched buckets;
    *   `stats/seg=K/`          — one (n_docs, sum_dl) row per segment;
    *   `commits/k=K/`          — the segment's commit marker, written
    *     LAST: a segment exists for readers only once its marker is
    *     `_SUCCESS`-committed, so a crash between the three data writes
    *     leaves an invisible torn segment (reclaimed on the next append
    *     with the same batch id), never an inconsistent index — the
    *     SegmentFs discipline the CountLog/MergeLog siblings use.
    * Probe IO is therefore ∝ touched-buckets/buckets of the index and
    * the corpus text is never re-scanned.
    *
    * Every stored quantity is ADDITIVE (tf and df rows sum across
    * segments when batches carry disjoint doc ids; n_docs and Σdl sum
    * unconditionally — the CountLog law), so [[appendBm25Index]] grows
    * the index in O(batch): corpus-sized files never rewrite and the
    * probe folds segments with a sum. Stats persist as (n_docs, sum_dl),
    * not avgdl — the average is not additive, the pair is; the probe
    * derives avgdl = sum_dl/n_docs, which equals the direct path's
    * `avg(dl)` exactly while Σdl < 2^53 (Spark's Average accumulates
    * integral input in a double sum — token counts reach 2^53 at ~9e15
    * tokens, far past any real corpus).
    */
  def saveBm25Index(docs: DataFrame, id: Column, text: Column, path: String,
                    buckets: Int = 64, targetRows: Long = 1L << 20,
                    spread: Int = 8): Unit = {
    val spark = docs.sparkSession
    // meta is ONE driver-known integer: write/read it as a tiny
    // `_SUCCESS`-gated text file via the FS API instead of a one-row
    // parquet (whose write was a Spark job and whose read was a head()
    // job on EVERY append/probe/compact — pure driver round-trip
    // latency, r19 guide §1.2). errorifexists contract preserved.
    val f = SegmentFs.fs(spark, path)
    val dir = new org.apache.hadoop.fs.Path(s"$path/meta")
    if (f.exists(dir))
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(dir.toString)
    val out = f.create(new org.apache.hadoop.fs.Path(dir, "buckets"), false)
    out.write(buckets.toString.getBytes("UTF-8")); out.close()
    f.create(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"), true).close()
    writeBm25Segment(docs, id, text, path, buckets, targetRows, spread,
      seg = 0L)
  }

  /** O(batch) growth of a saved BM25 index: the batch's postings/df/
    * stats rows land as segment `seg=K` (K = `batchId` or max+1) and
    * become visible atomically via the commit marker; the probe's
    * segment fold (sum df per term, sum the stats pair) makes the
    * result identical to a from-scratch rebuild over the union.
    *
    * Replay contract: an append whose batch id is already COMMITTED —
    * or at-or-below the persisted hwm water line, i.e. committed once
    * and since folded by a compaction — is a no-op (returns K
    * untouched), and a torn prior attempt at the same id is deleted
    * and rewritten — so at-least-once ingest pipelines can retry
    * blindly, unconditionally. Batch ids must be MONOTONE per index
    * (the foreachBatch contract; an id below the line can only be a
    * replay, never a first append). Batches must carry doc ids DISJOINT
    * from other BATCHES (a doc resent under a different batch id
    * double-counts its tf/df/Σdl — spec-pinned); the bucket count
    * comes from the index's own meta, never the caller.
    */
  def appendBm25Index(docs: DataFrame, id: Column, text: Column,
                      path: String, targetRows: Long = 1L << 20,
                      spread: Int = 8, batchId: Option[Long] = None): Long = {
    val spark = docs.sparkSession
    val buckets = readMetaBuckets(spark, path)
    val committed = committedSegs(spark, path)
    // auto ids are monotone past compaction via the hwm water line;
    // ids at-or-below it are replays of committed-then-folded batches
    val (k, done) = SegmentFs.resolveAppendId(spark, path, committed,
      batchId, minId = 1L)
    if (done) k // idempotent replay of a committed (possibly folded) batch
    else {
      writeBm25Segment(docs, id, text, path, buckets, targetRows, spread,
        seg = k)
      SegmentFs.recordHighWater(spark, path, k)
      k
    }
  }

  /** Committed segment ids — the only segments a reader may see. */
  private def committedSegs(spark: org.apache.spark.sql.SparkSession,
                            path: String): Seq[Long] =
    SegmentFs.listVersions(spark, s"$path/commits", "k")

  /** Fold every committed BM25 segment ≤ `upTo` into ONE merged
    * segment — the IVF/band-index compaction for the lexical index.
    * The additive quantities make the fold subtler than a row move:
    * postings de-duplicate by (doc_id, term) (identical rows — the
    * disjoint-batches contract; duplicates only exist after a crashed
    * retirement), df RECOMPUTES from the deduped postings (a plain sum
    * would double-count those), and stats rows dedup by their `src`
    * provenance tag and carry through unchanged (n_docs/Σdl cover
    * zero-token docs postings can't see). Merged generations take
    * NEGATIVE ids (−1, −2, …; the base build is 0, appends ≥ 1);
    * marker-first retirement as everywhere. A crash mid-retirement
    * leaves a window where a reader folds a doc's rows twice — rerun
    * the compaction to heal (each of the three folds is
    * provenance-exact, so the rerun converges); fold only batches the
    * appending stream's checkpoint has passed.
    */
  def compactBm25Index(spark: org.apache.spark.sql.SparkSession,
                       path: String, upTo: Long,
                       targetRows: Long = 1L << 20,
                       spread: Int = 8): Option[Long] = {
    val committed = committedSegs(spark, path)
    val fold = committed.filter(_ <= upTo)
    if (fold.size < 2) None
    else {
      val buckets = readMetaBuckets(spark, path)
      val gen = math.min(committed.min, 0L) - 1L
      val f = SegmentFs.fs(spark, path)
      Seq(s"$path/postings/seg=$gen", s"$path/df/seg=$gen",
          s"$path/stats/seg=$gen").foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        if (f.exists(p)) f.delete(p, true): Unit
      }
      val postings = spark.read.schema(postingsSchema)
        .option("basePath", s"$path/postings")
        .parquet(fold.map(k => s"$path/postings/seg=$k"): _*)
        .drop("seg").dropDuplicates("doc_id", "term")
      graft.sources.Compaction.writeSized(
        postings, s"$path/postings/seg=$gen", Seq("tp"), col("doc_id"),
        targetRows, spread, "errorifexists")
      val dfreq = postings.groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .withColumn("tp", termBucket(col("term"), buckets))
      graft.sources.Compaction.writeSized(
        dfreq, s"$path/df/seg=$gen", Seq("tp"), col("term"),
        targetRows, spread, "errorifexists")
      spark.read.schema(statsSchema)
        .option("basePath", s"$path/stats")
        .parquet(fold.map(k => s"$path/stats/seg=$k"): _*)
        // stats rows persisted before the src column existed read back
        // src = NULL under the forced schema; dedup-by-NULL would
        // collapse them all into one row and silently undercount
        // n_docs/Σdl. A src-less row can only live in the segment it
        // was originally written to (every compaction stamps src), so
        // its seg id IS its provenance — backfill it.
        .withColumn("src", coalesce(col("src"), col("seg")))
        .dropDuplicates("src").select(col("src"), col("n_docs"),
          col("sum_dl"))
        .coalesce(1).write.mode("errorifexists")
        .parquet(s"$path/stats/seg=$gen")
      SegmentFs.writeMarker(spark, s"$path/commits/k=$gen")
      // raise the water line past every folded batch id BEFORE retiring
      // its commit marker — the folded ids must never be reused or
      // re-appended once their markers are gone
      fold.filter(_ >= 0).reduceOption(_ max _)
        .foreach(SegmentFs.recordHighWater(spark, path, _))
      fold.foreach { k =>
        f.delete(new org.apache.hadoop.fs.Path(s"$path/commits/k=$k"),
          true): Unit
        Seq("postings", "df", "stats").foreach { d =>
          f.delete(new org.apache.hadoop.fs.Path(s"$path/$d/seg=$k"),
            true): Unit
        }
      }
      Some(gen)
    }
  }

  private def readMetaBuckets(spark: org.apache.spark.sql.SparkSession,
                              path: String): Int = {
    val f = SegmentFs.fs(spark, path)
    val in = f.open(new org.apache.hadoop.fs.Path(s"$path/meta/buckets"))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
    finally in.close()
  }

  private def writeBm25Segment(docs: DataFrame, id: Column, text: Column,
                               path: String, buckets: Int, targetRows: Long,
                               spread: Int, seg: Long): Unit = {
    val spark = docs.sparkSession
    // reclaim torn partials from a crashed prior attempt at this id
    val f = SegmentFs.fs(spark, path)
    Seq(s"$path/postings/seg=$seg", s"$path/df/seg=$seg",
        s"$path/stats/seg=$seg").foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      if (f.exists(p)) f.delete(p, true): Unit
    }
    val base = docs.select(id.cast("long").as("doc_id"),
        TA.tokens(text).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), col("toks"))
    val postings = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).cast("long").as("dl"))
      .withColumn("tp", termBucket(col("term"), buckets))
    graft.sources.Compaction.writeSized(
      postings, s"$path/postings/seg=$seg", Seq("tp"), col("doc_id"),
      targetRows, spread, "errorifexists")
    val dfreq = postings.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .withColumn("tp", termBucket(col("term"), buckets))
    graft.sources.Compaction.writeSized(
      dfreq, s"$path/df/seg=$seg", Seq("tp"), col("term"),
      targetRows, spread, "errorifexists")
    base.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).cast("long").as("sum_dl"))
      // src = the ORIGINAL segment id, carried through compactions so
      // a re-run after a crashed retirement can dedup stats rows by
      // provenance instead of double-counting
      .select(lit(seg).as("src"), col("n_docs"), col("sum_dl"))
      .coalesce(1).write.mode("errorifexists")
      .parquet(s"$path/stats/seg=$seg")
    // the commit point — everything above is invisible until this lands
    // ("overwrite": a torn marker dir without _SUCCESS must not block)
    SegmentFs.writeMarker(spark, s"$path/commits/k=$seg")
  }

  /** Probe a saved BM25 index: the query vocabulary's term buckets
    * (count read from the index's own meta) become literal partition
    * filters on the postings AND df reads (PartitionFilters — IO ∝
    * touched buckets), the terms themselves a literal pushed filter
    * inside each bucket; scoring is the exact [[bm25]] expression tree
    * over the pruned slivers. Only COMMITTED segments are read, so a
    * concurrent torn append is invisible. Scores equal the direct
    * path's bit-for-bit.
    */
  def bm25Indexed(spark: org.apache.spark.sql.SparkSession, path: String,
                  queries: Seq[(Int, Seq[String])],
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    val buckets = readMetaBuckets(spark, path)
    val segs = committedSegs(spark, path)
    require(segs.nonEmpty, s"no committed BM25 segments under $path")
    val vocab = queries.flatMap(_._2).distinct
    // Reconstruct the touched buckets engine-side (tiny local job — the
    // md5 bucket recipe stays in ONE place, Dedup.bandBucket).
    val tps = vocab.toDF("term")
      .select(termBucket(col("term"), buckets)).distinct()
      .collect().map(_.getLong(0)).sorted
    val postings = spark.read.schema(postingsSchema)
      .option("basePath", s"$path/postings")
      .parquet(segs.map(k => s"$path/postings/seg=$k"): _*)
      .where(col("tp").isin(tps: _*)).where(col("term").isin(vocab: _*))
    // Segment folds: df rows and the (n_docs, Σdl) pair sum across
    // appended segments (additivity is the append contract).
    val dfreq = spark.read.schema(dfSchema)
      .option("basePath", s"$path/df")
      .parquet(segs.map(k => s"$path/df/seg=$k"): _*)
      .where(col("tp").isin(tps: _*)).where(col("term").isin(vocab: _*))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    val stats = spark.read.schema(statsSchema)
      .option("basePath", s"$path/stats")
      .parquet(segs.map(k => s"$path/stats/seg=$k"): _*)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    val q = queries.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")
    scoreBm25(postings.select(col("doc_id"), col("term"), col("tf"),
        col("dl")), dfreq, q, stats, k1, b)
  }

  /** Reciprocal-rank fusion (Cormack et al.): fuse any number of ranked
    * candidate lists into one ranking, `rrf = Σ 1/(k + rank)`. Inputs
    * are (query_id, doc_id, rank) frames — each typically a top-n
    * truncation, so the union is (n · lists · queries) rows: tiny
    * relative to the corpus no matter the corpus size. Union + sum
    * (not an n-way outer join) keeps the plan one combine regardless of
    * how many legs are fused; a doc absent from a leg simply
    * contributes nothing, which IS the RRF contract.
    */
  def rrfFuse(ranked: Seq[DataFrame], k: Int = 60): DataFrame =
    ranked
      .map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(lit(1.0) / (lit(k) + col("rank"))).as("rrf"))

  /** Two-stage retrieval: the first-stage candidate list (lexical,
    * dense, or hybrid top-k) reranks through an injectable
    * cross-encoder client. External model serving is orchestration, not
    * a row expression — so the client is a trait called through
    * `mapPartitions` with ONE call per `batchSize` pairs (the Embed /
    * Enrich harness shape), and the economics are the point: the
    * expensive scorer sees ONLY queries×k candidate rows, never the
    * corpus. [[OverlapRerankClient]] is the deterministic stand-in that
    * makes the stage oracle-checkable (and the spec fixture); a real
    * cross-encoder endpoint drops in behind the same trait.
    */
  trait RerankClient extends Serializable {
    /** One relevance score per (query, doc) text pair, batched. */
    def score(pairs: Seq[(String, String)]): Seq[Double]
  }

  /** Deterministic mock cross-encoder: the fraction of the query's
    * distinct terms present in the doc's token set (the T13 overlap
    * semantic over TA.jvmTokens — same tokenizer as the engine side,
    * so the DuckDB twin reproduces it from `sqlTokens`).
    */
  final class OverlapRerankClient extends RerankClient {
    def score(pairs: Seq[(String, String)]): Seq[Double] =
      pairs.map { case (q, d) =>
        val qs = TA.jvmTokens(q).distinct
        if (qs.isEmpty) 0.0
        else {
          val ds = TA.jvmTokens(d).toSet
          qs.count(ds).toDouble / qs.length
        }
      }
  }

  /** Append `ce_score` (double) to the candidate frame by scoring
    * (query, doc) text pairs through `client`, batched per partition.
    * Rows where either text is null skip the client and score null.
    */
  def rerank(cands: DataFrame, query: Column, text: Column,
             client: RerankClient, batchSize: Int = 32): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val withPair = cands
      .withColumn("__rr_q", query).withColumn("__rr_d", text)
    val outSchema = StructType(withPair.schema.fields :+
      StructField("ce_score", DoubleType))
    withPair.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val pairs = batch.collect {
          case r if !r.isNullAt(r.fieldIndex("__rr_q")) &&
                    !r.isNullAt(r.fieldIndex("__rr_d")) =>
            (r.getAs[String]("__rr_q"), r.getAs[String]("__rr_d"))
        }
        val scores = if (pairs.isEmpty) Seq.empty else client.score(pairs)
        require(scores.length == pairs.length,
          s"client returned ${scores.length} scores for ${pairs.length} pairs")
        val it = scores.iterator
        batch.map { r =>
          val s: Any =
            if (r.isNullAt(r.fieldIndex("__rr_q")) ||
                r.isNullAt(r.fieldIndex("__rr_d"))) null
            else it.next()
          Row.fromSeq(r.toSeq :+ s)
        }
      }
    }(Encoders.row(outSchema)).drop("__rr_q", "__rr_d")
  }

  /** V5 — automatic answer metrics as pure columns: length/word counts,
    * question-keyword overlap, citation usage, and the weighted auto
    * score (rag.ipynb:770-880). `round4`-stable across engines.
    */
  def autoMetrics(question: Column, answer: Column): Column = {
    val words = TF.wordCount(answer)
    val overlap = TF.keywordOverlap(question, answer)
    val citations = size(TF.citationMatches(answer))
    val score =
      least(lit(1.0), words.cast("double") / 50.0) * 0.3 +
        least(lit(1.0), overlap.cast("double") / 5.0) * 0.4 +
        when(citations > 0, 1.0).otherwise(0.5) * 0.3
    struct(
      length(answer).as("answer_chars"),
      words.as("answer_words"),
      overlap.as("keyword_overlap"),
      citations.as("n_citations"),
      (floor(score * 10000.0 + 0.5) / 10000.0).as("auto_score"))
  }
}
