package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Merge-on-read snapshot log — the storage lifecycle around
  * [[Dedup.mergeUpsert]] (beyond the reference, whose "checkpoints" are
  * whole-file JSONL rewrites, checkpoint_manager.py).
  *
  * At 100 TB the one thing a CDC sink must NOT do is rewrite the
  * snapshot per batch. The layout here is the merge-on-read shape:
  *
  * {{{
  *   dir/base/v=N/     data columns                (rewritten only by compact)
  *   dir/delta/d=K/    data + version + deleted    (append-only, one per batch)
  * }}}
  *
  * Writes are O(batch): [[appendDelta]] drops one new parquet dir and
  * never touches base. Reads resolve lazily: [[read]] is
  * `mergeUpsert(base, all deltas)` — one plan, the base side untouched
  * by the delta windows. [[compact]] folds the delta log into a new
  * base version and retires the absorbed deltas; readers pick the
  * highest complete base, so a crashed compact leaves the log readable.
  * Row-level precedence is the row `version` column (CDC contract),
  * not file arrival order, so replayed batches are harmless.
  *
  * Directory versions are discovered by listing — no driver-side
  * manifest state to corrupt; `d=K` names come from the writer's
  * batch id (streaming) or max+1 (batch), both monotone.
  */
/** Shared segment-directory discipline for the merge-on-read logs
  * ([[MergeLog]] last-wins-by-version, [[CountLog]] additive): Hadoop-FS
  * listing-discovered `base/v=N` + `delta/d=K` dirs, `_SUCCESS`-gated
  * commitment, idempotent per-batch appends, torn-write reclaim.
  */
private[operators] object SegmentFs {

  // Hadoop FS, not java.io.File: the log must live on whatever
  // filesystem the cluster writes (HDFS/S3A/local alike).
  def fs(spark: SparkSession, dir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())

  /** COMMITTED versions only: a segment counts once its `_SUCCESS`
    * marker exists (written last by Spark's file committer). A dir
    * without one is a torn write from a crashed job — readers must not
    * merge its partial part-files, compact must not retire it as
    * absorbed, and a replaying writer must rewrite it rather than
    * skip it as already-done.
    */
  def listVersions(spark: SparkSession, dir: String,
                   prefix: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix + "=")
        && f.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.drop(prefix.length + 1).toLong)
      .sorted
  }

  def baseDir(dir: String, v: Long) = s"$dir/base/v=$v"
  def deltaDir(dir: String, k: Long) = s"$dir/delta/d=$k"

  /** High-water mark of batch ids ever committed at an index root — a
    * `hwm/k=<id>` marker that compaction NEVER retires. Compactions
    * fold positive commit markers into negative merged generations;
    * without the water line, a post-compaction auto id would restart
    * at 1 and reuse folded batch ids, and an out-of-contract replay of
    * a folded id would double-append instead of no-op. Markers below
    * the max prune opportunistically; the max alone carries the line.
    *
    * Write ordering: appenders record the line AFTER their commit
    * marker lands (a torn append must stay retryable — recording
    * first would make the retry of that very id a data-losing no-op);
    * compactions record the max folded id BEFORE retiring its commit
    * marker, which closes the crash window between an append's commit
    * and its own hwm record.
    */
  def highWater(spark: SparkSession, dir: String): Option[Long] =
    listVersions(spark, s"$dir/hwm", "k").lastOption

  /** Advance the water line to at least `k` (no-op if already ≥ k). */
  def recordHighWater(spark: SparkSession, dir: String, k: Long): Unit = {
    val existing = listVersions(spark, s"$dir/hwm", "k")
    if (!existing.lastOption.exists(_ >= k)) {
      writeMarker(spark, s"$dir/hwm/k=$k")
      val f = fs(spark, dir)
      existing.filter(_ < k).foreach { o =>
        f.delete(new org.apache.hadoop.fs.Path(s"$dir/hwm/k=$o"),
          true): Unit
      }
    }
  }

  /** Write a `_SUCCESS`-gated EMPTY marker directory — for the commit/
    * hwm markers whose only information is their NAME ([[listVersions]]
    * reads directory names + marker presence, never file content).
    * Each marker was previously a one-row `spark.range(1)` parquet
    * write: a whole Spark job plus a file-committer round trip of pure
    * driver latency PER MARKER, multiplied across every lifecycle tick
    * (r19 optimization, guide §1.2 — a job that computes nothing a
    * reader ever loads). Crash contract unchanged from the parquet
    * committer's: the directory may exist torn (readers skip it,
    * writers reclaim it); the `_SUCCESS` file's atomic create is the
    * commit point, written last.
    */
  def writeMarker(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (f.exists(p)) f.delete(p, true): Unit
    f.mkdirs(p): Unit
    f.create(new org.apache.hadoop.fs.Path(p, "_SUCCESS"), true).close()
  }

  /** The append-side id resolution shared by every commit-gated index
    * ([[graft.operators.Rag.appendBm25Index]], the IVF/IVF-PQ appends,
    * the LSH band index): explicit `id` or the successor of the water
    * line / max committed id, floored at `minId`. Returns (k, done) —
    * `done` means the id is already committed (visible now) or below
    * the water line (committed once and since folded; under the
    * monotone-batch-id contract a replay, never a first append), so
    * the caller must no-op.
    */
  def resolveAppendId(spark: SparkSession, dir: String,
                      committed: Seq[Long], id: Option[Long],
                      minId: Long): (Long, Boolean) = {
    val hw = highWater(spark, dir)
    val k = id.getOrElse(math.max(
      math.max(hw.getOrElse(minId - 1L),
        committed.lastOption.getOrElse(minId - 1L)) + 1L, minId))
    (k, committed.contains(k) || hw.exists(k <= _))
  }

  /** Append `delta` as segment `d=K` (K = `id` or max+1), idempotent on
    * COMMITTED batch ids, rewriting torn dirs. Returns K.
    */
  def appendSegment(delta: DataFrame, dir: String,
                    id: Option[Long]): Long = {
    val spark = delta.sparkSession
    val committed = listVersions(spark, s"$dir/delta", "d")
    val k = id.getOrElse(committed.lastOption.map(_ + 1).getOrElse(0L))
    if (committed.contains(k)) k
    else {
      val p = new org.apache.hadoop.fs.Path(deltaDir(dir, k))
      val f = fs(spark, dir)
      if (f.exists(p)) f.delete(p, true): Unit // torn write — rewrite it
      delta.write.mode("errorifexists").parquet(deltaDir(dir, k))
      k
    }
  }

  /** Latest committed base version, or throw if the log is not
    * initialized. */
  def latestBase(spark: SparkSession, dir: String): Long =
    listVersions(spark, s"$dir/base", "v").lastOption.getOrElse(
      throw new IllegalStateException(s"no base under $dir — init() first"))

  /** Fold `resolved` (the current read) into base v=N+1 and retire the
    * absorbed delta segments. Crash-safe write order: the new base
    * lands complete before any delta is removed, and readers take the
    * highest COMMITTED base, so a torn compact leaves the log readable
    * and the next compact deletes the torn dir before writing.
    * Returns the new base version.
    */
  def compactInto(spark: SparkSession, dir: String,
                  resolved: DataFrame): Long = {
    val bv = latestBase(spark, dir)
    val absorbed = listVersions(spark, s"$dir/delta", "d")
    val next = bv + 1
    val nextPath = new org.apache.hadoop.fs.Path(baseDir(dir, next))
    val f = fs(spark, dir)
    if (f.exists(nextPath)) f.delete(nextPath, true): Unit // torn prior compact
    resolved.write.mode("errorifexists").parquet(baseDir(dir, next))
    absorbed.foreach { k =>
      val p = new org.apache.hadoop.fs.Path(deltaDir(dir, k))
      f.delete(p, true): Unit
    }
    next
  }

  /** Delete every base older than the latest COMMITTED one — the
    * storage-reclaim step compaction deliberately leaves behind
    * (the old base must survive until the new one is committed, and a
    * reader mid-plan may still hold it; vacuum runs later, on the
    * operator's cadence). Reads are unaffected: [[latestBase]] already
    * serves only the newest committed base, and as-of reads reach back
    * only to it. Returns the number of bases removed.
    */
  def vacuumBases(spark: SparkSession, dir: String): Int = {
    val keep = listVersions(spark, s"$dir/base", "v").lastOption
      .getOrElse(return 0)
    val f = fs(spark, dir)
    val all = f.listStatus(new org.apache.hadoop.fs.Path(s"$dir/base")).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .filter(_.getPath.getName.drop(2).toLong != keep)
    all.foreach(s => f.delete(s.getPath, true): Unit)
    all.size
  }
}

object MergeLog {
  import SegmentFs.{baseDir, deltaDir, listVersions}

  /** Create the log with `snapshot` as base v=0. */
  def init(snapshot: DataFrame, dir: String): Unit =
    snapshot.write.mode("errorifexists").parquet(baseDir(dir, 0L))

  /** Append one change batch (data + version + deleted columns) as the
    * next delta segment. O(batch) — base is never read or written. An
    * explicit `id` (streaming batch id) makes the write idempotent:
    * re-delivery of a COMMITTED batch (its `_SUCCESS` marker exists) is
    * a no-op instead of a dup, while a torn dir from a crashed attempt
    * is deleted and rewritten — existence of the directory alone is NOT
    * commitment, or a replay after a mid-write crash would silently
    * drop the batch.
    */
  def appendDelta(delta: DataFrame, dir: String,
                  id: Option[Long] = None): Long =
    SegmentFs.appendSegment(delta, dir, id)

  /** Current table state: latest base ⊕ every delta segment, resolved
    * by row version. ONE lazy plan — the delta union windows on the
    * key over delta rows only; the base side takes the anti-join
    * passthrough (broadcast under AQE at sane delta/base ratios).
    */
  def read(spark: SparkSession, dir: String, key: String,
           version: String = "version",
           deleted: String = "deleted"): DataFrame = {
    val bv = SegmentFs.latestBase(spark, dir)
    val base = spark.read.parquet(baseDir(dir, bv))
    val deltas = listVersions(spark, s"$dir/delta", "d")
    if (deltas.isEmpty) base
    else {
      val delta = spark.read.parquet(deltas.map(deltaDir(dir, _)): _*)
      Dedup.mergeUpsert(base, delta, key, version, deleted)
    }
  }

  /** Time-travel read: the table AS OF delta segment `upTo` (inclusive)
    * — the reproducibility primitive: a training run records the batch
    * id it consumed, and any later job reads the exact same corpus
    * state back. Implemented as the plain [[read]] restricted to delta
    * segments ≤ `upTo`; one lazy plan, no snapshot copies. Only valid
    * back to the current base — [[compact]] absorbs and retires older
    * segments (throws if `upTo` predates a still-listed segment range
    * that compaction has folded away, i.e. when segments ≤ upTo no
    * longer exist but later ones do).
    */
  def readAsOf(spark: SparkSession, dir: String, key: String, upTo: Long,
               version: String = "version",
               deleted: String = "deleted"): DataFrame = {
    val bv = SegmentFs.latestBase(spark, dir)
    val base = spark.read.parquet(baseDir(dir, bv))
    val all = listVersions(spark, s"$dir/delta", "d")
    if (all.nonEmpty && all.min > upTo)
      throw new IllegalStateException(
        s"as-of $upTo predates the current base — segments <= $upTo were " +
          s"compacted away (earliest retained: ${all.min})")
    val deltas = all.filter(_ <= upTo)
    if (deltas.isEmpty) base
    else {
      val delta = spark.read.parquet(deltas.map(deltaDir(dir, _)): _*)
      Dedup.mergeUpsert(base, delta, key, version, deleted)
    }
  }

  /** Fold the current delta log into base v=N+1 and retire the absorbed
    * segments. Write order is crash-safe: the new base lands complete
    * before any delta is removed, and a reader always takes the highest
    * COMMITTED base — [[listVersions]] skips a torn `v=N+1` missing its
    * `_SUCCESS` marker (a torn compact at worst leaves deltas whose
    * final values the new base already holds, so re-merging them reads
    * identically; the next compact deletes the torn dir before writing).
    * Returns the new base version.
    */
  def compact(spark: SparkSession, dir: String, key: String,
              version: String = "version",
              deleted: String = "deleted"): Long =
    SegmentFs.compactInto(spark, dir, read(spark, dir, key, version, deleted))

  /** Reclaim bases older than the latest committed one (see
    * [[SegmentFs.vacuumBases]] — reads and the as-of horizon are
    * unaffected, they already reach back only to the current base).
    */
  def vacuum(spark: SparkSession, dir: String): Int =
    SegmentFs.vacuumBases(spark, dir)

  /** Row-level diff between two time-travel states: every key whose
    * resolved value differs between [[readAsOf]] `from` and `to`, with
    * `change` ∈ insert (absent→present), update (present, value
    * differs), delete (present→absent); a rewrite to the SAME value is
    * NOT a change. `from = -1` means "since init" (valid only while the
    * log is uncompacted, base v=0); otherwise `from` obeys [[readAsOf]]'s
    * compaction horizon. The corpus-maintenance "what changed between
    * yesterday's corpus and today's" question, answered without reading
    * either snapshot in full.
    *
    * Scale shape: only keys appearing in a delta segment in (from, to]
    * can differ, so that key set (delta-sized, never snapshot-sized)
    * broadcasts as a semi-join prune onto the base scan and the delta
    * union — the snapshot itself never shuffles, and both as-of states
    * resolve with windows over the pruned candidate rows only. Both
    * states resolve from one tagged delta union, so precedence is
    * exactly [[Dedup.mergeUpsert]]'s: any delta row beats base, max
    * `version` wins within the delta.
    */
  def diff(spark: SparkSession, dir: String, key: String,
           from: Long, to: Long, version: String = "version",
           deleted: String = "deleted"): DataFrame = {
    require(from <= to, s"from=$from must be <= to=$to")
    val bv = SegmentFs.latestBase(spark, dir)
    val base = spark.read.parquet(baseDir(dir, bv))
    val all = listVersions(spark, s"$dir/delta", "d")
    if (from == -1L && bv != 0L)
      throw new IllegalStateException(
        s"diff from init requires an uncompacted log; base is v=$bv")
    if (from != -1L && all.nonEmpty && all.min > from)
      throw new IllegalStateException(
        s"diff from $from predates the current base — segments <= $from " +
          s"were compacted away (earliest retained: ${all.min})")
    val dataCols = base.columns.toIndexedSeq
    val segs = all.filter(_ <= to)
    if (!segs.exists(_ > from))
      return base.limit(0).withColumn("change", lit(""))
    val delta = segs.map { k =>
      spark.read.parquet(deltaDir(dir, k)).withColumn("__seg", lit(k))
    }.reduce(_ unionByName _)
    val touched = delta.filter(col("__seg") > from).select(col(key)).distinct()
    val deltaT = delta.join(broadcast(touched), Seq(key), "left_semi")
      .select(dataCols.map(col) ++ Seq(col(version).as("__v"),
        col(deleted).as("__d"), lit(1).as("__pri"), col("__seg")): _*)
    val baseT = base.join(broadcast(touched), Seq(key), "left_semi")
      .select(dataCols.map(col) ++ Seq(lit(0L).as("__v"),
        lit(false).as("__d"), lit(0).as("__pri"), lit(-1L).as("__seg")): _*)
    def resolve(cand: DataFrame) = cand
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(key))
          .orderBy(col("__pri").desc, col("__v").desc)))
      .filter(col("__rn") === 1 && !col("__d"))
      .select(col(key), struct(dataCols.map(col): _*).as("__row"))
    val o = resolve(baseT.unionByName(deltaT.filter(col("__seg") <= from)))
      .withColumnRenamed("__row", "__o")
    val n = resolve(baseT.unionByName(deltaT)).withColumnRenamed("__row", "__n")
    o.join(n, Seq(key), "full_outer")
      .withColumn("change",
        when(col("__o").isNull, "insert")
          .when(col("__n").isNull, "delete")
          .when(!(col("__o") <=> col("__n")), "update"))
      .filter(col("change").isNotNull)
      .withColumn("__r",
        when(col("change") === "delete", col("__o")).otherwise(col("__n")))
      .select(dataCols.map(c => col(s"__r.$c")) :+ col("change"): _*)
  }

  /** Streaming CDC sink: every micro-batch appends one delta segment
    * keyed by the batch id (idempotent on replay after a sink-side
    * commit; exactly-once against the checkpoint). Start with
    * `.start()` and compact on whatever cadence suits the log/read
    * amplification trade-off.
    */
  def upsertSink(delta: DataFrame, dir: String): DataStreamWriter[Row] =
    delta.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        appendDelta(batch, dir, Some(batchId)): Unit
    }

  /** Schema of the delta side for a given base schema (adds the CDC
    * version/tombstone columns) — handy for stream sources. */
  def deltaSchema(base: StructType, version: String = "version",
                  deleted: String = "deleted"): StructType =
    StructType(base.fields)
      .add(version, "long", nullable = false)
      .add(deleted, "boolean", nullable = false)
}
