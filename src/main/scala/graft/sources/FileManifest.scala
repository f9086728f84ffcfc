package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S19 — incremental file-discovery ingest: the FILE-LEVEL watermark of
  * every production lake pipeline. A landing root accrues immutable
  * committed drops (one subdirectory per drop, `_SUCCESS`-gated — the
  * unit a distributed writer commits atomically); a MANIFEST records
  * which drops have been absorbed; each tick reads ONLY the manifest
  * complement, so a day's tick costs O(new data) no matter how large
  * the landing history grows, and a drop is never absorbed twice.
  *
  * Crash contract (at-least-once → exactly-once): the tick processes
  * new drops FIRST and records them in the manifest LAST, so a crash
  * between the two replays the same drops — downstream effects must be
  * keyed by the tick's batch id (the MergeLog/index-append discipline
  * elsewhere in this library) for the replay to collapse. The manifest
  * append itself is `_SUCCESS`-gated and batch-keyed: a replayed
  * `record` for a committed tick is a no-op, a torn one rewrites.
  *
  * Scale shape: listing is one FS namespace scan of drop dirs (not
  * data files); the manifest is a tiny parquet log; the data read
  * touches only the new drops' files. Nothing corpus-sized moves.
  */
object FileManifest {

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Committed drop directories under `landing`, sorted by name — a
    * drop counts once its writer's `_SUCCESS` marker exists; an
    * in-flight or torn drop is invisible.
    */
  def listDrops(spark: SparkSession, landing: String): Seq[String] = {
    val f = fs(spark, landing)
    val root = new org.apache.hadoop.fs.Path(landing)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      .map(_.getName)
      .sorted
  }

  /** Drop names already absorbed, from the committed manifest segments. */
  def processed(spark: SparkSession, manifest: String): Set[String] = {
    val f = fs(spark, manifest)
    val root = new org.apache.hadoop.fs.Path(manifest)
    if (!f.exists(root)) Set.empty
    else {
      val segs = f.listStatus(root).toSeq
        .filter(_.isDirectory)
        .map(_.getPath)
        .filter(p => f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      if (segs.isEmpty) Set.empty
      else spark.read.parquet(segs.map(_.toString): _*)
        .select(col("drop")).collect().map(_.getString(0)).toSet
    }
  }

  /** The tick's work list: committed drops not yet in the manifest. */
  def newDrops(spark: SparkSession, landing: String,
               manifest: String): Seq[String] =
    listDrops(spark, landing).filterNot(processed(spark, manifest))

  /** One DataFrame over exactly the given drops (empty schema-less
    * reads are the caller's concern — pass a non-empty list).
    */
  def readDrops(spark: SparkSession, landing: String,
                drops: Seq[String]): DataFrame =
    spark.read.parquet(drops.map(d => s"$landing/$d"): _*)

  /** Record `drops` as absorbed, as the `_SUCCESS`-gated manifest
    * segment of tick `batchId`. Idempotent: a committed segment for
    * this id makes the call a no-op; a torn one (dir without marker,
    * a crashed prior attempt) is deleted and rewritten.
    */
  def record(spark: SparkSession, manifest: String, drops: Seq[String],
             batchId: Long): Unit = {
    val seg = s"$manifest/m=$batchId"
    val f = fs(spark, manifest)
    val p = new org.apache.hadoop.fs.Path(seg)
    if (f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))) return
    if (f.exists(p)) f.delete(p, true): Unit
    import spark.implicits._
    drops.toDF("drop").coalesce(1).write.parquet(seg)
  }
}
