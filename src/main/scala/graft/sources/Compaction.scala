package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Size-targeted partitioned parquet sink (beyond the reference — the
  * reference's outputs are single-process JSONL files; at 100 TB the
  * operational problem becomes file-count/file-size control: a write
  * that emits one file per (task × partition-value) turns a daily run
  * into millions of kilobyte files, and a naive
  * `repartition(partitionCols)` fix serializes each partition value
  * through one task).
  *
  * `writeSized` gives both bounds at once:
  *  - an explicit bucket column `pmod(xxhash64(fileKey), spread)` fans
  *    each partition value across `spread` writer tasks, so a hot
  *    partition (one language dominating a corpus) still writes in
  *    parallel;
  *  - `maxRecordsPerFile` is the hard per-file cap, enforced by the
  *    writer itself — no file exceeds it regardless of bucket skew.
  * Files per partition value ≈ min(spread, ceil(rows / targetRows)),
  * never one-file-per-shuffle-task. One shuffle total, no count
  * pre-pass, no driver-side planning loop — layout decisions are all
  * expression-local, so the same call works at any scale.
  */
object Compaction {

  /** Write `df` as `path/col=value/...` parquet with bounded file sizes.
    *
    * @param partitionCols  hive-style output partition columns
    * @param fileKey        deterministic fan-out key (e.g. the record id);
    *                       rows with equal keys land in the same file
    * @param targetRows     hard cap on rows per file (maxRecordsPerFile)
    * @param spread         max writer tasks per partition value
    */
  def writeSized(df: DataFrame, path: String, partitionCols: Seq[String],
                 fileKey: Column, targetRows: Long, spread: Int = 8,
                 mode: String = "overwrite"): Unit = {
    require(spread > 0, s"spread must be positive, got $spread")
    val bucket = pmod(xxhash64(fileKey), lit(spread))
    val parts = partitionCols.map(col) :+ bucket
    df.repartition(parts: _*)
      .write
      .mode(mode)
      .option("maxRecordsPerFile", targetRows)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Scan twin: partition columns come back from directory names, so a
    * write→read round trip is the identity on the data columns. */
  def readSized(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)
}
