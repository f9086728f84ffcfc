package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the CO-LOCATED JOIN answer at corpus scale
  * (the third layout tool beside [[Compaction.writeSized]]'s size-bounded
  * hive partitions and `writeZOrdered`'s 2D clustering): both sides of a
  * recurring join land pre-hash-partitioned on the join key into the
  * same bucket count, so every future join on that key plans with ZERO
  * shuffle exchanges — the 100 TB fact-to-dim and fact-to-fact pattern
  * where re-shuffling the big table per query is the dominant cost.
  * Spark's bucketing metadata lives in the session catalog; the files
  * are plain parquet at `path` (external table), so the layout survives
  * the session and re-registers on the next one.
  */
object Buckets {

  /** Land `df` as an external bucketed+sorted parquet table: hashed into
    * `numBuckets` by `key`, rows sorted by `key` within each bucket
    * file. `repartition(numBuckets, key)` first, so each bucket is ONE
    * file and bucket-side sorts vanish from downstream merge joins.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, numBuckets: Int): Unit =
    df.repartition(numBuckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite")
      .bucketBy(numBuckets, key).sortBy(key)
      .option("path", path).format("parquet")
      .saveAsTable(table)

  /** The registered bucketed table (bucket metadata intact — joins on
    * the bucket key skip the exchange).
    */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
