package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** JSONL sources/sinks — SURVEY.md §2.1 S1–S3. The reference's whole
  * dataflow is JSONL-file → transform → JSONL-file
  * (strict_deduplication.py:6-18 and copies in every stage).
  *
  * Contracts pinned here:
  *  - schema is ALWAYS explicit (schema-on-read, never inference in a
  *    production path — inference means a second scan and a drifting
  *    contract);
  *  - tolerant scans keep malformed lines observable via
  *    `_corrupt_record` instead of dropping them silently
  *    (enhance_fields_of_study.py:228-241 logs bad lines);
  *  - the keyed variant reproduces the reference's dict-build semantics:
  *    key = coalesce(paper_id, id), LAST occurrence wins
  *    (build_simple_dataset.py:23-48 — dict insertion overwrites);
  *  - the sink writes canonical key-ordered JSON via to_json(struct(...))
  *    so golden-file comparison is byte-stable.
  */
object Jsonl {

  /** S1 — strict JSONL scan with explicit schema; malformed lines fail
    * the job (FAILFAST), matching the reference's non-tolerant loaders.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** S1 tolerant variant: malformed lines land in `_corrupt_record`. */
  def readTolerant(spark: SparkSession, path: String,
                   schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** S3 — keyed scan: key = coalesce of `keyCols`, LAST occurrence wins
    * (the reference's dict overwrite). Rows with a null key drop, as the
    * strict variant does (bulid_final_dataset.py:16-48). Requires an
    * explicit order column — at scale "file order" must be carried, not
    * assumed.
    */
  def readKeyedLastWins(df: DataFrame, order: Column,
                        keyCols: Column*): DataFrame = {
    val key = coalesce(keyCols: _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(order.desc)
    df.filter(key.isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** S2 — canonical JSONL sink: fixed column order via struct, one JSON
    * object per line, no partition metadata in the payload.
    */
  def writeCanonical(df: DataFrame, path: String,
                     columns: Seq[String]): Unit =
    df.select(to_json(struct(columns.map(col): _*)).as("value"))
      .write.mode("overwrite").text(path)
}
