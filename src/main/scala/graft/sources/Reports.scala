package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ArrayNode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stats-report sinks/scans — SURVEY.md §2.1 S8–S10. The reference's
  * evaluation stages emit small stage-comparison tables as CSV
  * (data_quality_comparison.py:130-135, rag.ipynb:1032-1066) and
  * nested stats dicts as pretty JSON (enhance_scoring.py:603-609,
  * provenance_compliance.py:443-446), then read the CSVs back for
  * visualisation (visualize_dataset_quality.py:11).
  *
  * These are REPORT paths, not data paths: inputs are aggregate
  * outputs (rows ≈ number of stages/languages), so a single-file
  * driver-side sink is the correct shape — the 100 TB never flows
  * through here. Data-scale output stays on the parquet/JSONL sinks.
  */
object Reports {

  /** S8 — canonical CSV sink: fixed column order, header, ONE file
    * (reports feed spreadsheet/plot tooling that expects a single
    * csv). `coalesce(1)` is safe precisely because report tables are
    * small; never use this for data-scale output.
    */
  def writeCsv(df: DataFrame, path: String, columns: Seq[String]): Unit =
    df.select(columns.map(col): _*)
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** S10 — CSV scan with explicit schema (schema-on-read like
    * Jsonl.read; inference would double-scan and drift).
    */
  def readCsv(spark: SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true")
      .option("mode", "FAILFAST").csv(path)

  /** S9 — JSON report sink: rows → pretty-printed JSON array on the
    * driver. Reports are tiny aggregates, so the collect is bounded by
    * construction; the row order of `df` is preserved.
    */
  def writeJsonReport(df: DataFrame, path: String): Unit = {
    val mapper = new ObjectMapper()
    val arr = mapper.createArrayNode().asInstanceOf[ArrayNode]
    df.toJSON.collect().foreach(line => arr.add(mapper.readTree(line)))
    val out = java.nio.file.Paths.get(path)
    if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(arr))
  }

  /** S9 read-back twin for golden tests: the pretty JSON array parses
    * as a multiline JSON document.
    */
  def readJsonReport(spark: SparkSession, path: String,
                     schema: StructType): DataFrame =
    spark.read.schema(schema).option("multiLine", "true").json(path)
}
