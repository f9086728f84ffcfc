package graft

import graft.functions.{TextFunctions => TF}
import graft.sources.Reports
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ReportsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val statsSchema = StructType(Seq(
    StructField("stage", StringType),
    StructField("n_docs", LongType),
    StructField("avg_score", DoubleType),
    StructField("score_str", StringType)))

  private def stats = Seq(
    ("raw", 100L, 5.21, "5.21/10"),
    ("dedup", 95L, 6.5, "6.5/10"),
    ("enhanced", 95L, 7.75, "7.75/10")).toDF(statsSchema.fieldNames: _*)

  test("S8/S10 — CSV sink writes one headered file; scan round-trips values") {
    val dir = tmp("graft-csv")
    Reports.writeCsv(stats, dir, statsSchema.fieldNames)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 1)
    val back = Reports.readCsv(spark, dir, statsSchema).orderBy("stage")
    assert(rows(back) == rows(stats.orderBy("stage")))
  }

  test("S10 — score strings from a CSV scan parse exactly (T19)") {
    val dir = tmp("graft-csv-score")
    Reports.writeCsv(stats, dir, statsSchema.fieldNames)
    val parsed = Reports.readCsv(spark, dir, statsSchema)
      .select($"stage", TF.scoreOfString($"score_str").as("score"))
      .orderBy("stage")
    assert(rows(parsed).map(r => r.getString(0) -> r.getDouble(1)) ==
      Seq("dedup" -> 6.5, "enhanced" -> 7.75, "raw" -> 5.21))
  }

  test("S9 — JSON report is a pretty array that round-trips through a JSON scan") {
    val path = tmp("graft-json") + "/report.json"
    Reports.writeJsonReport(stats.drop("score_str"), path)
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    assert(text.startsWith("[") && text.contains("\n"))  // pretty, not JSONL
    val schema = StructType(statsSchema.dropRight(1))
    val back = Reports.readJsonReport(spark, path, schema).orderBy("stage")
    assert(rows(back) == rows(stats.drop("score_str").orderBy("stage")))
  }
}
