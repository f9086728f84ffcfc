package graft

import graft.sources.Jsonl
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("paper_id", StringType),
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("n", LongType)))

  private def tmpWrite(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("jsonl").toFile
    val f = new java.io.File(dir, "part.jsonl")
    val w = new java.io.PrintWriter(f, "UTF-8")
    lines.foreach(w.println)
    w.close()
    f.getAbsolutePath
  }

  test("read parses JSONL with explicit schema") {
    val p = tmpWrite(Seq(
      """{"paper_id":"a","title":"T1","n":1}""",
      """{"id":"b","title":"T2","n":2}"""))
    val df = Jsonl.read(spark, p, schema)
    assert(df.count() == 2)
    assert(col0[String](df.filter($"n" === 2).select($"id")) == Seq("b"))
  }

  test("readTolerant surfaces malformed lines in _corrupt_record") {
    val p = tmpWrite(Seq(
      """{"paper_id":"a","title":"T1","n":1}""",
      """{broken json"""))
    // Spark refuses to filter a raw scan on _corrupt_record alone
    // (SPARK-21610) — materialize first, as its error message directs.
    val df = Jsonl.readTolerant(spark, p, schema).cache()
    assert(df.count() == 2)
    assert(df.filter($"_corrupt_record".isNotNull).count() == 1)
    assert(df.filter($"paper_id" === "a" && $"_corrupt_record".isNull).count() == 1)
  }

  test("readKeyedLastWins: coalesce key, last occurrence wins, null keys drop") {
    val df = Seq(
      (1L, Some("k1"), None: Option[String], "first"),
      (2L, Some("k1"), None, "second"),     // same key, later -> wins
      (3L, None, Some("k2"), "via-id"),     // key from fallback column
      (4L, None, None, "keyless")           // dropped
    ).toDF("ord", "paper_id", "id", "title")
    val out = Jsonl.readKeyedLastWins(df, $"ord", $"paper_id", $"id")
    val got = rows(out.orderBy($"ord").select($"ord", $"title"))
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got == Seq((2L, "second"), (3L, "via-id")))
  }

  test("writeCanonical emits key-ordered JSON lines that round-trip") {
    val df = Seq(("a", "T1", 1L), ("b", "T2", 2L)).toDF("paper_id", "title", "n")
    val dir = Files.createTempDirectory("jsonl-out").toString + "/out"
    Jsonl.writeCanonical(df, dir, Seq("paper_id", "title", "n"))
    val lines = spark.read.text(dir).collect().map(_.getString(0)).sorted
    assert(lines.toSeq == Seq(
      """{"paper_id":"a","title":"T1","n":1}""",
      """{"paper_id":"b","title":"T2","n":2}"""))
    val back = spark.read.schema(
      StructType(schema.fields.filter(_.name != "id"))).json(dir)
    assert(back.count() == 2)
  }
}
