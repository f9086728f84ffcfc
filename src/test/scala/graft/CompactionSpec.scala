package graft

import graft.sources.Compaction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def mkData = (1L to 600L).map(i =>
    (i, s"text-$i", Seq("en", "zh", "de")((i % 3).toInt))).toDF(
    "id", "payload", "lang")

  private def parquetFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).toSeq.flatten.flatMap {
      case d if d.isDirectory => parquetFiles(d)
      case f if f.getName.endsWith(".parquet") => Seq(f)
      case _ => Nil
    }

  test("writeSized round-trips losslessly through hive-style partitions") {
    val out = Scratch.dir("compaction_rt")
    Compaction.writeSized(mkData, out, Seq("lang"), $"id",
      targetRows = 50L, spread = 2)
    val schema = StructType.fromDDL("id LONG, payload STRING, lang STRING")
    val back = Compaction.readSized(spark, out, schema)
      .select($"id", $"payload", $"lang").orderBy($"id")
    assert(rows(back).map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      == rows(mkData.orderBy($"id"))
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))))
  }

  test("writeSized bounds every file at targetRows and keeps file counts sane") {
    val out = Scratch.dir("compaction_caps")
    Compaction.writeSized(mkData, out, Seq("lang"), $"id",
      targetRows = 50L, spread = 2)
    val langDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang="))
    assert(langDirs.map(_.getName).sorted.toSeq
      == Seq("lang=de", "lang=en", "lang=zh"))
    langDirs.foreach { d =>
      val files = parquetFiles(d)
      val perFile = files.map(f =>
        spark.read.parquet(f.getAbsolutePath).count())
      // hard cap from maxRecordsPerFile
      assert(perFile.forall(_ <= 50L), s"${d.getName}: $perFile")
      // 200 rows per lang at cap 50 ⇒ at least 4 files; the 2-bucket
      // fan-out over ≤4 shuffle tasks caps the split count at 8
      assert(files.size >= 4 && files.size <= 8,
        s"${d.getName}: ${files.size} files")
      assert(perFile.sum == 200L)
    }
  }

  test("g3 layout: two-level (lang, bin_range) partitioning prunes and caps") {
    // the g3 shape: per-doc packed layout written under
    // lang=<v>/bin_range=<r>/ — a reader of one shard lists only its
    // directories
    val laid = (1L to 300L).map(i => (i, Seq("en", "zh")((i % 2).toInt),
        (i / 25L), (i / 25L) / 8L, 10L + i % 5, i * 10L))
      .toDF("doc_id", "lang", "bin", "bin_range", "n_tok", "start_tok")
    val out = Scratch.dir("compaction_g3")
    Compaction.writeSized(laid, out, Seq("lang", "bin_range"), $"doc_id",
      targetRows = 40L, spread = 2)
    val langDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang="))
    assert(langDirs.map(_.getName).sorted.toSeq == Seq("lang=en", "lang=zh"))
    langDirs.foreach { ld =>
      val rangeDirs = ld.listFiles().filter(f =>
        f.isDirectory && f.getName.startsWith("bin_range="))
      assert(rangeDirs.nonEmpty, ld.getName)
      rangeDirs.foreach { rd =>
        val perFile = parquetFiles(rd).map(f =>
          spark.read.parquet(f.getAbsolutePath).count())
        assert(perFile.forall(_ <= 40L), s"${rd.getName}: $perFile")
      }
    }
    // pruning: a single (lang, bin_range) directory read touches only
    // its own rows
    val shard = spark.read
      .schema(StructType.fromDDL(
        "doc_id LONG, bin LONG, n_tok LONG, start_tok LONG"))
      .parquet(s"$out/lang=en/bin_range=0")
    assert(shard.count() ==
      laid.filter($"lang" === "en" && $"bin_range" === 0L).count())
  }

  test("writeSized bucket co-location is deterministic across runs") {
    // file names differ run to run (task/attempt ids), so compare the
    // STRUCTURE: which ids share a shuffle bucket. xxhash64(id) % spread
    // is a pure function of the key — never row position or rand — so
    // the grouping must be identical.
    def buckets(out: String): Map[String, Set[Long]] =
      spark.read.parquet(out).select($"id", input_file_name())
        .collect()
        .groupBy(_.getString(1))
        .map { case (f, rs) => (f, rs.map(_.getLong(0)).toSet) }
        .values.toSeq
        // canonicalize: name each file group by its smallest id
        .map(ids => (ids.min.toString, ids)).toMap
    val out1 = Scratch.dir("compaction_d1")
    val out2 = Scratch.dir("compaction_d2")
    // spread=1, huge cap ⇒ exactly one file per (lang, bucket) group, so
    // the file partition of ids is exactly the bucket partition
    Compaction.writeSized(mkData, out1, Seq("lang"), $"id", 100000L, 1)
    Compaction.writeSized(mkData, out2, Seq("lang"), $"id", 100000L, 1)
    assert(buckets(out1) == buckets(out2))
    val expected = rows(mkData.groupBy($"lang")
        .agg(collect_set($"id").as("ids")).select($"ids"))
      .map(_.getSeq[Long](0).toSet)
      .map(ids => (ids.min.toString, ids)).toMap
    assert(buckets(out1) == expected)
  }
}
