package graft

import graft.sources.FileManifest
import org.apache.spark.sql.functions._

class FileManifestSpec extends SparkSpec {
  import spark.implicits._

  private def hfs(dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  test("listing gates on _SUCCESS; manifest complement drives ticks; record replay is a no-op") {
    val base = java.nio.file.Files.createTempDirectory("fm").toString
    val landing = s"$base/landing"
    val man = s"$base/man"
    Seq(1L, 2L).toDF("v").coalesce(1).write.parquet(s"$landing/a")
    Seq(3L).toDF("v").coalesce(1).write.parquet(s"$landing/b")
    // a torn drop (crashed writer: no _SUCCESS) must stay invisible
    Seq(9L).toDF("v").coalesce(1).write.parquet(s"$landing/torn")
    val hf = hfs(landing)
    hf.delete(new org.apache.hadoop.fs.Path(s"$landing/torn/_SUCCESS"),
      false): Unit
    assert(FileManifest.listDrops(spark, landing) == Seq("a", "b"))
    val nd = FileManifest.newDrops(spark, landing, man)
    assert(nd == Seq("a", "b"))
    assert(col0[Long](FileManifest.readDrops(spark, landing, nd)
      .select($"v").orderBy($"v")) == Seq(1L, 2L, 3L))
    FileManifest.record(spark, man, nd, 1L)
    assert(FileManifest.newDrops(spark, landing, man).isEmpty)
    // replay of the committed tick id: no-op, manifest unchanged
    FileManifest.record(spark, man, nd, 1L)
    assert(FileManifest.processed(spark, man) == Set("a", "b"))
  }

  test("a torn manifest segment is invisible and a replayed record rewrites it") {
    val base = java.nio.file.Files.createTempDirectory("fm2").toString
    val landing = s"$base/landing"
    val man = s"$base/man"
    Seq(7L).toDF("v").coalesce(1).write.parquet(s"$landing/c")
    FileManifest.record(spark, man, Seq("c"), 2L)
    val hf = hfs(man)
    hf.delete(new org.apache.hadoop.fs.Path(s"$man/m=2/_SUCCESS"),
      false): Unit
    // crashed mid-record: the drop must surface as unprocessed again
    assert(FileManifest.newDrops(spark, landing, man) == Seq("c"))
    FileManifest.record(spark, man, Seq("c"), 2L)
    assert(FileManifest.newDrops(spark, landing, man).isEmpty)
    assert(FileManifest.processed(spark, man) == Set("c"))
  }
}
