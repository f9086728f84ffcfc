package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((1L, "hello world"), (2L, "abc"), (3L, ""))
    .toDF("id", "text")

  test("withFakeMedia produces binary payload + typed metadata struct") {
    val m = Multimodal.withFakeMedia(docs, $"text")
    val mediaField = m.schema("media")
    assert(mediaField.dataType == BinaryType)
    assert(m.schema("media_meta").dataType.catalogString ==
      Multimodal.mediaMetaType.catalogString)
    val r = rows(m.orderBy($"id").select($"media", $"media_meta.media_type")).head
    assert(new String(r.getAs[Array[Byte]](0), "UTF-8") == "hello world")
    assert(r.getString(1) == "image/fake")
  }

  test("StubDecoder features are deterministic, sized, and in [0,1)") {
    val d = new Multimodal.StubDecoder
    val b = "hello world".getBytes("UTF-8")
    val f1 = d.features(b, 8)
    val f2 = d.features(b, 8)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 8)
    assert(f1.forall(x => x >= 0.0 && x < 1.0))
    // position arithmetic: feature 0 of dim 1 is total byte sum mod 997
    val total = b.map(_ & 0xff).sum.toLong % 997
    assert(d.features(b, 1)(0) == total.toDouble / 997.0)
  }

  test("decodeFeatures appends array<double> features; null-safe; batch invariant") {
    val m = Multimodal.withFakeMedia(docs, $"text")
    val a = Multimodal.decodeFeatures(m, "media", 4, new Multimodal.StubDecoder, batchSize = 1)
    val b = Multimodal.decodeFeatures(m, "media", 4, new Multimodal.StubDecoder, batchSize = 99)
    assert(rows(a.orderBy($"id")) == rows(b.orderBy($"id")))
    assert(a.schema("features").dataType == ArrayType(DoubleType))
    val feats = col0[collection.Seq[Double]](a.orderBy($"id").select($"features"))
    assert(feats.head.size == 4)
    assert(feats(2).forall(_ == 0.0)) // empty payload -> zero sums
  }

  test("frameSample yields n byte-range frames that reassemble a prefix") {
    val m = Multimodal.withFakeMedia(docs.filter($"id" === 1), $"text")
    val f = Multimodal.frameSample(m, "media", 4)
    val frames = col0[collection.Seq[Array[Byte]]](f.select($"frames")).head
    assert(frames.size == 4)
    val joined = new String(frames.flatten.toArray, "UTF-8")
    assert("hello world".startsWith(joined.take(8)))
    assert(frames.forall(_.nonEmpty))
  }
}
