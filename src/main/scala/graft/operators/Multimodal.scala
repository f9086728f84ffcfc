package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}

/** Multimodal column support (BASELINE.json "multimodal columns"
  * north-star): image/audio/video payloads ride as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extract /
  * frame-sample run as batched `mapPartitions` stages over the bytes —
  * the Scala-side equivalent of a Pandas-UDF `mapInPandas` batch stage.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[StubDecoder]] derives a deterministic feature frame
  * from the raw bytes. Everything around it — schema, batching,
  * partition-local execution, column contracts — is the real 100 TB
  * plumbing: payload bytes never hit the driver, a real decoder drops in
  * behind the same trait, and feature output lands in an
  * `array<float>`-compatible column ready for the Similarity operators.
  */
object Multimodal {

  /** Typed metadata carried alongside the payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Byte-level decoder contract; a real image/audio codec implements
    * this. Must be serializable (ships to executors).
    */
  trait MediaDecoder extends Serializable {
    /** Decode a payload into a fixed-dimension feature vector. */
    def features(bytes: Array[Byte], dim: Int): Array[Double]
  }

  /** Deterministic stand-in codec: feature c = (Σ unsigned bytes at
    * positions ≡ c (mod dim)) mod 997 / 997 — engine-independent, so the
    * DuckDB oracle can recompute it from the same payload.
    */
  final class StubDecoder extends MediaDecoder {
    def features(bytes: Array[Byte], dim: Int): Array[Double] = {
      val sums = new Array[Long](dim)
      var i = 0
      while (i < bytes.length) {
        sums(i % dim) += bytes(i) & 0xff
        i += 1
      }
      sums.map(s => (s % 997).toDouble / 997.0)
    }
  }

  /** Demo/test fixture: synthesize a binary media column (UTF-8 payload
    * of a text column) plus a plausible metadata struct. In production
    * the payload arrives from the source (parquet/binaryFile).
    */
  def withFakeMedia(df: DataFrame, text: Column): DataFrame =
    df.withColumn("media", encode(text, "UTF-8").cast(BinaryType))
      .withColumn("media_meta", struct(
        lit("image/fake").as("media_type"),
        (length(text) % 1024).cast("int").as("width"),
        (length(text) % 768).cast("int").as("height"),
        lit(0L).as("duration_ms")))

  /** Feature extraction over the binary column: batched mapPartitions
    * through the decoder, appending `array<double>` features. Payloads
    * stay executor-local; batch size bounds decoder memory.
    */
  def decodeFeatures(df: DataFrame, binCol: String, dim: Int,
                     decoder: MediaDecoder, outCol: String = "features",
                     batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(DoubleType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](binCol)
          val f =
            if (bytes == null) null
            else decoder.features(bytes, dim).toSeq
          Row.fromSeq(r.toSeq :+ f)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling: n evenly-spaced byte-range "frames" from a payload
    * (the video-decode shape: sample k frames, decode each). Returns
    * array<binary>; empty payload ⇒ empty array.
    */
  def frameSample(df: DataFrame, binCol: String, n: Int,
                  outCol: String = "frames",
                  batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(BinaryType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](binCol)
          val frames =
            if (bytes == null || bytes.isEmpty) Seq.empty[Array[Byte]]
            else {
              val frameLen = math.max(1, bytes.length / n)
              (0 until math.min(n, bytes.length)).map { i =>
                val start = i * frameLen
                bytes.slice(start, math.min(start + frameLen, bytes.length))
              }
            }
          Row.fromSeq(r.toSeq :+ frames)
        }
      }
    }(Encoders.row(outSchema))
  }
}
