package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}

/** Multimodal column support (BASELINE.json "multimodal columns"
  * north-star): image/audio/video payloads ride as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extract /
  * frame-sample run as batched `mapPartitions` stages over the bytes —
  * the Scala-side equivalent of a Pandas-UDF `mapInPandas` batch stage.
  *
  * Decode depth (no external codec libraries anywhere): the HEADER
  * parses are real — [[pngDims]] / [[jpegDims]] read width/height
  * straight from PNG IHDR / JPEG SOF bytes as pure expressions (no
  * library, no UDF), with GIF/BMP/WAV/MP4 beside them — and since r16
  * the PIXEL/SAMPLE decodes are real too for the self-describing
  * formats: BMP 24bpp (m6), PCM s16le (m7), full PNG including
  * DEFLATE + all five defilters (expressions/PngPixelStats), GIF
  * including variable-width LZW (expressions/GifPixelStats). Only the
  * GENERIC feature-extract trait below keeps a stub implementation:
  * [[StubDecoder]] derives a deterministic feature frame from raw
  * bytes where a lossy-codec library (JPEG DCT, video) would sit.
  * Everything around it — schema, batching, partition-local
  * execution, column contracts — is the real 100 TB plumbing: payload
  * bytes never hit the driver, a real decoder drops in behind the
  * same trait, and feature output lands in an `array<float>`-
  * compatible column ready for the Similarity operators.
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

  /** Ingest a directory of media files via Spark's `binaryFile` source —
    * the production entry point for image/audio directories: one row per
    * file (path, length, payload bytes), fully distributed (files are
    * listed and read executor-side, never through the driver).
    * `glob` prunes at LISTING time (pathGlobFilter — non-matching files
    * are never opened); `maxBytes` drops oversized payloads before they
    * can blow an executor's task memory, using the source's `length`
    * column so the filter needs no file contents. Feed the result
    * straight to [[decodeFeatures]] / [[pngDims]] / [[wavInfo]].
    */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*",
                    maxBytes: Long = 64L * 1024 * 1024): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .filter(col("length") <= maxBytes)
      .select(col("path"), col("length"), col("content").as("media"))

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

  /** Hex of the fixed PNG prefix a well-formed file must carry: 8-byte
    * signature + IHDR chunk length (13) + "IHDR" type (bytes 0-15).
    */
  val pngSigIhdrHex: String = "89504E470D0A1A0A" + "0000000D" + "49484452"

  /** PNG IHDR width/height as a pure binary expression — a REAL header
    * parse, no codec library: hex the payload once, check the 16-byte
    * signature+IHDR prefix, and read the two big-endian u32s at byte
    * offsets 16 and 20 (PNG spec §5.2/§11.2.2). Returns
    * struct(width BIGINT, height BIGINT), NULL for truncated or
    * non-PNG payloads (never throws — every read is length-guarded, so
    * ANSI mode stays safe).
    */
  def pngDims(bin: Column): Column = bind(upper(hex(bin))) { h =>
    when(length(bin) >= 24 && substring(h, 1, 32) === pngSigIhdrHex,
      struct(
        conv(substring(h, 33, 8), 16, 10).cast("long").as("width"),
        conv(substring(h, 41, 8), 16, 10).cast("long").as("height")))
  }

  /** JPEG SOF width/height as a pure expression — a real bounded segment
    * walk, not a fixed-offset peek: after the FFD8 SOI, each marker
    * segment carries a big-endian u16 length, so the walker hops
    * segment-to-segment (APPn/COM/DQT/... all skip uniformly) until it
    * hits an SOF0-SOF3 frame header (FFC0-FFC3) and reads
    * height@+5/width@+7 (ITU T.81 §B.2.2). The walk is an `aggregate`
    * over a `maxSegments` sequence with a struct(off,width,height)
    * accumulator — each step references the accumulator once, so the
    * expression stays linear in `maxSegments` (a when-cascade unroll
    * would square it). Truncated/malformed input → NULL at the first
    * unreadable byte; every substring is length-guarded (ANSI-safe).
    */
  def jpegDims(bin: Column, maxSegments: Int = 8): Column =
    bind(upper(hex(bin))) { h =>
      val n = length(h)
      def hp(off: Column) = substring(h, off * 2 + 1, lit(2))
      def v16(off: Column) = conv(substring(h, off * 2 + 1, lit(4)), 16, 10).cast("long")
      val nullL = lit(null).cast("long")
      val dead = struct(nullL.as("off"), nullL.as("width"), nullL.as("height"))
      val start = struct(lit(2L).as("off"), nullL.as("width"), nullL.as("height"))
      val walk = aggregate(
        sequence(lit(1), lit(maxSegments)), start,
        (a, _) => {
          val off = a.getField("off")
          val done = a.getField("width").isNotNull
          // marker (2 bytes) + segment length (2 bytes) must be in range
          val canRead = off.isNotNull && (off * 2 + 8) <= n
          val m = hp(off + 1)
          val isSof = m >= "C0" && m <= "C3"
          val hasDims = (off * 2 + 18) <= n
          when(done, a)
            .when(!canRead || hp(off) =!= "FF", dead)
            .when(isSof && hasDims, struct(off.as("off"),
              v16(off + 7).as("width"), v16(off + 5).as("height")))
            .when(isSof, dead)
            .otherwise(struct((off + 2 + v16(off + 2)).as("off"),
              nullL.as("width"), nullL.as("height")))
        })
      bind(walk) { walked =>
        when(length(bin) >= 2 && substring(h, 1, 4) === "FFD8" &&
            walked.getField("width").isNotNull,
          struct(walked.getField("width").as("width"),
            walked.getField("height").as("height")))
      }
    }

  /** Evaluate `c` ONCE per row and hand the bound value to `f` as a
    * lambda variable — see [[graft.functions.TextFunctions.letBound]]
    * (each `getField` on a header chunk walk would otherwise re-run the
    * whole walk).
    */
  private def bind(c: Column)(f: Column => Column): Column =
    graft.functions.TextFunctions.letBound(c)(f)

  /** Little-endian u16 at byte offset `off` of hex string `h` (1-indexed
    * hex chars; byte o lives at chars o*2+1..o*2+2).
    */
  private def leU16(h: Column, off: Column): Column =
    conv(concat(substring(h, off * 2 + 3, lit(2)),
      substring(h, off * 2 + 1, lit(2))), 16, 10).cast("long")

  /** Little-endian u32 at byte offset `off` of hex string `h`. */
  private def leU32(h: Column, off: Column): Column =
    conv(concat(substring(h, off * 2 + 7, lit(2)),
      substring(h, off * 2 + 5, lit(2)),
      substring(h, off * 2 + 3, lit(2)),
      substring(h, off * 2 + 1, lit(2))), 16, 10).cast("long")

  /** WAV/RIFF audio header as a pure expression — the audio leg of the
    * multimodal column suite, same shape as [[jpegDims]]'s segment walk:
    * after the "RIFF....WAVE" preamble, chunks carry an id + a
    * little-endian u32 length, so the walker hops chunk-to-chunk
    * (JUNK/LIST/... skip uniformly, odd lengths pad to even per the
    * RIFF spec) collecting the `fmt ` fields (channels@+10, sample
    * rate@+12, byte rate@+16, bits@+22 — all little-endian) and the
    * declared `data` chunk length, until it has both. Returns
    * struct(channels, sample_rate, bits_per_sample, duration_ms) with
    * duration derived as data_len·1000/byte_rate; NULL for truncated or
    * non-WAV payloads (every read is length-guarded — ANSI-safe), and
    * the byte-rate division is guarded against zero.
    */
  def wavInfo(bin: Column, maxChunks: Int = 8): Column =
    bind(upper(hex(bin))) { h =>
      val n = length(h)
      val nullL = lit(null).cast("long")
      def carry(off: Column, a: Column) = struct(off.as("off"),
        a.getField("ch").as("ch"), a.getField("rate").as("rate"),
        a.getField("brate").as("brate"), a.getField("bits").as("bits"),
        a.getField("dlen").as("dlen"))
      val dead = struct(nullL.as("off"), nullL.as("ch"), nullL.as("rate"),
        nullL.as("brate"), nullL.as("bits"), nullL.as("dlen"))
      val start = struct(lit(12L).as("off"), nullL.as("ch"), nullL.as("rate"),
        nullL.as("brate"), nullL.as("bits"), nullL.as("dlen"))
      val walk = aggregate(
        sequence(lit(1), lit(maxChunks)), start,
        (a, _) => {
          val off = a.getField("off")
          val done = a.getField("ch").isNotNull && a.getField("dlen").isNotNull
          // chunk id (4 bytes) + chunk length (4 bytes) must be in range
          val canRead = off.isNotNull && (off * 2 + 16) <= n
          val id = substring(h, off * 2 + 1, lit(8))
          val len = leU32(h, off + 4)
          val next = off + 8 + len + pmod(len, lit(2)) // RIFF pads chunks to even
          when(done, a)
            .when(!canRead, dead)
            // "fmt " with its 16 mandatory bytes readable
            .when(id === "666D7420" && (off * 2 + 48) <= n &&
                a.getField("ch").isNull,
              struct(next.as("off"), leU16(h, off + 10).as("ch"),
                leU32(h, off + 12).as("rate"), leU32(h, off + 16).as("brate"),
                leU16(h, off + 22).as("bits"), a.getField("dlen").as("dlen")))
            // "data": only the DECLARED length is read (header-only parse)
            .when(id === "64617461" && a.getField("dlen").isNull,
              struct(next.as("off"), a.getField("ch").as("ch"),
                a.getField("rate").as("rate"), a.getField("brate").as("brate"),
                a.getField("bits").as("bits"), len.as("dlen")))
            .otherwise(carry(next, a))
        })
      bind(walk) { walked =>
        when(length(bin) >= 12 && substring(h, 1, 8) === "52494646" &&
            substring(h, 17, 8) === "57415645" &&
            walked.getField("ch").isNotNull && walked.getField("dlen").isNotNull &&
            walked.getField("brate") > 0,
          struct(walked.getField("ch").as("channels"),
            walked.getField("rate").as("sample_rate"),
            walked.getField("bits").as("bits_per_sample"),
            floor(walked.getField("dlen").cast("double") * 1000.0 /
              walked.getField("brate")).cast("long").as("duration_ms")))
      }
    }

  /** GIF logical-screen width/height as a pure expression: "GIF87a" or
    * "GIF89a" signature (bytes 0-5), then two little-endian u16s at byte
    * offsets 6 and 8 (GIF89a spec §18). NULL for truncated or non-GIF
    * payloads.
    */
  def gifDims(bin: Column): Column = bind(upper(hex(bin))) { h =>
    when(length(bin) >= 10 &&
        (substring(h, 1, 12) === "474946383761" ||
         substring(h, 1, 12) === "474946383961"),
      struct(leU16(h, lit(6)).as("width"), leU16(h, lit(8)).as("height")))
  }

  /** Big-endian u32 at byte offset `off` of hex string `h`. */
  private def beU32(h: Column, off: Column): Column =
    conv(substring(h, off * 2 + 1, lit(8)), 16, 10).cast("long")

  /** BMP (BITMAPINFOHEADER) info as a pure expression: "BM" signature,
    * DIB header size 40 at byte 14, SIGNED little-endian width/height
    * at 18/22 (negative height = top-down row order, BMP spec), bits
    * per pixel at 28. NULL for truncated or non-BMP payloads — every
    * read is length-guarded (ANSI-safe).
    */
  def bmpInfo(bin: Column): Column = bind(upper(hex(bin))) { h =>
    def s32(v: Column) =
      when(v >= lit(1L << 31), v - lit(1L << 32)).otherwise(v)
    when(length(bin) >= 30 && substring(h, 1, 4) === "424D" &&
        leU32(h, lit(14)) === 40,
      struct(s32(leU32(h, lit(18))).as("width"),
        s32(leU32(h, lit(22))).as("height"),
        leU16(h, lit(28)).as("bits_per_pixel")))
  }

  /** m6 — 24bpp uncompressed BMP PIXEL decode as a pure expression:
    * the one mainstream image family whose pixels need no codec (raw
    * BGR triples, rows bottom-up unless height < 0, each row padded
    * to a 4-byte boundary — BMP spec). Returns
    * struct(n_px, b_sum, g_sum, r_sum, rw_sum): exact integer channel
    * sums plus a POSITION-WEIGHTED red sum (weight = logical top-down
    * y·w + x + 1). The weighted sum is the honesty term: plain sums
    * are spatial-order-invariant, so only a decoder that maps byte
    * position → (x, y) through the bottom-up row order AND the row
    * padding correctly can match a formula-only oracle. NULL for
    * truncated, compressed, non-24bpp, or non-BMP payloads; every
    * branch that could walk pixels is gated so malformed headers
    * yield an EMPTY walk, never a garbage-length sequence.
    *
    * Scale note: per-pixel reads are substring/conv over the ONE
    * letBound hex string; payloads here are thumbnail-sized by
    * contract (the resize stage bounds bytes upstream), so the
    * per-row HOF walk is O(n_px) tiny and the expression stays a
    * scan-fused projection.
    */
  def bmpPixelStats(bin: Column): Column = bind(upper(hex(bin))) { h =>
    def s32(v: Column) =
      when(v >= lit(1L << 31), v - lit(1L << 32)).otherwise(v)
    def u8(off: Column) =
      conv(substring(h, off * 2 + 1, lit(2)), 16, 10).cast("long")
    val dataOff = leU32(h, lit(10))
    val w = s32(leU32(h, lit(18)))
    val hRaw = s32(leU32(h, lit(22)))
    val habs = abs(hRaw)
    val rowSize = w * 3 + pmod(lit(4L) - pmod(w * 3, lit(4L)), lit(4L))
    val valid = length(bin) >= 54 && substring(h, 1, 4) === "424D" &&
      leU32(h, lit(14)) === 40 && leU16(h, lit(28)) === 24 &&
      leU32(h, lit(30)) === 0 && w >= 1 && habs >= 1 &&
      length(bin) >= dataOff + rowSize * habs
    val g0 = struct(dataOff.as("o"), w.as("w"), hRaw.as("hr"),
      habs.as("h"), rowSize.as("rs"),
      when(valid, w * habs).otherwise(lit(0L)).as("n"))
    bind(g0) { g =>
      val zero = struct(lit(0L).as("b"), lit(0L).as("g"), lit(0L).as("r"),
        lit(0L).as("rw"))
      val acc = aggregate(
        sequence(lit(0L), g.getField("n") - 1),
        zero,
        (a, i) => {
          val x = pmod(i, g.getField("w"))
          // exact: (i − x) is divisible by w, so the double divide is
          // integral and the cast truncates nothing
          val yLog = ((i - x) / g.getField("w")).cast("long")
          val yPhys = when(g.getField("hr") < 0, yLog)
            .otherwise(g.getField("h") - 1 - yLog)
          val off = g.getField("o") + yPhys * g.getField("rs") + x * 3
          struct(
            (a.getField("b") + u8(off)).as("b"),
            (a.getField("g") + u8(off + 1)).as("g"),
            (a.getField("r") + u8(off + 2)).as("r"),
            (a.getField("rw") + u8(off + 2) *
              (yLog * g.getField("w") + x + 1)).as("rw"))
        })
      when(g.getField("n") > 0,
        bind(acc)(a => struct(g.getField("n").as("n_px"),
          a.getField("b").as("b_sum"), a.getField("g").as("g_sum"),
          a.getField("r").as("r_sum"), a.getField("rw").as("rw_sum"))))
    }
  }

  /** m7 — 16-bit PCM WAV SAMPLE decode as a pure expression: the audio
    * twin of [[bmpPixelStats]] — PCM needs no codec either (raw s16le
    * samples after the canonical 44-byte RIFF/fmt/data layout this
    * decoder requires; chunk-walking containers stay [[wavInfo]]'s
    * job). Returns struct(n_samples, sum_abs, max_abs, n_zero_cross):
    * exact integer amplitude stats plus the zero-crossing count — the
    * positional honesty term (crossings compare ADJACENT samples, so
    * endianness, sign decoding, and sample order must all be right for
    * a formula-only oracle to match). NULL for truncated, compressed,
    * multi-channel, or non-16-bit payloads; malformed headers yield an
    * EMPTY walk, never a garbage-length sequence.
    */
  def wavSampleStats(bin: Column): Column = bind(upper(hex(bin))) { h =>
    val dlen = leU32(h, lit(40))
    val valid = length(bin) >= 44 && substring(h, 1, 8) === "52494646" &&
      substring(h, 17, 8) === "57415645" &&
      substring(h, 25, 8) === "666D7420" &&
      leU32(h, lit(16)) === 16 && leU16(h, lit(20)) === 1 &&
      leU16(h, lit(22)) === 1 && leU16(h, lit(34)) === 16 &&
      substring(h, 73, 8) === "64617461" &&
      pmod(dlen, lit(2L)) === 0 && length(bin) >= dlen + 44
    val g0 = struct(
      when(valid, (dlen / lit(2L)).cast("long")).otherwise(lit(0L)).as("n"))
    bind(g0) { g =>
      val zero = struct(lit(0L).as("sa"), lit(0L).as("ma"),
        lit(0L).as("zc"), lit(0L).as("prev"))
      val acc = aggregate(
        sequence(lit(0L), g.getField("n") - 1),
        zero,
        (a, i) => {
          val raw = conv(concat(substring(h, i * 4 + 91, lit(2)),
            substring(h, i * 4 + 89, lit(2))), 16, 10).cast("long")
          val s = when(raw >= 32768L, raw - 65536L).otherwise(raw)
          struct(
            (a.getField("sa") + abs(s)).as("sa"),
            greatest(a.getField("ma"), abs(s)).as("ma"),
            (a.getField("zc") + when(i > 0 &&
              (s < 0) =!= (a.getField("prev") < 0), 1L).otherwise(0L))
              .as("zc"),
            s.as("prev"))
        })
      when(g.getField("n") > 0,
        bind(acc)(a => struct(g.getField("n").as("n_samples"),
          a.getField("sa").as("sum_abs"), a.getField("ma").as("max_abs"),
          a.getField("zc").as("n_zero_cross"))))
    }
  }

  /** m10 — frame-level PCM ENERGY (the voice-activity work list): the
    * [[wavSampleStats]] byte walk framed into fixed windows of
    * `frameLen` samples (last frame partial, its true length reported).
    * Returns array<struct(frame, n, energy, peak)> — energy = Σ s²,
    * peak = max |s|, both exact BIGINTs, so the downstream activity
    * census (energy ≥ n·threshold²) is pure integer arithmetic. Same
    * validity mask as wavSampleStats: invalid or empty payloads → NULL
    * (an explode then drops them). Frame starts come from a STEPPED
    * sequence (no long division anywhere); the hex string is letBound
    * once per row, not per sample.
    */
  def wavFrameEnergies(bin: Column, frameLen: Int): Column = {
    require(frameLen >= 1, "wavFrameEnergies needs frameLen >= 1")
    bind(upper(hex(bin))) { h =>
      val dlen = leU32(h, lit(40))
      val valid = length(bin) >= 44 && substring(h, 1, 8) === "52494646" &&
        substring(h, 17, 8) === "57415645" &&
        substring(h, 25, 8) === "666D7420" &&
        leU32(h, lit(16)) === 16 && leU16(h, lit(20)) === 1 &&
        leU16(h, lit(22)) === 1 && leU16(h, lit(34)) === 16 &&
        substring(h, 73, 8) === "64617461" &&
        pmod(dlen, lit(2L)) === 0 && length(bin) >= dlen + 44
      val g0 = struct(
        when(valid, (dlen / lit(2L)).cast("long")).otherwise(lit(0L)).as("n"))
      bind(g0) { g =>
        val n = g.getField("n")
        when(n > 0,
          transform(
            sequence(lit(0L), n - 1, lit(frameLen.toLong)),
            (lo, fi) => {
              val hi = least(lo + frameLen, n) - 1
              val zero = struct(lit(0L).as("e"), lit(0L).as("p"))
              val acc = aggregate(
                sequence(lo, hi),
                zero,
                (a, i) => {
                  val raw = conv(concat(substring(h, i * 4 + 91, lit(2)),
                    substring(h, i * 4 + 89, lit(2))), 16, 10).cast("long")
                  val s = when(raw >= 32768L, raw - 65536L).otherwise(raw)
                  struct(
                    (a.getField("e") + s * s).as("e"),
                    greatest(a.getField("p"), abs(s)).as("p"))
                })
              bind(acc)(a => struct(
                fi.cast("int").as("frame"),
                (hi - lo + 1).cast("int").as("n"),
                a.getField("e").as("energy"),
                a.getField("p").as("peak")))
            }))
      }
    }
  }

  /** 2⁰..2³¹ for lambda-indexed bit packing (shiftleft needs a constant
    * shift amount) — the [[graft.functions.VectorFunctions.signBits]]
    * convention: 32 bits per BIGINT word, so words replay as plain
    * BIGINT sums in DuckDB with no 2⁶³ sign-bit hazard.
    */
  private val pow2 = array((0 until 32).map(i => lit(1L << i)): _*)

  /** m8 — perceptual difference-hash (dHash) over REAL decoded 24bpp
    * BMP pixels as a pure expression: nearest-neighbor downsample onto
    * a 9×8 luma lattice (integer sample positions x = ⌊gx·w/9⌋,
    * y = ⌊gy·h/8⌋ over the decoded pixel grid — any source size maps
    * to the same 64-bit signature), luma as the INTEGER BT.601 weights
    * 299R + 587G + 114B (comparisons only, never divided), bit
    * gy·8+gx set iff luma(gx,gy) > luma(gx+1,gy). Returns two BIGINT
    * words of 32 bits ([[graft.functions.VectorFunctions
    * .hammingDistance]] scores pairs). Row order, padding, and channel
    * order are all load-bearing through the same offset walk as
    * [[bmpPixelStats]]; a uniform brightness shift cancels in the
    * adjacent-luma comparisons — the dHash robustness property the m8
    * query exercises. NULL for malformed/truncated/non-24bpp payloads.
    */
  def bmpDHash(bin: Column): Column = bind(upper(hex(bin))) { h =>
    def s32(v: Column) =
      when(v >= lit(1L << 31), v - lit(1L << 32)).otherwise(v)
    def u8(off: Column) =
      conv(substring(h, off * 2 + 1, lit(2)), 16, 10).cast("long")
    val dataOff = leU32(h, lit(10))
    val w = s32(leU32(h, lit(18)))
    val hRaw = s32(leU32(h, lit(22)))
    val habs = abs(hRaw)
    val rowSize = w * 3 + pmod(lit(4L) - pmod(w * 3, lit(4L)), lit(4L))
    val valid = length(bin) >= 54 && substring(h, 1, 4) === "424D" &&
      leU32(h, lit(14)) === 40 && leU16(h, lit(28)) === 24 &&
      leU32(h, lit(30)) === 0 && w >= 1 && habs >= 1 &&
      length(bin) >= dataOff + rowSize * habs
    val g0 = struct(dataOff.as("o"), w.as("w"), hRaw.as("hr"),
      habs.as("h"), rowSize.as("rs"), valid.as("ok"))
    bind(g0) { g =>
      // exact: gx·w ≤ 8·2³¹ and gy·h ≤ 7·2³¹ sit far inside double's
      // 2⁵³ integer range, so the float divide + floor is the integer
      // quotient
      def lumaAt(gx: Column, gy: Column): Column = {
        val x = floor((gx * g.getField("w")).cast("double") / 9.0)
          .cast("long")
        val yLog = floor((gy * g.getField("h")).cast("double") / 8.0)
          .cast("long")
        val yPhys = when(g.getField("hr") < 0, yLog)
          .otherwise(g.getField("h") - 1 - yLog)
        val off = g.getField("o") + yPhys * g.getField("rs") + x * 3
        u8(off) * 114L + u8(off + 1) * 587L + u8(off + 2) * 299L
      }
      when(g.getField("ok"),
        transform(sequence(lit(0L), lit(1L)), wd =>
          aggregate(sequence(lit(0L), lit(31L)), lit(0L), (acc, j) => {
            val i = wd * 32 + j
            val gx = pmod(i, lit(8L))
            // (i − gx) divisible by 8: the divide is integral
            val gy = ((i - gx) / lit(8L)).cast("long")
            acc + when(lumaAt(gx, gy) > lumaAt(gx + 1, gy),
              element_at(pow2, (j + 1).cast("int"))).otherwise(lit(0L))
          })))
    }
  }

  /** MP4/ISO-BMFF `ftyp` box as a pure expression (ISO/IEC 14496-12
    * §4.3 — the box every .mp4/.mov-family file leads with): big-endian
    * u32 box size, type "ftyp" at byte 4, major-brand 4cc at 8, minor
    * version at 12, compatible-brand 4ccs filling the rest of the box.
    * Returns struct(major_brand, minor_version, n_brands); NULL for
    * truncated or non-BMFF payloads (box must be fully present — the
    * brand count reads only the DECLARED, in-range box).
    */
  def mp4Info(bin: Column): Column = bind(upper(hex(bin))) { h =>
    val size = beU32(h, lit(0))
    when(length(bin) >= 16 && substring(h, 9, 8) === "66747970" &&
        size >= 16 && pmod(size, lit(4)) === 0 && length(bin) >= size,
      struct(decode(unhex(substring(h, 17, 8)), "UTF-8").as("major_brand"),
        beU32(h, lit(12)).as("minor_version"),
        floor((size - 16).cast("double") / 4.0).cast("long").as("n_brands")))
  }

  /** MP4/ISO-BMFF movie header (`moov`/`mvhd`, ISO/IEC 14496-12 §8.2.2)
    * as a pure expression — the duration leg the frame-sample scheduler
    * needs. Box walk in [[wavInfo]]'s bounded-fold shape: hop top-level
    * boxes by their declared big-endian u32 size, DESCEND into `moov`
    * (+8, its children are boxes too), capture version-0 `mvhd`'s
    * timescale (box+20) and duration ticks (box+24). Returns
    * struct(timescale, duration_ticks) — derive milliseconds as
    * `(duration_ticks · 1000) div timescale`, exact integer arithmetic,
    * at the call site. NULL for truncated/non-BMFF payloads, version-1
    * (64-bit) headers, and zero timescales (every read is
    * length-guarded — ANSI-safe).
    */
  def mvhdInfo(bin: Column, maxBoxes: Int = 8): Column =
    bind(upper(hex(bin))) { h =>
      val n = length(h)
      val nullL = lit(null).cast("long")
      val dead = struct(nullL.as("off"), nullL.as("ts"), nullL.as("dur"))
      val start = struct(lit(0L).as("off"), nullL.as("ts"), nullL.as("dur"))
      val walk = aggregate(
        sequence(lit(1), lit(maxBoxes)), start,
        (a, _) => {
          val off = a.getField("off")
          val done = a.getField("ts").isNotNull
          // box size (4) + type (4) must be in range, size sane
          val canRead = off.isNotNull && (off * 2 + 16) <= n
          val size = beU32(h, off)
          val id = substring(h, off * 2 + 9, lit(8))
          val skip = struct((off + size).as("off"),
            a.getField("ts").as("ts"), a.getField("dur").as("dur"))
          when(done, a)
            .when(!canRead || size < 8, dead)
            // "moov": descend — children start right after the header
            .when(id === "6D6F6F76",
              struct((off + 8).as("off"), a.getField("ts").as("ts"),
                a.getField("dur").as("dur")))
            // version-0 "mvhd" with timescale+duration readable
            .when(id === "6D766864" && (off * 2 + 56) <= n &&
                substring(h, off * 2 + 17, lit(2)) === "00",
              struct(off.as("off"), beU32(h, off + 20).as("ts"),
                beU32(h, off + 24).as("dur")))
            .otherwise(skip)
        })
      bind(walk) { w =>
        when(length(bin) >= 16 && w.getField("ts").isNotNull &&
            w.getField("ts") > 0,
          struct(w.getField("ts").as("timescale"),
            w.getField("dur").as("duration_ticks")))
      }
    }

  /** Resize plumbing — the remaining member of the decode /
    * feature-extract / resize / frame-sample quartet. A real resize
    * needs codec libraries this container doesn't ship, so the
    * injectable trait is the boundary ([[MediaDecoder]]'s pattern): a
    * production `MediaResizer` wraps an image library behind the same
    * two-argument call, while [[StrideResizer]] is the clearly-marked
    * deterministic stand-in that keeps the Spark-side plumbing —
    * schema, batching, null path, payload locality — real and
    * oracle-checkable.
    */
  trait MediaResizer extends Serializable {
    /** Shrink `bytes` to (about) `targetBytes`; null passes through. */
    def resize(bytes: Array[Byte], targetBytes: Int): Array[Byte]
  }

  /** Deterministic stub: identity when the payload already fits, else
    * exactly `targetBytes` bytes sampled at stride k = len div target
    * (positions 0, k, 2k, …) — the byte-level analogue of
    * nearest-neighbor downsampling, trivially replayable in SQL.
    */
  final class StrideResizer extends MediaResizer {
    def resize(bytes: Array[Byte], targetBytes: Int): Array[Byte] =
      if (bytes == null || bytes.length <= targetBytes) bytes
      else {
        val k = bytes.length / targetBytes
        Array.tabulate(targetBytes)(i => bytes(i * k))
      }
  }

  /** Batched resize over the binary column: one resizer call per row,
    * grouped `batchSize` rows per iteration step, appending `resized`
    * (binary). Payloads never leave the executor; null binaries skip
    * the resizer and stay null.
    */
  def resizeMedia(df: DataFrame, binCol: String, targetBytes: Int,
                  resizer: MediaResizer, batchSize: Int = 64): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val outSchema = StructType(df.schema.fields :+
      StructField("resized", BinaryType))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](binCol)
          val out = if (bytes == null) null
                    else resizer.resize(bytes, targetBytes)
          Row.fromSeq(r.toSeq :+ out)
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
