package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType}

/** REAL PNG pixel decode as a native expression — the answer to "no
  * codec libraries exist in this container": DEFLATE ships in the JDK
  * (`java.util.zip.Inflater`), so an 8-bit truecolor PNG decodes with
  * zero external dependencies. Walks the chunk stream (signature,
  * IHDR, ordered IDAT concatenation, IEND), CRC32-validates every
  * chunk, inflates the scanline stream, and reverses all five PNG
  * scanline filters (None/Sub/Up/Average/Paeth, RFC 2083 §6) row by
  * row — the filter arithmetic makes byte ORDER load-bearing, so a
  * formula-only oracle catches any defilter/orientation bug. Returns
  * `struct(w, h, n_px, r_sum, g_sum, b_sum, rw_sum)` (all BIGINT;
  * rw_sum = Σ r(x,y)·(y·w+x+1), the m6 position-weighted term), or
  * NULL for anything malformed: bad signature, non-8-bit or
  * non-truecolor, interlaced, CRC mismatch, truncated or over-long
  * inflate, missing IEND.
  *
  * Scale shape: one scan-fused projection per row, executor-local
  * bytes, codegen via a single static call — the same seat as
  * [[graft.operators.Multimodal]]'s BMP/WAV decoders, upgraded with a
  * real entropy-coded payload. Memory guard: w·h ≤ 2²² rejects
  * decompression bombs before allocating.
  */
case class PngPixelStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("w", LongType, nullable = false),
    StructField("h", LongType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("r_sum", LongType, nullable = false),
    StructField("g_sum", LongType, nullable = false),
    StructField("b_sum", LongType, nullable = false),
    StructField("rw_sum", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "png_pixel_stats"

  override def nullSafeEval(input: Any): Any =
    PngPixelStats.compute(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.PngPixelStats.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): PngPixelStats =
    copy(child = newChild)
}

object PngPixelStats {

  private val Signature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def beU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** Paeth predictor (RFC 2083 §6.6) — exact spec arithmetic. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // scalastyle:off return
  def compute(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 8 + 25) return null
    var i = 0
    while (i < 8) { if (bytes(i) != Signature(i)) return null; i += 1 }
    var off = 8
    var w = 0L; var h = 0L
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new java.util.zip.CRC32()
    while (!sawIend) {
      if (off + 12 > bytes.length) return null
      val len = beU32(bytes, off)
      if (len > Int.MaxValue - 12 || off + 12 + len > bytes.length)
        return null
      val tag = new String(bytes, off + 4, 4, "US-ASCII")
      crc.reset()
      crc.update(bytes, off + 4, 4 + len.toInt)
      if (crc.getValue != beU32(bytes, off + 8 + len.toInt)) return null
      tag match {
        case "IHDR" =>
          if (sawIhdr || len != 13) return null
          sawIhdr = true
          w = beU32(bytes, off + 8)
          h = beU32(bytes, off + 12)
          val bitDepth = bytes(off + 16) & 0xff
          val colorType = bytes(off + 17) & 0xff
          val compression = bytes(off + 18) & 0xff
          val filterMethod = bytes(off + 19) & 0xff
          val interlace = bytes(off + 20) & 0xff
          if (w <= 0 || h <= 0 || w * h > (1L << 22) || bitDepth != 8 ||
            colorType != 2 || compression != 0 || filterMethod != 0 ||
            interlace != 0) return null
        case "IDAT" =>
          if (!sawIhdr) return null
          idat.write(bytes, off + 8, len.toInt)
        case "IEND" =>
          if (!sawIhdr || len != 0) return null
          sawIend = true
        case _ => if (!sawIhdr) return null // ancillary chunks skipped
      }
      off += 12 + len.toInt
    }
    val wi = w.toInt; val hi = h.toInt
    val stride = 1 + 3 * wi
    val raw = new Array[Byte](stride * hi)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // 0 without finish = truncated input or a preset-dictionary
        // stream — both malformed here
        if (n == 0 && !inf.finished()) return null
        got += n
      }
      if (got != raw.length) return null
      // any trailing decompressed byte means the stream is over-long
      if (!inf.finished() &&
        inf.inflate(new Array[Byte](1), 0, 1) > 0) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    // defilter in place, row-major; prior row already reconstructed
    var rSum = 0L; var gSum = 0L; var bSum = 0L; var rwSum = 0L
    var y = 0
    while (y < hi) {
      val rowOff = y * stride
      val filter = raw(rowOff) & 0xff
      if (filter > 4) return null
      var k = 0
      while (k < 3 * wi) {
        val pos = rowOff + 1 + k
        val cur = raw(pos) & 0xff
        val left = if (k >= 3) raw(pos - 3) & 0xff else 0
        val up = if (y > 0) raw(pos - stride) & 0xff else 0
        val upLeft = if (y > 0 && k >= 3) raw(pos - stride - 3) & 0xff else 0
        val recon = filter match {
          case 0 => cur
          case 1 => (cur + left) & 0xff
          case 2 => (cur + up) & 0xff
          case 3 => (cur + (left + up) / 2) & 0xff
          case 4 => (cur + paeth(left, up, upLeft)) & 0xff
        }
        raw(pos) = recon.toByte
        val x = k / 3
        (k % 3) match {
          case 0 => rSum += recon; rwSum += recon.toLong * (y.toLong * wi + x + 1)
          case 1 => gSum += recon
          case 2 => bSum += recon
        }
        k += 1
      }
      y += 1
    }
    new GenericInternalRow(Array[Any](w, h, w * h, rSum, gSum, bSum, rwSum))
  }
  // scalastyle:on return

  def apply(c: Column): Column =
    GraftBridge.column(PngPixelStats(GraftBridge.expression(c)))
}
