package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType}

/** REAL GIF pixel decode as a native expression — the LZW companion to
  * [[PngPixelStats]]'s DEFLATE: a single-frame GIF87a/89a with a
  * global color table decodes with zero external dependencies because
  * GIF-LZW is pure integer bookkeeping. Walks the header, logical
  * screen descriptor and global color table, SKIPS extension blocks
  * (sub-block chains), then runs the full variable-width LZW decode of
  * the image data: LSB-first bit reader over the reassembled
  * sub-blocks, clear/end codes, prefix-linked dictionary growth with
  * the spec's width-bump cadence (next == 2^width, cap 12) and the
  * KwKwK `code == next` special case — the index stream then maps
  * through the palette. Returns
  * `struct(w, h, n_px, r_sum, g_sum, b_sum, rw_sum)` (all BIGINT;
  * rw_sum = Σ r(x,y)·(y·w+x+1), the m6/m11 position-weighted term),
  * or NULL for anything malformed: bad signature, missing global
  * color table, local color table, interlace, a frame that is not the
  * full logical screen, more than one image, an invalid/oversized
  * code, a pixel count ≠ w·h, or a missing trailer.
  *
  * Scale shape: one scan-fused projection per row, executor-local
  * bytes, codegen via a single static call — the
  * [[graft.operators.Multimodal]] decoder seat. Memory guard:
  * w·h ≤ 2²² rejects decompression bombs before allocating.
  */
case class GifPixelStats(child: Expression) extends UnaryExpression {

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
  override def prettyName: String = "gif_pixel_stats"

  override def nullSafeEval(input: Any): Any =
    GifPixelStats.compute(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.GifPixelStats.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): GifPixelStats =
    copy(child = newChild)
}

object GifPixelStats {

  private def leU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  // scalastyle:off return
  def compute(b: Array[Byte]): GenericInternalRow = {
    if (b == null || b.length < 14) return null
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return null
    val w = leU16(b, 6); val h = leU16(b, 8)
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 22)) return null
    val packed = b(10) & 0xff
    if ((packed & 0x80) == 0) return null // global color table required
    val nColors = 1 << ((packed & 0x07) + 1)
    val gctOff = 13
    var pos = gctOff + 3 * nColors
    if (pos > b.length) return null

    // block walk: skip extensions, decode exactly one full-frame image
    var indices: Array[Int] = null
    var done = false
    while (!done) {
      if (pos >= b.length) return null
      (b(pos) & 0xff) match {
        case 0x21 => // extension: label + sub-block chain
          pos += 2
          var len = if (pos < b.length) b(pos) & 0xff else return null
          while (len != 0) {
            pos += 1 + len
            if (pos >= b.length) return null
            len = b(pos) & 0xff
          }
          pos += 1 // terminator
        case 0x2c => // image descriptor
          if (indices != null) return null // single-frame contract
          if (pos + 10 > b.length) return null
          val left = leU16(b, pos + 1); val top = leU16(b, pos + 3)
          val iw = leU16(b, pos + 5); val ih = leU16(b, pos + 7)
          val ipacked = b(pos + 9) & 0xff
          if (left != 0 || top != 0 || iw != w || ih != h) return null
          if ((ipacked & 0x80) != 0) return null // no local color table
          if ((ipacked & 0x40) != 0) return null // no interlace
          pos += 10
          val dec = lzwDecode(b, pos, w * h, nColors)
          if (dec == null) return null
          indices = dec._1
          pos = dec._2
        case 0x3b => // trailer
          if (indices == null) return null
          done = true
        case _ => return null
      }
    }

    var rSum = 0L; var gSum = 0L; var bSum = 0L; var rwSum = 0L
    var i = 0
    while (i < indices.length) {
      val idx = indices(i)
      val r = b(gctOff + 3 * idx) & 0xff
      rSum += r
      gSum += b(gctOff + 3 * idx + 1) & 0xff
      bSum += b(gctOff + 3 * idx + 2) & 0xff
      rwSum += r.toLong * (i + 1) // i = y·w + x in raster order
      i += 1
    }
    new GenericInternalRow(Array[Any](w.toLong, h.toLong,
      w.toLong * h, rSum, gSum, bSum, rwSum))
  }

  /** Full GIF-LZW decode of the image data starting at `pos` (the LZW
    * minimum-code-size byte). Returns (indices, position after the
    * block terminator), or null for any malformation: bad min code
    * size, truncated sub-blocks, an out-of-range or premature code, a
    * palette overrun, or a pixel count ≠ `nPx`.
    */
  private def lzwDecode(b: Array[Byte], start: Int, nPx: Int,
                        nColors: Int): (Array[Int], Int) = {
    if (start >= b.length) return null
    val minCode = b(start) & 0xff
    if (minCode < 2 || minCode > 8) return null
    // reassemble the sub-block chain
    val data = new java.io.ByteArrayOutputStream()
    var pos = start + 1
    if (pos >= b.length) return null
    var len = b(pos) & 0xff
    while (len != 0) {
      if (pos + 1 + len > b.length) return null
      data.write(b, pos + 1, len)
      pos += 1 + len
      if (pos >= b.length) return null
      len = b(pos) & 0xff
    }
    pos += 1 // block terminator
    val bytes = data.toByteArray

    val clear = 1 << minCode
    val end = clear + 1
    // prefix-linked dictionary: code -> (prefix code, appended index)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val firstOf = new Array[Int](4096) // first index of code's expansion
    var i = 0
    while (i < clear) { prefix(i) = -1; suffix(i) = i; firstOf(i) = i; i += 1 }
    var next = end + 1
    var width = minCode + 1
    var prev = -1

    val out = new Array[Int](nPx)
    var nOut = 0
    var bitPos = 0
    val totalBits = bytes.length * 8
    def read(): Int = { // LSB-first variable-width code, -1 on exhaustion
      if (bitPos + width > totalBits) -1
      else {
        var v = 0; var k = 0
        while (k < width) {
          val bp = bitPos + k
          if ((bytes(bp >> 3) & (1 << (bp & 7))) != 0) v |= 1 << k
          k += 1
        }
        bitPos += width
        v
      }
    }
    // expand `code` into out; returns false on overflow/palette overrun
    def emit(code: Int): Boolean = {
      var n = 0
      var c = code
      while (c >= 0) { n += 1; c = prefix(c) } // expansion length
      if (nOut + n > nPx) return false
      var at = nOut + n - 1
      c = code
      while (c >= 0) {
        val s = suffix(c)
        if (s >= nColors) return false
        out(at) = s; at -= 1; c = prefix(c)
      }
      nOut += n
      true
    }

    var finished = false
    while (!finished) {
      val code = read()
      if (code < 0) return null // ran out of bits before the END code
      if (code == clear) {
        next = end + 1; width = minCode + 1; prev = -1
      } else if (code == end) {
        finished = true
      } else if (prev == -1) {
        if (code >= clear) return null // first code must be a root
        if (!emit(code)) return null
        prev = code
      } else {
        if (code > next || (code >= next && next >= 4096)) return null
        val toEmit =
          if (code < next) code
          else { // KwKwK: seq(prev) + first(seq(prev)), entered below
            code
          }
        if (code == next) {
          // the entry being defined: prev's expansion + its first index
          if (next >= 4096) return null
          prefix(next) = prev; suffix(next) = firstOf(prev)
          firstOf(next) = firstOf(prev)
          next += 1
          if (!emit(toEmit)) return null
        } else {
          if (!emit(toEmit)) return null
          if (next < 4096) {
            prefix(next) = prev; suffix(next) = firstOf(code)
            firstOf(next) = firstOf(prev)
            next += 1
          }
        }
        if (next == (1 << width) && width < 12) width += 1
        prev = code
      }
    }
    if (nOut != nPx) return null
    (out, pos)
  }
  // scalastyle:on return

  def apply(c: Column): Column =
    GraftBridge.column(GifPixelStats(GraftBridge.expression(c)))
}
