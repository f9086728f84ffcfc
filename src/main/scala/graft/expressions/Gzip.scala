package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Real gzip compression of a string column via the JDK's zlib
  * (`java.util.zip.GZIPOutputStream`) — the [[PngPixelStats]] argument
  * again: compressed-payload handling needs no external codec. The
  * encode side of the WARC/WET ingest shape (Common Crawl text ships
  * as gzip members); [[GunzipText]] is the decode. Output bytes are
  * deterministic within a JVM (fixed header: mtime 0, no flags) —
  * queries must never ship the raw compressed bytes to an oracle,
  * only what decodes FROM them.
  */
case class GzipBytes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "gzip_bytes"

  override def nullSafeEval(input: Any): Any =
    GzipBytes.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.GzipBytes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): GzipBytes =
    copy(child = newChild)
}

object GzipBytes {
  def compute(s: UTF8String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(s.getBytes)
    gz.close()
    out.toByteArray
  }

  def apply(c: Column): Column =
    GraftBridge.column(GzipBytes(GraftBridge.expression(c)))
}

/** Real gzip decode of a binary column to UTF-8 text
  * (`java.util.zip.GZIPInputStream`) — the decode half of the WARC/WET
  * ingest shape. NULL for malformed payloads: bad magic, truncated
  * member, corrupt CRC trailer, or decompressed size past the 2²⁴-byte
  * guard (a per-document text ceiling that rejects decompression bombs
  * before they allocate).
  */
case class GunzipText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "gunzip_text"

  override def nullSafeEval(input: Any): Any =
    GunzipText.compute(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.GunzipText.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): GunzipText =
    copy(child = newChild)
}

object GunzipText {
  private val MaxBytes = 1 << 24

  // scalastyle:off return
  def compute(bytes: Array[Byte]): UTF8String = {
    if (bytes == null || bytes.length < 18) return null // header+trailer
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) {
          out.write(buf, 0, n)
          if (out.size() > MaxBytes) return null
          n = in.read(buf)
        }
        UTF8String.fromBytes(out.toByteArray)
      } finally in.close()
    } catch {
      case _: java.io.IOException => null // bad magic/truncated/CRC
    }
  }
  // scalastyle:on return

  def apply(c: Column): Column =
    GraftBridge.column(GunzipText(GraftBridge.expression(c)))
}
