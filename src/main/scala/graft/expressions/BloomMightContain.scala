package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a pre-built Bloom filter over string keys — the
  * scan-side half of incremental dedup (Dedup.incrementalDedup): "has
  * this key ever been seen in the existing corpus?" answered per row
  * with zero joins and zero shuffles. `false` is authoritative
  * (definitely new); `true` means "maybe" at the filter's false-positive
  * rate and must be confirmed exactly downstream.
  *
  * The serialized filter travels in the expression (and, deserialized,
  * in the codegen references array), so a probe costs a few hash ops per
  * row inside whole-stage codegen — same mechanism as Spark's own
  * runtime bloom pruning, but against a filter whose lifecycle the
  * pipeline owns (build once over the corpus, reuse across every
  * incoming batch).
  *
  * Keys are probed as UTF-8 bytes; build the filter with
  * `putBinary(key.getBytes(UTF_8))` (Dedup.corpusBloom does) so probe
  * and insert hash identical bytes.
  */
case class BloomMightContain(filterBytes: Array[Byte], child: Expression)
  extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def apply(filterBytes: Array[Byte], key: Column): Column =
    GraftBridge.column(
      BloomMightContain(filterBytes, GraftBridge.expression(key)))
}
