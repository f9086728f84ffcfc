package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
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
  * The filter ships as a BROADCAST handle, not task-closure bytes: at
  * the operator's design point (a few GiB of bits for billions of keys,
  * see Dedup.corpusBloom) closure transport would re-serialize the
  * filter with every task, where a broadcast lands on each executor
  * once. Codegen binds `broadcast.value()` to a per-partition local at
  * init, so the per-row cost stays a few hash ops inside whole-stage
  * codegen — same mechanism as Spark's own runtime bloom pruning, but
  * against a filter whose lifecycle the pipeline owns (build once over
  * the corpus, persist, reuse across every incoming batch).
  *
  * Keys are probed as UTF-8 bytes; build the filter with
  * `putBinary(key.getBytes(UTF_8))` (Dedup.corpusBloom does) so probe
  * and insert hash identical bytes.
  */
case class BloomMightContain(filterBc: Broadcast[BloomFilter],
                             child: Expression)
  extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter = filterBc.value

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
    val bcCls = classOf[Broadcast[_]].getName
    val bfCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("graftBloomBc", filterBc, bcCls)
    // dereference the broadcast ONCE per partition, not per row — the
    // value() lookup synchronizes on the broadcast block
    val local = ctx.addMutableState(bfCls, "graftBloom",
      v => s"$v = ($bfCls) (($bcCls) $bcRef).value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $local.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def apply(filterBc: Broadcast[BloomFilter], key: Column): Column =
    GraftBridge.column(
      BloomMightContain(filterBc, GraftBridge.expression(key)))

  /** Convenience: broadcast serialized filter bytes, then probe. */
  def apply(spark: SparkSession, filterBytes: Array[Byte],
            key: Column): Column =
    apply(spark.sparkContext.broadcast(
      BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))), key)
}
