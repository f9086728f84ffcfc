package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native count-only tokenizer —
  * [[graft.functions.TextAnalysis.tokenCount]]'s kernel. The
  * declarative twin `size(regexp_extract_all(lower(text), pat, 0))`
  * materializes the full token array (one UTF8String per token plus
  * the ArrayData) only for `size` to throw it away; token counting is
  * the single most repeated full-corpus pass in the suite (budget
  * cuts, drift censuses, packing, mixes — 23 call sites), so the
  * allocation tax is paid on every one. This runs the SAME compiled
  * [[graft.functions.TextAnalysis.tokenPattern]] over the same
  * `Locale.ROOT`-lowered string and just counts matches — identical
  * count by construction (parity-pinned in TextAnalysisSpec), zero
  * per-token allocation.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override def nullSafeEval(input: Any): Any =
    TokenCount.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokenCount.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object TokenCount {

  def compute(s: UTF8String): Int =
    graft.functions.TextAnalysis.jvmTokenCount(s.toString)

  def apply(c: Column): Column =
    GraftBridge.column(TokenCount(GraftBridge.expression(c)))
}
