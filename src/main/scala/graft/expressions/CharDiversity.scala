package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass char-diversity kernel —
  * [[graft.functions.TextAnalysis.charDiversity]]'s twin. The
  * declarative form pays an interpreted per-character struct fold
  * (HOF lambdas never codegen), which made ta13 the most expensive
  * query in the suite; this walks the string once, counts code points
  * in a sorted map, and accumulates the entropy sum in the SAME
  * ascending-code-point order as the declarative sorted-run fold
  * (UTF8 binary order == code point order), so the doubles match
  * bit-for-bit — pinned in TextAnalysisSpec.
  * Returns `struct(n_chars LONG, entropy DOUBLE, simpson DOUBLE)`.
  */
case class CharDiversity(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false),
    StructField("simpson", DoubleType, nullable = false)))
  override def prettyName: String = "char_diversity"

  override def nullSafeEval(input: Any): Any =
    CharDiversity.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CharDiversity.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharDiversity =
    copy(child = newChild)
}

object CharDiversity {

  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      i += Character.charCount(cp)
      n += 1
    }
    // same term and accumulation order as the declarative fold:
    // ascending char, run·log₂(run) with log₂ = detln·(1/ln2) — the
    // r11 libm sweep: libm log differs across engines at the last ulp,
    // detln is bit-identical everywhere
    var sTot = 0.0
    var s2 = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      sTot += c.toDouble * (DetLn.compute(c) * DetLn.InvLn2)
      s2 += c * (c - 1)
    }
    val entropy =
      if (n > 0) DetLn.compute(n) * DetLn.InvLn2 - sTot / n.toDouble
      else 0.0
    val simpson =
      if (n > 1) s2.toDouble / (n * (n - 1)).toDouble else 0.0
    new GenericInternalRow(Array[Any](n, entropy, simpson))
  }

  def apply(c: Column): Column =
    GraftBridge.column(CharDiversity(GraftBridge.expression(c)))
}
