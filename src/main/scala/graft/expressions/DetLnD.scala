package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** [[DetLn]] for DOUBLE input on (2⁻⁵², 2¹⁰]: deterministic natural
  * log of a probability-scale value (ratio mixes, normalized
  * frequencies) where the integer-argument rewrite doesn't apply.
  * Exponent extraction stays exact WITHOUT frexp or a double→bits
  * builtin — which DuckDB lacks — via the power-of-two scaling trick:
  * i = ⌊x·2⁵²⌋ is exact (power-of-two multiply + floor), so
  * e = ⌊log2 x⌋ = bitlength(i) − 53 exactly, and the mantissa
  * m = x / 2ᵉ is one exact power-of-two divide into [1, 2). The same
  * atanh-series Horner as [[DetLn]] finishes; every op is a
  * correctly-rounded IEEE add/multiply/divide in a fixed order, so
  * the result is bit-identical on any conforming engine.
  *
  * Domain: NaN outside (2⁻⁵², 2¹⁰] — callers feed probabilities and
  * bounded ratios (the 2¹⁰ guard keeps i = x·2⁵² inside the exact
  * BIGINT range with margin). SQL twin:
  * [[graft.operators.Classify.sqlDetLnDCols]] — keep in exact
  * lockstep.
  */
case class DetLnD(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "detlnd"

  override def nullSafeEval(input: Any): Any =
    DetLnD.compute(input.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.DetLnD.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DetLnD =
    copy(child = newChild)
}

object DetLnD {

  /** 2⁵² — the exact exponent-extraction scale shared with the SQL
    * twin. */
  val Scale: Double = 4503599627370496.0

  /** Keep in exact lockstep with
    * [[graft.operators.Classify.sqlDetLnDCols]]'s text. */
  def compute(x: Double): Double = {
    if (!(x > 0.0) || x > 1024.0) return Double.NaN
    val i = math.floor(x * Scale)
    if (i < 1.0) return Double.NaN // below 2^-52
    val e = (63 - java.lang.Long.numberOfLeadingZeros(i.toLong)) - 52
    val p2 = (1L << (e + 52)).toDouble / Scale
    val m = x / p2
    val z = (m - 1.0) / (m + 1.0)
    val z2 = z * z
    var h = 1.0 / DetLn.HornerK.head
    DetLn.HornerK.tail.foreach(k => h = h * z2 + 1.0 / k)
    e.toDouble * DetLn.Ln2 + (2.0 * z) * h
  }

  def apply(c: Column): Column =
    GraftBridge.column(DetLnD(GraftBridge.expression(c)))
}
