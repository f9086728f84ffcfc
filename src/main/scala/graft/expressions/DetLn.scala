package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Deterministic natural log of a POSITIVE integer: `detln(n) =
  * e·LN2 + atanh-series(m)` where n = m·2^e, e = ⌊log2 n⌋ extracted by
  * exact bit counting and m = n/2^e ∈ [1, 2) by one exact power-of-two
  * divide. ln(m) then evaluates as 2z·Σ z^2k/(2k+1) with
  * z = (m−1)/(m+1) ∈ [0, 1/3), Horner over [[DetLn.HornerK]]. Every
  * step is a correctly-rounded IEEE-754 add/multiply/divide in a FIXED
  * order, so unlike libm `log` the result is bit-identical on any
  * conforming engine (JVM, DuckDB, any C libm) — [[DetExp]]'s sibling,
  * closing the last libm call in the DSIR weight chain
  * ([[graft.operators.Classify.dsirWeights]]): a 1-ulp libm-log
  * difference inside a float aggregate shifted 6-dp-rounded weights
  * between engines (the round-9/10 x5 failure mode).
  *
  * Accuracy vs true ln: the truncated series error is ≤
  * 2·(1/3)^23/23 ≈ 9·10⁻¹³ absolute before the e·LN2 term — far inside
  * the 2⁻²⁰ quantization grid the DSIR weights land on. Exact at
  * n = 2^k (z = 0 ⇒ ln m ≡ 0.0, e·LN2 a single multiply); detln(1) is
  * EXACTLY +0.0. Inputs ≤ 0 yield NaN (callers feed count+1 ≥ 1).
  *
  * SQL twin: [[graft.operators.Classify.sqlDetLnCols]] — keep the op
  * sequence in exact lockstep.
  */
case class DetLn(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "detln"

  override def nullSafeEval(input: Any): Any =
    DetLn.compute(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.DetLn.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DetLn =
    copy(child = newChild)
}

object DetLn {

  /** ln 2 as the nearest double — the same decimal literal is parsed by
    * both engines' correctly-rounded decimal→binary conversion, so the
    * constant is the identical double everywhere. Rendered into the SQL
    * twin via [[Ln2Literal]].
    */
  val Ln2: Double = 0.6931471805599453
  val Ln2Literal: String = "0.6931471805599453"

  /** 1/ln2 as the nearest double (log2 x = detln(x)·InvLn2 — one
    * deterministic multiply). */
  val InvLn2: Double = 1.4426950408889634
  val InvLn2Literal: String = "1.4426950408889634"

  /** The 2⁻⁴⁰ grid for quantizing SMALL log-terms (|term| ≤ ~2)
    * before an order-free sum: partial sums stay exact while
    * |Σ| < 2¹³ — the fine-grained sibling of the 2⁻²⁰ weight grid
    * (which suits integer-scaled weights up to ~2⁷ magnitude).
    */
  val TermGrid: Double = (1L << 40).toDouble

  /** Odd Horner denominators for the atanh series, highest first —
    * shared with the SQL twin so both sides unroll the SAME
    * polynomial: h = 1/23; h = h·z² + 1/21; …; h = h·z² + 1/1.
    */
  val HornerK: Seq[Int] = 23 to 1 by -2

  /** Keep in exact lockstep with
    * [[graft.operators.Classify.sqlDetLnCols]]'s text. */
  def compute(n: Long): Double = {
    if (n <= 0L) return Double.NaN
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val m = n.toDouble / (1L << e).toDouble
    val z = (m - 1.0) / (m + 1.0)
    val z2 = z * z
    var h = 1.0 / HornerK.head
    HornerK.tail.foreach(k => h = h * z2 + 1.0 / k)
    e.toDouble * Ln2 + (2.0 * z) * h
  }

  def apply(c: Column): Column =
    GraftBridge.column(DetLn(GraftBridge.expression(c)))
}
