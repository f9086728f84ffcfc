package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Deterministic exponential: `detexp(x) = p(x/32)^32` with p the
  * degree-4 Taylor polynomial of exp (Horner form), computed as one
  * divide, four fused Horner steps, and 5 squarings. Every step is an
  * EXACT IEEE-754 operation (add, multiply, divide), so unlike libm
  * `exp` the result is bit-identical on ANY conforming engine — the
  * JVM, DuckDB, C libm variants — which is what the cross-engine
  * sampling keys need ([[graft.operators.Sampling]]): a 1-ulp libm
  * difference under a `floor(x·10^k + 0.5)` contract flips the bucket
  * and cascades through prefix sums (the round-9 x5 failure mode).
  *
  * p is an even-degree Taylor polynomial of exp ⇒ strictly positive
  * for ALL real y, so no domain guard is needed and the result is
  * always > 0 (a valid sampling weight). Accuracy vs true exp:
  * relative error ≈ 32·(x/32)⁵/120 (≤ 10⁻⁵ for |x| ≤ 4), monotone in
  * x on any practical range, exact at x = 0. The shallow shape (5
  * squarings, not 20) matters for the SQL twin
  * ([[graft.operators.Sampling.sqlDetExp]]): each textual squaring
  * level doubles the expression tree, so 2^5 base copies stay cheap
  * where 2^20 would explode the oracle's binder.
  */
case class DetExp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "detexp"

  override def nullSafeEval(input: Any): Any =
    DetExp.compute(input.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.DetExp.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DetExp =
    copy(child = newChild)
}

object DetExp {

  /** 2^5 — the squaring count / argument scale shared with the SQL
    * twin ([[graft.operators.Sampling.sqlDetExp]]).
    */
  val Grain: Double = 32.0

  /** Keep the op sequence in EXACT lockstep with sqlDetExp's text:
    * y = x/32; Horner p = 1 + y·(1 + y·(0.5 + y·(1/6 + y·(1/24))));
    * then p squared 5 times. 1/6 and 1/24 are written as the division
    * expression on both sides (one IEEE divide of exact literals ⇒
    * identical doubles).
    */
  def compute(x: Double): Double = {
    val y = x / Grain
    var p = 1.0 + y * (1.0 + y * (0.5 + y * (1.0 / 6.0 + y * (1.0 / 24.0))))
    var i = 0
    while (i < 5) { p = p * p; i += 1 }
    p
  }

  def apply(c: Column): Column =
    GraftBridge.column(DetExp(GraftBridge.expression(c)))
}
