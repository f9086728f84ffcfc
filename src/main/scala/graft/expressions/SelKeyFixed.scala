package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, DataTypes, LongType}

/** Pure-BIGINT fixed-point kernels for the weighted-selection key
  * (Efraimidis–Spirakis resampling, the DSIR recipe's ranking stage —
  * reference behavior: Data_Analysis pipeline's importance resampling;
  * the key math itself is Efraimidis & Spirakis 2006 / Xie et al. 2023).
  *
  * WHY INTEGER-ONLY: the r9–r12 history of the x5 driver gate. The key
  * chain moved from libm pow/exp (1-ulp engine differences flip a
  * 6-decimal rounding at bucket edges) to exact-IEEE fixed-order double
  * kernels ([[DetLn]]/[[DetExp]] — identical op SEQUENCE on both
  * engines). That is bit-exact on any engine that executes the ops as
  * written — but a DuckDB build is free to CONTRACT a·b+c into fused
  * multiply-adds inside the long Horner chains, which changes the
  * result by an ulp and, under floor(x·2²⁰+½), flips one mid-rank key
  * per ~10⁶ draws: locally bit-exact, red on the driver, four rounds
  * running. These kernels remove the float entirely: every step is a
  * BIGINT multiply / truncating divide / compare, so there is NO
  * rounding mode, contraction, or evaluation-order freedom left — any
  * two engines that agree on integer arithmetic agree on the key.
  *
  * Numerics (all values on the 2⁻²⁰ dyadic grid, "Q20"):
  *  - [[lnDraw]]: L = ⌊(28·ln2 − ln v)·2²⁰⌉ for the md5 draw
  *    v = h+1 ∈ [1, 2²⁸] — decompose v = 2ᵉ·(1+z), z ∈ [0,1) on the
  *    Q20 grid, then ln(1+z) = 2·atanh(z/(2+z)) by the odd atanh
  *    series through t⁹ (t ≤ 1/3 ⇒ truncation ≤ ~1.1 Q20 ulp; divide
  *    truncation adds ≤ ~10 more — measured worst 13.9 ulps ≈ 1.3·10⁻⁵
  *    absolute in −ln u, far below sampling noise). Monotone
  *    non-increasing in v on every range checked (no violations over
  *    [1, 3·10⁵] + power-of-two boundaries).
  *  - [[expQ20]]: m = clamp₁..₂²⁶ ⌊2²⁰·exp(−lw/10⁶)⌉ for a LOG-domain
  *    micro-unit weight lw (w = exp(lw/10⁶); m ≈ 2²⁰/w is the dyadic
  *    exponent numerator the integer key ranks by). Base-2 split:
  *    −lw/10⁶ = (q + r/2²⁰ − 24)·ln2 via one integer multiply by
  *    K = ⌊2⁴⁰/(10⁶·ln2)⌉, then 2^(r/2²⁰) by a degree-7 Q20 Taylor
  *    (poly rel. err ≤ 3.7·10⁻⁶; whole-chain ≤ ~1 Q20 ulp of exponent
  *    ≈ 7·10⁻⁷ relative, before the final integer round).
  *
  * The selection key is m·L < 2²⁶·28·726817 < 2⁵¹ — exact BIGINT, and
  * `sel_key >> 31` keeps the bounded census spine contract of
  * [[graft.operators.Sampling.SelBucketShift]].
  *
  * Cross-engine contract: the DuckDB oracle replays the SAME integer
  * algorithm via [[lnDrawSteps]]/[[expSteps]] rendered in the
  * [[Duck]] dialect; the [[SparkSql]] rendering of the same template
  * is the declarative twin the parity spec pins against [[SelLnDraw]]/
  * [[SelExpQ20]]. All divides are truncating with NON-NEGATIVE
  * operands except the clamp input (no divide sees a negative), so
  * Spark `div` and DuckDB `//` agree unconditionally.
  */
object SelKeyFixed {

  /** The Q20 grid: 2²⁰. */
  val Q: Long = 1L << 20

  /** ⌊ln2·2²⁰⌉ — pinned literal; spec asserts = round(ln 2 · 2²⁰). */
  val Ln2Q: Long = 726817L

  /** ⌊2⁴⁰/(10⁶·ln2)⌉ — micro-units → Q20 base-2 exponent. */
  val K: Long = 1586260L

  /** 24·2²⁰ − (14600000·K) div 2²⁰: folds the +4-octave safety offset
    * and the −14.6 clamp offset so the biased exponent is always ≥ 0
    * (no negative value ever reaches a divide).
    */
  val EBase: Long = 3079303L

  /** ⌊(ln2)ᵏ/k!·2²⁰⌉, k = 1..7 — the 2^u Taylor on u ∈ [0,1). */
  val ExpC: Array[Long] =
    Array(726817L, 251896L, 58200L, 10085L, 1398L, 162L, 16L)

  /** Clamp of the NEGATED log-weight −lw (micro units): below −14.6
    * the target m rounds to < 1, above +4.9 it exceeds 2²⁶ — both ends
    * already saturated by the final clamp, so clamping the input first
    * changes nothing and bounds every intermediate.
    */
  val GClampLo: Long = -14600000L
  val GClampHi: Long = 4900000L

  /** m ceiling 2²⁶ (key stays < 2⁵¹). */
  val MMax: Long = 1L << 26

  /** L = ⌊(28·ln2 − ln v)·2²⁰⌉-ish (see object doc) for v ∈ [1, 2²⁸].
    * Deterministic for any positive long (out-of-domain just shifts the
    * base term), but callers feed md5-hash+1 which is in-domain.
    */
  def lnDraw(v: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val z = (v << 20) / (1L << e) - Q
    val t = (z * Q) / ((1L << 21) + z)
    val t2 = (t * t) / Q
    val t3 = (t2 * t) / Q
    val t5 = (t3 * t2) / Q
    val t7 = (t5 * t2) / Q
    val t9 = (t7 * t2) / Q
    (28L - e) * Ln2Q - 2L * (t + t3 / 3 + t5 / 5 + t7 / 7 + t9 / 9)
  }

  /** m = clamp(⌊2²⁰·exp(−lw/10⁶)⌉, 1, 2²⁶) for a log-domain micro-unit
    * weight lw (see object doc). Total function of any long.
    */
  def expQ20(lw: Long): Long = {
    val g = math.max(GClampLo, math.min(GClampHi, -lw))
    val en = EBase + ((g + 14600000L) * K) / Q
    val q = (en / Q).toInt
    val r = en % Q
    var acc = ExpC(6)
    var i = 5
    while (i >= 0) { acc = ExpC(i) + (r * acc) / Q; i -= 1 }
    val p = Q + (r * acc) / Q
    val m =
      if (q >= 30) MMax
      else if (q >= 24) p << (q - 24)
      else (p + (1L << (23 - q))) >> (24 - q)
    math.min(MMax, math.max(1L, m))
  }

  // ---- shared two-dialect step template ---------------------------
  //
  // One algorithm, two renderings: the DuckDB oracle and the Spark-SQL
  // declarative twin are generated from the SAME template, so the spec
  // that pins template == native expression transfers to the oracle.
  // Only truncating integer division differs in spelling; every
  // dividend/divisor is non-negative, so `div` and `//` agree.

  /** Dialect = how truncating integer division renders. */
  final case class Dialect(idiv: (String, String) => String)
  val Duck: Dialect = Dialect((a, b) => s"(($a) // ($b))")
  val SparkSql: Dialect = Dialect((a, b) => s"(($a) div ($b))")

  /** (alias, expr) steps computing `_sk_l` = [[lnDraw]] of `vExpr`
    * (which must already be a bound column/alias — it is referenced
    * 58× by the generated CASE branches).
    */
  def lnDrawSteps(vExpr: String, d: Dialect): Seq[(String, String)] = {
    val zCase = {
      val branches = (28 to 1 by -1).map { e =>
        s"WHEN $vExpr >= ${1L << e} THEN " +
          s"${d.idiv(s"$vExpr * 1048576", (1L << e).toString)} - 1048576"
      }.mkString(" ")
      s"(CASE $branches ELSE $vExpr * 1048576 - 1048576 END)"
    }
    val t = d.idiv("_sk_z * 1048576", "2097152 + _sk_z")
    val t2 = d.idiv("_sk_t * _sk_t", "1048576")
    val t3 = s"(${d.idiv("_sk_t2 * _sk_t", "1048576")})"
    val t5 = s"(${d.idiv(s"$t3 * _sk_t2", "1048576")})"
    val t7 = s"(${d.idiv(s"$t5 * _sk_t2", "1048576")})"
    val t9 = s"(${d.idiv(s"$t7 * _sk_t2", "1048576")})"
    val baseCase = {
      val branches = (28 to 1 by -1).map { e =>
        s"WHEN $vExpr >= ${1L << e} THEN ${(28L - e) * Ln2Q}"
      }.mkString(" ")
      s"(CASE $branches ELSE ${28L * Ln2Q} END)"
    }
    val l = s"$baseCase - 2 * (_sk_t + ${d.idiv(t3, "3")} + " +
      s"${d.idiv(t5, "5")} + ${d.idiv(t7, "7")} + ${d.idiv(t9, "9")})"
    Seq("_sk_z" -> zCase, "_sk_t" -> s"($t)", "_sk_t2" -> s"($t2)",
      "_sk_l" -> s"($l)")
  }

  /** (alias, expr) steps computing `_sk_m` = [[expQ20]] of `lwExpr`. */
  def expSteps(lwExpr: String, d: Dialect): Seq[(String, String)] = {
    val en = s"$EBase + ${d.idiv(
        s"(greatest($GClampLo, least($GClampHi, -($lwExpr))) + 14600000) * $K",
        "1048576")}"
    val p = {
      var acc = ExpC(6).toString
      var i = 5
      while (i >= 0) {
        acc = s"${ExpC(i)} + ${d.idiv(s"_sk_r * ($acc)", "1048576")}"
        i -= 1
      }
      s"1048576 + ${d.idiv(s"_sk_r * ($acc)", "1048576")}"
    }
    val mCase = {
      val hi = (29 to 24 by -1).map(q =>
        s"WHEN _sk_q = $q THEN _sk_p * ${1L << (q - 24)}").mkString(" ")
      val lo = (23 to 0 by -1).map(q =>
        s"WHEN _sk_q = $q THEN ${d.idiv(s"_sk_p + ${1L << (23 - q)}",
          (1L << (24 - q)).toString)}").mkString(" ")
      s"(CASE WHEN _sk_q >= 30 THEN $MMax $hi $lo ELSE 1 END)"
    }
    Seq(
      "_sk_en" -> s"($en)",
      "_sk_q" -> s"(${d.idiv("_sk_en", "1048576")})",
      "_sk_r" -> "(_sk_en % 1048576)",
      "_sk_p" -> s"($p)",
      "_sk_m" -> s"(least($MMax, greatest(1, $mCase)))")
  }
}

/** Native Catalyst wrapper of [[SelKeyFixed.lnDraw]] — BIGINT→BIGINT,
  * codegen'd to one static call on the hot key-projection path.
  */
case class SelLnDraw(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = DataTypes.LongType
  override def prettyName: String = "sel_ln_draw"
  override def nullSafeEval(input: Any): Any =
    SelKeyFixed.lnDraw(input.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SelKeyFixed.lnDraw($c)")
  override protected def withNewChildInternal(newChild: Expression): SelLnDraw =
    copy(child = newChild)
}

object SelLnDraw {
  def apply(c: Column): Column =
    GraftBridge.column(SelLnDraw(GraftBridge.expression(c)))
}

/** Native Catalyst wrapper of [[SelKeyFixed.expQ20]] — BIGINT→BIGINT. */
case class SelExpQ20(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = DataTypes.LongType
  override def prettyName: String = "sel_exp_q20"
  override def nullSafeEval(input: Any): Any =
    SelKeyFixed.expQ20(input.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SelKeyFixed.expQ20($c)")
  override protected def withNewChildInternal(newChild: Expression): SelExpQ20 =
    copy(child = newChild)
}

object SelExpQ20 {
  def apply(c: Column): Column =
    GraftBridge.column(SelExpQ20(GraftBridge.expression(c)))
}
