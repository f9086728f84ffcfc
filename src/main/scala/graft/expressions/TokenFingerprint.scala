package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling token-fingerprint (TextAnalysis.fingerprint's twin):
  * lowercase whitespace tokens, 28-bit md5-derived value per token,
  * h ← (h·31 + v) mod 1e9+7 seeded 7 — in ONE JVM pass instead of a
  * split → filter → transform(md5 ∘ conv) → aggregate expression chain.
  * Bit-identical to the declarative version (same tokenization, same
  * md5 prefix, same fold), so the existing DuckDB oracle covers it.
  * Codegen delegates to [[TokenFingerprint.compute]] — one static call,
  * whole-stage codegen keeps flowing.
  */
case class TokenFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "token_fingerprint"

  override def nullSafeEval(input: Any): Any =
    TokenFingerprint.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TokenFingerprint.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenFingerprint =
    copy(child = newChild)
}

object TokenFingerprint {
  private val MOD = 1000000007L

  private val localMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** JVM kernel shared by eval and generated code. */
  def compute(s: UTF8String): Long = {
    val md = localMd.get()
    var h = 7L
    // same tokenization as TextAnalysis.tokens (CJK-aware)
    val toks = graft.functions.TextAnalysis.jvmTokens(s.toString)
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(toks(i).getBytes("UTF-8"))
      // first 7 hex chars = 28 bits: 3.5 bytes, high nibble of byte 3
      val v = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
        ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >> 4)
      h = (h * 31L + v) % MOD
      i += 1
    }
    h
  }

  def apply(c: Column): Column =
    GraftBridge.column(TokenFingerprint(GraftBridge.expression(c)))
}
