package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 16-bit SimHash (Dedup.simhash16's twin): distinct lowercase
  * whitespace tokens → 16-bit md5-prefix value per token → per-bit
  * majority vote → fingerprint, in ONE md5 per token. The declarative
  * chain re-evaluates md5 inside the per-bit lambda (16 md5 calls per
  * token per row); this pays one. Bit-identical by construction (same
  * tokenization as TextFunctions.tokenSet, same first-4-hex-chars
  * value, same vote>0 rule), pinned in SimHash16Spec; the d7 oracle
  * covers the semantics.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "simhash16"

  override def nullSafeEval(input: Any): Any =
    SimHash16.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHash16.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object SimHash16 {

  private val localMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** 16-bit value from the first 4 hex chars of md5(s) — identical to
    * conv(substring(md5(x), 1, 4), 16, 10).
    */
  private def h16(md: java.security.MessageDigest, s: String): Int = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    ((d(0) & 0xff) << 8) | (d(1) & 0xff)
  }

  def compute(s: UTF8String): Int = {
    val md = localMd.get()
    // same tokenization as TextFunctions.tokenSet (CJK-aware; parity
    // pinned in SimHash16Spec)
    val toks = graft.functions.TextAnalysis.jvmTokens(s.toString)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](16)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        val v = h16(md, t)
        var b = 0
        while (b < 16) {
          // declarative bit(b) = nibble (b/4) of v, bit (3 - b%4) ⇒ v >> (15 - b)
          votes(b) += (((v >> (15 - b)) & 1) * 2) - 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0
    var b = 0
    while (b < 16) { if (votes(b) > 0) fp |= 1 << b; b += 1 }
    fp
  }

  def apply(c: Column): Column =
    GraftBridge.column(SimHash16(GraftBridge.expression(c)))
}
