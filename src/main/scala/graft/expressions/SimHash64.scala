package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash — the PRODUCTION fingerprint width for
  * near-dup pair generation ([[graft.operators.Dedup.simhashPairs]]):
  * 16-bit blocking buckets saturate once a corpus outgrows the 2¹⁶
  * space (every bucket key collides and the candidate join goes
  * quadratic), while 4×16-bit bands over 64 bits keep buckets
  * selective at any corpus size. Same cost as [[SimHash16]]: ONE md5
  * per distinct token, votes over the digest's first 8 bytes. The
  * 16-bit fingerprint remains the reference-parity artifact (d7);
  * this is its scale sibling. Declarative twin:
  * `Dedup.simhash64` — bit-identical, pinned in SimHash16Spec.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  private val localMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** 64-bit value from the first 16 hex chars (8 bytes) of md5(s) —
    * identical to conv(substring(md5(x), 1, 16), 16, 10) interpreted
    * as an unsigned bit pattern.
    */
  private def h64(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  def compute(s: UTF8String): Long = {
    val md = localMd.get()
    val toks = graft.functions.TextAnalysis.jvmTokens(s.toString)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        val v = h64(md, t)
        var b = 0
        while (b < 64) {
          // same convention as SimHash16: bit b votes with hex-string
          // bit (63 - b) of the token value
          votes(b) += ((((v >>> (63 - b)) & 1L) * 2) - 1).toInt
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) fp |= 1L << b; b += 1 }
    fp
  }

  def apply(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))
}
