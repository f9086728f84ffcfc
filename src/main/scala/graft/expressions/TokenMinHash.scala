package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature (Dedup.minhashSignature's twin): lowercase
  * whitespace tokens → word n-gram shingles (short texts collapse to one
  * whole-string shingle) → 28-bit md5 value per shingle → per-seed
  * affine minimum, all in ONE JVM pass. The declarative chain pays
  * numHashes interpreted array traversals per row; this pays one loop.
  * Bit-identical by construction (same tokenization, md5 prefix, and
  * (A·v+B) mod 1e9+7 family from Dedup.minhashCoeffs), so the d6 oracle
  * covers it; parity is pinned in TokenMinHashSpec.
  */
case class TokenMinHash(child: Expression, shingleSize: Int,
                        coeffs: Seq[(Long, Long)]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_minhash"

  @transient private lazy val as: Array[Long] = coeffs.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = coeffs.map(_._2).toArray

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TokenMinHash.compute(
      input.asInstanceOf[UTF8String], shingleSize, as, bs))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.TokenMinHash.compute($c, $shingleSize, $aRef, $bRef))")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenMinHash =
    copy(child = newChild)
}

object TokenMinHash {
  private val MOD = 1000000007L

  /** 28-bit value from the first 7 hex chars of md5(s) — identical to
    * conv(substring(md5(x), 1, 7), 16, 10).
    */
  private def h28(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >> 4)
  }

  private val localMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def compute(s: UTF8String, shingleSize: Int,
              as: Array[Long], bs: Array[Long]): Array[Long] = {
    val md = localMd.get()
    // same tokenization as TextAnalysis.tokens (CJK-aware; parity pinned
    // in TokenMinHashSpec)
    val toks = graft.functions.TextAnalysis.jvmTokens(s.toString)
    val shingles: Iterator[String] =
      if (toks.length < shingleSize) Iterator(toks.mkString(" "))
      else {
        val seen = new java.util.HashSet[String]()
        (0 to toks.length - shingleSize).iterator
          .map(i => toks.slice(i, i + shingleSize).mkString(" "))
          .filter(seen.add)
      }
    val sig = Array.fill(as.length)(Long.MaxValue)
    var any = false
    shingles.foreach { sh =>
      any = true
      val v = h28(md, sh)
      var j = 0
      while (j < as.length) {
        val h = (as(j) * v + bs(j)) % MOD
        if (h < sig(j)) sig(j) = h
        j += 1
      }
    }
    // empty-token text yields one ""-shingle in the declarative chain
    if (!any) {
      val v = h28(md, "")
      var j = 0
      while (j < as.length) { sig(j) = (as(j) * v + bs(j)) % MOD; j += 1 }
    }
    sig
  }

  def apply(c: Column, shingleSize: Int, coeffs: Seq[(Long, Long)]): Column =
    GraftBridge.column(TokenMinHash(GraftBridge.expression(c), shingleSize, coeffs))
}
