package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native serving-path BPE encoder: CJK-aware tokenize (the shared
  * TextAnalysis.jvmTokens twin) then apply a trained merge list to every
  * token, all in ONE JVM pass per document.
  *
  * The declarative twin — `flatten(transform(toks, w => Bpe.segment(w,
  * merges)))` — nests one fold expression PER MERGE into the plan, so a
  * production-sized merge list (10⁴+) is unplannable; this kernel is
  * O(merges · token length) of primitive string compares per token with
  * an early exit once a token is fully collapsed. Segmentation semantics
  * are exactly [[graft.operators.Bpe.jvmSegment]] (sequential merges in
  * training order, left-to-right non-overlapping — for any merge list a
  * trainer can emit this equals rank-greedy, since a later merge's
  * output can only feed EARLIER-trained symbols if the trainer saw them
  * first); parity with the declarative chain is pinned in BpeSpec.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val aArr: Array[String] = merges.map(_._1).toArray
  @transient private lazy val bArr: Array[String] = merges.map(_._2).toArray
  @transient private lazy val mArr: Array[String] =
    merges.map(p => p._1 + p._2).toArray

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(BpeEncode.compute(
      input.asInstanceOf[UTF8String], aArr, bArr, mArr))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeA", aArr, "java.lang.String[]")
    val bRef = ctx.addReferenceObj("bpeB", bArr, "java.lang.String[]")
    val mRef = ctx.addReferenceObj("bpeM", mArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.BpeEncode.compute($c, $aRef, $bRef, $mRef))")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  def compute(text: UTF8String, aArr: Array[String], bArr: Array[String],
              mArr: Array[String]): Array[UTF8String] = {
    val toks = graft.functions.TextAnalysis.jvmTokens(text.toString)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](toks.length)
    val nMerges = aArr.length
    toks.foreach { tok =>
      // initial symbols = characters (surrogate-pair safe)
      val syms = new Array[String](tok.codePointCount(0, tok.length))
      var ci = 0; var si = 0
      while (ci < tok.length) {
        val cp = tok.codePointAt(ci)
        val w = Character.charCount(cp)
        syms(si) = tok.substring(ci, ci + w)
        ci += w; si += 1
      }
      var len = syms.length
      var mi = 0
      while (mi < nMerges && len > 1) {
        // left-to-right non-overlapping replacement of (a,b) with the
        // merged symbol, in place with a write pointer — identical
        // semantics to Bpe.jvmSegment (a fresh merge result can absorb
        // the NEXT b, never re-pair with the previous symbol)
        var w = 0; var r = 0
        while (r < len) {
          if (w > 0 && syms(w - 1) == aArr(mi) && syms(r) == bArr(mi)) {
            syms(w - 1) = mArr(mi)
          } else {
            syms(w) = syms(r); w += 1
          }
          r += 1
        }
        len = w
        mi += 1
      }
      var k = 0
      while (k < len) { out += UTF8String.fromString(syms(k)); k += 1 }
    }
    out.toArray
  }

  def apply(c: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeEncode(GraftBridge.expression(c), merges))
}
