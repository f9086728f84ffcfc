package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen
  * expression — the canonicalization step every corpus pipeline runs
  * before hashing/dedup/tokenization (CCNet, C4): visually identical
  * strings with different code-point sequences ("é" vs "e"+U+0301,
  * fullwidth vs ASCII, ligatures) must hash identically or every
  * downstream exact-dedup and token count silently fractures. Spark has
  * no built-in; a Scala UDF would break whole-stage codegen — this stays
  * fused (one static call, same pattern as [[TokenFingerprint]]).
  *
  * Fast path: `Normalizer.isNormalized` (a scan, no allocation) skips
  * the rewrite for already-normalized text — the overwhelmingly common
  * case in real corpora, and the reason this beats normalize-always.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else if (!UnicodeNormalize.FormNames.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of ${UnicodeNormalize.FormNames.mkString("/")}, got $form")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.compute(input.asInstanceOf[UTF8String], form)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.expressions.UnicodeNormalize.compute($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  import java.text.Normalizer

  private[expressions] val FormNames =
    Normalizer.Form.values().map(_.name()).toSet

  /** JVM kernel shared by eval and generated code. `form` is a literal
    * in the generated source, so valueOf resolves a constant per row —
    * negligible next to the normalization scan itself.
    */
  def compute(s: UTF8String, form: String): UTF8String = {
    val f = Normalizer.Form.valueOf(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  def apply(c: Column, form: String): Column =
    GraftBridge.column(UnicodeNormalize(GraftBridge.expression(c), form))
}
