package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Contamination fraction of a document against a fixed eval n-gram
  * hash set, in ONE JVM pass: tokenize (TextAnalysis.jvmTokens), hash
  * each strict token n-gram with Spark's xxhash64 seed-chain (identical
  * to `xxhash64(slice(toks, i, n))`, so hashes from the declarative
  * [[graft.operators.Decontam.evalGramHashes]] probe match bit-for-bit),
  * dedup, and binary-search the sorted eval set. Returns
  * distinct-matched / distinct-total as a double, 0.0 when the doc has
  * no n-grams, null on null text.
  *
  * Why an expression and not the declarative gram chain behind a select
  * boundary: a FILTER predicate has no select boundary —
  * PushPredicateThroughNonJoin substitutes projection aliases into the
  * pushed condition, which re-inlines the tokenizer inside the
  * transform lambda (re-running the regex once per gram — the capture
  * pitfall CLAUDE.md forbids). A single self-contained expression is
  * immune: however Catalyst moves it, it evaluates once per row. The
  * declarative formula survives as the spec-only parity twin
  * (DecontamSpec pins equality, CJK and non-BMP included).
  */
case class TokenNgramContamination(child: Expression, n: Int,
                                   sortedEvalHashes: Array[Long])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "token_ngram_contamination"

  override def nullSafeEval(input: Any): Any =
    TokenNgramContamination.compute(
      input.asInstanceOf[UTF8String], n, sortedEvalHashes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("evalHashes", sortedEvalHashes, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TokenNgramContamination.compute($c, $n, $setRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenNgramContamination = copy(child = newChild)
}

object TokenNgramContamination {

  /** xxhash64 of tokens(i until i+n) — the seed-chain Spark's XxHash64
    * uses for array<string> (each element hashed with the running result
    * as seed, initial seed 42). Parity with the declarative
    * `xxhash64(slice(toks, i, n))` is pinned in DecontamSpec.
    */
  private def gramHash(toks: Array[UTF8String], i: Int, n: Int): Long = {
    var h = 42L
    var j = i
    while (j < i + n) {
      h = XxHash64Function.hash(toks(j), StringType, h)
      j += 1
    }
    h
  }

  def compute(text: UTF8String, n: Int, sorted: Array[Long]): Double = {
    val words = graft.functions.TextAnalysis.jvmTokens(text.toString)
    if (words.length < n) return 0.0
    val toks = new Array[UTF8String](words.length)
    var i = 0
    while (i < words.length) { toks(i) = UTF8String.fromString(words(i)); i += 1 }
    // distinct-by-hash, matching the declarative array_distinct over hashes
    val seen = new java.util.HashSet[java.lang.Long]()
    var total = 0L
    var matched = 0L
    i = 0
    while (i <= toks.length - n) {
      val h = gramHash(toks, i, n)
      if (seen.add(h)) {
        total += 1
        if (java.util.Arrays.binarySearch(sorted, h) >= 0) matched += 1
      }
      i += 1
    }
    // same IEEE divide as the declarative cast(m as double) / t
    if (total > 0) matched.toDouble / total.toDouble else 0.0
  }

  def apply(c: Column, n: Int, sortedEvalHashes: Array[Long]): Column =
    GraftBridge.column(TokenNgramContamination(
      GraftBridge.expression(c), n, sortedEvalHashes))
}
