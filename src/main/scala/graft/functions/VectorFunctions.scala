package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` embedding columns
  * (SURVEY.md §2.9 V1–V3), built from higher-order functions so the dot
  * products stay codegen'd column expressions — no UDF boundary, no
  * per-row boxing beyond the array itself.
  *
  * All functions promote to double before accumulating: float-order
  * effects stay below the 1e-6 rounding used by oracle comparisons.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ via zip_with + aggregate. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; zero-norm input ⇒ null via an explicit guard —
    * a bare division would throw DIVIDE_BY_ZERO under ANSI mode (Spark 4
    * default). Ref behavior: RAG/rag.ipynb:488-530.
    */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom > 0, dot(a, b) / denom)
  }

  /** Euclidean distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, x) => acc + x))

  /** L2-normalize a vector to unit length (TF-embedding contract:
    * RAG/rag.ipynb:413-436 normalizes its bag-of-words fallback).
    */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n > 0, transform(a, x => x.cast("double") / n)).otherwise(a.cast("array<double>"))
  }

  // ---------------------------------------------------------------------
  // Symmetric int8 scalar quantization (the ANN memory-bandwidth path:
  // codes are 4× smaller than float32, and cosine over codes needs no
  // dequantization because the per-vector scales cancel).
  // ---------------------------------------------------------------------

  /** Per-vector symmetric scale: max|xᵢ|/127 (0 for the zero vector). */
  def int8Scale(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double")))) / 127.0

  /** Quantize to int8 codes in [−127, 127] with a PRE-MATERIALIZED scale
    * column (pass [[int8Scale]] through a select boundary first —
    * splicing it into this lambda re-runs the max-fold per element).
    * Rounding is the floor-stable half-up used everywhere else, so the
    * oracle replicates codes exactly. Zero vectors code to zeros.
    */
  def int8Codes(v: Column, scale: Column): Column =
    when(scale > 0,
      transform(v, x => floor(x.cast("double") / scale + 0.5).cast("long")))
      .otherwise(transform(v, _ => lit(0L)))

  /** Integer dot product of two code arrays (exact, order-independent). */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
}
