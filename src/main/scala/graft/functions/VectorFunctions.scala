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

  // ---------------------------------------------------------------------
  // Binary (1-bit) sign quantization — the step past int8: one bit per
  // dimension, Hamming distance by xor+popcount. 32× smaller than
  // float32, and the candidate scan is pure integer bit ops.
  // ---------------------------------------------------------------------

  /** 2⁰..2³¹ as a literal lookup — shiftleft needs a constant shift, so
    * packing under a lambda-bound bit index goes through element_at.
    */
  private val pow2 = array((0 until 32).map(i => lit(1L << i)): _*)

  /** Pack sign bits into BIGINT words, 32 dims per word: bit `i` of
    * word `w` is set iff v[32w+i] > 0 (zeros and negatives clear — the
    * deterministic sign rule, no epsilon). Out-of-range tail dims of
    * the last word stay clear (`get` yields NULL past the end, never an
    * ANSI index error). Each word is a sum of distinct powers of two,
    * so the same arithmetic replays as plain BIGINT sums in DuckDB —
    * no 2⁶³ sign-bit overflow because words hold 32 bits.
    */
  def signBits(v: Column): Column =
    transform(
      sequence(lit(0),
        ceil(size(v).cast("double") / 32.0).cast("int") - 1),
      w => aggregate(sequence(lit(0), lit(31)), lit(0L),
        (acc, i) => acc +
          when(get(v, w * 32 + i) > 0, element_at(pow2, i + 1))
            .otherwise(lit(0L))))

  /** Hamming distance between two packed sign-bit arrays: Σ
    * popcount(aᵢ xor bᵢ). Exact, order-independent integer math.
    */
  def hammingDistance(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)
}
