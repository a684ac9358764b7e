package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (zip_with/aggregate), no UDFs.
  *
  * Determinism: elements are cast to double first and folded strictly
  * left-to-right, so the floating-point summation order is fixed — the
  * same bits on 1 executor or 1000, and the same bits as a DuckDB
  * list_reduce fold for oracle checks.
  *
  * Scale notes: precompute norms once per side (see [[withNorm]]) before
  * a pairwise join so the O(pairs) work is one fused zip_with+fold per
  * pair inside WholeStageCodegen.
  */
object VectorOps {

  /** array<float> → array<double>. */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Left-fold sum of an array<double>. */
  def arraySum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two array<double> columns — a native codegen
    * Catalyst expression (see [[DotProductDouble]]); the HOF variant
    * [[dotHof]] is kept as the reference semantics. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, DotProductDouble}
    ColumnBridge.column(DotProductDouble(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Interpreted higher-order-function dot product (same fold order as
    * [[dot]]); used to cross-check the native expression in specs. */
  def dotHof(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => x * y))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity from raw vectors (norms computed inline; prefer
    * precomputed norms for pairwise joins). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine from precomputed norms. */
  def cosinePre(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Combined multimodal vector — the reference's image⊕text embedding
    * (extracting_embeddings.py:432-439 concatenates the CLIP image and
    * text vectors into the `combined` search vector). */
  def combined(imageVec: Column, textVec: Column): Column =
    concat(imageVec, textVec)

  /** L2-normalize a vector (unit sphere), guarding the zero vector. */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, a).otherwise(transform(a, x => x / n))
  }
}
