package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps.toDouble

/** Embedding compression for storage/serving: symmetric int8
  * quantization with per-vector scale — the layout a 100 TB embedding
  * corpus ships to an ANN serving tier (4× smaller than float32, dot
  * products in int arithmetic). The reference stores raw CLIP vectors in
  * Qdrant (extracting_embeddings.py); quantization is the standard
  * scale-out refinement of that storage.
  *
  * Scale notes: ONE narrow projection over the corpus — no shuffle, no
  * join; the per-element loop is a native codegen kernel
  * ([[org.apache.spark.sql.graftbridge.Int8QuantStats]]), not an
  * interpreted HOF stack. The gated output carries the full code array
  * compressed into scalars (sum/min/max + a polynomial hash of every
  * code), so the oracle value-checks the exact int8 codes without
  * emitting an array column the driver's comparator can't hash.
  */
object Quantize {

  /** Native single-pass stats column; see [[int8StatsHof]] for the
    * interpreted reference semantics specs cross-check. */
  def int8Stats(e: Column): Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, Int8QuantStats}
    ColumnBridge.column(Int8QuantStats(ColumnBridge.expression(e)))
  }

  /** Interpreted HOF formulation of [[int8Stats]] — same six outputs via
    * aggregate/transform folds in the same order. */
  def int8StatsHof(e: Column): Column = {
    val hashM = org.apache.spark.sql.graftbridge.Int8QuantStats.HashM
    val amax = aggregate(e, lit(0.0), (a, x) => greatest(a, abs(x)))
    val scale = when(amax > 0.0, lit(127.0) / amax).otherwise(lit(0.0))
    val q = transform(e, x =>
      when(scale === 0.0, lit(0L)).otherwise(
        greatest(lit(-127L), least(lit(127L), round(x * scale).cast("long")))))
    val qsum = aggregate(q, lit(0L), (a, x) => a + x)
    val qmin = aggregate(q, lit(127L), (a, x) => least(a, x))
    val qmax = aggregate(q, lit(-127L), (a, x) => greatest(a, x))
    val qhash = aggregate(q, lit(0L), (a, x) => (a * 31L + x + 127L) % hashM)
    val err = when(scale === 0.0, lit(0.0)).otherwise(
      aggregate(zip_with(e, q, (x, qq) => {
        val d = x - qq.cast("double") / scale
        d * d
      }), lit(0.0), (a, x) => a + x))
    array(scale, qsum.cast("double"), qmin.cast("double"), qmax.cast("double"),
      qhash.cast("double"), err)
  }

  /** q66: per-vector int8 quantization summary — scale, code stats, code
    * hash (value-proves the full code array), reconstruction error. */
  def int8Quantize(s: SparkSession, dir: String): DataFrame =
    int8Quantize(Tables.embeddings(s, dir))

  def int8Quantize(embeddings: DataFrame): DataFrame =
    embeddings
      // NULL embeddings drop at the scan (same policy as Dedup.normalized)
      .where(col("embedding").isNotNull)
      .select(col("vec_id"), int8Stats(toDouble(col("embedding"))).as("st"))
      .select(col("vec_id"),
        round(element_at(col("st"), 1), 9).as("scale_r"),
        element_at(col("st"), 2).cast("long").as("q_sum"),
        element_at(col("st"), 3).cast("long").as("q_min"),
        element_at(col("st"), 4).cast("long").as("q_max"),
        element_at(col("st"), 5).cast("long").as("q_hash"),
        round(element_at(col("st"), 6), 9).as("err_r"))
      .orderBy("vec_id")

  /** q66 oracle: the same folds as the kernel, element order fixed —
    * round() is ties-away-from-zero in both engines, the integer folds
    * are exact, and err replays the identical left-to-right float
    * accumulation. */
  def int8OracleSql: String = {
    val hashM = org.apache.spark.sql.graftbridge.Int8QuantStats.HashM
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings WHERE embedding IS NOT NULL),
       |m AS (SELECT vec_id, e,
       |  list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(e, x -> abs(x))),
       |    (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS amax FROM v),
       |s AS (SELECT vec_id, e,
       |  CASE WHEN amax > 0 THEN 127.0 / amax ELSE 0.0 END AS scale FROM m),
       |q AS (SELECT vec_id, e, scale,
       |  list_transform(e, x -> CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
       |    ELSE GREATEST(CAST(-127 AS BIGINT), LEAST(CAST(127 AS BIGINT),
       |      CAST(round(x * scale) AS BIGINT))) END) AS qe FROM s)
       |SELECT vec_id,
       |  ROUND(scale, 9) AS scale_r,
       |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), qe), (a, b) -> a + b) AS BIGINT) AS q_sum,
       |  CAST(list_reduce(list_prepend(CAST(127 AS BIGINT), qe), (a, b) -> LEAST(a, b)) AS BIGINT) AS q_min,
       |  CAST(list_reduce(list_prepend(CAST(-127 AS BIGINT), qe), (a, b) -> GREATEST(a, b)) AS BIGINT) AS q_max,
       |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), qe),
       |    (h, x) -> (h * 31 + x + 127) % $hashM) AS BIGINT) AS q_hash,
       |  ROUND(CASE WHEN scale = 0 THEN 0.0 ELSE
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(range(1, len(e) + 1),
       |        i -> (e[i] - CAST(qe[i] AS DOUBLE) / scale) * (e[i] - CAST(qe[i] AS DOUBLE) / scale))),
       |      (a, b) -> a + b) END, 9) AS err_r
       |FROM q ORDER BY vec_id""".stripMargin
  }
}
