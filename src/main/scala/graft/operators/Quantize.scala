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

  /** q130: per-dimension corpus STANDARDIZATION (z-scoring) — the
    * whitening-lite preprocessing run before distance-based ops
    * (clustering, ANN, near-dup thresholds) so no dimension dominates
    * by scale. Two passes: ONE map-combined 64-row moment aggregate
    * (count / sum / sum-of-squares per dimension over KMeansOp's
    * quantized integral vectors — sums exact in DECIMAL, so the
    * moments are order-independent), broadcast back onto the exploded
    * corpus for the z computation.
    *
    * Exactness: z = (n·x_q − s) / √(n·ss − s²) — numerator an exact
    * int64 (≤ n·10⁶, well under 2⁵³), variance numerator an exact
    * DECIMAL(38,0) cast once to double (correctly rounded in Spark;
    * the oracle routes the same value through VARCHAR because DuckDB's
    * int128→double cast is not correctly rounded), then one IEEE sqrt
    * + divide — bit-identical across engines. Zero-variance dims z=0.
    *
    * Gated surface per vector: ±2σ outlier-dim counts (exact ints),
    * z min/max, and the dim-0 z as a direct value witness — all
    * order-independent, no float aggregation.
    *
    * Scale notes: moments are one partial-agg shuffle of 64×P rows;
    * the join-back is a 64-row broadcast; nothing else shuffles. At
    * 100 TB the explode inflates the scan 64× — fuse the explode and
    * the final per-vector fold into one mapPartitions (or a native
    * Expression over the array) if the scan cost shows; the moment
    * pass is already minimal. */
  def standardize(s: SparkSession, dir: String): DataFrame =
    standardize(Tables.embeddings(s, dir))

  def standardize(embeddings: DataFrame): DataFrame = {
    val ex = KMeansOp.quantized(embeddings)
      .select(col("vec_id"), posexplode(col("q")))
      .toDF("vec_id", "d", "xq")
      .withColumn("xq", col("xq").cast("long"))
    val stats = ex.groupBy(col("d"))
      .agg(count(lit(1)).as("n"),
        sum(col("xq")).as("s"),
        sum((col("xq").cast("decimal(19,0)") * col("xq").cast("decimal(19,0)")))
          .as("ss"))
      .withColumn("var_num",
        col("ss") * col("n").cast("decimal(19,0)")
          - col("s").cast("decimal(19,0)") * col("s").cast("decimal(19,0)"))
    val zed = ex.join(broadcast(stats), Seq("d"))
      .withColumn("z",
        when(col("var_num") === lit(0), lit(0.0))
          .otherwise((col("n") * col("xq") - col("s")).cast("double")
            / sqrt(col("var_num").cast("double"))))
    zed.groupBy(col("vec_id"))
      .agg(
        sum(when(col("z") > 2.0, 1L).otherwise(0L)).as("n_hi"),
        sum(when(col("z") < -2.0, 1L).otherwise(0L)).as("n_lo"),
        min(col("z")).as("z_min"),
        max(col("z")).as("z_max"),
        max(when(col("d") === 0, col("z"))).as("z_dim0"))
      .orderBy("vec_id")
  }

  val standardizeOracleSql: String =
    s"""WITH qv AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * ${KMeansOp.ScaleQ}) AS BIGINT)) AS q
       | FROM embeddings WHERE embedding IS NOT NULL),
       |ex AS (SELECT vec_id, u.d AS d, u.xq AS xq FROM (
       |  SELECT vec_id, unnest(list_transform(range(1, len(q)+1),
       |    i -> {'d': i-1, 'xq': q[i]})) AS u FROM qv)),
       |st AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(xq) AS BIGINT) AS s, SUM(xq*xq) AS ss FROM ex GROUP BY d),
       |sv AS (SELECT d, n, s,
       |  CAST(ss AS HUGEINT)*n - CAST(s AS HUGEINT)*s AS var_num FROM st),
       |z AS (SELECT vec_id, d,
       |  CASE WHEN var_num = 0 THEN 0.0
       |    ELSE CAST(n*xq - s AS DOUBLE) / sqrt(CAST(CAST(var_num AS VARCHAR) AS DOUBLE))
       |  END AS z
       |  FROM ex JOIN sv USING (d))
       |SELECT vec_id,
       |  CAST(SUM(CASE WHEN z > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
       |  CAST(SUM(CASE WHEN z < -2 THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
       |  MIN(z) AS z_min, MAX(z) AS z_max,
       |  MAX(CASE WHEN d = 0 THEN z END) AS z_dim0
       |FROM z GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** q176: embedding dimension covariance / correlation matrix (the
    * distributed Gramian) — the whitening / PCA-precursor statistic a
    * real embedding corpus is audited with before ANN index tuning:
    * strongly correlated dimensions mean the effective dimensionality
    * is lower than the stored one (and PQ subspace splits should cut
    * across, not along, the correlation structure; q111's codebooks
    * and q130's per-dim z-scores both implicitly assume this matrix
    * is near-diagonal — this operator is the audit that checks it).
    * Reference anchor: extracting_embeddings.py stores raw CLIP
    * vectors; dimension-correlation auditing is the standard scale-out
    * hygiene over such a corpus.
    *
    * Exactness: works on KMeansOp's ScaleQ-quantized integral vectors;
    * all moments (Σx, Σx², Σxy) are exact integer/DECIMAL sums —
    * order-independent, so partial aggregation commutes — and the
    * covariance/correlation doubles derive from those exact integers
    * through a VARCHAR round-trip (DuckDB's int128→double cast is not
    * correctly rounded; parsing the exact decimal string is, in both
    * engines).
    *
    * Scale notes: ONE pass — the upper-triangle pair stream (d·(d+1)/2
    * = 2 080 rows per vector at d=64) flows through a map-side-combined
    * aggregate, so the shuffle is 2 080 rows × partitions regardless of
    * corpus size; output is d²-sized, never corpus-sized. The pair
    * stream stays in whole-stage codegen (posexplode + sequence +
    * element_at — no interpreted HOF fold). At 100 TB the explode-side
    * cost is n·d²/2 cheap long multiplies inside one stage; if that
    * shows, the refinement is a native Expression emitting per-vector
    * partial Gramians, not a different plan. */
  def embedCovariance(s: SparkSession, dir: String): DataFrame =
    embedCovariance(Tables.embeddings(s, dir))

  def embedCovariance(embeddings: DataFrame): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(19,0)")
    val pairs = KMeansOp.quantized(embeddings)
      .select(col("q"), posexplode(col("q")))
      .toDF("q", "d1", "x1")
      .select(col("q"), col("d1").cast("long").as("d1"),
        col("x1").cast("long").as("x1"),
        explode(sequence(col("d1").cast("long"), size(col("q")).cast("long") - 1L)).as("d2"))
      .select(col("d1"), col("d2"), col("x1"),
        element_at(col("q"), (col("d2") + 1L).cast("int")).cast("long").as("x2"))
    val toD = (c: Column) => c.cast("string").cast("double")
    pairs.groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
        sum(dec(col("x1")) * dec(col("x2"))).as("s12"),
        sum(dec(col("x1")) * dec(col("x1"))).as("s11"),
        sum(dec(col("x2")) * dec(col("x2"))).as("s22"))
      .withColumn("num", dec(col("n")) * col("s12") - dec(col("s1")) * dec(col("s2")))
      .withColumn("vn1", dec(col("n")) * col("s11") - dec(col("s1")) * dec(col("s1")))
      .withColumn("vn2", dec(col("n")) * col("s22") - dec(col("s2")) * dec(col("s2")))
      .select(col("d1"), col("d2"), col("n"), col("s1"), col("s2"),
        toD(col("num")).as("cov_num"),
        when(col("vn1") === 0 || col("vn2") === 0, lit(null).cast("double"))
          .otherwise(round(toD(col("num")) / sqrt(toD(col("vn1")) * toD(col("vn2"))), 6))
          .as("corr_r"))
      .orderBy("d1", "d2")
  }

  /** q176 oracle: identical quantization, upper-triangle pair stream
    * (flatten of nested list_transform), HUGEINT moments, VARCHAR-
    * routed doubles. */
  val embedCovarianceOracleSql: String =
    s"""WITH qv AS (SELECT
       |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * ${KMeansOp.ScaleQ}) AS BIGINT)) AS q
       | FROM embeddings WHERE embedding IS NOT NULL),
       |px AS (SELECT u.d1 AS d1, u.d2 AS d2, u.x1 AS x1, u.x2 AS x2 FROM (
       |  SELECT unnest(flatten(list_transform(range(0, len(q)), i ->
       |    list_transform(range(i, len(q)), j ->
       |      {'d1': i, 'd2': j, 'x1': q[i+1], 'x2': q[j+1]})))) AS u FROM qv)),
       |m AS (SELECT d1, d2, CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
       |  SUM(CAST(x1 AS HUGEINT) * x2) AS s12,
       |  SUM(CAST(x1 AS HUGEINT) * x1) AS s11,
       |  SUM(CAST(x2 AS HUGEINT) * x2) AS s22
       | FROM px GROUP BY d1, d2),
       |v AS (SELECT d1, d2, n, s1, s2,
       |  CAST(n AS HUGEINT) * s12 - CAST(s1 AS HUGEINT) * s2 AS num,
       |  CAST(n AS HUGEINT) * s11 - CAST(s1 AS HUGEINT) * s1 AS vn1,
       |  CAST(n AS HUGEINT) * s22 - CAST(s2 AS HUGEINT) * s2 AS vn2
       | FROM m)
       |SELECT d1, d2, n, s1, s2,
       |  CAST(CAST(num AS VARCHAR) AS DOUBLE) AS cov_num,
       |  CASE WHEN vn1 = 0 OR vn2 = 0 THEN NULL
       |    ELSE ROUND(CAST(CAST(num AS VARCHAR) AS DOUBLE) /
       |      sqrt(CAST(CAST(vn1 AS VARCHAR) AS DOUBLE) * CAST(CAST(vn2 AS VARCHAR) AS DOUBLE)), 6)
       |  END AS corr_r
       |FROM v ORDER BY d1, d2""".stripMargin
}
