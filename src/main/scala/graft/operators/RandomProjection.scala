package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Johnson-Lindenstrauss signed random projection (Achlioptas 2003,
  * "Database-friendly random projections": entries drawn from ±1 keep
  * the JL distance-preservation guarantee) — the standard cheap
  * dimensionality reduction a 100 TB embedding pipeline runs before
  * clustering/dedup when 64→16 dims cuts downstream shuffle bytes 4×.
  * The reference ships full CLIP vectors end-to-end
  * (extracting_embeddings.py:154-183); this is the compression audit a
  * team runs to decide whether the pipeline can afford to.
  *
  * q190 projects every embedding to [[R]] dims with a FIXED
  * deterministic ±1 matrix and reports, per consecutive-id pair, the
  * cosine in the original and the projected space plus the absolute
  * distortion — the acceptance metric for the JL trade.
  *
  * Determinism: the sign matrix is a compile-time constant (parity of
  * the first hex char of md5("i_j") — seedable, engine-independent,
  * inlined as literals into BOTH the Spark plan and the oracle SQL).
  * Vectors are integral-double quantized ([[KMeansOp.ScaleQ]]), so
  * original-space dot products and norms are EXACT integers; projected
  * values are exact integer sums, and the projected dot products fold
  * left-to-right ascending on both engines (the lr pattern) so every
  * float matches bitwise. One rounded division per output column.
  *
  * Plan shape: one narrow projection per row (unrolled codegen sums —
  * no HOF fallback, SURVEY §6's round-1 lesson), one keyed equality
  * self-join on vec_id+1, no other shuffle. */
object RandomProjection {

  val R = 16
  private val Dim = KMeansOp.Dim

  /** Deterministic ±1 matrix: signs(i)(j) for input dim i (0-based),
    * output dim j. */
  private[graft] val signs: IndexedSeq[IndexedSeq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until Dim).map { i =>
      (0 until R).map { j =>
        val h = md.digest(s"${i}_$j".getBytes("UTF-8"))
        val hex = "%02x".format(h(0) & 0xff)
        if (hex.charAt(0).toInt % 2 == 0) 1 else -1
      }
    }
  }

  /** Ascending left fold of `terms` — matches the oracle's unrolled
    * left-associated `t1 + t2 + …` sums. */
  private def foldSum(terms: Seq[Column]): Column = terms.reduce(_ + _)

  private def projCol(q: Column, j: Int): Column =
    foldSum((0 until Dim).map(i =>
      element_at(q, i + 1) * lit(signs(i)(j).toDouble)))

  private def dotCol(a: Column, b: Column, dim: Int): Column =
    foldSum((0 until dim).map(i => element_at(a, i + 1) * element_at(b, i + 1)))

  /** q190: per consecutive-id pair, original vs projected cosine and
    * the absolute distortion. */
  def jlDistortion(s: SparkSession, dir: String): DataFrame =
    jlDistortion(Tables.embeddings(s, dir))

  def jlDistortion(embeddings: DataFrame): DataFrame = {
    // Materialize the quantized frame BEFORE the unrolled projection:
    // `q` comes from a transform() HOF, and CollapseProject would
    // otherwise inline that lambda into every one of the 16×64
    // element_at terms below — re-evaluating it per term (measured
    // 30s at sf0.1 vs ~1s materialized). The checkpoint makes q a
    // concrete column, so the 1,024 unrolled terms read cheap array
    // slots in codegen.
    val qmat = KMeansOp.quantized(embeddings).localCheckpoint()
    // Materialized again after projecting: both join sides below read
    // pr, and without the barrier the corpus projection runs twice.
    // Norms ride along from here — each row's self-dots (na/pna) were
    // previously re-folded PER PAIR on both join sides (4 of the 6
    // unrolled folds in the pair projection); computing them once per
    // row before the join halves the per-pair work and the expressions
    // are the identical unrolled left folds, so the doubles match
    // bitwise.
    // nq folds over the CHECKPOINTED q attribute inside the same
    // projection (cheap slot reads); np is added in a projection ABOVE
    // the checkpoint, where p is a concrete array — folding it inside
    // the p-building projection would let SimplifyExtractValueOps
    // re-expand each element_at(p, i) back into the full 64-term
    // projection sum (the same CollapseProject trap as `q`).
    val pr0 = qmat
      .select(col("vec_id"), col("q"),
        array((0 until R).map(j => projCol(col("q"), j)): _*).as("p"),
        sqrt(dotCol(col("q"), col("q"), Dim)).as("nq"))
      .localCheckpoint()
    val pr = pr0.select(col("vec_id"), col("q"), col("p"), col("nq"),
      sqrt(dotCol(col("p"), col("p"), R)).as("np"))
    val a = pr.select(col("vec_id").as("vec_id_a"), col("q").as("qa"),
      col("p").as("pa"), col("nq").as("na"), col("np").as("pna"))
    val b = pr.select((col("vec_id") - 1).as("vec_id_a"),
      col("vec_id").as("vec_id_b"), col("q").as("qb"), col("p").as("pb"),
      col("nq").as("nb"), col("np").as("pnb"))
    a.join(b, Seq("vec_id_a"))
      .select(col("vec_id_a"), col("vec_id_b"),
        dotCol(col("qa"), col("qb"), Dim).as("dq"),
        col("na"), col("nb"),
        dotCol(col("pa"), col("pb"), R).as("dp"),
        col("pna"), col("pnb"))
      .where(col("na") > 0 && col("nb") > 0 && col("pna") > 0 && col("pnb") > 0)
      .select(col("vec_id_a"), col("vec_id_b"),
        round(col("dq") / (col("na") * col("nb")), 9).as("cos_orig_r"),
        round(col("dp") / (col("pna") * col("pnb")), 9).as("cos_proj_r"))
      .withColumn("err_r",
        round(abs(col("cos_orig_r") - col("cos_proj_r")), 9))
      .orderBy("vec_id_a")
  }

  /** q190 oracle: sign literals inlined per output dim as UNROLLED
    * left-associated sums (the lambda form costs a list construction
    * per term — 27× slower, measured), identical folds. `pr` is
    * MATERIALIZED: both join sides reference it, and DuckDB inlines
    * plain CTEs per reference. */
  def jlDistortionOracleSql: String = {
    def dot(a: String, b: String, dim: Int) =
      (1 to dim).map(i => s"$a[$i]*$b[$i]").mkString(" + ")
    val projList = (0 until R).map { j =>
      (0 until Dim).map(i => s"q[${i + 1}]*(${signs(i)(j)})").mkString(" + ")
    }.mkString("[", ",\n ", "]")
    s"""WITH qv AS (SELECT vec_id,
       |  list_transform(embedding, x -> round(CAST(x AS DOUBLE) * ${KMeansOp.ScaleQ})) AS q
       | FROM embeddings WHERE embedding IS NOT NULL),
       |pr AS MATERIALIZED (SELECT vec_id, q, $projList AS p FROM qv),
       |pairs AS (SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       |    ${dot("a.q", "b.q", Dim)} AS dq,
       |    sqrt(${dot("a.q", "a.q", Dim)}) AS na,
       |    sqrt(${dot("b.q", "b.q", Dim)}) AS nb,
       |    ${dot("a.p", "b.p", R)} AS dp,
       |    sqrt(${dot("a.p", "a.p", R)}) AS pna,
       |    sqrt(${dot("b.p", "b.p", R)}) AS pnb
       |  FROM pr a JOIN pr b ON b.vec_id = a.vec_id + 1),
       |c AS (SELECT vec_id_a, vec_id_b,
       |    ROUND(dq / (na * nb), 9) AS cos_orig_r,
       |    ROUND(dp / (pna * pnb), 9) AS cos_proj_r
       |  FROM pairs
       |  WHERE na > 0 AND nb > 0 AND pna > 0 AND pnb > 0)
       |SELECT vec_id_a, vec_id_b, cos_orig_r, cos_proj_r,
       |  ROUND(ABS(cos_orig_r - cos_proj_r), 9) AS err_r
       |FROM c ORDER BY vec_id_a""".stripMargin
  }
}
