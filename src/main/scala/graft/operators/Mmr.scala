package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorOps.cosinePre

/** Maximal-marginal-relevance result diversification (Carbonell &
  * Goldstein, SIGIR'98) — the last stage of the serving stack built in
  * this repo (retrieve q27/q72 → filter q167 → fuse q162 → DIVERSIFY):
  * a top-k of near-identical neighbors is technically correct and
  * useless to a user; the reference's similar-items panel
  * (streamlit/app/app.py:237-254) ships Qdrant's raw top-10 and shows
  * exactly this failure on duplicate-heavy heritage records. MMR
  * re-picks greedily: each step takes argmax λ·rel(c) − (1−λ)·max_{s∈S}
  * sim(c,s), trading relevance against redundancy with what is already
  * selected.
  *
  * Engine-exact: relevance and candidate-pair similarities enter as the
  * ROUND(·,9) cosines both engines already agree on bitwise (q27), and
  * λ = 0.5 is chosen deliberately — argmax(λ·rel − (1−λ)·msim) is then
  * argmax(rel − msim), so the ranking key is ONE IEEE subtraction of
  * identical doubles and the reported `mmr_margin` is that raw
  * difference, never re-rounded (re-rounding (rel−msim)/2 at 9 decimals
  * sits exactly on round-half boundaries — the 10th digit is always 0
  * or 5 — where engine ROUNDs disagree by 1 ulp; found at the sf1
  * gate); argmax ties break on candidate id, and the greedy recursion
  * is replayed round-for-round in the oracle (the q87 unrolled-loop
  * pattern). A query with fewer candidates than [[SelK]] simply stops
  * early (LEFT-joined winner rounds no-op).
  *
  * Scale notes: the corpus is touched ONLY by the shortlist retrieval
  * (broadcast probes + map-side top-k, q27's shape). Everything after —
  * the CandK² pairwise sims and [[SelK]] greedy rounds — runs on
  * probes·CandK rows, and each round is a broadcast of |probes| winner
  * rows, never a shuffle of the corpus. That is the defining property of
  * serving-side reranking: cost is a function of k, not of corpus size. */
object Mmr {

  /** Shortlist depth entering the diversifier. */
  val CandK = 20
  /** Diversified picks per query. */
  val SelK = 5

  def mmrDiversify(s: SparkSession, dir: String): DataFrame =
    mmrDiversify(graft.Tables.embeddings(s, dir))

  def mmrDiversify(embeddings: DataFrame): DataFrame = {
    val v = Dedup.normalized(embeddings)
    val q = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("e").as("eq"), col("nrm").as("nq"))
    val c = v.select(col("vec_id").as("__cand_id"), col("e").as("ec"), col("nrm").as("nc"))
    val scored = broadcast(q).join(c, col("query_id") =!= col("__cand_id"))
      .select(col("query_id"), col("__cand_id"),
        cosinePre(col("eq"), col("ec"), col("nq"), col("nc")).as("sim"))
    val cand = Similarity.explodeTopKPerGroup(scored, "query_id", "cand_id", CandK)
      .select(col("query_id"), col("cand_id"), col("sim_r").as("rel"))

    // pairwise similarities inside each query's shortlist (≤ CandK² rows
    // per probe) — the redundancy term
    val cv = cand.select(col("query_id"), col("cand_id"))
      .join(v.select(col("vec_id").as("cand_id"), col("e"), col("nrm")), Seq("cand_id"))
    val a = cv.select(col("query_id"), col("cand_id").as("cid"),
      col("e").as("ea"), col("nrm").as("na"))
    val b = cv.select(col("query_id"), col("cand_id").as("other"),
      col("e").as("eb"), col("nrm").as("nb"))
    val pairs = a.join(b, Seq("query_id")).filter(col("cid") =!= col("other"))
      .select(col("query_id"), col("cid"), col("other"),
        round(cosinePre(col("ea"), col("eb"), col("na"), col("nb")), 9).as("psim"))
      .localCheckpoint()

    // checkpointed: `state` feeds BOTH the winner argmax and the update
    // join each round — without cutting lineage the upstream shortlist
    // retrieval re-evaluates 2^SelK times (the BpeTrain lesson)
    var state = cand
      .withColumn("msim", lit(0.0))
      .withColumn("mmr_step", lit(0L))
      .withColumn("score", lit(null).cast("double"))
      .localCheckpoint()
    for (k <- 1 to SelK) {
      val wRank = Window.partitionBy(col("query_id"))
        .orderBy(col("s").desc, col("cand_id"))
      val winner = state.filter(col("mmr_step") === 0L)
        .withColumn("s", col("rel") - col("msim"))
        .withColumn("rn", row_number().over(wRank))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("cand_id").as("w_cand"), col("s").as("w_score"))
      state = state
        .join(broadcast(winner), Seq("query_id"), "left")
        // explicit broadcast: the checkpointed pair table's stats are
        // opaque to the planner (LogicalRDD), which otherwise falls back
        // to a per-round sort-merge join on a probes·k² frame
        .join(broadcast(pairs.withColumnRenamed("cid", "cand_id")
            .withColumnRenamed("other", "w_cand")),
          Seq("query_id", "cand_id", "w_cand"), "left")
        .select(col("query_id"), col("cand_id"), col("rel"),
          when(col("mmr_step") === 0L && col("cand_id") =!= col("w_cand") &&
              col("psim").isNotNull, greatest(col("msim"), col("psim")))
            .otherwise(col("msim")).as("msim"),
          when(col("mmr_step") === 0L && col("cand_id") === col("w_cand"),
            lit(k.toLong)).otherwise(col("mmr_step")).as("mmr_step"),
          when(col("mmr_step") === 0L && col("cand_id") === col("w_cand"),
            col("w_score")).otherwise(col("score")).as("score"))
        .localCheckpoint()
    }
    state.filter(col("mmr_step") > 0L)
      .select(col("query_id"), col("cand_id"), col("mmr_step"),
        col("rel").as("rel_r"), col("score").as("mmr_margin"))
      .orderBy("query_id", "mmr_step")
  }

  /** q168 oracle: the greedy recursion unrolled round-for-round (q87's
    * pattern) over the same rounded-9 cosine inputs. */
  def mmrDiversifyOracleSql: String = {
    val rounds = (1 to SelK).map { k =>
      s"""w$k AS (SELECT query_id, cand_id AS w_cand, s AS w_score FROM (
         |  SELECT query_id, cand_id, rel - msim AS s,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY rel - msim DESC, cand_id) AS rn
         |  FROM s${k - 1} WHERE mmr_step = 0) WHERE rn = 1),
         |s$k AS (SELECT s.query_id, s.cand_id, s.rel,
         |    CASE WHEN s.mmr_step = 0 AND s.cand_id <> w.w_cand AND pp.psim IS NOT NULL
         |      THEN greatest(s.msim, pp.psim) ELSE s.msim END AS msim,
         |    CASE WHEN s.mmr_step = 0 AND s.cand_id = w.w_cand
         |      THEN $k ELSE s.mmr_step END AS mmr_step,
         |    CASE WHEN s.mmr_step = 0 AND s.cand_id = w.w_cand
         |      THEN w.w_score ELSE s.score END AS score
         |  FROM s${k - 1} s LEFT JOIN w$k w ON w.query_id = s.query_id
         |  LEFT JOIN pp ON pp.query_id = s.query_id
         |    AND pp.cid = s.cand_id AND pp.other = w.w_cand)""".stripMargin
    }.mkString(",\n")
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings WHERE embedding IS NOT NULL),
       |n AS (SELECT vec_id, e,
       |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform(range(1, len(e)+1), i -> e[i]*e[i])), (x,y) -> x+y)) AS nrm FROM v),
       |sp AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform(range(1, len(q.e)+1), i -> q.e[i]*c.e[i])), (x,y) -> x+y)
       |   / (q.nrm * c.nrm) AS sim
       |  FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
       |r AS (SELECT query_id, cand_id, ROUND(sim, 9) AS rel FROM (
       |  SELECT query_id, cand_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rk
       |  FROM sp) WHERE rk <= $CandK),
       |pp AS (SELECT a.query_id, a.cand_id AS cid, b.cand_id AS other,
       |  ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform(range(1, len(na.e)+1), i -> na.e[i]*nb.e[i])), (x,y) -> x+y)
       |   / (na.nrm * nb.nrm), 9) AS psim
       |  FROM r a JOIN r b ON a.query_id = b.query_id AND a.cand_id <> b.cand_id
       |  JOIN n na ON na.vec_id = a.cand_id
       |  JOIN n nb ON nb.vec_id = b.cand_id),
       |s0 AS (SELECT query_id, cand_id, rel, CAST(0.0 AS DOUBLE) AS msim,
       |  0 AS mmr_step, CAST(NULL AS DOUBLE) AS score FROM r),
       |$rounds
       |SELECT query_id, cand_id, CAST(mmr_step AS BIGINT) AS mmr_step,
       |  rel AS rel_r, score AS mmr_margin
       |FROM s$SelK WHERE mmr_step > 0 ORDER BY query_id, mmr_step""".stripMargin
  }
}
