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

    // materialized once: the shortlist feeds the pair build twice (both
    // self-join arms) and the greedy fold — without the barrier the
    // corpus-side retrieval re-evaluates per consumer
    val candCp = cand.localCheckpoint()

    // pairwise similarities inside each query's shortlist (≤ CandK² rows
    // per probe) — the redundancy term
    val cv = candCp.select(col("query_id"), col("cand_id"))
      .join(v.select(col("vec_id").as("cand_id"), col("e"), col("nrm")), Seq("cand_id"))
    val a = cv.select(col("query_id"), col("cand_id").as("cid"),
      col("e").as("ea"), col("nrm").as("na"))
    val b = cv.select(col("query_id"), col("cand_id").as("other"),
      col("e").as("eb"), col("nrm").as("nb"))
    val pairs = a.join(b, Seq("query_id")).filter(col("cid") =!= col("other"))
      .select(col("query_id"), col("cid"), col("other"),
        round(cosinePre(col("ea"), col("eb"), col("na"), col("nb")), 9).as("psim"))

    // The SelK greedy rounds fold PER QUERY in one cogroup pass: state is
    // ≤ CandK rows and the pair table ≤ CandK² rows per probe BY
    // CONSTRUCTION (cost is a function of k, not corpus size), so the
    // former per-round window + two joins + localCheckpoint chain
    // (~25 jobs of scheduling latency at sf0.1) is replaced by one
    // shuffle of each bounded frame. The fold replays the exact same
    // arithmetic: s = rel − msim (one IEEE subtraction of the rounded-9
    // doubles), winner = max s with ties to the lower cand_id, losers
    // take msim = max(msim, psim(cid, winner)) — spec-checked against
    // the oracle's unrolled recursion.
    val spark = embeddings.sparkSession
    import spark.implicits._
    val candDs = candCp.select(col("query_id").cast("long"),
      col("cand_id").cast("long"), col("rel").cast("double"))
      .as[(Long, Long, Double)].groupByKey(_._1)
    val pairDs = pairs.select(col("query_id").cast("long"),
      col("cid").cast("long"), col("other").cast("long"),
      col("psim").cast("double"))
      .as[(Long, Long, Long, Double)].groupByKey(_._1)
    val picked = candDs.cogroup(pairDs) { (qid, cs, ps) =>
      val cands = cs.map { case (_, id, rel) => (id, rel) }.toArray
      val psim = ps.map { case (_, cid, other, s) => (cid, other) -> s }.toMap
      val msim = scala.collection.mutable.LongMap
        .empty[Double].withDefaultValue(0.0)
      val done = scala.collection.mutable.LongMap.empty[(Long, Double)]
      var k = 1
      while (k <= SelK && done.size < cands.length) {
        var wId = -1L; var wScore = 0.0
        cands.foreach { case (id, rel) =>
          if (!done.contains(id)) {
            val s = rel - msim(id)
            if (wId < 0 || s > wScore || (s == wScore && id < wId)) {
              wId = id; wScore = s
            }
          }
        }
        done(wId) = (k.toLong, wScore)
        cands.foreach { case (id, _) =>
          if (!done.contains(id))
            psim.get((id, wId)).foreach(p => msim(id) = math.max(msim(id), p))
        }
        k += 1
      }
      cands.iterator.flatMap { case (id, rel) =>
        done.get(id).map { case (step, score) => (qid, id, step, rel, score) }
      }
    }
    picked.toDF("query_id", "cand_id", "mmr_step", "rel_r", "mmr_margin")
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
