package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** q-digest quantile sketch (Shrivastava/Buragohain/Agrawal/Suri,
  * SenSys 2004) — the missing member of the sketch family: CMS (q68)
  * answers point frequency, Bloom (q70) membership, HLL (q74/q120)
  * distinct counts; THIS answers rank/quantile queries from bounded
  * state. The engine twin of q51/q97's exact group quantiles for the
  * place exactness can't go: an unbounded stream or a pre-aggregated
  * 100 TB corpus where the answer must come from sketch-sized state.
  *
  * Construction (deterministic, integer-exact end to end):
  *  - values quantize to milli and clamp to the dyadic domain
  *    [0, 2^[[QdLevels]]) — the same milli grid as q192/q193/q200;
  *  - the corpus collapses ONCE to the exact leaf profile (map-side
  *    combined, bounded by the VALUE RANGE, never the corpus — the
  *    q192 stance). The profile is the sketch's mergeable state: leaf
  *    histograms sum across partitions/days/streams exactly like HLL
  *    registers MAX;
  *  - bottom-up compression with threshold t = n div [[QdK]]: a node
  *    whose residual count is ≤ t pushes it to its dyadic parent,
  *    otherwise the node enters the sketch. Every kept non-root node
  *    therefore holds > t, so the sketch has ≤ K + 1 nodes; every
  *    INTERNAL node holds ≤ 2t (two children each pushed ≤ t), which
  *    is what bounds the rank error below.
  *
  * Rank-error guarantee, asserted per query row: a quantile read off
  * the sketch (smallest node upper bound whose cumulative count
  * reaches the target rank) misses the true rank by at most the mass
  * of the boundary-straddling nodes — one ancestor per internal
  * level, ≤ 2t each — so |err| ≤ 2·t·[[QdLevels]], the classic
  * n·log(U)/K q-digest bound. The gated output carries the sketch
  * estimate, the exact quantile (from the same leaf profile), the
  * achieved rank error, and the bound — all BIGINTs, no float leaves
  * the plan.
  *
  * Scale notes: one corpus scan to the profile; the 20-round
  * compression loop runs on the profile-sized (then K-sized) frame
  * with per-round localCheckpoint (q110's bounded-lineage pattern);
  * quantile reads are windows over ≤ K+1 rows. The exact arm's
  * profile-wide cumulative window is the audit's cost, not the
  * sketch's — at 100 TB you ship the profile (or the K-node sketch)
  * and drop the exact column, exactly like q74's true_distinct. */
object QDigest {

  val QdLevels = 20           // dyadic levels above the leaf grid
  val QdU: Long = 1L << QdLevels // milli-value domain [0, 2^20)
  val QdK = 1024L             // compression: sketch keeps ≤ K+1 nodes

  /** Leaf profile (x, cnt): exact milli-value histogram — the
    * mergeable pre-sketch state. */
  private def leafProfile(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull)
      .select(least(greatest(floor(col("value") * 1e3).cast("long"), lit(0L)),
        lit(QdU - 1L)).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("cnt"))

  /** The compressed sketch: (level, node, cnt) rows, Σcnt = n. */
  def sketch(events: DataFrame, k: Long = QdK): DataFrame = {
    val prof = leafProfile(events).localCheckpoint()
    val n = prof.agg(coalesce(sum(col("cnt")), lit(0L))).collect()(0).getLong(0)
    sketchFromProfile(prof, n / k)
  }

  /** Compression from an already-materialized leaf profile — the shared
    * entry point: [[qdigest]] scans the corpus ONCE and feeds the same
    * checkpointed profile to both the sketch and the exact arm. */
  private def sketchFromProfile(prof: DataFrame, t: Long): DataFrame = {
    val spark = prof.sparkSession
    import spark.implicits._
    // All QdLevels bottom-up rounds in ONE single-task pass: the profile
    // is bounded by the VALUE DOMAIN (≤ 2^QdLevels rows at any corpus
    // size), so the former per-level distributed filter/groupBy loop paid
    // 20 sequential jobs + 20 localCheckpoints of scheduling latency for
    // data one core folds in milliseconds. The fold applies the identical
    // integer rule per level — cnt > t keeps (level, node, cnt), cnt ≤ t
    // pushes the count to node div 2 — so the kept multiset is
    // bit-identical (spec-checked against a level-by-level reference).
    prof.select(col("x").cast("long"), col("cnt").cast("long"))
      .as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        var cur = scala.collection.mutable.LongMap.empty[Long]
        it.foreach { case (x, c) => cur(x) = cur.getOrElse(x, 0L) + c }
        val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        var level = 0
        while (level < QdLevels) {
          val next = scala.collection.mutable.LongMap.empty[Long]
          cur.foreach { case (node, cnt) =>
            if (cnt > t) kept += ((level.toLong, node, cnt))
            else { val p = node / 2; next(p) = next.getOrElse(p, 0L) + cnt }
          }
          cur = next
          level += 1
        }
        cur.foreach { case (node, cnt) =>
          if (cnt > 0) kept += ((QdLevels.toLong, node, cnt))
        }
        kept.iterator
      }
      .toDF("level", "node", "cnt")
  }

  /** q203: quantile audit — sketch estimate vs exact, per target rank. */
  def qdigest(s: SparkSession, dir: String): DataFrame =
    qdigest(Tables.events(s, dir))

  def qdigest(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val prof = leafProfile(events).localCheckpoint()
    val n = prof.agg(coalesce(sum(col("cnt")), lit(0L))).collect()(0).getLong(0)
    val t = n / QdK
    val sk = sketchFromProfile(prof, t).localCheckpoint()
    val cum = sk
      .withColumn("hi", expr("shiftleft(node + 1, CAST(level AS INT)) - 1"))
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("hi"), col("level"))))
    val nn = sk.agg(count(lit(1)).as("n_nodes"))
    val pcum = prof.withColumn("pc", sum(col("cnt")).over(Window.orderBy(col("x"))))
    // the 5-row phi table is always the broadcast side; the rank scans
    // stay profile-sized inner joins (never an unbroadcast theta join)
    val phis = Seq(25L, 50L, 75L, 90L, 99L).toDF("phi")
      .withColumn("target_rank", expr(s"(phi * ${n}L + 99) div 100"))
    val est = cum.crossJoin(broadcast(phis))
      .filter(col("cum") >= col("target_rank"))
      .groupBy(col("phi"), col("target_rank"))
      .agg(min(col("hi")).as("est_x"))
    val exact = pcum.crossJoin(broadcast(phis))
      .filter(col("pc") >= col("target_rank"))
      .groupBy(col("phi")).agg(min(col("x")).as("exact_x"))
    val ranks = pcum.crossJoin(broadcast(est))
      .groupBy(col("phi"), col("target_rank"), col("est_x"))
      .agg(coalesce(max(when(col("x") < col("est_x"), col("pc"))), lit(0L)).as("cnt_lt"),
        coalesce(max(when(col("x") <= col("est_x"), col("pc"))), lit(0L)).as("cnt_le"))
    ranks.join(exact, Seq("phi")).crossJoin(broadcast(nn))
      .select(col("phi"), lit(n).as("n"), lit(t).as("t"), col("n_nodes"),
        col("est_x"), col("exact_x"), col("cnt_lt"), col("cnt_le"),
        col("target_rank"),
        greatest(lit(0L), col("cnt_lt") + lit(1L) - col("target_rank"),
          col("target_rank") - col("cnt_le")).as("rank_err"),
        lit(2L * t * QdLevels).as("err_bound"))
      .orderBy(col("phi"))
  }

  /** q203 oracle: the identical 20-level bottom-up compression as an
    * unrolled MATERIALIZED CTE chain (the q110 pattern — plain CTEs
    * inline per reference and would expand exponentially). */
  def qdigestOracleSql: String = {
    val levels = (0 until QdLevels).map { l =>
      s"""k$l AS (SELECT CAST($l AS BIGINT) AS level, node, cnt
         |  FROM l$l CROSS JOIN tt WHERE cnt > tt.t),
         |l${l + 1} AS MATERIALIZED (SELECT node // 2 AS node,
         |    CAST(SUM(cnt) AS BIGINT) AS cnt
         |  FROM l$l CROSS JOIN tt WHERE cnt <= tt.t GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val unionKeeps = (0 until QdLevels).map(l => s"SELECT * FROM k$l")
      .mkString("\n  UNION ALL ") +
      s"\n  UNION ALL SELECT CAST($QdLevels AS BIGINT) AS level, node, cnt" +
      s" FROM l$QdLevels WHERE cnt > 0"
    s"""WITH e AS (SELECT LEAST(GREATEST(CAST(FLOOR(value * 1e3) AS BIGINT), 0),
       |    ${QdU - 1L}) AS x
       |  FROM events WHERE value IS NOT NULL),
       |l0 AS MATERIALIZED (SELECT x AS node, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM e GROUP BY 1),
       |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(COUNT(*) AS BIGINT) // $QdK AS t FROM e),
       |$levels,
       |sk AS MATERIALIZED ($unionKeeps),
       |cum AS (SELECT level, node, cnt,
       |    ((node + 1) << level) - 1 AS hi FROM sk),
       |cm AS (SELECT *, CAST(SUM(cnt) OVER (ORDER BY hi, level) AS BIGINT) AS cum
       |  FROM cum),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM sk),
       |pc AS (SELECT node AS x, cnt,
       |    CAST(SUM(cnt) OVER (ORDER BY node) AS BIGINT) AS pc FROM l0),
       |ph AS (SELECT CAST(phi AS BIGINT) AS phi,
       |    (CAST(phi AS BIGINT) * tt.n + 99) // 100 AS target_rank
       |  FROM (VALUES (25), (50), (75), (90), (99)) v(phi) CROSS JOIN tt),
       |est AS (SELECT ph.phi, ph.target_rank, MIN(cm.hi) AS est_x
       |  FROM ph JOIN cm ON cm.cum >= ph.target_rank GROUP BY 1, 2),
       |ex AS (SELECT ph.phi, MIN(pc.x) AS exact_x
       |  FROM ph JOIN pc ON pc.pc >= ph.target_rank GROUP BY 1),
       |rk AS (SELECT est.phi, est.target_rank, est.est_x,
       |    COALESCE(MAX(CASE WHEN pc.x < est.est_x THEN pc.pc END), 0) AS cnt_lt,
       |    COALESCE(MAX(pc.pc), 0) AS cnt_le
       |  FROM est LEFT JOIN pc ON pc.x <= est.est_x GROUP BY 1, 2, 3)
       |SELECT rk.phi, tt.n, tt.t, nn.n_nodes, rk.est_x, ex.exact_x,
       |  rk.cnt_lt, rk.cnt_le, rk.target_rank,
       |  GREATEST(0, rk.cnt_lt + 1 - rk.target_rank,
       |    rk.target_rank - rk.cnt_le) AS rank_err,
       |  2 * tt.t * $QdLevels AS err_bound
       |FROM rk JOIN ex USING (phi) CROSS JOIN nn CROSS JOIN tt
       |ORDER BY phi""".stripMargin
  }
}
