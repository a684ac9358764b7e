package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Ranking-quality evaluation operators over the event stream — the
  * family's third and fourth members after q164's Welch A/B test and
  * q172's Wilson leaderboard: ROC-AUC (does a score ORDER the positives
  * above the negatives?) and the decile gains/lift table (how much of
  * the positive mass does the top-k% of the ranking capture?). The
  * reference's dashboard plots per-facet metric panels
  * (streamlit/app/app.py:84-140); these are the two readouts that turn
  * a score column on those panels into an accept/reject decision for
  * the model that produced it.
  */
object Eval {

  /** q192: one-vs-rest ROC-AUC per event_type — for each observed type,
    * how well does `value` rank events OF that type above the rest?
    * AUC is computed as the normalized Mann–Whitney U statistic with
    * the standard average-rank tie treatment: doubling the statistic
    * makes ties contribute exactly 1 (a win 2, a loss 0), so
    * `u2 = Σ_s pos_s · (2·negBelow_s + neg_s)` over distinct scores s
    * and `AUC = u2 / (2·n_pos·n_neg)` — every term an exact integer
    * until the single final IEEE division.
    *
    * Engine-exact: values integerize to milli (q164's floor·10³); the
    * per-score profile counts are exact BIGINTs; u2 accumulates in
    * DECIMAL(38,0) (q146's cross-product pattern — pos·negBelow is
    * corpus², past int64 at trillion-row scale) and reaches the double
    * division through the shared VARCHAR-mediated cast (q171); the
    * gate also ships u2 as a VARCHAR column, which both engines print
    * identically from DECIMAL(38,0).
    *
    * Scale notes: the corpus collapses ONCE to the distinct-milli-score
    * profile (map-combined; bounded by the value RANGE × 10³, not the
    * corpus — the reason for quantizing before ranking) and every
    * window/join below runs on profile-sized frames: cumulative
    * totals over |scores| rows, per-type cumulative positives over the
    * (type, score) rows, one |scores|-key join. No corpus-wide sort,
    * no per-row rank. The unpartitioned profile windows are the
    * q166/q146 "right frame for a global series" shape; if a raw
    * unquantized score ever made the profile corpus-sized, the
    * cumulative flips to q98's two-pass bucketed form unchanged. */
  def aucOneVsRest(s: SparkSession, dir: String): DataFrame =
    aucOneVsRest(Tables.events(s, dir))

  def aucOneVsRest(events: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val e = events
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type"), floor(col("value") * 1e3).cast("long").as("x"))
    // ONE corpus scan: the (type, score) count table; every row has a
    // type post-filter, so the score profile and the grand total both
    // derive from it — materialized so its three consumers don't each
    // re-aggregate the corpus (the q191 shared-frame idiom).
    val typeScore = e.groupBy(col("event_type"), col("x"))
      .agg(count(lit(1)).as("pos")).localCheckpoint()
    // Distinct-score profile: total count per score + count below it.
    val prof = typeScore.groupBy(col("x")).agg(sum(col("pos")).as("tot"))
      .withColumn("tot_below", coalesce(sum(col("tot")).over(
        Window.orderBy(col("x")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    // Per (type, score) positives + positives of that type below.
    val pos = typeScore
      .withColumn("pos_below", coalesce(sum(col("pos")).over(
        Window.partitionBy(col("event_type")).orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val n = typeScore.agg(sum(col("pos")).as("n_all"))
    val joined = pos.join(prof, Seq("x"))
      .withColumn("neg", col("tot") - col("pos"))
      .withColumn("neg_below", col("tot_below") - col("pos_below"))
      .withColumn("contrib",
        d38(col("pos")) * d38(lit(2L) * col("neg_below") + col("neg")))
    val byType = joined.groupBy(col("event_type"))
      .agg(sum(col("pos")).as("n_pos"), sum(col("contrib")).cast("decimal(38,0)").as("u2"))
      .crossJoin(broadcast(n))
      .withColumn("n_neg", col("n_all") - col("n_pos"))
    byType.select(col("event_type"), col("n_pos"), col("n_neg"),
        col("u2").cast("string").as("u2_s"),
        round(col("u2").cast("string").cast("double") /
          when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null))
            .otherwise(lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")),
          9).as("auc_r"))
      .orderBy(col("event_type"))
  }

  /** q192 oracle: identical profile, tie-doubled U, and final division. */
  def aucOneVsRestOracleSql: String =
    """WITH e AS (SELECT event_type, CAST(FLOOR(value * 1e3) AS BIGINT) AS x
      |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
      |prof AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS tot FROM e GROUP BY 1),
      |profb AS (SELECT x, tot,
      |    CAST(COALESCE(SUM(tot) OVER (ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tot_below
      |  FROM prof),
      |pos AS (SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS pos
      |  FROM e GROUP BY 1, 2),
      |posb AS (SELECT event_type, x, pos,
      |    CAST(COALESCE(SUM(pos) OVER (PARTITION BY event_type ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pos_below
      |  FROM pos),
      |n AS (SELECT CAST(SUM(tot) AS BIGINT) AS n_all FROM prof),
      |j AS (SELECT p.event_type, p.pos,
      |    CAST(p.pos AS DECIMAL(38,0)) *
      |      CAST(2 * (b.tot_below - p.pos_below) + (b.tot - p.pos) AS DECIMAL(38,0)) AS contrib
      |  FROM posb p JOIN profb b USING (x)),
      |t AS (SELECT event_type, CAST(SUM(pos) AS BIGINT) AS n_pos,
      |    CAST(SUM(contrib) AS DECIMAL(38,0)) AS u2
      |  FROM j GROUP BY 1)
      |SELECT event_type, n_pos, n_all - n_pos AS n_neg,
      |  CAST(u2 AS VARCHAR) AS u2_s,
      |  ROUND(CAST(CAST(u2 AS VARCHAR) AS DOUBLE) /
      |    (CASE WHEN n_pos = 0 OR n_all - n_pos = 0 THEN NULL
      |     ELSE 2.0 * CAST(n_pos AS DOUBLE) * CAST(n_all - n_pos AS DOUBLE) END),
      |    9) AS auc_r
      |FROM t CROSS JOIN n ORDER BY event_type""".stripMargin

  /** q193: decile gains/lift table for `value` as a purchase predictor —
    * rank all events by score descending, cut the ranking into ten
    * equal-frequency deciles, and report per decile how many purchases
    * it contains, the cumulative share of all purchases captured, and
    * the lift over the base rate. THE model-triage readout ("the top
    * 10 % of the ranking holds 31 % of the positives") behind every
    * targeting/curation cutoff decision.
    *
    * Engine-exact: milli scores; the global descending rank is the
    * q98 two-pass decomposition — per-score offsets from a cumulative
    * window over the distinct-score profile plus a row_number INSIDE
    * each tie group ordered by event_id — so both engines replay the
    * identical total order (x desc, event_id asc) without either ever
    * sorting the corpus on one reducer; deciles are q170's explicit
    * ((rank−1)·10 div n)+1 (never NTILE); counts exact BIGINTs, each
    * reported ratio ONE rounded division of exact integers.
    *
    * Scale notes: one map-combined profile agg, one |scores|-row
    * window, one profile join back (AQE splits a viral tie group), a
    * tie-group-bounded row_number, one map-combined decile rollup to
    * 10 rows; the cumulative-capture window runs over the 10-row
    * table. Nothing corpus-sized is ever globally sorted. */
  def gainsDeciles(s: SparkSession, dir: String): DataFrame =
    gainsDeciles(Tables.events(s, dir))

  def gainsDeciles(events: DataFrame): DataFrame = {
    val e = events
      .filter(col("event_id").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull)
      .select(col("event_id"), floor(col("value") * 1e3).cast("long").as("x"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("is_pos"))
    // First pass: the distinct-score profile, materialized so the
    // offset window and the grand total read it instead of each
    // re-aggregating the corpus. The row pass below is the second —
    // two corpus scans total, the irreducible cost of a two-pass rank.
    val prof = e.groupBy(col("x")).agg(count(lit(1)).as("tot")).localCheckpoint()
    val offs = prof
      .withColumn("off", coalesce(sum(col("tot")).over(
        Window.orderBy(col("x").desc).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val n = prof.agg(sum(col("tot")).as("n_all"))
    val ranked = e.join(offs.select(col("x"), col("off")), Seq("x"))
      .withColumn("rn_in", row_number().over(
        Window.partitionBy(col("x")).orderBy(col("event_id"))).cast("long"))
      .crossJoin(broadcast(n))
      .withColumn("decile", expr("((off + rn_in - 1) * 10) div n_all + 1"))
    val g = ranked.groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("is_pos")).as("n_pos"),
        first(col("n_all")).as("n_all"))
    val wc = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wa = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.withColumn("cum_pos", sum(col("n_pos")).over(wc))
      .withColumn("total_pos", sum(col("n_pos")).over(wa))
      .select(col("decile"), col("n"), col("n_pos"), col("cum_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 9).as("pos_rate_r"),
        round(col("cum_pos").cast("double") /
          when(col("total_pos") === 0L, lit(null))
            .otherwise(col("total_pos").cast("double")), 9).as("cum_capture_r"),
        round((col("n_pos").cast("double") / col("n").cast("double")) /
          when(col("total_pos") === 0L, lit(null))
            .otherwise(col("total_pos").cast("double") / col("n_all").cast("double")),
          9).as("lift_r"))
      .orderBy(col("decile"))
  }

  /** q193 oracle: identical two-pass rank, explicit deciles, ratios. */
  def gainsDecilesOracleSql: String =
    """WITH e AS (SELECT event_id, CAST(FLOOR(value * 1e3) AS BIGINT) AS x,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_pos
      |  FROM events
      |  WHERE event_id IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL),
      |prof AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS tot FROM e GROUP BY 1),
      |offs AS (SELECT x,
      |    CAST(COALESCE(SUM(tot) OVER (ORDER BY x DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
      |  FROM prof),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM e),
      |r AS (SELECT e.event_id, e.is_pos,
      |    o.off + CAST(ROW_NUMBER() OVER (PARTITION BY e.x ORDER BY e.event_id) AS BIGINT) AS rnk
      |  FROM e JOIN offs o USING (x)),
      |b AS (SELECT ((rnk - 1) * 10) // n_all + 1 AS decile, is_pos
      |  FROM r CROSS JOIN n),
      |g AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(is_pos) AS BIGINT) AS n_pos
      |  FROM b GROUP BY 1),
      |c AS (SELECT *,
      |    CAST(SUM(n_pos) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
      |    CAST(SUM(n_pos) OVER () AS BIGINT) AS total_pos
      |  FROM g)
      |SELECT decile, n, n_pos, cum_pos,
      |  ROUND(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 9) AS pos_rate_r,
      |  ROUND(CAST(cum_pos AS DOUBLE) /
      |    (CASE WHEN total_pos = 0 THEN NULL ELSE CAST(total_pos AS DOUBLE) END),
      |    9) AS cum_capture_r,
      |  ROUND((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)) /
      |    (CASE WHEN total_pos = 0 THEN NULL
      |     ELSE CAST(total_pos AS DOUBLE) / CAST(n_all AS DOUBLE) END),
      |    9) AS lift_r
      |FROM c CROSS JOIN n ORDER BY decile""".stripMargin

  /** q200: calibration (reliability) table + Brier score for `value` as
    * a purchase predictor — the family's fifth member and the readout
    * AUC cannot give: AUC says the score ORDERS positives above
    * negatives, the reliability table says whether the score's
    * MAGNITUDE means what it claims ("events the model scores ~0.7
    * convert ~70 % of the time"), which is what a curation threshold or
    * a sampling temperature actually consumes. Scores min-max-map to a
    * predicted probability, the probability axis cuts into ten fixed
    * bins, and each bin reports mean prediction vs observed positive
    * rate (their gap is the reliability curve) plus the bin's Brier
    * contribution (mean squared error of prediction vs outcome — the
    * proper score that decomposes into calibration + refinement).
    *
    * Engine-exact: milli scores (q192's floor·10³); the predicted
    * probability is the INTEGER micro-unit `((x−min)·10⁶) div
    * max(range,1)` so bin edges are integer-exact in both engines
    * (bin = min(p_micro div 10⁵, 9) — p=1.0 closes the top bin);
    * per-bin sums accumulate in DECIMAL(38,0) (Σp ≤ corpus·10⁶ and
    * Σ(p−y·10⁶)² ≤ corpus·10¹² both pass int64 at trillion-row scale)
    * and ship as VARCHAR (q192's u2_s stance); every reported ratio is
    * one identically-associated division of exact integers.
    *
    * Scale notes: pass 1 is a map-combined global min/max (2 values),
    * pass 2 a map-combined 10-group aggregate — nothing is sorted,
    * ranked, or joined at corpus size, so the shape is strictly
    * cheaper than q193's two-pass rank and survives any scale the
    * scan itself survives. */
  def calibration(s: SparkSession, dir: String): DataFrame =
    calibration(Tables.events(s, dir))

  def calibration(events: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val e = events
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(floor(col("value") * 1e3).cast("long").as("x"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("is_pos"))
    val mm = e.agg(min(col("x")).as("minx"), max(col("x")).as("maxx"))
    val p = e.crossJoin(broadcast(mm))
      .withColumn("p_micro",
        expr("((x - minx) * 1000000) div greatest(maxx - minx, 1)"))
      .withColumn("bin", least(expr("p_micro div 100000"), lit(9L)))
      .withColumn("d", col("p_micro") - col("is_pos") * lit(1000000L))
    p.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("is_pos")).as("n_pos"),
        sum(d38(col("p_micro"))).cast("decimal(38,0)").as("sum_p"),
        sum(d38(col("d")) * d38(col("d"))).cast("decimal(38,0)").as("sum_sq"))
      .select(col("bin"), col("n"), col("n_pos"),
        col("sum_p").cast("string").as("sum_p_micro_s"),
        col("sum_sq").cast("string").as("sum_sq_err_s"),
        round(col("sum_p").cast("string").cast("double") /
          (col("n").cast("double") * lit(1.0e6)), 9).as("mean_p_r"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 9)
          .as("frac_pos_r"),
        round(col("sum_p").cast("string").cast("double") /
            (col("n").cast("double") * lit(1.0e6))
          - col("n_pos").cast("double") / col("n").cast("double"), 9)
          .as("gap_r"),
        round(col("sum_sq").cast("string").cast("double") /
          (col("n").cast("double") * lit(1.0e12)), 9).as("brier_r"))
      .orderBy(col("bin"))
  }

  /** q200 oracle: identical integer micro-probabilities, bins, decimal
    * accumulators, and final float associations. */
  def calibrationOracleSql: String =
    """WITH e AS (SELECT CAST(FLOOR(value * 1e3) AS BIGINT) AS x,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_pos
      |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
      |mm AS (SELECT MIN(x) AS minx, MAX(x) AS maxx FROM e),
      |p AS (SELECT is_pos,
      |    ((x - minx) * 1000000) // GREATEST(maxx - minx, 1) AS p_micro
      |  FROM e CROSS JOIN mm),
      |b AS (SELECT LEAST(p_micro // 100000, 9) AS bin, is_pos, p_micro,
      |    p_micro - is_pos * 1000000 AS d FROM p),
      |g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(is_pos) AS BIGINT) AS n_pos,
      |    CAST(SUM(CAST(p_micro AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sum_p,
      |    CAST(SUM(CAST(d AS DECIMAL(38,0)) * CAST(d AS DECIMAL(38,0)))
      |      AS DECIMAL(38,0)) AS sum_sq
      |  FROM b GROUP BY 1)
      |SELECT bin, n, n_pos,
      |  CAST(sum_p AS VARCHAR) AS sum_p_micro_s,
      |  CAST(sum_sq AS VARCHAR) AS sum_sq_err_s,
      |  ROUND(CAST(CAST(sum_p AS VARCHAR) AS DOUBLE) /
      |    (CAST(n AS DOUBLE) * 1.0e6), 9) AS mean_p_r,
      |  ROUND(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 9) AS frac_pos_r,
      |  ROUND(CAST(CAST(sum_p AS VARCHAR) AS DOUBLE) /
      |      (CAST(n AS DOUBLE) * 1.0e6)
      |    - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 9) AS gap_r,
      |  ROUND(CAST(CAST(sum_sq AS VARCHAR) AS DOUBLE) /
      |    (CAST(n AS DOUBLE) * 1.0e12), 9) AS brier_r
      |FROM g ORDER BY bin""".stripMargin

  /** q219: classifier ACCEPTANCE report (round 12, the second
    * trained-member consolidation) — the readout a curation-threshold
    * rollout signs off on before swapping the q31 heuristic filter for
    * the q217 trained classifier: both scorers' decile gains tables
    * side by side over the SAME documents and the SAME ground truth
    * (q217's digit-rule label), so "the trained top decile captures X %
    * of the positives vs the heuristic's Y %" is one frame. This is the
    * DCLM/FineWeb-Edu rollout decision (heuristic → trained quality
    * filter) expressed as a gated query, reusing q217's training chain,
    * q31's feature stack, and q193's two-pass rank machinery unchanged.
    *
    * Engine-exact: the trained score is q217's integer micro-sigmoid
    * (div 1000 → milli); the heuristic score is q31's gate-proven
    * bit-identical double, floored to milli — both integers, so the
    * per-scorer distinct-score profile stays bounded (≤ ~10³ keys) and
    * the q193 rank decomposition (offset window over the profile +
    * in-tie row_number by doc_id) replays the identical total order in
    * both engines with no corpus-wide sort. Deciles are the explicit
    * ((rank−1)·10 div n)+1; counts exact BIGINTs; each ratio one
    * rounded division.
    *
    * Scale notes: q217's training cost (bounded stride, 17-long
    * driver state) + two corpus-scan scorers + profile-sized windows
    * partitioned by scorer; nothing corpus-sized sorts on one
    * reducer. The heuristic arm joins the trained frame's (doc_id,
    * label) so both rankings cover the identical row universe
    * (trainScore's text/source non-null filter). */
  def acceptanceReport(s: SparkSession, dir: String): DataFrame =
    acceptanceReport(Tables.documents(s, dir))

  def acceptanceReport(docs: DataFrame): DataFrame = {
    // trainScoreRaw: q217's chain minus its presentation sort — the
    // scores feed joins/groupBys here, and behind the checkpoint barrier
    // below the sort would actually execute (EliminateSorts can't see
    // through it). The frame is a cheap projection over q217's own
    // internal checkpoint, so it needs no barrier of its own.
    val trained = QualityClassifier.trainScoreRaw(docs)
      .select(col("doc_id"), col("label").as("is_pos"),
        expr("score_micro div 1000").as("x"))
    val heur = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"),
        floor(col("quality") * lit(1e3)).cast("long").as("x"))
    // materialized once: read by the profile aggregate AND the rank
    // join, which would otherwise each re-run the heuristic scan and
    // the is_pos join (the q191 shared-frame idiom)
    val both = trained
      .select(lit("trained").as("scorer"), col("doc_id"), col("x"), col("is_pos"))
      .unionByName(heur
        .join(trained.select(col("doc_id"), col("is_pos")), Seq("doc_id"))
        .select(lit("heuristic").as("scorer"), col("doc_id"), col("x"),
          col("is_pos")))
      .localCheckpoint()
    val prof = both.groupBy(col("scorer"), col("x")).agg(count(lit(1)).as("tot"))
      .localCheckpoint()
    val offs = prof.withColumn("off", coalesce(sum(col("tot")).over(
      Window.partitionBy(col("scorer")).orderBy(col("x").desc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val n = prof.groupBy(col("scorer")).agg(sum(col("tot")).as("n_all"))
    val ranked = both
      .join(offs.select(col("scorer"), col("x"), col("off")), Seq("scorer", "x"))
      .withColumn("rn_in", row_number().over(
        Window.partitionBy(col("scorer"), col("x")).orderBy(col("doc_id")))
        .cast("long"))
      .join(broadcast(n), Seq("scorer"))
      .withColumn("decile", expr("((off + rn_in - 1) * 10) div n_all + 1"))
    val g = ranked.groupBy(col("scorer"), col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("is_pos")).as("n_pos"),
        first(col("n_all")).as("n_all"))
    val wc = Window.partitionBy(col("scorer")).orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wa = Window.partitionBy(col("scorer"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.withColumn("cum_pos", sum(col("n_pos")).over(wc))
      .withColumn("total_pos", sum(col("n_pos")).over(wa))
      .select(col("scorer"), col("decile"), col("n"), col("n_pos"), col("cum_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 9)
          .as("pos_rate_r"),
        round(col("cum_pos").cast("double") /
          when(col("total_pos") === 0L, lit(null))
            .otherwise(col("total_pos").cast("double")), 9).as("cum_capture_r"),
        round((col("n_pos").cast("double") / col("n").cast("double")) /
          when(col("total_pos") === 0L, lit(null))
            .otherwise(col("total_pos").cast("double") / col("n_all").cast("double")),
          9).as("lift_r"))
      .orderBy(col("scorer"), col("decile"))
  }

  /** q219 oracle: q217's full round chain and q31's feature stack as
    * derived-table CTEs (DuckDB allows WITH inside a subquery), then
    * the identical partitioned two-pass rank and decile rollup. */
  def acceptanceReportOracleSql: String =
    s"""WITH q217 AS (SELECT * FROM (${QualityClassifier.trainScoreOracleSql}) t),
       |heur AS (SELECT doc_id, CAST(FLOOR(quality * 1e3) AS BIGINT) AS x FROM (
       |  WITH f AS (SELECT doc_id,
       |    CAST(length(text) AS DOUBLE) AS n_chars_f,
       |    CAST(len(list_filter(string_split(text,' '), w -> w <> '')) AS DOUBLE) AS n_words,
       |    CAST(len(list_distinct(list_filter(string_split(text,' '), w -> w <> ''))) AS DOUBLE) AS n_uniq,
       |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE) AS n_punct,
       |    CAST(len(list_filter(string_split(lower(text),' '), w -> list_contains(['the','a','of','and','to','in','is'], w))) AS DOUBLE) AS n_stop
       |   FROM documents),
       |  r AS (SELECT doc_id,
       |    CASE WHEN n_words > 0 THEN n_uniq / n_words ELSE 0.0 END AS uniq_ratio,
       |    CASE WHEN n_chars_f > 0 THEN n_punct / n_chars_f ELSE 0.0 END AS punct_ratio,
       |    CASE WHEN n_words > 0 THEN n_stop / n_words ELSE 0.0 END AS stop_ratio,
       |    n_words FROM f)
       |  SELECT doc_id,
       |    0.3 * least(n_words / 200.0, 1.0) + 0.3 * uniq_ratio
       |    + 0.2 * (1.0 - punct_ratio) + 0.2 * least(stop_ratio * 5.0, 1.0) AS quality
       |  FROM r) h),
       |uni AS (
       |  SELECT 'trained' AS scorer, doc_id, score_micro // 1000 AS x,
       |    CAST(label AS BIGINT) AS is_pos FROM q217
       |  UNION ALL
       |  SELECT 'heuristic', h.doc_id, h.x, CAST(q.label AS BIGINT)
       |  FROM heur h JOIN q217 q USING (doc_id)),
       |prof AS (SELECT scorer, x, CAST(COUNT(*) AS BIGINT) AS tot
       |  FROM uni GROUP BY 1, 2),
       |offs AS (SELECT scorer, x,
       |    CAST(COALESCE(SUM(tot) OVER (PARTITION BY scorer ORDER BY x DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
       |  FROM prof),
       |nn AS (SELECT scorer, CAST(SUM(tot) AS BIGINT) AS n_all
       |  FROM prof GROUP BY 1),
       |r2 AS (SELECT b.scorer, b.is_pos, n.n_all,
       |    o.off + CAST(ROW_NUMBER() OVER (PARTITION BY b.scorer, b.x
       |      ORDER BY b.doc_id) AS BIGINT) AS rnk
       |  FROM uni b
       |  JOIN offs o ON b.scorer = o.scorer AND b.x = o.x
       |  JOIN nn n ON n.scorer = b.scorer),
       |b2 AS (SELECT scorer, ((rnk - 1) * 10) // n_all + 1 AS decile,
       |    is_pos, n_all FROM r2),
       |g AS (SELECT scorer, decile, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(is_pos) AS BIGINT) AS n_pos, MAX(n_all) AS n_all
       |  FROM b2 GROUP BY 1, 2),
       |c AS (SELECT *,
       |    CAST(SUM(n_pos) OVER (PARTITION BY scorer ORDER BY decile
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
       |    CAST(SUM(n_pos) OVER (PARTITION BY scorer) AS BIGINT) AS total_pos
       |  FROM g)
       |SELECT scorer, decile, n, n_pos, cum_pos,
       |  ROUND(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 9) AS pos_rate_r,
       |  ROUND(CAST(cum_pos AS DOUBLE) /
       |    (CASE WHEN total_pos = 0 THEN NULL ELSE CAST(total_pos AS DOUBLE) END),
       |    9) AS cum_capture_r,
       |  ROUND((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)) /
       |    (CASE WHEN total_pos = 0 THEN NULL
       |     ELSE CAST(total_pos AS DOUBLE) / CAST(n_all AS DOUBLE) END),
       |    9) AS lift_r
       |FROM c ORDER BY scorer, decile""".stripMargin
}
