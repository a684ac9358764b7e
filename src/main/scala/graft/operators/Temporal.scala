package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Temporal join operators over the event stream — the point-in-time
  * (as-of) join and the bounded interval join. The reference correlates
  * user annotations with the metadata state current at annotation time
  * (join_eu_ugc_qdrant_merge.py:191-263 joins each UGC event to its
  * guid's curated row) and its dashboard windows activity over time
  * (app.py:84-255); at training-pipeline scale these become the two
  * canonical event-correlation shapes Spark has no built-in operator for.
  *
  * Scale notes:
  *  - asofJoin is the UNION trick: tag both sides, one shuffle on
  *    user_id, a running last_value window — NO join node at all, so
  *    there is no pair blow-up and no range-condition nested loop. This
  *    is the only as-of formulation that survives 100 TB: cost is one
  *    sort-shuffle of (left ∪ right), same as any window query.
  *  - intervalJoin buckets both sides into fixed-width time cells and
  *    equi-joins on (user_id, cell): each left row lands in 1 cell and
  *    probes ⌈window/cell⌉+1 = 2 cells, so Catalyst plans a plain
  *    SortMergeJoin/ShuffledHashJoin on a compound key — never the
  *    O(n·m) BroadcastNestedLoopJoin a raw range predicate degenerates
  *    to. The residual range filter runs post-join on the tiny
  *    candidate set.
  */
object Temporal {

  /** q57: as-of join — each purchase picks up the most recent click
    * (click.ts <= purchase.ts) by the same user. Right side is first
    * made unique per (user_id, ts) (keep max event_id) so the match is
    * well-defined under timestamp ties, mirroring DuckDB's ASOF JOIN
    * "greatest ts <=" semantics bit-for-bit. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = asofJoin(Tables.events(s, dir))

  def asofJoin(events: DataFrame): DataFrame = {
    val clickRank = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(col("event_id").desc)
    val clicks = events.filter(col("event_type") === "click")
      .withColumn("rn", row_number().over(clickRank)).filter(col("rn") === 1)
      .select(col("user_id"), col("ts"), lit(0).as("side"),
        col("event_id").as("click_event_id"), col("value").as("click_value"),
        lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("side"),
        lit(null).cast("long").as("click_event_id"),
        lit(null).cast("double").as("click_value"),
        col("event_id"), col("value"))
    // clicks sort before purchases at equal ts (side asc) => ts-tie rows
    // match, i.e. ASOF's inclusive `>=`. The frame may include preceding
    // purchase rows, but last(..ignoreNulls) only sees side=0 payloads.
    // The payload travels as ONE struct so every output column comes from
    // the SAME click row — per-column picks would skip a NULL click_value
    // back to an older click while keeping the newer click's id.
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val picked = last(
      when(col("side") === 0,
        struct(col("ts"), col("click_event_id"), col("click_value"))),
      ignoreNulls = true).over(w)
    clicks.unionByName(purchases)
      .withColumn("c", picked)
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("c.ts").as("click_ts"), col("c.click_event_id").as("click_event_id"),
        col("c.click_value").as("click_value"))
      .orderBy("event_id")
  }

  /** q57 oracle: DuckDB's native ASOF JOIN over the same deduped right
    * side — an independent engine implementation of the operator, not a
    * re-statement of the union trick. */
  val asofJoinOracleSql: String =
    """WITH clicks AS (
      |  SELECT user_id, ts, event_id AS click_event_id, value AS click_value
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
      |          ORDER BY event_id DESC) AS rn
      |        FROM events WHERE event_type = 'click') WHERE rn = 1),
      |purchases AS (SELECT event_id, user_id, ts, value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, p.ts,
      |  c.ts AS click_ts, c.click_event_id, c.click_value
      |FROM purchases p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  /** Interval-join window: a purchase follows a view within this many
    * seconds (strictly after, inclusive upper bound). The bucket width
    * equals the window so each view probes exactly 2 cells. */
  val IntervalSeconds = 1800L

  /** q58: bounded interval join — (view, purchase) pairs for the same
    * user with view.ts < purchase.ts <= view.ts + 30 min; the batch
    * analog of a stream-stream interval join (streaming variant in
    * Streams.intervalJoinStream). */
  /** q78: time-decay weighted event counts per event_type — recency
    * weighting with a 1-day half-life relative to the corpus's max
    * timestamp (deterministic reference point, not wall-clock). Each
    * event contributes 2^-k where k = full days before the reference;
    * the decayed count is the freshness-weighted popularity signal a
    * serving layer ranks by (the dashboard's "recent activity" panels,
    * app.py:84-255, recomputed exactly; this is the fixed-cost form).
    *
    * Scale notes: weights are carried as EXACT integers (2^(30-k),
    * weights below 2^-30 of the reference deliberately underflow to 0),
    * so the whole query is one map-side-combined integer-sum aggregate
    * plus a 1-row broadcast of the reference timestamp — order- and
    * partition-independent by construction, no float accumulation
    * anywhere. The float `decayed_r` is derived from the integer sum by
    * one division at the end. */
  val DecayBits = 30

  def timeDecay(s: SparkSession, dir: String): DataFrame =
    timeDecay(Tables.events(s, dir))

  def timeDecay(events: DataFrame): DataFrame = {
    val e = events.filter(col("ts").isNotNull)
    val ref = e.agg(max(col("ts")).as("tref"))
    e.select(col("event_type"), col("ts"))
      .crossJoin(broadcast(ref))
      .withColumn("k",
        expr("(unix_timestamp(tref) - unix_timestamp(ts)) DIV 86400"))
      .withColumn("wt",
        when(col("k") <= DecayBits,
          expr(s"shiftleft(CAST(1 AS BIGINT), CAST($DecayBits - k AS INT))"))
          .otherwise(lit(0L)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("wt")).as("decay_intsum"))
      .select(col("event_type"), col("n_events").cast("long").as("n_events"),
        col("decay_intsum"),
        round(col("decay_intsum").cast("double") / lit(1073741824.0), 6)
          .as("decayed_r"))
      .orderBy(col("event_type").asc_nulls_last)
  }

  /** q78 oracle: same day bucketing, integer weights, final division. */
  def timeDecayOracleSql: String =
    s"""WITH ref AS (SELECT MAX(ts) AS tref FROM events WHERE ts IS NOT NULL),
       |k AS (SELECT event_type,
       |    date_diff('second', ts, (SELECT tref FROM ref)) // 86400 AS k
       |  FROM events WHERE ts IS NOT NULL),
       |w AS (SELECT event_type, CASE WHEN k <= $DecayBits
       |    THEN CAST(1 AS BIGINT) << CAST($DecayBits - k AS INTEGER)
       |    ELSE CAST(0 AS BIGINT) END AS wt FROM k)
       |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(wt) AS BIGINT) AS decay_intsum,
       |  ROUND(CAST(SUM(wt) AS BIGINT) / 1073741824.0e0, 6) AS decayed_r
       |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q85: inter-event gap histogram — seconds between each user's
    * consecutive events (LAG over the unique (ts, event_id) order),
    * bucketed into human bands. The sessionization-threshold diagnostic:
    * q20's gap parameter should sit in this histogram's valley.
    *
    * Scale notes: one shuffle on user_id + sort feeds the lag; the
    * histogram is a tiny map-combined count over the band label. Gap
    * seconds come from truncated epoch arithmetic (engine-identical),
    * never float durations. */
  def eventGaps(s: SparkSession, dir: String): DataFrame =
    eventGaps(Tables.events(s, dir))

  def eventGaps(events: DataFrame): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapped = events.filter(col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_s", lag(unix_timestamp(col("ts")), 1).over(byTime))
      .withColumn("gap_s", unix_timestamp(col("ts")) - col("prev_s"))
    gapped
      .withColumn("band",
        when(col("gap_s").isNull, "0_first")
          .when(col("gap_s") < 60, "1_under_1m")
          .when(col("gap_s") < 3600, "2_under_1h")
          .when(col("gap_s") < 86400, "3_under_1d")
          .otherwise("4_over_1d"))
      .groupBy(col("band")).agg(count(lit(1)).as("n"),
        sum(coalesce(col("gap_s"), lit(0L))).as("gap_sum_s"))
      .orderBy("band")
  }

  /** q85 oracle: same lag order, truncated-second gaps, bands. */
  def eventGapsOracleSql: String =
    """WITH g AS (SELECT user_id,
      |  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
      |    - LAG(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts), 1)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
      | FROM events WHERE ts IS NOT NULL),
      |b AS (SELECT CASE WHEN gap_s IS NULL THEN '0_first'
      |    WHEN gap_s < 60 THEN '1_under_1m'
      |    WHEN gap_s < 3600 THEN '2_under_1h'
      |    WHEN gap_s < 86400 THEN '3_under_1d'
      |    ELSE '4_over_1d' END AS band, gap_s FROM g)
      |SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(COALESCE(gap_s, 0)) AS BIGINT) AS gap_sum_s
      |FROM b GROUP BY band ORDER BY band""".stripMargin

  /** q96: event-rate anomaly score — each hourly count z-scored against
    * its trailing 24 OBSERVED hourly buckets (ROWS frame: calendar gaps
    * collapse, deterministic and gap-robust), the ops-monitoring signal
    * over the ingest stream. The moments under the z-score are exact
    * integer window sums; the score itself is one fixed-association
    * double chain (sqrt is IEEE-exact), zero-variance windows → NULL
    * like q90.
    *
    * Scale notes: one map-combined hourly rollup (output = hours ×
    * types), then the window runs over that output-sized table — never
    * over raw events. */
  def rateAnomaly(s: SparkSession, dir: String): DataFrame =
    rateAnomaly(Tables.events(s, dir))

  def rateAnomaly(events: DataFrame): DataFrame = {
    val hourly = events.filter(col("ts").isNotNull)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n"))
    val tw = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-24, -1)
    def d(c: Column) = c.cast("double")
    val scored = hourly
      .withColumn("cnt", count(lit(1)).over(tw))
      .withColumn("s1", sum(col("n")).over(tw))
      .withColumn("s2", sum(col("n") * col("n")).over(tw))
      .filter(col("cnt") >= 2)
      .withColumn("den",
        d(col("cnt")) * sqrt((d(col("cnt")) * d(col("s2")) - d(col("s1")) * d(col("s1")))
          / (d(col("cnt")) * (d(col("cnt")) - lit(1.0)))))
    scored.select(col("event_type"), col("hour"), col("n"), col("cnt"),
        round((d(col("n")) * d(col("cnt")) - d(col("s1")))
          / when(col("den") === 0.0, lit(null)).otherwise(col("den")), 6).as("z_r"))
      .orderBy("event_type", "hour")
  }

  /** q96 oracle: identical moments, frame, and float chain. */
  def rateAnomalyOracleSql: String =
    """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour,
      |  CAST(COUNT(*) AS BIGINT) AS n
      | FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      |w AS (SELECT event_type, hour, n,
      |  CAST(COUNT(*) OVER tw AS BIGINT) AS cnt,
      |  CAST(SUM(n) OVER tw AS BIGINT) AS s1,
      |  CAST(SUM(n * n) OVER tw AS BIGINT) AS s2
      | FROM h WINDOW tw AS (PARTITION BY event_type ORDER BY hour
      |   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, hour, n, cnt,
      |  ROUND((CAST(n AS DOUBLE) * CAST(cnt AS DOUBLE) - CAST(s1 AS DOUBLE))
      |    / NULLIF(CAST(cnt AS DOUBLE)
      |      * sqrt((CAST(cnt AS DOUBLE) * CAST(s2 AS DOUBLE)
      |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |        / (CAST(cnt AS DOUBLE) * (CAST(cnt AS DOUBLE) - 1.0e0))), 0.0e0), 6) AS z_r
      |FROM w WHERE cnt >= 2 ORDER BY event_type, hour""".stripMargin

  /** q159: NEAREST-event temporal join — each purchase picks the click
    * closest in time in EITHER direction (q57's as-of looks only
    * backward; attribution models routinely want "the click around the
    * purchase"). Match rule: latest click with ts ≤ purchase.ts vs
    * earliest click with ts > purchase.ts, smaller µs gap wins, exact
    * tie → the earlier (prev) one — a total order both engines replay.
    * Right side deduped per (user_id, ts) by max event_id, the q57
    * convention. Rows with NULL ts are excluded on both sides by
    * contract (a nearest-neighbor match against an unknown time is
    * undefined).
    *
    * Scale notes: the SAME union trick as q57 run bidirectionally in
    * ONE window pass — tag both sides, one shuffle+sort on (user_id,
    * ts, side), a last(ignoreNulls) over the preceding frame and a
    * first(ignoreNulls) over the following frame share the single sort;
    * NO join node, no range nested-loop, no second shuffle. The oracle
    * replays it as the naive per-purchase MAX/MIN inequality joins. */
  def nearestEventJoin(s: SparkSession, dir: String): DataFrame =
    nearestEventJoin(Tables.events(s, dir))

  def nearestEventJoin(events: DataFrame): DataFrame = {
    val ev = events.filter(col("ts").isNotNull)
    val clickRank = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(col("event_id").desc)
    val clicks = ev.filter(col("event_type") === "click")
      .withColumn("rn", row_number().over(clickRank)).filter(col("rn") === 1)
      .select(col("user_id"), col("ts"), lit(0).as("side"),
        col("event_id").as("click_event_id"),
        lit(null).cast("long").as("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("side"),
        lit(null).cast("long").as("click_event_id"), col("event_id"))
    // clicks sort before purchases at equal ts (side asc): an equal-ts
    // click is "prev" (gap 0), never "next" — matching the oracle's
    // c.ts <= p.ts / c.ts > p.ts split exactly
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("side"))
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val clickStruct = when(col("side") === 0,
      struct(col("ts"), col("click_event_id")))
    val both = clicks.unionByName(purchases)
      .withColumn("p", last(clickStruct, ignoreNulls = true).over(wPrev))
      .withColumn("nx", first(clickStruct, ignoreNulls = true).over(wNext))
      .filter(col("side") === 1)
    val pgap = unix_micros(col("ts")) - unix_micros(col("p.ts"))
    val ngap = unix_micros(col("nx.ts")) - unix_micros(col("ts"))
    val prevWins = col("p").isNotNull && (col("nx").isNull || pgap <= ngap)
    both.select(col("event_id"), col("user_id"), col("ts"),
        when(prevWins, col("p.click_event_id"))
          .otherwise(col("nx.click_event_id")).as("nearest_click_id"),
        when(prevWins, lit("prev"))
          .when(col("nx").isNotNull, lit("next")).as("direction"),
        when(prevWins, pgap).otherwise(ngap).as("gap_us"))
      .orderBy("event_id")
  }

  /** q159 oracle: the naive replay — per purchase, MAX(c.ts ≤ p.ts) and
    * MIN(c.ts > p.ts) inequality joins, µs gaps, prev-on-tie. */
  val nearestEventJoinOracleSql: String =
    """WITH ev AS (SELECT * FROM events WHERE ts IS NOT NULL),
      |clicks AS (SELECT user_id, ts, event_id AS click_event_id FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
      |        ORDER BY event_id DESC) AS rn
      |    FROM ev WHERE event_type = 'click') WHERE rn = 1),
      |p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
      |prv AS (SELECT p.event_id, MAX(c.ts) AS pts FROM p JOIN clicks c
      |    ON c.user_id = p.user_id AND c.ts <= p.ts GROUP BY p.event_id),
      |nxt AS (SELECT p.event_id, MIN(c.ts) AS nts FROM p JOIN clicks c
      |    ON c.user_id = p.user_id AND c.ts > p.ts GROUP BY p.event_id),
      |j AS (SELECT p.event_id, p.user_id, p.ts,
      |    cp.click_event_id AS prev_id, epoch_us(p.ts) - epoch_us(prv.pts) AS pgap,
      |    cn.click_event_id AS next_id, epoch_us(nxt.nts) - epoch_us(p.ts) AS ngap
      |  FROM p
      |  LEFT JOIN prv ON prv.event_id = p.event_id
      |  LEFT JOIN clicks cp ON cp.user_id = p.user_id AND cp.ts = prv.pts
      |  LEFT JOIN nxt ON nxt.event_id = p.event_id
      |  LEFT JOIN clicks cn ON cn.user_id = p.user_id AND cn.ts = nxt.nts)
      |SELECT event_id, user_id, ts,
      |  CASE WHEN prev_id IS NOT NULL AND (next_id IS NULL OR pgap <= ngap)
      |    THEN prev_id ELSE next_id END AS nearest_click_id,
      |  CASE WHEN prev_id IS NOT NULL AND (next_id IS NULL OR pgap <= ngap)
      |    THEN 'prev' WHEN next_id IS NOT NULL THEN 'next' END AS direction,
      |  CAST(CASE WHEN prev_id IS NOT NULL AND (next_id IS NULL OR pgap <= ngap)
      |    THEN pgap ELSE ngap END AS BIGINT) AS gap_us
      |FROM j ORDER BY event_id""".stripMargin

  def intervalJoin(s: SparkSession, dir: String): DataFrame = intervalJoin(Tables.events(s, dir))

  def intervalJoin(events: DataFrame): DataFrame = {
    val cell = (c: String) => (unix_timestamp(col(c)) / IntervalSeconds).cast("long")
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_event_id"),
        col("ts").as("view_ts"),
        explode(array(cell("ts"), cell("ts") + 1)).as("cell"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_event_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"),
        cell("ts").as("cell"))
    views.join(purchases, Seq("user_id", "cell"))
      .filter(col("purchase_ts") > col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $IntervalSeconds SECONDS"))
      .select(col("user_id"), col("view_event_id"), col("purchase_event_id"),
        col("view_ts"), col("purchase_ts"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")))
          .as("gap_us"),
        col("purchase_value"))
      .orderBy("view_event_id", "purchase_event_id")
  }

  /** q58 oracle: the raw range-predicate join DuckDB evaluates exactly —
    * value-checks that the bucketed rewrite is pair-complete (a candidate
    * in neither probed cell would be a missing output row). */
  val intervalJoinOracleSql: String =
    s"""SELECT v.user_id, v.event_id AS view_event_id,
      |  p.event_id AS purchase_event_id,
      |  v.ts AS view_ts, p.ts AS purchase_ts,
      |  epoch_us(p.ts) - epoch_us(v.ts) AS gap_us,
      |  p.value AS purchase_value
      |FROM (SELECT * FROM events WHERE event_type = 'view') v
      |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON v.user_id = p.user_id AND p.ts > v.ts
      | AND p.ts <= v.ts + INTERVAL $IntervalSeconds SECONDS
      |ORDER BY view_event_id, purchase_event_id""".stripMargin

  /** q122: behavioral transition motifs — per-user event-type Markov
    * transitions ((prev → next) counts over each user's time-ordered
    * stream) with the corpus-wide transition probability per source
    * type. The sequence-mining complement of q50's fixed funnel: the
    * funnel asks "did view→click→purchase happen", this surfaces WHICH
    * transitions dominate (and is the input a session-recommendation
    * model trains on).
    *
    * Determinism: each user's order is (ts, event_id) — event_id is
    * unique, so LAG sees one total order in any engine; NULL ts rows
    * are excluded (no deterministic position). Probabilities are one
    * integer division per output row.
    *
    * Scale notes: ONE shuffle by user_id feeds the LAG window; the
    * transition count then aggregates on (prev, next) — output-sized
    * (|event types|²) — and the per-source totals broadcast back. */
  def eventTransitions(s: SparkSession, dir: String): DataFrame =
    eventTransitions(Tables.events(s, dir))

  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val tr = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("cnt"))
    val totals = tr.groupBy(col("prev_type")).agg(sum(col("cnt")).as("tot"))
    tr.join(totals, Seq("prev_type"))
      .select(col("prev_type"), col("next_type"), col("cnt"),
        round(col("cnt").cast("double") / col("tot").cast("double"), 9).as("p_r"))
      .orderBy("prev_type", "next_type")
  }

  /** q122 oracle: identical order, LAG, counts, one division. */
  def eventTransitionsOracleSql: String =
    """WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
      |l AS (SELECT event_type,
      |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM e),
      |t AS (SELECT prev_type, event_type AS next_type, COUNT(*) AS cnt
      |  FROM l WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |s AS (SELECT prev_type, SUM(cnt) AS tot FROM t GROUP BY 1)
      |SELECT t.prev_type, t.next_type, CAST(t.cnt AS BIGINT) AS cnt,
      |  ROUND(CAST(t.cnt AS DOUBLE) / CAST(s.tot AS DOUBLE), 9) AS p_r
      |FROM t JOIN s USING (prev_type)
      |ORDER BY prev_type, next_type""".stripMargin

  /** q135: SCD Type-2 dimension build — the slowly-changing-dimension
    * history a warehouse derives when an entity's attribute changes over
    * time. Per user, the event_type sequence (ordered by ts with
    * event_id as the unique tiebreaker — fixture ts values can
    * collide after a regen, and a nondeterministic lag order would make
    * the whole history nondeterministic) collapses into runs of equal
    * state; each run becomes one versioned row with
    * [valid_from, valid_to) validity and an is_current flag on the open
    * interval. This is the standing shape behind the reference's
    * "latest state wins" MERGE (join_eu_ugc_qdrant_merge.py:399-400) when
    * the pipeline must keep the superseded versions instead of
    * overwriting them.
    *
    * Scale notes: the lag pass, the row_number, and the lead all share
    * ONE window spec (partition user_id, order ts/event_id) — Spark
    * plans a single exchange + a single sort and evaluates the later
    * windows on the already-sorted runs; no self-join, no whole-table
    * second shuffle. State is per-user-bounded, so 100 TB of events
    * stream through as ordinary window processing. */
  def scd2(s: SparkSession, dir: String): DataFrame =
    scd2(Tables.events(s, dir))

  def scd2(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val runs = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    runs
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "version")
  }

  /** q135 oracle: the same run-collapse in window SQL. */
  def scd2OracleSql: String =
    """WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
      |c AS (SELECT user_id, ts, event_id, event_type,
      |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM e),
      |r AS (SELECT user_id, ts, event_id, event_type FROM c
      |  WHERE prev_type IS NULL OR prev_type <> event_type)
      |SELECT user_id,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
      |  event_type AS state, ts AS valid_from,
      |  LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |  (LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
      |FROM r ORDER BY user_id, version""".stripMargin

  /** q151: point-in-time dimension lookup against the q135 SCD2
    * history — for a probe set of (user, ts) facts (every 10th event),
    * resolve the dimension version whose [valid_from, valid_to)
    * interval contains the fact's timestamp: THE query shape SCD2
    * exists to serve ("what was this entity's state when the fact
    * happened"), and the warehouse-side twin of q57's stream as-of.
    *
    * Scale notes: the join is an equi-join on user_id with the interval
    * predicate evaluated inside it — no time-bucketing needed (unlike
    * q58) because a user's VERSION COUNT is bounded by state changes,
    * not by event volume: per-key fan-in stays small by construction,
    * the defining property of a dimension history. One shuffle each
    * side on user_id; half-open intervals make the match unique, so no
    * dedup pass afterward.
    *
    * Self-validating by construction: an event used as a probe sits
    * inside the run that produced its version, so the resolved state
    * must equal the event's own type — the oracle proves it without a
    * second ground-truth source. */
  def pointInTimeJoin(s: SparkSession, dir: String): DataFrame =
    pointInTimeJoin(Tables.events(s, dir))

  def pointInTimeJoin(events: DataFrame): DataFrame = {
    val dim = scd2(events)
      .select(col("user_id").as("d_user"), col("version"), col("state"),
        col("valid_from"), col("valid_to"))
    val probes = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull && col("event_id") % 10 === 0)
      .select(col("event_id"), col("user_id"), col("ts"))
    probes.join(dim,
        col("user_id") === col("d_user") &&
          col("valid_from") <= col("ts") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")))
      .select(col("event_id"), col("user_id"), col("ts").as("fact_ts"),
        col("version"), col("state"))
      .orderBy("event_id")
  }

  /** q151 oracle: the q135 history CTE + the same interval resolve. */
  def pointInTimeJoinOracleSql: String =
    """WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
      |c AS (SELECT user_id, ts, event_id, event_type,
      |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM e),
      |r AS (SELECT user_id, ts, event_id, event_type FROM c
      |  WHERE prev_type IS NULL OR prev_type <> event_type),
      |dim AS (SELECT user_id AS d_user,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
      |  event_type AS state, ts AS valid_from,
      |  LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      | FROM r),
      |probes AS (SELECT event_id, user_id, ts FROM e WHERE event_id % 10 = 0)
      |SELECT p.event_id, p.user_id, p.ts AS fact_ts, d.version, d.state
      |FROM probes p JOIN dim d ON p.user_id = d.d_user
      |  AND d.valid_from <= p.ts AND (d.valid_to IS NULL OR p.ts < d.valid_to)
      |ORDER BY p.event_id""".stripMargin

  /** q166: CUSUM level-shift changepoint over the daily event-volume
    * series — the offline complement to q96's trailing-window z-score:
    * q96 flags hour-local spikes against a moving baseline; CUSUM
    * (Page 1954) accumulates every day's deviation from the GLOBAL mean,
    * so a sustained level shift — ingestion drop, source cutover,
    * scraper breakage — shows as the peak of the cumulative deviation
    * curve, and the argmax day IS the maximum-likelihood shift point for
    * a mean change. The monitoring query behind "when did our daily
    * volume actually change", run over the same rollup the reference's
    * dashboard plots as its daily activity panel (streamlit/app/app.py:
    * 84-140).
    *
    * Engine-exact: with daily totals Tₜ (milli-integer), D days and
    * grand total S, the scaled CUSUM cₜ = D·Σ_{d≤t}Td − t·S is pure
    * BIGINT (no division inside the recursion); the argmax is an integer
    * comparison (earliest day wins ties) and the only doubles are the
    * final unit-restoring divisions, identical in both engines.
    *
    * Scale notes: one map-combined rollup collapses the 100 TB event
    * scan to |days| rows; the cumulative window then runs
    * single-partition over that day-level frame (hundreds of rows — the
    * correct frame for a global time series, same shape as q146's trend
    * table). Nothing unbounded touches the raw events. */
  def cusumChangepoint(s: SparkSession, dir: String): DataFrame =
    cusumChangepoint(Tables.events(s, dir))

  def cusumChangepoint(events: DataFrame): DataFrame = {
    def d(c: Column) = c.cast("double")
    val daily = events
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(to_date(col("ts")).as("day"),
        floor(col("value") * 1e3).cast("long").as("x"))
      .groupBy(col("day"))
      .agg(sum(col("x")).as("t"), count(lit(1)).as("n"))
    val tot = daily.agg(sum(col("t")).as("s_all"),
      count(lit(1)).as("n_days"))
    val wSeq = Window.orderBy(col("day"))
    val wCum = wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    daily
      .withColumn("idx", row_number().over(wSeq).cast("long"))
      .withColumn("p", sum(col("t")).over(wCum))
      .crossJoin(broadcast(tot))
      .withColumn("c", col("n_days") * col("p") - col("idx") * col("s_all"))
      .withColumn("mx", max(abs(col("c"))).over(wAll))
      .withColumn("cp_day",
        min(when(abs(col("c")) === col("mx"), col("day"))).over(wAll))
      .select(col("day"), col("n"),
        round(d(col("t")) / 1000.0, 6).as("total_r"),
        round(d(col("c")) / (d(col("n_days")) * 1000.0), 6).as("cusum_r"),
        (col("day") === col("cp_day")).as("is_changepoint"))
      .orderBy("day")
  }

  /** q169: seasonal-baseline anomaly — the calendar-aligned third leg of
    * the monitoring family: q96 scores an hour against its TRAILING 24 h
    * (absorbs daily cycles into the baseline), q166 finds the one global
    * level shift, and this scores each (type, day, hour) against the
    * profile of THE SAME HOUR-OF-DAY across all days — traffic at 3 am
    * is judged against other 3 ams, so a diurnal corpus stops
    * false-alarming every evening peak and a quiet-hour burst stops
    * hiding inside the daily swing. The shape behind every
    * "vs same time last week" dashboard panel (the reference plots raw
    * daily activity, streamlit/app/app.py:84-140).
    *
    * Engine-exact: q96's exact chain regrouped — integer moments
    * (cnt, Σn, Σn²) per (type, hour-of-day) profile, z from the
    * identical fixed-order double expression, zero-variance → NULL;
    * profiles need ≥ 2 days. NULL event_type groups are kept and
    * ordered NULLS LAST in both engines.
    *
    * Scale notes: one map-combined rollup to (type, day, hour) rows,
    * one |types|·24-row profile agg broadcast back onto the rollup —
    * nothing beyond the first aggregation ever touches raw events, and
    * the profile join is a broadcast by construction. */
  def seasonalAnomaly(s: SparkSession, dir: String): DataFrame =
    seasonalAnomaly(Tables.events(s, dir))

  def seasonalAnomaly(events: DataFrame): DataFrame = {
    def d(c: Column) = c.cast("double")
    val hourly = events.filter(col("ts").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        hour(col("ts")).cast("long").as("hod"))
      .groupBy(col("event_type"), col("day"), col("hod"))
      .agg(count(lit(1)).as("n"))
    val profile = hourly.groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("cnt"), sum(col("n")).as("s1"),
        sum(col("n") * col("n")).as("s2"))
      .filter(col("cnt") >= 2L)
    val den = d(col("cnt")) *
      sqrt((d(col("cnt")) * d(col("s2")) - d(col("s1")) * d(col("s1")))
        / (d(col("cnt")) * (d(col("cnt")) - lit(1.0))))
    val pr = profile.withColumnRenamed("event_type", "p_type")
      .withColumnRenamed("hod", "p_hod")
    // <=> so a NULL event_type group still meets its own profile (the
    // oracle's null-safe join predicate)
    hourly.join(broadcast(pr),
        col("event_type") <=> col("p_type") && col("hod") === col("p_hod"))
      .select(col("event_type"), col("day"), col("hod"), col("n"), col("cnt"),
        round((d(col("n")) * d(col("cnt")) - d(col("s1"))) /
          when(den === 0.0, lit(null)).otherwise(den), 6).as("z_season_r"))
      .orderBy(col("event_type").asc_nulls_last, col("day"), col("hod"))
  }

  /** q169 oracle: identical moments and float chain, calendar grouping. */
  def seasonalAnomalyOracleSql: String =
    """WITH h AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2, 3),
      |p AS (SELECT event_type, hod, CAST(COUNT(*) AS BIGINT) AS cnt,
      |    CAST(SUM(n) AS BIGINT) AS s1, CAST(SUM(n * n) AS BIGINT) AS s2
      |  FROM h GROUP BY 1, 2
      |  HAVING COUNT(*) >= 2),
      |z AS (SELECT h.event_type, h.day, h.hod, h.n, p.cnt,
      |    CAST(p.cnt AS DOUBLE) *
      |      sqrt((CAST(p.cnt AS DOUBLE) * CAST(p.s2 AS DOUBLE)
      |          - CAST(p.s1 AS DOUBLE) * CAST(p.s1 AS DOUBLE))
      |        / (CAST(p.cnt AS DOUBLE) * (CAST(p.cnt AS DOUBLE) - 1.0))) AS den,
      |    CAST(h.n AS DOUBLE) * CAST(p.cnt AS DOUBLE) - CAST(p.s1 AS DOUBLE) AS num
      |  FROM h JOIN p ON (h.event_type = p.event_type
      |      OR (h.event_type IS NULL AND p.event_type IS NULL))
      |    AND h.hod = p.hod)
      |SELECT event_type, day, hod, n, cnt,
      |  ROUND(num / (CASE WHEN den = 0.0 THEN NULL ELSE den END), 6) AS z_season_r
      |FROM z ORDER BY event_type, day, hod""".stripMargin

  /** q166 oracle: the same integer CUSUM and window argmax. */
  def cusumChangepointOracleSql: String =
    """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(FLOOR(value * 1e3) AS BIGINT)) AS BIGINT) AS t,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      |  GROUP BY 1),
      |tot AS (SELECT CAST(SUM(t) AS BIGINT) AS s_all,
      |    CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
      |c AS (SELECT day, n, t, s_all, n_days,
      |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS idx,
      |    CAST(SUM(t) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
      |  FROM daily CROSS JOIN tot),
      |k AS (SELECT *, n_days * p - idx * s_all AS c FROM c),
      |mx AS (SELECT *, MAX(ABS(c)) OVER () AS mx FROM k),
      |m AS (SELECT *,
      |    MIN(CASE WHEN ABS(c) = mx THEN day END) OVER () AS cp_day
      |  FROM mx)
      |SELECT day, n,
      |  ROUND(CAST(t AS DOUBLE) / 1000.0, 6) AS total_r,
      |  ROUND(CAST(c AS DOUBLE) / (CAST(n_days AS DOUBLE) * 1000.0), 6) AS cusum_r,
      |  day = cp_day AS is_changepoint
      |FROM m ORDER BY day""".stripMargin
}
