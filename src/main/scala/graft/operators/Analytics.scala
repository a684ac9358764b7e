package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational / analytics core — the join-aggregate-window surface the
  * reference's dashboard and curated-layer queries exercise
  * (streamlit/app/app.py:84-255, join_eu_ugc_qdrant_merge.py:191-351),
  * expressed over the TPC-H-ish test schema.
  *
  * Scale notes:
  *  - dimension tables (region/nation/supplier) are always `broadcast()` —
  *    at 100 TB the facts shuffle once on their join key and dims ride along.
  *  - money aggregates run in DECIMAL (exact, order-independent across
  *    1000 executors) and only the final value is cast to double.
  */
object Analytics {

  /** Exact decimal view of a 2-dp money column; sums of these are
    * reassociation-safe, so distributed partial aggregation can't flip
    * low-order bits. */
  private def dec(c: Column): Column = c.cast("decimal(12,4)")

  /** q01: filtered grouped aggregation (pricing-summary shape). */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,4)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .select("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "count_order", "avg_qty")
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q02: 3-table join + agg + top-k (shipping-priority shape). */
  def topkRevenue(s: SparkSession, dir: String): DataFrame = {
    val cutoff = to_timestamp(lit("1995-03-15"))
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,4)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** q03: star join over all six relational tables, dims broadcast. */
  def starJoin(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, dir)
    val c = Tables.customer(s, dir)
    val sup = Tables.supplier(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1995-01-01")) &&
              col("o_orderdate") <  to_timestamp(lit("1997-01-01")))
    val l = Tables.lineitem(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,4)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** q04: deterministic first-row-per-group (DISTINCT ON shape,
    * app.py:146 + representative-guid selection join_…_merge.py:90). */
  def representativePerGroup(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("first_orderkey"),
        col("o_orderdate").as("first_orderdate"))
      .orderBy("o_custkey")
  }

  /** q05: left-semi join — "guid in validated set" filter
    * (join_…_merge.py:215). */
  def validatedSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
    c.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** q06: left-anti join — MERGE whenNotMatchedInsertAll candidate set
    * (eu_raw_to_cleansed_merge.py:66-69). */
  def newRecordsAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** q07: full-outer join + coalesce (README §5.5 full outer eu×ugc). */
  def fullOuterEnrich(s: SparkSession, dir: String): DataFrame = {
    val custPerNation = Tables.customer(s, dir)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    val suppPerNation = Tables.supplier(s, dir)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    custPerNation.join(suppPerNation, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .orderBy("nationkey")
  }

  /** q08: ROLLUP facet counts (dashboard facets shape). */
  def rollupFacets(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(dec(col("c_acctbal"))).cast("double").as("sum_acctbal"))
      // n_customers tiebreak: with NULL facet values in the data, the
      // NULL-keyed data row, subtotal, and grand total all sort equal on
      // (r_name, n_name) — without a total order the gate compare is
      // nondeterministic
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"),
        col("n_customers"))
  }

  /** q09: DISTINCT facet values (app.py:94-100 filter options). */
  def distinctFacets(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_mktsegment").as("segment"))
      .distinct()
      // NULLS LAST: DuckDB's ORDER BY default — a NULL facet value
      // would otherwise sort first here and last in the oracle
      .orderBy(col("segment").asc_nulls_last)

  /** q10: explode/UNNEST word arrays + count (app.py:100 UNNEST(tags)). */
  def explodeTags(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))

  /** q11: running windows over an event stream (temporal analysis,
    * README §8.2). Running count is exact; running sum runs in DECIMAL so
    * the cumulative order of double addition can't diverge. */
  def runningWindow(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).filter(col("user_id") < 100)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.select(col("user_id"), col("ts"), col("event_id"),
        count(lit(1)).over(w).as("running_events"),
        sum(col("value").cast("decimal(20,4)")).over(w).cast("double").as("running_value"))
      .orderBy("user_id", "ts", "event_id")
  }

  /** q37: promo revenue share (TPC-H Q14 shape) — lineitem ⋈ broadcast
    * part with a string predicate inside a conditional aggregate; the
    * only inventory query exercising the part dimension. */
  def promoRevenue(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1995-09-01")) &&
              col("l_shipdate") <  to_timestamp(lit("1995-10-01")))
    val p = Tables.part(s, dir)
    val disc = dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,4)") - dec(col("l_discount")))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n_items"),
        sum(disc).cast("double").as("revenue"),
        sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0).cast("decimal(12,4)")))
          .cast("double").as("promo_revenue"))
      .orderBy("p_type")
  }

  /** q50: conversion funnel — per user, the first view, the first click
    * AFTER that view, and the first purchase AFTER that click, plus the
    * deepest stage reached. The three stage columns are sequential
    * whole-partition window minima over ONE shuffle on user_id, and the
    * final per-user aggregate reuses that partitioning — a single
    * exchange end to end, which is what makes the funnel viable over a
    * 100 TB event log. */
  def funnel(s: SparkSession, dir: String): DataFrame =
    funnel(Tables.events(s, dir))

  def funnel(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    events
      .withColumn("view_ts",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("click_ts",
        min(when(col("event_type") === "click" && col("ts") > col("view_ts"),
          col("ts"))).over(w))
      .withColumn("purchase_ts",
        min(when(col("event_type") === "purchase" && col("ts") > col("click_ts"),
          col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(min(col("view_ts")).as("view_ts"), min(col("click_ts")).as("click_ts"),
        min(col("purchase_ts")).as("purchase_ts"))
      .withColumn("stage",
        when(col("purchase_ts").isNotNull, 3L)
          .when(col("click_ts").isNotNull, 2L)
          .when(col("view_ts").isNotNull, 1L)
          .otherwise(0L))
      .orderBy("user_id")
  }

  /** q51: exact per-group quantiles by rank selection — the value at row
    * ceil(q·n) of the (value, event_id)-sorted group. Discrete selection
    * of an actual data element via integer index math: no interpolation
    * arithmetic to diverge between engines, unlike percentile_cont. One
    * shuffle; at scale you'd swap in approx_percentile and lose the
    * oracle, so the exact variant is the gated one. */
  def groupQuantiles(s: SparkSession, dir: String): DataFrame =
    groupQuantiles(Tables.events(s, dir))

  def groupQuantiles(events: DataFrame): DataFrame = {
    val byValue = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val whole = Window.partitionBy(col("event_type"))
    val ranked = events
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(byValue))
      .withColumn("n", count(lit(1)).over(whole))
    def pick(q: Double): Column =
      max(when(col("rn") === ceil(col("n") * q), col("value")))
    ranked.groupBy(col("event_type"))
      .agg(max(col("n")).as("n_events"),
        pick(0.5).as("p50"), pick(0.9).as("p90"), pick(0.99).as("p99"))
      // NULLS LAST: match the oracle's DuckDB ORDER BY default for a
      // NULL group key
      .orderBy(col("event_type").asc_nulls_last)
  }

  /** Range-bucket count for [[groupQuantiles2Pass]]: each group's
    * candidate bucket holds ~1/256 of the group, so the only sort runs
    * over n/256 rows instead of n. */
  val QuantileBuckets = 256

  /** Internal null-group sentinel (NUL can't occur in a real event_type;
    * lets the bucket/target equi-joins keep NULL groups that a plain
    * using-column join would silently drop). */
  private val NullKey = "\u0000"

  /** q97: the SAME exact rank-selection quantiles as q51, restructured
    * for 100 TB — q51's whole-group window sort puts each event_type's
    * entire data on one reducer for a full sort (5 event types ⇒ 5
    * reducers sort everything); this variant never sorts a whole group:
    *
    *  1. per-group (min, max, n) — one map-combined agg, 5 rows,
    *     broadcast back;
    *  2. range-bucket counts — one map-combined agg over (group,
    *     bucket≤256), then cumulative counts over the ≤256-row-per-group
    *     aggregate (output-sized window, the q83 rule);
    *  3. rank r = ceil(q·n) lands in the unique bucket with
    *     prev < r ≤ cum; only THAT bucket's rows (≈ n/256) are re-read,
    *     sorted, and the (r − prev)-th smallest picked.
    *
    * Bucketing is any monotone value→bucket map (floats fine: monotone
    * IEEE ops preserve order, equal values share a bucket), so the
    * selected element is exactly q51's — the oracle is the same
    * rank-selection SQL. Recursing into the candidate bucket would
    * bound the sort further; one level suffices here. */
  def groupQuantiles2Pass(s: SparkSession, dir: String): DataFrame =
    groupQuantiles2Pass(Tables.events(s, dir))

  /** Monotone value→bucket map over the broadcast (vmin, vmax) range:
    * monotone IEEE ops preserve order and equal values share a bucket,
    * so buckets partition the per-group value order.
    *
    * PRECONDITION (all two-pass twins): values must be FINITE — a NaN or
    * ±Infinity poisons the range arithmetic into NaN buckets and rows
    * would silently drop from the bucket joins. The window-sort
    * originals tolerate non-finite values (engines sort NaN greatest);
    * filter or clamp upstream before using the two-pass plans. */
  private def bucketOf(value: Column): Column =
    when(col("vmax") <= col("vmin"), lit(0))
      .otherwise(least(floor((value - col("vmin"))
        / (col("vmax") - col("vmin")) * QuantileBuckets).cast("int"),
        lit(QuantileBuckets - 1)))

  /** Per-(gkey, bucket) counts with running totals: `prev` = rows in
    * strictly earlier buckets, `cum` = rows through this bucket. The
    * window runs over the ≤[[QuantileBuckets]]-row-per-group aggregate
    * (output-sized, the q83 rule), never raw rows. */
  private def bucketCum(bucketed: DataFrame): DataFrame = {
    val byBucket = Window.partitionBy(col("gkey")).orderBy(col("bucket"))
    bucketed.groupBy(col("gkey"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt"))
        .over(byBucket.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("prev", col("cum") - col("cnt"))
  }

  /** Shared two-pass rank-selection core (q97/q99): for each quantile
    * q, rank r = ceil(q·n) lands in the unique bucket with
    * prev < r ≤ cum; only THAT bucket's rows (≈ n/256) are re-read,
    * sorted, and the (r − prev)-th smallest picked. Input `ev` must
    * carry (gkey, value, tb); returns (stats(gkey, vmin, vmax, n),
    * picked(gkey, qname, value)). */
  private def bucketRankSelect(ev: DataFrame,
      qs: Seq[(String, Double)]): (DataFrame, DataFrame) = {
    val spark = ev.sparkSession
    import spark.implicits._
    // materialized eagerly: the stats frame (≤ one row per group) is read
    // by THREE plan branches (the bucket map, the target-rank join, and
    // the caller's final select) and each branch would otherwise re-run
    // the full group aggregate over the corpus — at scale that is two
    // extra corpus passes, and under AQE each duplicated subtree also
    // re-executes as its own chain of per-exchange jobs (q154 measured
    // 41 jobs for a 5-row result before this barrier)
    val stats = ev.groupBy(col("gkey"))
      .agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"),
        count(lit(1)).as("n"))
      .localCheckpoint()
    val bucketed = ev.join(broadcast(stats), Seq("gkey"))
      .withColumn("bucket", bucketOf(col("value")))
    val targets = bucketCum(bucketed)
      .join(broadcast(stats.select(col("gkey"), col("n"))), Seq("gkey"))
      .crossJoin(broadcast(qs.toDF("qname", "q")))
      .withColumn("r", ceil(col("n") * col("q")))
      .filter(col("prev") < col("r") && col("r") <= col("cum"))
      .select(col("gkey"), col("bucket"), col("qname"),
        (col("r") - col("prev")).as("k"))
    val picked = bucketed.join(broadcast(targets), Seq("gkey", "bucket"))
      .withColumn("rnk", row_number().over(Window
        .partitionBy(col("gkey"), col("qname"))
        .orderBy(col("value"), col("tb"))))
      .filter(col("rnk") === col("k"))
      .select(col("gkey"), col("qname"), col("value"))
    (stats, picked)
  }

  /** events → the (gkey, value, tb) frame the bucket machinery runs on;
    * NULL values filtered (cross-engine rank rule), NULL group keys kept
    * through the equi-joins via the sentinel. */
  private def keyedEventValues(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull)
      .select(coalesce(col("event_type"), lit(NullKey)).as("gkey"),
        col("value"), col("event_id").as("tb"))

  private def unkey(gkey: Column): Column =
    when(gkey === NullKey, lit(null).cast("string")).otherwise(gkey)

  def groupQuantiles2Pass(events: DataFrame): DataFrame = {
    val (stats, picked) = bucketRankSelect(keyedEventValues(events),
      Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99)))
    val sel = picked.groupBy(col("gkey"))
      .agg(max(when(col("qname") === "p50", col("value"))).as("p50"),
        max(when(col("qname") === "p90", col("value"))).as("p90"),
        max(when(col("qname") === "p99", col("value"))).as("p99"))
    stats.select(col("gkey"), col("n").as("n_events"))
      .join(sel, Seq("gkey"))
      .select(unkey(col("gkey")).as("event_type"),
        col("n_events"), col("p50"), col("p90"), col("p99"))
      // NULLS LAST: q51 and the DuckDB oracle both order the NULL
      // group last
      .orderBy(col("event_type").asc_nulls_last)
  }

  /** q99: q77's winsorization with the clamp bounds computed by the q97
    * two-pass bucket selection instead of a whole-group window sort —
    * identical output (the oracle is q77's SQL), scale-safe plan: the
    * p01/p99 bounds come out of [[bucketRankSelect]], broadcast back
    * onto the scan, and the clamp aggregation is the same exact
    * micro-unit integer fold as q77. */
  def winsorize2Pass(s: SparkSession, dir: String): DataFrame =
    winsorize2Pass(Tables.events(s, dir))

  def winsorize2Pass(events: DataFrame): DataFrame = {
    // q77 (and its oracle's JOIN USING(event_type)) EXCLUDES the NULL
    // group — the bounds join can never match it — so the twin must too;
    // found by the PropertySpec random-frame cross-check, not the fixture
    val ev = keyedEventValues(events.filter(col("event_type").isNotNull))
    val (stats, picked) = bucketRankSelect(ev, Seq(("lo", 0.01), ("hi", 0.99)))
    val bounds = stats.select(col("gkey"), col("n").as("n_events"))
      .join(picked.groupBy(col("gkey"))
        .agg(max(when(col("qname") === "lo", col("value"))).as("lo"),
          max(when(col("qname") === "hi", col("value"))).as("hi")), Seq("gkey"))
    ev.join(broadcast(bounds), Seq("gkey"))
      .withColumn("cv", least(greatest(col("value"), col("lo")), col("hi")))
      .groupBy(col("gkey"))
      .agg(max(col("n_events")).as("n_events"),
        max(col("lo")).as("lo"), max(col("hi")).as("hi"),
        sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_clamped_lo"),
        sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_clamped_hi"),
        sum(floor(col("cv") * 1e6).cast("long")).as("clamped_sum_micro"))
      .select(unkey(col("gkey")).as("event_type"), col("n_events"),
        col("lo"), col("hi"), col("n_clamped_lo"), col("n_clamped_hi"),
        col("clamped_sum_micro"))
      .orderBy(col("event_type").asc_nulls_last)
  }

  /** q98: q81's per-row percentile ranks without the per-language
    * whole-group window sort. The global rank of a row decomposes as
    * (rows in strictly earlier buckets) + (rank within its own bucket)
    * because buckets partition the value order — so the per-row window
    * sorts only (gkey, bucket) slices of ~n/256 rows, with the bucket
    * prefix totals ([[bucketCum]]) broadcast. Output identical to q81
    * (same oracle modulo the explicit non-null filter). */
  def percentileRank2Pass(s: SparkSession, dir: String): DataFrame =
    percentileRank2Pass(Tables.documents(s, dir))

  def percentileRank2Pass(docs: DataFrame): DataFrame = {
    val d = docs.filter(col("n_chars").isNotNull)
      .select(coalesce(col("lang"), lit(NullKey)).as("gkey"),
        col("doc_id"), col("n_chars"))
    // same eager barrier as bucketRankSelect: stats is broadcast into
    // both the bucket map and (via bucketed) the prefix aggregate
    val stats = d.groupBy(col("gkey"))
      .agg(min(col("n_chars")).as("vmin"), max(col("n_chars")).as("vmax"),
        count(lit(1)).as("n"))
      .localCheckpoint()
    val bucketed = d.join(broadcast(stats), Seq("gkey"))
      .withColumn("bucket", bucketOf(col("n_chars")))
    val prefix = bucketCum(bucketed).select(col("gkey"), col("bucket"), col("prev"))
    bucketed.join(broadcast(prefix), Seq("gkey", "bucket"))
      .withColumn("rn", col("prev") + row_number().over(Window
        .partitionBy(col("gkey"), col("bucket"))
        .orderBy(col("n_chars"), col("doc_id"))))
      .select(col("doc_id"), unkey(col("gkey")).as("lang"), col("n_chars"),
        ((col("rn") - 1).cast("double")
          / greatest(col("n") - 1, lit(1)).cast("double")).as("pct_rank"),
        (col("rn").cast("double") / col("n").cast("double")).as("cume"))
      .orderBy("doc_id")
  }

  /** q98 oracle: q81's SQL over non-null lengths. */
  val percentileRank2PassOracleSql: String =
    """WITH r AS (SELECT doc_id, lang, n_chars,
      |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
      |  COUNT(*) OVER (PARTITION BY lang) AS n
      | FROM documents WHERE n_chars IS NOT NULL)
      |SELECT doc_id, lang, n_chars,
      |  CAST(rn - 1 AS DOUBLE) / CAST(GREATEST(n - 1, 1) AS DOUBLE) AS pct_rank,
      |  CAST(rn AS DOUBLE) / CAST(n AS DOUBLE) AS cume
      |FROM r ORDER BY doc_id""".stripMargin

  /** q97 oracle: q51's rank-selection SQL (non-null values). */
  val groupQuantiles2PassOracleSql: String =
    """WITH r AS (SELECT event_type, value, event_id,
      |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |  COUNT(*) OVER (PARTITION BY event_type) AS n
      | FROM events WHERE value IS NOT NULL)
      |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
      |  MAX(CASE WHEN rn = CEIL(n * 0.5) THEN value END) AS p50,
      |  MAX(CASE WHEN rn = CEIL(n * 0.9) THEN value END) AS p90,
      |  MAX(CASE WHEN rn = CEIL(n * 0.99) THEN value END) AS p99
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q77: per-group winsorization — clamp `value` to the exact
    * rank-selected [p01, p99] per event_type and report the clamp
    * bounds, clamp counts, and the clamped sum. The outlier-taming step
    * before any learned-from aggregate (feature scaling, reward
    * normalization) — same rank-selection quantiles as q51, so the
    * bounds are engine-exact data values, not interpolations.
    *
    * Scale notes: one sort-per-group window pass computes both bounds;
    * the 5-row bounds table broadcasts back onto the scan, so the clamp
    * itself is a narrow projection. The clamped sum is carried in
    * floor-quantized micro-units: an exact integer, order-independent
    * under Spark's unordered partial aggregation and bit-identical in
    * the oracle. */
  def winsorize(s: SparkSession, dir: String): DataFrame =
    winsorize(Tables.events(s, dir))

  def winsorize(events: DataFrame): DataFrame = {
    val byValue = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val whole = Window.partitionBy(col("event_type"))
    // NULL values filtered on both sides: the engines rank NULLs at
    // opposite ends, which would shift the ceil(n·q)-selected bounds
    // (same cross-engine rule as the null-ts filters in q78/q80/q85/q88)
    val ranked = events
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(byValue))
      .withColumn("n", count(lit(1)).over(whole))
    def pick(q: Double): Column =
      max(when(col("rn") === ceil(col("n") * q), col("value")))
    val bounds = ranked.groupBy(col("event_type"))
      .agg(max(col("n")).as("n_events"), pick(0.01).as("lo"), pick(0.99).as("hi"))
    val clamped = events.filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
      .join(broadcast(bounds), Seq("event_type"))
      .withColumn("cv", least(greatest(col("value"), col("lo")), col("hi")))
    clamped.groupBy(col("event_type"))
      .agg(max(col("n_events")).as("n_events"),
        max(col("lo")).as("lo"), max(col("hi")).as("hi"),
        sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_clamped_lo"),
        sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_clamped_hi"),
        sum(floor(col("cv") * 1e6).cast("long")).as("clamped_sum_micro"))
      .orderBy(col("event_type").asc_nulls_last)
  }

  /** q80: per-user rolling event features — the feature-engineering
    * window shapes a training pipeline derives online signals from, one
    * of each frame kind: a ROWS frame (last 5 events incl. current:
    * rolling count + micro-quantized rolling sum — exact integers) and a
    * RANGE frame (events in the trailing hour by event-time value, which
    * is tie-order-independent by definition: equal timestamps enter the
    * frame together).
    *
    * Scale notes: ONE shuffle on user_id feeds both frames over the same
    * (ts, event_id) sort; all arithmetic is integer-exact so the output
    * is partition-order-independent. */
  def rollingFeatures(s: SparkSession, dir: String): DataFrame =
    rollingFeatures(Tables.events(s, dir))

  def rollingFeatures(events: DataFrame): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val last5 = byTime.rowsBetween(-4, 0)
    val lastHour = Window.partitionBy(col("user_id"))
      .orderBy(unix_timestamp(col("ts")))
      .rangeBetween(-3600L, 0L)
    // NULL ts filtered on both sides: the engines order NULLs at
    // opposite ends, which would shift every frame (q78/q85/q88 rule)
    events.filter(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        floor(col("value") * 1e6).cast("long").as("vm"))
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(last5).as("roll5_n"),
        sum(col("vm")).over(last5).as("roll5_sum_micro"),
        count(lit(1)).over(lastHour).as("hour_n"))
      .orderBy("event_id")
  }

  /** q81: per-language percentile rank of document length — the rank
    * feature (percentile-normalized score) corpus selection thresholds
    * on. Computed from explicit ROW_NUMBER over the unique (n_chars,
    * doc_id) order so the 0-to-1 ratios are exact integer divisions,
    * identical in any engine (the builtin percent_rank's n=1 edge case
    * is engine-defined; (rn-1)/max(n-1,1) is not).
    *
    * Scale notes: one shuffle on lang + one sort; NULL lang forms its
    * own partition in both engines. */
  def percentileRank(s: SparkSession, dir: String): DataFrame =
    percentileRank(Tables.documents(s, dir))

  def percentileRank(docs: DataFrame): DataFrame = {
    val byLen = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
    val whole = Window.partitionBy(col("lang"))
    docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("rn", row_number().over(byLen))
      .withColumn("n", count(lit(1)).over(whole))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        ((col("rn") - 1).cast("double") / greatest(col("n") - 1, lit(1)).cast("double"))
          .as("pct_rank"),
        (col("rn").cast("double") / col("n").cast("double")).as("cume"))
      .orderBy("doc_id")
  }

  /** q83: heavy hitters — top-3 sources per language by document count,
    * the dashboard "top contributors per facet" panel (app.py:146 top
    * collections shape) and the skew-diagnosis step before any
    * hot-key mitigation (q53's salted join needs to know WHICH keys are
    * hot).
    *
    * Scale notes: the corpus-sized work is ONE map-combined count
    * aggregate; the rank window then runs over the aggregated
    * (lang, source) table whose cardinality is #distinct pairs — output
    * -sized, not corpus-sized — so the window sort is scale-safe where
    * a window over raw rows would not be. NULL facets are normalized to
    * '' so grouping and ordering agree across engines. */
  def heavyHitters(s: SparkSession, dir: String): DataFrame =
    heavyHitters(Tables.documents(s, dir))

  def heavyHitters(docs: DataFrame): DataFrame = {
    val counts = docs
      .select(coalesce(col("lang"), lit("")).as("lang"),
        coalesce(col("source"), lit("")).as("source"))
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("cnt"))
    val byCnt = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("source"))
    counts.withColumn("rank", row_number().over(byCnt).cast("long"))
      .filter(col("rank") <= 3)
      .select("lang", "source", "cnt", "rank")
      .orderBy("lang", "rank")
  }

  /** q88: cohort retention — users grouped by first-activity day
    * (cohort), counted by how many distinct days later they return: the
    * engagement matrix behind every retention dashboard. Self-join-free:
    * one agg derives each user's cohort day, one distinct-activity agg
    * joins back on user_id, and the matrix is a final count-distinct —
    * all date arithmetic in whole days (engine-exact), no timestamps
    * compared directly.
    *
    * Scale notes: two shuffles on user_id (cohort agg + join; AQE
    * broadcasts the per-user cohort table when it fits) and one on the
    * (cohort, offset) matrix key whose cardinality is days², not rows. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame =
    cohortRetention(Tables.events(s, dir))

  def cohortRetention(events: DataFrame): DataFrame = {
    val e = events.filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    e.distinct()
      .join(cohorts, Seq("user_id"))
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"),
        col("user_id"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** q90: per-group Pearson correlation between event value and the
    * props payload's k field — the feature-correlation screen a pipeline
    * runs before training on derived signals. The five raw moments
    * (Σx, Σy, Σx², Σy², Σxy) are EXACT integer sums of milli-quantized
    * values (order/partition-independent, emitted so the whole
    * computation is value-proven); the correlation itself is one
    * identically-associated double chain on top — sqrt is IEEE
    * correctly-rounded everywhere, unlike ln/exp, so it is safe in a
    * cross-engine expression.
    *
    * Scale notes: ONE map-side-combined aggregate over the scan, output
    * rows = #groups. Milli (not micro) quantization keeps Σx² under
    * 2^63 at 10^7 rows per group × values to ~10^6 — the documented
    * scale/size trade. */
  def groupCorr(s: SparkSession, dir: String): DataFrame =
    groupCorr(Tables.events(s, dir))

  def groupCorr(events: DataFrame): DataFrame = {
    val e = events
      .select(col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("value").isNotNull && col("k").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 1e3).cast("long").as("x"),
        col("k").cast("long").as("y"))
    e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("num",
        col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
      .withColumn("den",
        sqrt((col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
          * (col("n").cast("double") * col("syy").cast("double")
            - col("sy").cast("double") * col("sy").cast("double"))))
      // zero-variance group → NULL, not NaN (NaN round-trips differently
      // through the two engines' comparators)
      .select(col("event_type"), col("n"), col("sx"), col("sy"),
        col("sxx"), col("syy"), col("sxy"),
        round(col("num") / when(col("den") === 0.0, lit(null)).otherwise(col("den")), 6)
          .as("corr_r"))
      .orderBy(col("event_type").asc_nulls_last)
  }

  /** q154: robust outlier detection via MAD (median absolute deviation)
    * — the outlier rule that survives the outliers themselves: mean/σ
    * thresholds (q96's family) are dragged by the very tails they hunt,
    * while median and MAD have a 50% breakdown point. Per group: median
    * (two-pass rank selection), MAD = median of |x − med| (the SAME
    * bucket machinery run again over the derived deviations — nothing
    * new to trust), and the count beyond the standard 3σ-equivalent
    * fence |x − med| > 3·1.4826·MAD. The fence compare is one float
    * multiply both engines evaluate identically; median/MAD values are
    * exact rank-selected ELEMENTS of the data, not interpolations, so
    * they hash-match bitwise.
    *
    * Scale notes: two bucketRankSelect passes (each: one map-combined
    * stats agg + ≤256-row-per-group cumulative + one candidate-bucket
    * sort of ~n/256 rows) + one counting aggregate — no whole-group
    * sort anywhere; the q97/q99 cost class, ~2× of it. */
  def madOutliers(s: SparkSession, dir: String): DataFrame =
    madOutliers(Tables.events(s, dir))

  def madOutliers(events: DataFrame): DataFrame = {
    // checkpoint the keyed values: the chain below reads them ~4 times
    // (two bucketRankSelect passes + the fence count), and without the
    // materialization each read re-runs the events scan + filter
    val kv = keyedEventValues(events).localCheckpoint()
    val (stats, medPicked) = bucketRankSelect(kv, Seq(("med", 0.5)))
    // round-13 barrier cut (the r12 eager checkpoints were correct but
    // over-applied): med and mad are ≤ one row per group, and each used
    // to be checkpointed and re-joined by 2-3 downstream branches —
    // three sequential materialization barriers. Instead med RIDES the
    // dev checkpoint (dev is its only remaining consumer's input: the
    // fence compare needs |x − med|, which IS dev.value, and the final
    // readout takes the group-constant med back out of the fences
    // aggregate), and mad is inlined into the fences plan the same way —
    // 6 barriers → 4, two joins fewer, identical values per group.
    val med = medPicked.groupBy(col("gkey")).agg(max(col("value")).as("med"))
    // the derived deviations: the second rank-select pass reads them
    // three times (stats, bucketing, candidate pick); med rides along
    // as a group-constant column
    val dev = kv.join(broadcast(med), Seq("gkey"))
      .select(col("gkey"), abs(col("value") - col("med")).as("value"),
        col("tb"), col("med"))
      .localCheckpoint()
    val (_, madPicked) = bucketRankSelect(dev, Seq(("mad", 0.5)))
    val mad = madPicked.groupBy(col("gkey")).agg(max(col("value")).as("mad"))
    val fences = dev.join(broadcast(mad), Seq("gkey"))
      .groupBy(col("gkey"))
      .agg(sum(when(col("value") > lit(4.4478) * col("mad"), 1L)
        .otherwise(0L)).as("n_outliers"),
        max(col("med")).as("med"), max(col("mad")).as("mad"))
    stats.select(col("gkey"), col("n").as("n_events"))
      .join(fences, Seq("gkey"))
      .select(unkey(col("gkey")).as("event_type"), col("n_events"),
        col("med"), col("mad"), col("n_outliers"))
      .orderBy(col("event_type").asc_nulls_last)
  }

  /** q154 oracle: the same rank rule on values, then on deviations;
    * null-safe group joins keep a NULL event_type group alive. */
  def madOutliersOracleSql: String =
    """WITH e AS (SELECT event_type, value, event_id FROM events
      |  WHERE value IS NOT NULL),
      |r AS (SELECT event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n FROM e),
      |med AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
      |    MAX(CASE WHEN rn = CEIL(n * 0.5) THEN value END) AS med
      |  FROM r GROUP BY event_type),
      |d AS (SELECT e.event_type, ABS(e.value - m.med) AS dev, e.event_id
      |  FROM e JOIN med m ON e.event_type IS NOT DISTINCT FROM m.event_type),
      |r2 AS (SELECT event_type, dev,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rn2,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n2 FROM d),
      |mad AS (SELECT event_type,
      |    MAX(CASE WHEN rn2 = CEIL(n2 * 0.5) THEN dev END) AS mad
      |  FROM r2 GROUP BY event_type),
      |fences AS (SELECT d.event_type,
      |    CAST(SUM(CASE WHEN d.dev > 4.4478 * a.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |  FROM d JOIN mad a ON d.event_type IS NOT DISTINCT FROM a.event_type
      |  GROUP BY d.event_type)
      |SELECT m.event_type, m.n_events, m.med, a.mad, f.n_outliers
      |FROM med m
      |JOIN mad a ON m.event_type IS NOT DISTINCT FROM a.event_type
      |JOIN fences f ON m.event_type IS NOT DISTINCT FROM f.event_type
      |ORDER BY m.event_type""".stripMargin

  /** q152: the built-in ranking-function surface in one gated query —
    * rank / dense_rank / ntile(4) / cume_dist over per-segment customer
    * balance, every tie broken by the (value, key) total order both
    * engines replay. cume_dist is an exact small-integer ratio
    * (rank_of_last_peer / n) in IEEE double, identical cross-engine;
    * ntile's uneven-split rule (first `n mod 4` tiles get the extra
    * row) matches between Spark and DuckDB by definition.
    *
    * Scale notes: this IS a whole-group window sort — the documented
    * built-in surface, kept for completeness and for groups that fit a
    * reducer (segments here). The scale path for rank-at-volume is
    * q98's two-pass bucket decomposition; at 100 TB choose by group
    * size, same rule as q51 vs q97. */
  def rankFamily(s: SparkSession, dir: String): DataFrame =
    rankFamily(Tables.customer(s, dir))

  def rankFamily(customer: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer
      .filter(col("c_mktsegment").isNotNull && col("c_acctbal").isNotNull)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(cume_dist().over(w), 9).as("cd_r"))
      .orderBy("c_mktsegment", "rnk", "c_custkey")
  }

  /** q152 oracle: the same four window functions — semantics must agree
    * engine-for-engine, which is the point of gating them. */
  val rankFamilyOracleSql: String =
    """SELECT c_mktsegment, c_custkey, c_acctbal,
      |  CAST(RANK() OVER w AS BIGINT) AS rnk,
      |  CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
      |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
      |  ROUND(CUME_DIST() OVER w, 9) AS cd_r
      |FROM customer
      |WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_mktsegment, rnk, c_custkey""".stripMargin

  /** q153: set-operation surface — INTERSECT (distinct) and EXCEPT
    * (distinct) over two order-date periods of active customers:
    * retained = active in both, churned = active early but not late.
    * Spark compiles both to aggregates + joins (intersect = left-semi
    * over distinct, except = left-anti over distinct), so each costs
    * one shuffle per side — worth gating because the DISTINCT-set
    * semantics (bag vs set) is exactly where ad-hoc reimplementations
    * drift. Output: one row per customer with a retained/churned tag. */
  def setOps(s: SparkSession, dir: String): DataFrame =
    setOps(Tables.orders(s, dir))

  def setOps(orders: DataFrame): DataFrame = {
    val early = orders.filter(col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      .select(col("o_custkey"))
    val late = orders.filter(col("o_orderdate") >= to_timestamp(lit("1998-01-01")))
      .select(col("o_custkey"))
    val retained = early.intersect(late)
      .select(col("o_custkey"), lit("retained").as("cohort"))
    val churned = early.except(late)
      .select(col("o_custkey"), lit("churned").as("cohort"))
    retained.unionAll(churned)
      .filter(col("o_custkey").isNotNull)
      .orderBy("cohort", "o_custkey")
  }

  val setOpsOracleSql: String =
    """WITH early AS (SELECT o_custkey FROM orders
      |  WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
      |late AS (SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
      |SELECT o_custkey, 'retained' AS cohort
      |FROM (SELECT o_custkey FROM early INTERSECT SELECT o_custkey FROM late)
      |WHERE o_custkey IS NOT NULL
      |UNION ALL
      |SELECT o_custkey, 'churned'
      |FROM (SELECT o_custkey FROM early EXCEPT SELECT o_custkey FROM late)
      |WHERE o_custkey IS NOT NULL
      |ORDER BY cohort, o_custkey""".stripMargin

  /** q148: approx-quantile contract audit — Spark's `percentile_approx`
    * (the KLL-style sketch a 100 TB rollout would actually ship for
    * dashboards) audited against the EXACT rank-selection quantiles: the
    * sketch value must land inside the exact [q−0.5%, q+0.5%] rank band,
    * far looser than the sketch's n/10000 rank-error bound — so a red
    * gate means the sketch integration is broken, not noisy. Same
    * audit-the-approximation methodology as q129's ANN recall gate:
    * booleans computed engine-side, the oracle emits the exact
    * quantiles + literal TRUE, so any violation hash-mismatches. The
    * band values come from the q97 bucket machinery (no whole-group
    * sort anywhere in the audit). */
  def approxQuantileAudit(s: SparkSession, dir: String): DataFrame =
    approxQuantileAudit(Tables.events(s, dir))

  def approxQuantileAudit(events: DataFrame): DataFrame = {
    val kv = keyedEventValues(events)
    val (stats, picked) = bucketRankSelect(kv, Seq(
      ("lo50", 0.495), ("p50", 0.5), ("hi50", 0.505),
      ("lo90", 0.895), ("p90", 0.9), ("hi90", 0.905)))
    def pick(n: String) = max(when(col("qname") === n, col("value"))).as(n)
    val sel = picked.groupBy(col("gkey"))
      .agg(pick("lo50"), pick("p50"), pick("hi50"),
        pick("lo90"), pick("p90"), pick("hi90"))
    val ap = kv.groupBy(col("gkey"))
      .agg(percentile_approx(col("value"), array(lit(0.5), lit(0.9)), lit(10000)).as("ap"))
    stats.select(col("gkey"), col("n").as("n_events"))
      .join(sel, Seq("gkey")).join(ap, Seq("gkey"))
      .select(unkey(col("gkey")).as("event_type"), col("n_events"),
        col("p50"), col("p90"),
        (col("ap")(0) >= col("lo50") && col("ap")(0) <= col("hi50")).as("p50_ok"),
        (col("ap")(1) >= col("lo90") && col("ap")(1) <= col("hi90")).as("p90_ok"))
      .orderBy(col("event_type").asc_nulls_last)
  }

  /** q148 oracle: exact quantiles by the q51 rank rule + literal TRUE
    * contract booleans. */
  def approxQuantileAuditOracleSql: String =
    """WITH e AS (SELECT event_type, value, event_id FROM events
      |  WHERE value IS NOT NULL),
      |r AS (SELECT event_type, value,
      |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |  COUNT(*) OVER (PARTITION BY event_type) AS n FROM e)
      |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
      |  MAX(CASE WHEN rn = CEIL(n * 0.5) THEN value END) AS p50,
      |  MAX(CASE WHEN rn = CEIL(n * 0.9) THEN value END) AS p90,
      |  TRUE AS p50_ok, TRUE AS p90_ok
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q146: per-group linear trend (least squares slope of value over
    * time) — the drift detector a pipeline runs per event type before
    * alerting on q96's rate anomalies: is the metric actually trending
    * or just noisy? All five moments are EXACT int64 sums of quantized
    * values (t = whole hours since 2024-01-01, v = milli-units, q90
    * convention), and — unlike q90's double chain — the slope's
    * numerator n·Σtv−Σt·Σv and denominator n·Σtt−Σt² are computed in
    * DECIMAL(38,0), exact at any SF (the int64 cross-products overflow
    * near sf1); only the final single division is float, rounded to 9
    * digits. Zero time-variance → NULL slope. One map-combined
    * aggregate over the scan; output rows = #groups.
    *
    * Pre-2024 timestamps are excluded by contract: t must be
    * non-negative so `div`-truncation equals floor in both engines
    * (negative integer division truncates toward zero in Spark but the
    * fixture's injected pre-1970 edge rows would floor in the
    * quantization — the q78/q85 whole-unit lesson). */
  def groupTrend(s: SparkSession, dir: String): DataFrame =
    groupTrend(Tables.events(s, dir))

  def groupTrend(events: DataFrame): DataFrame = {
    val e = events
      .filter(col("value").isNotNull && col("ts").isNotNull &&
        col("ts") >= to_timestamp(lit("2024-01-01")))
      .select(col("event_type"),
        expr("(unix_micros(ts) - unix_micros(timestamp'2024-01-01 00:00:00')) div 3600000000")
          .as("t"),
        floor(col("value") * 1e3).cast("long").as("v"))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("t")).as("st"), sum(col("v")).as("sv"),
        sum(col("t") * col("t")).as("stt"), sum(col("t") * col("v")).as("stv"))
      .withColumn("num", d38(col("n")) * d38(col("stv")) - d38(col("st")) * d38(col("sv")))
      .withColumn("den", d38(col("n")) * d38(col("stt")) - d38(col("st")) * d38(col("st")))
      .select(col("event_type"), col("n"), col("st"), col("sv"),
        col("stt"), col("stv"),
        round(col("num").cast("double") /
          when(col("den") === 0, lit(null)).otherwise(col("den")).cast("double"), 9)
          .as("slope_r"))
      .orderBy(col("event_type").asc_nulls_last)
  }

  /** q146 oracle: identical quantization, exact decimal cross-products,
    * one rounded division. */
  def groupTrendOracleSql: String =
    """WITH e AS (SELECT event_type,
      |  (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 3600000000 AS t,
      |  CAST(FLOOR(value * 1e3) AS BIGINT) AS v
      | FROM events
      | WHERE value IS NOT NULL AND ts IS NOT NULL
      |   AND ts >= TIMESTAMP '2024-01-01 00:00:00'),
      |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(v) AS BIGINT) AS sv,
      |  CAST(SUM(t * t) AS BIGINT) AS stt, CAST(SUM(t * v) AS BIGINT) AS stv
      | FROM e GROUP BY event_type),
      |d AS (SELECT *,
      |  CAST(n AS DECIMAL(38,0)) * CAST(stv AS DECIMAL(38,0))
      |    - CAST(st AS DECIMAL(38,0)) * CAST(sv AS DECIMAL(38,0)) AS num,
      |  CAST(n AS DECIMAL(38,0)) * CAST(stt AS DECIMAL(38,0))
      |    - CAST(st AS DECIMAL(38,0)) * CAST(st AS DECIMAL(38,0)) AS den
      | FROM m)
      |SELECT event_type, n, st, sv, stt, stv,
      |  ROUND(CAST(CAST(num AS VARCHAR) AS DOUBLE) /
      |    CAST(CAST(CASE WHEN den = 0 THEN NULL ELSE den END AS VARCHAR) AS DOUBLE), 9) AS slope_r
      |FROM d ORDER BY event_type""".stripMargin

  /** q90 oracle: identical quantization, exact moments, float chain. */
  def groupCorrOracleSql: String =
    """WITH e AS (SELECT event_type,
      |  CAST(FLOOR(value * 1e3) AS BIGINT) AS x,
      |  CAST(TRY_CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS INTEGER) AS BIGINT) AS y
      | FROM events
      | WHERE value IS NOT NULL
      |   AND TRY_CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS INTEGER) IS NOT NULL),
      |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |  CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
      |  CAST(SUM(x * y) AS BIGINT) AS sxy
      | FROM e GROUP BY event_type),
      |d AS (SELECT *,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) AS num,
      |  sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS den
      | FROM m)
      |SELECT event_type, n, sx, sy, sxx, syy, sxy,
      |  ROUND(num / NULLIF(den, 0.0e0), 6) AS corr_r
      |FROM d ORDER BY event_type""".stripMargin

  /** q91: fixed-width value histogram per event_type (width 50) — the
    * distribution panel behind q51's quantiles and q77's clamp bounds,
    * as one map-combined count/sum aggregate whose output is
    * #groups × #occupied buckets. Bucket = floor(value/50): integer,
    * engine-identical; per-bucket micro-sums stay exact integers. */
  def valueHistogram(s: SparkSession, dir: String): DataFrame =
    valueHistogram(Tables.events(s, dir))

  def valueHistogram(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") / lit(50.0)).cast("long").as("bucket"),
        floor(col("value") * 1e6).cast("long").as("vm"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("vm")).as("sum_micro"))
      .orderBy("event_type", "bucket")

  /** q91 oracle. */
  def valueHistogramOracleSql: String =
    """SELECT event_type, CAST(FLOOR(value / 50.0e0) AS BIGINT) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS BIGINT) AS sum_micro
      |FROM events WHERE value IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q92: CUBE over the document facets — all four grouping combinations
    * of (lang, source) in one pass (q08 is the ROLLUP half of this):
    * the dashboard's facet-count matrix. Data NULLs are normalized to ''
    * BEFORE the cube so they stay distinguishable from the cube's own
    * subtotal NULLs — the standard disambiguation trap with nullable
    * facet columns.
    *
    * Scale notes: Catalyst plans CUBE as one Expand (×4 streams) + one
    * map-combined agg; output is facet-cardinality-sized. */
  def facetCube(s: SparkSession, dir: String): DataFrame =
    facetCube(Tables.documents(s, dir))

  def facetCube(docs: DataFrame): DataFrame =
    docs.select(coalesce(col("lang"), lit("")).as("lang"),
        coalesce(col("source"), lit("")).as("source"), col("n_chars"))
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(asc_nulls_first("lang"), asc_nulls_first("source"))

  /** q94: top-source gate — keep only documents from each language's
    * top-3 sources (q83's heavy hitters), the "trusted high-volume
    * sources" corpus-selection rule. The gate table is output-sized, so
    * the semi join broadcasts and the corpus side never shuffles —
    * corpus selection as a runtime filter, the q70 bloom pattern with
    * an exact list. */
  def sourceGate(s: SparkSession, dir: String): DataFrame =
    sourceGate(Tables.documents(s, dir))

  def sourceGate(docs: DataFrame): DataFrame = {
    val top = heavyHitters(docs).select(col("lang"), col("source"))
    docs.select(col("doc_id"), coalesce(col("lang"), lit("")).as("lang"),
        coalesce(col("source"), lit("")).as("source"))
      .join(broadcast(top), Seq("lang", "source"), "left_semi")
      .orderBy("doc_id")
  }

  /** q115: correlated-scalar-subquery decorrelation (TPC-H Q17 shape —
    * "revenue hiding in below-average-quantity lines"): lineitems whose
    * quantity is under 20 % of their part's average, aggregated per
    * brand. The correlated subquery (`avg(l_quantity) of the same
    * part`) decorrelates into ONE per-part aggregate joined back to
    * the fact — the rewrite Catalyst applies to scalar subqueries,
    * written out explicitly; the oracle keeps the CORRELATED form, so
    * the gate proves rewrite ≡ original.
    *
    * Exactness: quantities are integral, so `qty < 0.2·avg` is
    * evaluated as `qty·5·cnt < sum` — pure int64 arithmetic, no float
    * threshold both engines could round differently. Revenue follows
    * the q01 DECIMAL convention.
    *
    * Scale notes: two shuffles of lineitem on l_partkey (the agg and
    * the join — AQE merges them into one exchange reuse), part joins
    * broadcast; never a per-row subquery. */
  def belowAvgRevenue(s: SparkSession, dir: String): DataFrame =
    belowAvgRevenue(Tables.lineitem(s, dir), Tables.part(s, dir))

  def belowAvgRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val li = lineitem
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        col("l_extendedprice"))
    val stats = li.groupBy(col("l_partkey"))
      .agg(sum(col("qty")).as("sq"), count(lit(1)).as("cq"))
    val p = part.select(col("p_partkey"), col("p_brand"))
    li.join(stats, Seq("l_partkey"))
      .where(col("qty") * lit(5L) * col("cq") < col("sq"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        sum(dec(col("l_extendedprice"))).cast("double").as("revenue"))
      .orderBy("p_brand")
  }

  val belowAvgRevenueOracleSql: String =
    """SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem l JOIN part ON p_partkey = l_partkey
      |WHERE CAST(l_quantity AS BIGINT) * 5 *
      |    (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
      |  < (SELECT SUM(CAST(l_quantity AS BIGINT)) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** q116: EXISTS / NOT-EXISTS chain decorrelation (TPC-H Q21 shape —
    * "the supplier who alone held up a multi-supplier order"): per
    * supplier, count orders where it had a returned line, at least one
    * OTHER supplier participated (EXISTS), and NO other supplier had a
    * returned line (NOT EXISTS). The classic plan is three self-joins
    * of the fact; here both existential tests decorrelate into ONE
    * per-order aggregate (distinct-supplier count, distinct-late
    * count, the lone late supplier id) — lineitem shuffles once by
    * order key, and the oracle keeps the correlated EXISTS form.
    *
    * Counted per ORDER (distinct order-supplier), so a supplier with
    * several returned lines in one order counts once. */
  def loneLateSupplier(s: SparkSession, dir: String): DataFrame =
    loneLateSupplier(Tables.lineitem(s, dir), Tables.supplier(s, dir))

  def loneLateSupplier(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    // Round 12 (the 7× sf10 growth attribution): the two-countDistinct
    // formulation compiled to an Expand that TRIPLED the fact scan into
    // a high-cardinality partial aggregate — 180M expanded rows whose
    // (orderkey, gid, suppkey) keys barely combine map-side, then two
    // more aggregate exchanges (36 s at sf10). Pre-deduping to
    // (order, supplier) pairs needs no Expand, and ONE raw repartition
    // on the order key serves both aggregates: hash(l_orderkey)
    // clusters (l_orderkey, l_suppkey) groups too, so the pair dedup
    // and the per-order rollup are in-partition — one exchange of 60M
    // slim rows total. count(col) (non-null) mirrors countDistinct's
    // null handling; max(late) over a pair is "any late line".
    val pairs = lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_returnflag") === "R").as("late"))
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("late_any"))
    val perOrder = pairs.groupBy(col("l_orderkey"))
      .agg(count(col("l_suppkey")).as("n_supp"),
        count(when(col("late_any"), col("l_suppkey"))).as("n_late"),
        min(when(col("late_any"), col("l_suppkey"))).as("late_supp"))
      .where(col("n_supp") > 1 && col("n_late") === 1)
    val sup = supplier.select(col("s_suppkey"), col("s_name"))
    perOrder.groupBy(col("late_supp"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(sup), col("late_supp") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  val loneLateSupplierOracleSql: String =
    """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R') l1
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_returnflag = 'R')
      |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin

  /** q123: argmax over an aggregated view, ties kept (TPC-H Q15 shape —
    * "the top-revenue supplier(s) of the quarter"). The view is the
    * per-supplier revenue aggregate over a fixed ship-date window; the
    * answer is every supplier whose revenue EQUALS the view's max. The
    * max is a 1-row aggregate of the (tiny, supplier-sized) view,
    * broadcast back as a cross join — never a per-row subquery, never a
    * whole-view window sort. Revenue follows the q01/q02 DECIMAL
    * convention, so the equality compare is exact in both engines (a
    * float-summed revenue could tie in one engine and not the other).
    * Oracle keeps the scalar-subquery form, proving the decorrelation. */
  def topSupplier(s: SparkSession, dir: String): DataFrame =
    topSupplier(Tables.lineitem(s, dir), Tables.supplier(s, dir))

  def topSupplier(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit("2000-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("2000-07-01")))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(12,4)") - dec(col("l_discount")))).as("rev_dec"))
    val top = rev.agg(max(col("rev_dec")).as("max_rev"))
    rev.join(broadcast(top)).where(col("rev_dec") === col("max_rev"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_dec").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  val topSupplierOracleSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey AS s_suppkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS rev_dec
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '2000-07-01 00:00:00'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS total_revenue
      |FROM rev JOIN supplier USING (s_suppkey)
      |WHERE rev_dec = (SELECT MAX(rev_dec) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** q124: group share vs a global total (TPC-H Q11 shape — "nations
    * holding an outsized share of supplier capital"): nations whose
    * supplier account-balance sum exceeds 1/20 of the corpus-wide sum.
    * The global total is ONE 1-row aggregate broadcast back over the
    * 25-row nation aggregate; the threshold compare is
    * `v·20 > total` in exact DECIMAL, no float fraction both engines
    * could round differently. Oracle keeps the scalar-subquery form.
    * At 100 TB the same plan holds: two map-combined aggs over the
    * supplier scan, a 1-row broadcast, zero extra shuffles. */
  def nationConcentration(s: SparkSession, dir: String): DataFrame =
    nationConcentration(Tables.supplier(s, dir), Tables.nation(s, dir))

  def nationConcentration(supplier: DataFrame, nation: DataFrame): DataFrame = {
    val perNation = supplier.groupBy(col("s_nationkey"))
      .agg(sum(dec(col("s_acctbal"))).as("v_dec"), count(lit(1)).as("n_supp"))
    val total = supplier.agg(sum(dec(col("s_acctbal"))).as("t_dec"))
    perNation.join(broadcast(total))
      .where(col("v_dec") * lit(20) > col("t_dec"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("n_supp"),
        col("v_dec").cast("double").as("acctbal_sum"))
      .orderBy(col("acctbal_sum").desc, col("n_name"))
  }

  val nationConcentrationOracleSql: String =
    """SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_supp,
      |  CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS acctbal_sum
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name
      |HAVING SUM(CAST(s_acctbal AS DECIMAL(12,4))) * 20 >
      |  (SELECT SUM(CAST(s_acctbal AS DECIMAL(12,4))) FROM supplier)
      |ORDER BY acctbal_sum DESC, n_name""".stripMargin

  /** q125: IN-subquery on a HAVING aggregate (TPC-H Q18 shape — "large
    * volume orders"): orders whose lineitem quantity total exceeds 250,
    * with their customer. The IN-set decorrelates into the per-order
    * quantity aggregate joined straight back to orders (the aggregate
    * IS the probe side, no separate semi-join pass); quantities are
    * integral so the threshold is pure int64. Customer joins on the
    * shuffled order side — at 100 TB both sides shuffle on their keys
    * once, and AQE reuses the lineitem exchange between agg and join. */
  def bigOrders(s: SparkSession, dir: String): DataFrame =
    bigOrders(Tables.lineitem(s, dir), Tables.orders(s, dir), Tables.customer(s, dir))

  def bigOrders(lineitem: DataFrame, orders: DataFrame, customer: DataFrame): DataFrame = {
    val qty = lineitem.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .where(col("total_qty") > 250L)
    orders.join(qty, col("o_orderkey") === col("l_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
  }

  val bigOrdersOracleSql: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, total_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |      FROM lineitem GROUP BY 1) q ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                     GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
      |ORDER BY total_qty DESC, o_orderkey""".stripMargin

  /** q126: anti-join + above-global-average filter (TPC-H Q22 shape —
    * "well-funded customers gone quiet"): customers whose balance beats
    * the positive-balance average and who placed NO order in 2001+.
    * The global average decorrelates into a 1-row (sum, count)
    * aggregate broadcast back, and `bal > sum/cnt` is evaluated as
    * `bal_µ·cnt > sum_µ` over micro-unit int64 (a float division both
    * engines could round differently never happens); the NOT EXISTS is
    * a left-anti join against the date-filtered orders — the filter
    * pushes to the orders scan, so the anti side is small. Aggregated
    * per market segment like Q22's per-country rollup. */
  def dormantCustomers(s: SparkSession, dir: String): DataFrame =
    dormantCustomers(Tables.customer(s, dir), Tables.orders(s, dir))

  def dormantCustomers(customer: DataFrame, orders: DataFrame): DataFrame = {
    val cust = customer.select(col("c_custkey"), col("c_mktsegment"),
      (dec(col("c_acctbal")) * lit(10000)).cast("long").as("bal_mu"))
    val stats = cust.where(col("bal_mu") > 0L)
      .agg(sum(col("bal_mu")).as("sum_mu"), count(lit(1)).as("n_pos"))
    val recent = orders
      .filter(col("o_orderdate") >= to_timestamp(lit("2001-01-01")))
      .select(col("o_custkey"))
    cust.join(broadcast(stats))
      .where(col("bal_mu") * col("n_pos") > col("sum_mu"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_custs"),
        sum(col("bal_mu")).as("acctbal_mu"))
      .orderBy("c_mktsegment")
  }

  val dormantCustomersOracleSql: String =
    """WITH cust AS (
      |  SELECT c_custkey, c_mktsegment,
      |    CAST(CAST(c_acctbal AS DECIMAL(12,4)) * 10000 AS BIGINT) AS bal_mu
      |  FROM customer)
      |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_custs,
      |  CAST(SUM(bal_mu) AS BIGINT) AS acctbal_mu
      |FROM cust c
      |WHERE bal_mu * (SELECT COUNT(*) FROM cust WHERE bal_mu > 0)
      |      > (SELECT SUM(bal_mu) FROM cust WHERE bal_mu > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |      AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q127: per-group share dominance (TPC-H Q20 family — "the supplier
    * that owns a part's volume"): for every (part, supplier), flag
    * shipments exceeding 2× the part's average per-supplier share
    * (`q·n_supp > 2·total`, pure int64 — the correlated per-part
    * subqueries decorrelate into one per-part aggregate joined back),
    * then count dominated parts per supplier. Both aggregates shuffle
    * lineitem on l_partkey once (AQE reuses the exchange); the
    * supplier name join is a broadcast. */
  def dominantSupplier(s: SparkSession, dir: String): DataFrame =
    dominantSupplier(Tables.lineitem(s, dir), Tables.supplier(s, dir))

  def dominantSupplier(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    // Round 12 (same family as q116's growth fix): the per-part rollup
    // derives FROM the pair aggregate instead of re-scanning the fact
    // table — sum of pair sums is the part total, and counting the
    // (already-distinct) non-null supplier groups replaces the
    // countDistinct whose Expand doubled the second scan. One
    // repartition on the part key serves the pair aggregate, the
    // derived rollup, AND the pair⋈part join's left side.
    val perPair = lineitem.select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("qty"))
      .repartition(col("l_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("qty")).as("q"))
    val perPart = perPair.groupBy(col("l_partkey"))
      .agg(sum(col("q")).as("t"), count(col("l_suppkey")).as("ns"))
    perPair.join(perPart, Seq("l_partkey"))
      .where(col("q") * col("ns") > col("t") * lit(2L))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_dominated"), sum(col("q")).as("qty_sum"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("n_dominated"), col("qty_sum"))
      .orderBy(col("n_dominated").desc, col("s_name"))
  }

  val dominantSupplierOracleSql: String =
    """WITH pair AS (
      |  SELECT l_partkey, l_suppkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_dominated,
      |  CAST(SUM(q) AS BIGINT) AS qty_sum
      |FROM pair p JOIN supplier ON s_suppkey = p.l_suppkey
      |WHERE p.q * (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem l2
      |             WHERE l2.l_partkey = p.l_partkey)
      |      > 2 * (SELECT SUM(CAST(l_quantity AS BIGINT)) FROM lineitem l2
      |             WHERE l2.l_partkey = p.l_partkey)
      |GROUP BY s_name ORDER BY n_dominated DESC, s_name""".stripMargin

  /** q136: nation-to-nation trade volume (TPC-H Q7 shape) — revenue
    * flowing between two named nations per ship year, both directions.
    * The scale-critical move is FILTER-EARLY: supplier and customer are
    * each pre-filtered to the two target nations via a broadcast of the
    * 2-row nation slice BEFORE touching the fact table, so the
    * lineitem⋈supplier and orders⋈customer joins run against 2/25 of
    * the dimension rows and AQE sees small enough sides to broadcast —
    * the naive shape (join everything, filter the nation pair at the
    * end) drags the full fact join tree through the shuffle first.
    * Revenue in exact DECIMAL per the q01 convention. */
  def tradeVolume(s: SparkSession, dir: String): DataFrame =
    tradeVolume(Tables.lineitem(s, dir), Tables.orders(s, dir),
      Tables.customer(s, dir), Tables.supplier(s, dir), Tables.nation(s, dir))

  def tradeVolume(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, nation: DataFrame): DataFrame = {
    val pair = Seq("NATION_1", "NATION_2")
    val nations = nation.filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey"), col("n_name"))
    val sup = supplier.select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = customer.select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(12,4)") - dec(col("l_discount")))).as("rev_dec"))
      .select(col("supp_nation"), col("cust_nation"), col("l_year"),
        col("rev_dec").cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val tradeVolumeOracleSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
      |    (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation n1 ON n1.n_nationkey = s_nationkey
      |JOIN nation n2 ON n2.n_nationkey = c_nationkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |  AND n1.n_name IN ('NATION_1', 'NATION_2')
      |  AND n2.n_name IN ('NATION_1', 'NATION_2')
      |  AND n1.n_name <> n2.n_name
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** q137: regional market share of one supplier nation (TPC-H Q8
    * shape) — for customers in ASIA, per order year: total revenue and
    * the slice supplied by NATION_2. The share division is deliberately
    * NOT computed (a cross-engine float division); both the numerator
    * and denominator ship as exact DECIMAL sums and the consumer divides.
    * One pass: the nation marker rides the supplier dimension into a
    * conditional aggregate — never two scans (one per sum) of the fact
    * table. Region filter pre-shrinks customer via the broadcast
    * nation⋈region slice exactly like q136's filter-early move. */
  def marketShare(s: SparkSession, dir: String): DataFrame =
    marketShare(Tables.lineitem(s, dir), Tables.orders(s, dir),
      Tables.customer(s, dir), Tables.supplier(s, dir), Tables.nation(s, dir),
      Tables.region(s, dir))

  def marketShare(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = {
    val asiaNations = nation
      .join(broadcast(region.filter(col("r_name") === "ASIA")
        .select(col("r_regionkey"))), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = customer.select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val sup = supplier.select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), (col("n_name") === "NATION_2").as("is_target"))
    val rev = dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(12,4)") - dec(col("l_discount")))
    lineitem
      .join(orders.filter(col("o_orderdate") >= to_timestamp(lit("1995-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01")))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(rev).cast("double").as("rev_total"),
        sum(when(col("is_target"), rev).otherwise(lit(0).cast("decimal(12,4)")))
          .cast("double").as("rev_nation"))
      .orderBy("o_year")
  }

  val marketShareOracleSql: String =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
      |    (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE) AS rev_total,
      |  CAST(CAST(SUM(CASE WHEN ns.n_name = 'NATION_2'
      |    THEN CAST(l_extendedprice AS DECIMAL(12,4)) *
      |      (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))
      |    ELSE CAST(0 AS DECIMAL(12,4)) END) AS VARCHAR) AS DOUBLE) AS rev_nation
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation nc ON nc.n_nationkey = c_nationkey
      |JOIN region ON r_regionkey = nc.n_regionkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ns ON ns.n_nationkey = s_nationkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q12: conditional (pivot-style) aggregation per entity. */
  def conditionalAgg(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_click"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_view"),
        sum(when(col("event_type") === "purchase", col("value").cast("decimal(20,4)"))
          .otherwise(lit(0).cast("decimal(20,4)"))).cast("double").as("purchase_value"))
      .orderBy("user_id")
  }

  /** q161: per-priority PARETO FRONT (skyline, Börzsönyi et al. 2001
    * "The Skyline Operator") over orders, maximizing (o_totalprice,
    * o_orderdate) — the non-dominated set: no other order in the
    * priority class has ≥ both coordinates with > in one. The
    * multi-objective "best tradeoffs" query relational engines lack as
    * a primitive.
    *
    * Algorithm: duplicates collapse to distinct (price, date) points
    * first (identical points never dominate each other — both survive
    * as one row with its multiplicity); then, ordered by (price desc,
    * date desc), a point survives iff every STRICTLY-PRECEDING point
    * has a smaller date — i.e. the running MAX(date) over the
    * preceding frame is < its date. Preceding points have (price,
    * date) lexicographically greater, so a preceding max-date ≥ d
    * means some point with price ≥ p and date ≥ d and one coordinate
    * strictly greater — the dominance definition exactly.
    *
    * Scale notes: the dedup is one map-combined aggregate to the
    * distinct-point table, the window runs over THAT (points ≪ rows
    * when values repeat); the 2-D sort-scan replaces the naive O(n²)
    * dominance join (the spec proves equality against that naive
    * filter). Groups are priority classes — reducer-bounded only by
    * distinct points per class; for an unbounded group the same
    * running-max decomposes through the q143 range-bucket trick. */
  def paretoFront(s: SparkSession, dir: String): DataFrame =
    paretoFront(Tables.orders(s, dir))

  def paretoFront(orders: DataFrame): DataFrame = {
    val pts = orders
      .filter(col("o_orderpriority").isNotNull && col("o_totalprice").isNotNull &&
        col("o_orderdate").isNotNull)
      .groupBy(col("o_orderpriority"), col("o_totalprice"), col("o_orderdate"))
      .agg(count(lit(1)).as("n_orders"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    pts.withColumn("dmax", max(col("o_orderdate")).over(w))
      .filter(col("dmax").isNull || col("dmax") < col("o_orderdate"))
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderdate"),
        col("n_orders"))
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderdate"))
  }

  /** q161 oracle: the same sort-scan in DuckDB's window engine (the
    * NAIVE quadratic dominance filter is the SPEC's job — AnalyticsSpec
    * proves engine ≡ brute force on a planted front; a correlated
    * NOT EXISTS over sf1's point count would be oracle-side O(n²)). */
  val paretoFrontOracleSql: String =
    """WITH pts AS (SELECT o_orderpriority, o_totalprice, o_orderdate,
      |    CAST(COUNT(*) AS BIGINT) AS n_orders
      |  FROM orders
      |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
      |    AND o_orderdate IS NOT NULL
      |  GROUP BY 1, 2, 3),
      |sc AS (SELECT *, MAX(o_orderdate) OVER (
      |    PARTITION BY o_orderpriority
      |    ORDER BY o_totalprice DESC, o_orderdate DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS dmax
      |  FROM pts)
      |SELECT o_orderpriority, o_totalprice, o_orderdate, n_orders
      |FROM sc WHERE dmax IS NULL OR dmax < o_orderdate
      |ORDER BY o_orderpriority, o_totalprice DESC, o_orderdate""".stripMargin

  /** q164: Welch two-sample t-test per event_type — the A/B readout every
    * data-driven rollout ends in (the reference surfaces per-facet metric
    * panels, streamlit/app/app.py:84-140; an experimentation readout is
    * those panels with a significance column). Deterministic hash split:
    * even user_id = control, odd = treatment; metric = event value.
    * Emits group sizes, group means, the Welch t statistic (unequal
    * variances — the safe default, never pooled), and the
    * Welch–Satterthwaite degrees of freedom.
    *
    * Engine-exact: values integerize to milli (q90's floor·10³), per-arm
    * (n, Σx, Σx²) are exact BIGINT aggregates, and the t/dof chain is a
    * fixed-order IEEE double expression over those integers, mirrored
    * token-for-token in the oracle; zero-variance arms yield NULL t (not
    * NaN) like q90, and arms need n ≥ 2. Non-negative user_id enforced so
    * `%` and `pmod` agree (the q139 trap).
    *
    * Scale notes: ONE map-combined aggregation over events (conditional
    * sums fold both arms in the same combiner) — output is |event_type|
    * rows; nothing else shuffles. At 100 TB this is the textbook
    * partial-agg pattern: 6 long counters per (partition, type). */
  def abWelch(s: SparkSession, dir: String): DataFrame =
    abWelch(Tables.events(s, dir))

  def abWelch(events: DataFrame): DataFrame = {
    def d(c: Column) = c.cast("double")
    val e = events
      .filter(col("event_type").isNotNull && col("value").isNotNull &&
        col("user_id").isNotNull && col("user_id") >= 0L)
      .select(col("event_type"), pmod(col("user_id"), lit(2L)).as("arm"),
        floor(col("value") * 1e3).cast("long").as("x"))
    val g = e.groupBy(col("event_type")).agg(
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("nc"),
      sum(when(col("arm") === 0L, col("x")).otherwise(0L)).as("sc1"),
      sum(when(col("arm") === 0L, col("x") * col("x")).otherwise(0L)).as("sc2"),
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("nt"),
      sum(when(col("arm") === 1L, col("x")).otherwise(0L)).as("st1"),
      sum(when(col("arm") === 1L, col("x") * col("x")).otherwise(0L)).as("st2"))
      .filter(col("nc") >= 2L && col("nt") >= 2L)
    val vc = (d(col("nc")) * d(col("sc2")) - d(col("sc1")) * d(col("sc1"))) /
      (d(col("nc")) * (d(col("nc")) - lit(1.0)))
    val vt = (d(col("nt")) * d(col("st2")) - d(col("st1")) * d(col("st1"))) /
      (d(col("nt")) * (d(col("nt")) - lit(1.0)))
    g.withColumn("se2", vc / d(col("nc")) + vt / d(col("nt")))
      .withColumn("t_welch_r",
        round((d(col("st1")) / d(col("nt")) - d(col("sc1")) / d(col("nc"))) /
          when(sqrt(col("se2")) === 0.0, lit(null)).otherwise(sqrt(col("se2"))), 6))
      .withColumn("dof_r",
        round(col("se2") * col("se2") /
          when((vc / d(col("nc"))) * (vc / d(col("nc"))) / (d(col("nc")) - lit(1.0))
              + (vt / d(col("nt"))) * (vt / d(col("nt"))) / (d(col("nt")) - lit(1.0)) === 0.0,
            lit(null))
            .otherwise((vc / d(col("nc"))) * (vc / d(col("nc"))) / (d(col("nc")) - lit(1.0))
              + (vt / d(col("nt"))) * (vt / d(col("nt"))) / (d(col("nt")) - lit(1.0))), 6))
      .select(col("event_type"), col("nc"), col("nt"),
        round(d(col("sc1")) / d(col("nc")) / lit(1000.0), 6).as("mean_c_r"),
        round(d(col("st1")) / d(col("nt")) / lit(1000.0), 6).as("mean_t_r"),
        col("t_welch_r"), col("dof_r"))
      .orderBy(col("event_type"))
  }

  /** q170: RFM (recency / frequency / monetary) user segmentation — the
    * canonical audience-analytics operator (Hughes 1994): per user,
    * days-since-last-event, event count, and milli-exact value total,
    * each cut into explicit equal-frequency quintiles, plus the standard
    * marketing segment labels. The reference's dashboard profiles
    * per-user annotation activity (streamlit/app/app.py:84-140); RFM is
    * that profile made actionable.
    *
    * Engine-exact: all three metrics are integers (datediff days, count,
    * milli sum); quintiles are computed EXPLICITLY as
    * ((row_number−1)·5) DIV n + 1 over the total order (metric,
    * user_id) rather than NTILE, so no engine's tie-splitting nuance is
    * load-bearing; the segment CASE is ordered identically.
    *
    * Scale notes: one map-combined per-user rollup collapses the corpus
    * to |users| rows; the three quintile windows rank THAT rollup. Like
    * q81→q98, the unpartitioned rank window is the exactness baseline —
    * at 100 TB user counts, each score flips to q98's two-pass bucketed
    * cumulative rank (identical integers, no single-partition sort). */
  def rfmSegment(s: SparkSession, dir: String): DataFrame =
    rfmSegment(Tables.events(s, dir))

  def rfmSegment(events: DataFrame): DataFrame = {
    val per = events
      .filter(col("user_id").isNotNull && col("value").isNotNull &&
        col("ts").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        floor(col("value") * 1e3).cast("long").as("x"))
      .groupBy(col("user_id"))
      .agg(max(col("day")).as("last_day"), count(lit(1)).as("n_events"),
        sum(col("x")).as("m_milli"))
    val gmax = per.agg(max(col("last_day")).as("gmax"))
    val wR = Window.orderBy(col("recency_days"), col("user_id"))
    val wF = Window.orderBy(col("n_events").desc, col("user_id"))
    val wM = Window.orderBy(col("m_milli").desc, col("user_id"))
    val ranked = per.crossJoin(broadcast(gmax))
      .withColumn("recency_days", datediff(col("gmax"), col("last_day")).cast("long"))
      .withColumn("n_users", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("rn_r", row_number().over(wR).cast("long"))
      .withColumn("rn_f", row_number().over(wF).cast("long"))
      .withColumn("rn_m", row_number().over(wM).cast("long"))
      .withColumn("r_q", expr("((rn_r - 1) * 5) div n_users + 1"))
      .withColumn("f_q", expr("((rn_f - 1) * 5) div n_users + 1"))
      .withColumn("m_q", expr("((rn_m - 1) * 5) div n_users + 1"))
    ranked.select(col("user_id"), col("recency_days"), col("n_events"),
        round(col("m_milli").cast("double") / 1000.0, 6).as("monetary_r"),
        col("r_q"), col("f_q"), col("m_q"),
        when(col("r_q") === 1L && col("f_q") <= 2L && col("m_q") <= 2L, "champion")
          .when(col("r_q") >= 4L && col("f_q") <= 2L, "at_risk")
          .when(col("r_q") >= 4L && col("f_q") >= 4L, "lost")
          .when(col("r_q") === 1L && col("f_q") >= 4L, "new")
          .otherwise("regular").as("segment"))
      .orderBy("user_id")
  }

  /** q170 oracle: same rollup, explicit-quintile formula, and CASE. */
  def rfmSegmentOracleSql: String =
    """WITH per AS (SELECT user_id, MAX(CAST(ts AS DATE)) AS last_day,
      |    CAST(COUNT(*) AS BIGINT) AS n_events,
      |    CAST(SUM(CAST(FLOOR(value * 1e3) AS BIGINT)) AS BIGINT) AS m_milli
      |  FROM events
      |  WHERE user_id IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
      |  GROUP BY 1),
      |g AS (SELECT MAX(last_day) AS gmax FROM per),
      |r AS (SELECT per.*, CAST(date_diff('day', last_day, gmax) AS BIGINT) AS recency_days,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n_users,
      |    CAST(ROW_NUMBER() OVER (ORDER BY date_diff('day', last_day, gmax), user_id) AS BIGINT) AS rn_r,
      |    CAST(ROW_NUMBER() OVER (ORDER BY n_events DESC, user_id) AS BIGINT) AS rn_f,
      |    CAST(ROW_NUMBER() OVER (ORDER BY m_milli DESC, user_id) AS BIGINT) AS rn_m
      |  FROM per CROSS JOIN g),
      |q AS (SELECT *, ((rn_r - 1) * 5) // n_users + 1 AS r_q,
      |    ((rn_f - 1) * 5) // n_users + 1 AS f_q,
      |    ((rn_m - 1) * 5) // n_users + 1 AS m_q
      |  FROM r)
      |SELECT user_id, recency_days, n_events,
      |  ROUND(CAST(m_milli AS DOUBLE) / 1000.0, 6) AS monetary_r,
      |  r_q, f_q, m_q,
      |  CASE WHEN r_q = 1 AND f_q <= 2 AND m_q <= 2 THEN 'champion'
      |    WHEN r_q >= 4 AND f_q <= 2 THEN 'at_risk'
      |    WHEN r_q >= 4 AND f_q >= 4 THEN 'lost'
      |    WHEN r_q = 1 AND f_q >= 4 THEN 'new'
      |    ELSE 'regular' END AS segment
      |FROM q ORDER BY user_id""".stripMargin

  /** q164 oracle: identical moments and the identical float chain. */
  def abWelchOracleSql: String =
    """WITH e AS (SELECT event_type, user_id % 2 AS arm,
      |    CAST(FLOOR(value * 1e3) AS BIGINT) AS x
      |  FROM events
      |  WHERE event_type IS NOT NULL AND value IS NOT NULL
      |    AND user_id IS NOT NULL AND user_id >= 0),
      |g AS (SELECT event_type,
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
      |    CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sc1,
      |    CAST(SUM(CASE WHEN arm = 0 THEN x * x ELSE 0 END) AS BIGINT) AS sc2,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
      |    CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS st1,
      |    CAST(SUM(CASE WHEN arm = 1 THEN x * x ELSE 0 END) AS BIGINT) AS st2
      |  FROM e GROUP BY 1
      |  HAVING SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) >= 2
      |     AND SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) >= 2),
      |v AS (SELECT *,
      |    (CAST(nc AS DOUBLE) * CAST(sc2 AS DOUBLE) - CAST(sc1 AS DOUBLE) * CAST(sc1 AS DOUBLE))
      |      / (CAST(nc AS DOUBLE) * (CAST(nc AS DOUBLE) - 1.0)) AS vc,
      |    (CAST(nt AS DOUBLE) * CAST(st2 AS DOUBLE) - CAST(st1 AS DOUBLE) * CAST(st1 AS DOUBLE))
      |      / (CAST(nt AS DOUBLE) * (CAST(nt AS DOUBLE) - 1.0)) AS vt
      |  FROM g),
      |s AS (SELECT *, vc / CAST(nc AS DOUBLE) + vt / CAST(nt AS DOUBLE) AS se2 FROM v)
      |SELECT event_type, nc, nt,
      |  ROUND(CAST(sc1 AS DOUBLE) / CAST(nc AS DOUBLE) / 1000.0, 6) AS mean_c_r,
      |  ROUND(CAST(st1 AS DOUBLE) / CAST(nt AS DOUBLE) / 1000.0, 6) AS mean_t_r,
      |  ROUND((CAST(st1 AS DOUBLE) / CAST(nt AS DOUBLE) - CAST(sc1 AS DOUBLE) / CAST(nc AS DOUBLE))
      |    / (CASE WHEN sqrt(se2) = 0.0 THEN NULL ELSE sqrt(se2) END), 6) AS t_welch_r,
      |  ROUND(se2 * se2 / (CASE WHEN
      |      (vc / CAST(nc AS DOUBLE)) * (vc / CAST(nc AS DOUBLE)) / (CAST(nc AS DOUBLE) - 1.0)
      |    + (vt / CAST(nt AS DOUBLE)) * (vt / CAST(nt AS DOUBLE)) / (CAST(nt AS DOUBLE) - 1.0) = 0.0
      |    THEN NULL ELSE
      |      (vc / CAST(nc AS DOUBLE)) * (vc / CAST(nc AS DOUBLE)) / (CAST(nc AS DOUBLE) - 1.0)
      |    + (vt / CAST(nt AS DOUBLE)) * (vt / CAST(nt AS DOUBLE)) / (CAST(nt AS DOUBLE) - 1.0)
      |    END), 6) AS dof_r
      |FROM s ORDER BY event_type""".stripMargin
}
