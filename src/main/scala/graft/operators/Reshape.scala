package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Wide↔long reshaping — pivot, unpivot, and custom grouping sets.
  *
  * The reference's dashboard renders exactly these shapes: the facet
  * panels (streamlit/app/app.py:84-130) are wide per-category columns of
  * one metric, and the per-record detail views melt a wide row back into
  * (field, value) pairs for display. Re-expressed Spark-first:
  * `RelationalGroupedDataset.pivot` with EXPLICIT values (never the
  * implicit form, which runs a distinct-collect job over the pivot
  * column before planning — a full extra scan at 100 TB),
  * `Dataset.unpivot` (a zero-shuffle narrow expand), and
  * `RelationalGroupedDataset.groupingSets` for the ad-hoc rollup combos
  * `cube`/`rollup` can't express without computing unwanted sets.
  */
object Reshape {

  /** Exact decimal view of a 2-dp money column (q01 convention). */
  private def dec(c: Column): Column = c.cast("decimal(12,4)")

  /** q132: pivot — monthly revenue split by order status, one wide row
    * per month. Pivot values are DECLARED (`Seq("F","O","P")`): Spark's
    * values-less overload first runs a separate distinct job on the
    * pivot column to discover them, which at 100 TB is a second full
    * scan and a nondeterministic column order; declaring them keeps the
    * plan to ONE map-combined hash aggregate (pivot compiles to
    * `sum(CASE WHEN status=v THEN p END)` per value — same shuffle as
    * any groupBy, #months × 3 output cells). Revenue sums run in exact
    * DECIMAL, cast to double only at the output edge. Rows with a
    * status outside the declared set (e.g. injected NULLs) fall in no
    * bucket — identical to the oracle's CASE WHEN arms. */
  def statusPivot(s: SparkSession, dir: String): DataFrame =
    statusPivot(Tables.orders(s, dir))

  def statusPivot(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderdate").isNotNull)
      .select(to_date(date_trunc("month", col("o_orderdate"))).as("order_month"),
        col("o_orderstatus"), dec(col("o_totalprice")).as("p"))
      .groupBy(col("order_month"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("p")))
      .select(col("order_month"),
        col("F").cast("double").as("rev_f"),
        col("O").cast("double").as("rev_o"),
        col("P").cast("double").as("rev_p"))
      .orderBy("order_month")

  val statusPivotOracleSql: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
      |  CAST(CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,4)) END) AS VARCHAR) AS DOUBLE) AS rev_f,
      |  CAST(CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,4)) END) AS VARCHAR) AS DOUBLE) AS rev_o,
      |  CAST(CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(12,4)) END) AS VARCHAR) AS DOUBLE) AS rev_p
      |FROM orders WHERE o_orderdate IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q133: unpivot (melt) — the per-nation supplier stat row goes from
    * wide (one column per metric) to long (metric, value) pairs, the
    * shape a generic display/export layer wants. `Dataset.unpivot` is a
    * NARROW operator — each input row expands to 4 output rows in place,
    * no shuffle, no join; the only exchange in the plan is the upstream
    * 25-row aggregate. All metrics share the double type (unpivot
    * requires a least-common value type; counts this small are exact in
    * a double). Value-NULL rows are KEPT (an all-NULL metric must
    * surface as a row, not vanish) — Spark's unpivot keeps them and the
    * oracle's UNION ALL form trivially does. */
  def nationMetricsUnpivot(s: SparkSession, dir: String): DataFrame =
    nationMetricsUnpivot(Tables.supplier(s, dir), Tables.nation(s, dir))

  def nationMetricsUnpivot(supplier: DataFrame, nation: DataFrame): DataFrame = {
    val wide = supplier
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).cast("double").as("n_supp"),
        sum(dec(col("s_acctbal"))).cast("double").as("bal_sum"),
        max(col("s_acctbal")).as("bal_max"),
        min(col("s_acctbal")).as("bal_min"))
    wide.unpivot(
        Array(col("n_name")),
        Array(col("n_supp"), col("bal_sum"), col("bal_max"), col("bal_min")),
        "metric", "value")
      .orderBy("n_name", "metric")
  }

  val nationMetricsUnpivotOracleSql: String =
    """WITH w AS (
      |  SELECT n_name,
      |    CAST(COUNT(*) AS DOUBLE) AS n_supp,
      |    CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS bal_sum,
      |    MAX(s_acctbal) AS bal_max,
      |    MIN(s_acctbal) AS bal_min
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY 1)
      |SELECT n_name, metric, value FROM (
      |  SELECT n_name, 'n_supp' AS metric, n_supp AS value FROM w
      |  UNION ALL SELECT n_name, 'bal_sum', bal_sum FROM w
      |  UNION ALL SELECT n_name, 'bal_max', bal_max FROM w
      |  UNION ALL SELECT n_name, 'bal_min', bal_min FROM w)
      |ORDER BY n_name NULLS FIRST, metric""".stripMargin

  /** q134: custom GROUPING SETS — the corpus facet report that wants
    * (source×lang), (lang), and the grand total but NOT the (source)
    * margin. `cube` would compute the unwanted set and force a
    * post-filter on grouping_id; `groupingSets` plans exactly the three
    * requested sets (Spark expands to one Expand + one hash aggregate —
    * 3 rows per input row into the same single shuffle a plain groupBy
    * pays; at 100 TB the Expand factor, not an extra scan, is the whole
    * cost). NULL facet values are COALESCE'd to '' BEFORE grouping (q92
    * convention) so data NULLs can't collide with the rolled-up-slot
    * NULLs; `gid = grouping(source)·2 + grouping(lang)` disambiguates
    * the sets portably (both engines compute the same bitmask). */
  def facetGroupingSets(s: SparkSession, dir: String): DataFrame =
    facetGroupingSets(Tables.documents(s, dir))

  def facetGroupingSets(documents: DataFrame): DataFrame = {
    val d = documents.select(
      coalesce(col("source"), lit("")).as("source"),
      coalesce(col("lang"), lit("")).as("lang"),
      col("n_chars"))
    d.groupingSets(
        Seq(Seq(col("source"), col("lang")), Seq(col("lang")), Seq.empty[Column]),
        col("source"), col("lang"))
      .agg((grouping(col("source")) * 2 + grouping(col("lang"))).cast("int").as("gid"),
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .select(col("source"), col("lang"), col("gid"), col("n_docs"), col("sum_chars"))
      .orderBy(col("gid"), col("source"), col("lang"))
  }

  val facetGroupingSetsOracleSql: String =
    """WITH d AS (SELECT COALESCE(source, '') AS source,
      |  COALESCE(lang, '') AS lang, n_chars FROM documents)
      |SELECT source, lang,
      |  CAST(GROUPING(source) * 2 + GROUPING(lang) AS INTEGER) AS gid,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM d GROUP BY GROUPING SETS ((source, lang), (lang), ())
      |ORDER BY gid, source, lang""".stripMargin
}
