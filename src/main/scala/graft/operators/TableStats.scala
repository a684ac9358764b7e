package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** ANALYZE-style per-column table statistics — the catalog profile a
  * cost-based optimizer, a data-quality monitor, or a partition planner
  * reads before touching the table (reference analog: the dataset
  * overview counts the dashboard renders before any facet drilldown,
  * app.py:84-104; the engine-side counterpart is Spark's own
  * `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`).
  *
  * For each profiled column: row count, NULL count, EXACT distinct
  * count, typed min/max (computed in the column's own type — a
  * lexicographic min over stringified integers would rank "9" above
  * "10" — then stringified for the uniform schema), and the HLL
  * register sketch (q74's dyadic-exact construction, keyed per column)
  * whose estimate sits beside the exact NDV as the built-in accuracy
  * check.
  *
  * Scale notes: two corpus scans, both map-combined — (1) ONE wide
  * aggregate computes every per-column null/min/max plus the exact
  * NDVs (Catalyst expands multi-distinct aggregates into one shuffle
  * of (gid, value) rows — the distinct-expand plan, not one job per
  * column) and reshapes its single output row to one row per column
  * with `stack`; (2) the (col, value) exploded frame folds to ≤ m
  * HLL registers per column. At 100 TB the exact-NDV arm is the one
  * you drop (the expand shuffle carries every distinct value); the
  * sketch arm IS the plan — registers merge by MAX across partitions,
  * days, or tables for free, which is why both are emitted side by
  * side here (q74's stance: the truth column validates the sketch at
  * gate scale and is the first thing a 100 TB profile omits).
  */
object TableStats {

  /** The profiled columns: name → stringify-safe typed column. BIGINT
    * and VARCHAR only — both engines print them identically (doubles
    * and timestamps stringify differently engine-to-engine, the same
    * reason q13's cleanse casts through canonical forms). */
  val ProfiledCols: Seq[String] =
    Seq("o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus")

  /** q201: per-column stats profile of the orders table. */
  def tableStats(s: SparkSession, dir: String): DataFrame =
    tableStats(Tables.orders(s, dir))

  def tableStats(df: DataFrame): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: ProfiledCols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nnull"),
        countDistinct(col(c)).as(s"${c}__ndv"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = ProfiledCols.map { c =>
      s"'$c', ${c}__nnull, ${c}__ndv, ${c}__min, ${c}__max"
    }.mkString(", ")
    val long = wide.select(col("n_rows"),
      expr(s"stack(${ProfiledCols.size}, $stackArgs) AS " +
        "(col_name, n_null, ndv, min_s, max_s)"))

    // Sketch arm: q74's register construction, keyed per column over the
    // one exploded (col_name, value-string) frame. NULLs carry no value
    // and are excluded (the per-column null count is exact above).
    val kv = ProfiledCols.flatMap(c => Seq(lit(c), col(c).cast("string")))
    val regs = df.select(explode(map(kv: _*)).as(Seq("col_name", "val_s")))
      .filter(col("val_s").isNotNull)
      .select(col("col_name"),
        TextAnalysis.md5Long(
          concat_ws(":", lit("st"), col("val_s"))).as("h"))
      .select(col("col_name"),
        col("h").bitwiseAND(lit(255L)).as("j"),
        expr("shiftright(h, 8) | CAST(2251799813685248 AS BIGINT)").as("x"))
      .select(col("col_name"), col("j"),
        expr("bit_count((x & -x) - 1) + 1").as("rank"))
      .groupBy(col("col_name"), col("j"))
      .agg(max(col("rank")).as("mj"))
    val sk = regs.groupBy(col("col_name"))
      .agg(count(lit(1)).as("nr"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${Hll.WBits} - mj AS INT))")).as("sp"))
      .select(col("col_name"), col("nr").cast("long").as("n_hll_regs"),
        (col("sp") + (lit(Hll.M.toLong) - col("nr")) * lit(Hll.Pow52)).as("hll_intsum"))

    long.join(sk, Seq("col_name"))
      .select(col("col_name"), col("n_rows"), col("n_null"), col("ndv"),
        col("min_s"), col("max_s"), col("n_hll_regs"), col("hll_intsum"),
        round(lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))
          * lit(65536.0) * lit(4.503599627370496e15)
          / col("hll_intsum").cast("double"), 3).as("est_r"))
      .orderBy(col("col_name"))
  }

  /** q201 oracle: typed per-column min/max blocks + the generic
    * stringified frame for null/NDV/HLL, same hash/rank/intsum. */
  def tableStatsOracleSql: String = {
    val valExprs = ProfiledCols.map(c =>
      s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS val_s FROM orders")
      .mkString("\n  UNION ALL ")
    val mmExprs = ProfiledCols.map(c =>
      s"SELECT '$c' AS col_name, CAST(MIN($c) AS VARCHAR) AS min_s, " +
      s"CAST(MAX($c) AS VARCHAR) AS max_s FROM orders")
      .mkString("\n  UNION ALL ")
    s"""WITH v AS ($valExprs),
       |mm AS ($mmExprs),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders),
       |st AS (SELECT col_name,
       |    CAST(SUM(CASE WHEN val_s IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       |    CAST(COUNT(DISTINCT val_s) AS BIGINT) AS ndv
       |  FROM v GROUP BY 1),
       |k AS (SELECT col_name,
       |    CAST(('0x' || substring(md5('st:' || val_s), 1, 15)) AS BIGINT) AS h
       |  FROM v WHERE val_s IS NOT NULL),
       |r AS (SELECT col_name, h & 255 AS j,
       |    bit_count((((h >> 8) | 2251799813685248) & -((h >> 8) | 2251799813685248)) - 1) + 1 AS rank
       |  FROM k),
       |m AS (SELECT col_name, j, MAX(rank) AS mj FROM r GROUP BY 1, 2),
       |sk AS (SELECT col_name, CAST(COUNT(*) AS BIGINT) AS n_hll_regs,
       |    CAST(SUM(CAST(1 AS BIGINT) << CAST(${Hll.WBits} - mj AS INTEGER)) AS BIGINT)
       |      + (${Hll.M} - COUNT(*)) * ${Hll.Pow52} AS hll_intsum
       |  FROM m GROUP BY 1)
       |SELECT st.col_name, n.n_rows, st.n_null, st.ndv, mm.min_s, mm.max_s,
       |  sk.n_hll_regs, sk.hll_intsum,
       |  ROUND(0.7213e0 / (1.0e0 + 1.079e0 / 256.0e0)
       |    * 65536.0e0 * 4503599627370496.0e0
       |    / CAST(sk.hll_intsum AS DOUBLE), 3) AS est_r
       |FROM st JOIN mm USING (col_name) JOIN sk USING (col_name) CROSS JOIN n
       |ORDER BY col_name""".stripMargin
  }
}
