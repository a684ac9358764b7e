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

    long.join(hllSketch(df), Seq("col_name"))
      .select(col("col_name"), col("n_rows"), col("n_null"), col("ndv"),
        col("min_s"), col("max_s"), col("n_hll_regs"), col("hll_intsum"),
        estRCol.as("est_r"))
      .orderBy(col("col_name"))
  }

  /** Sketch arm shared by q201 and q213: q74's register construction,
    * keyed per column over the one exploded (col_name, value-string)
    * frame. NULLs carry no value and are excluded (the per-column null
    * count is exact in both profiles). */
  private def hllSketch(df: DataFrame): DataFrame = {
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
    regs.groupBy(col("col_name"))
      .agg(count(lit(1)).as("nr"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${Hll.WBits} - mj AS INT))")).as("sp"))
      .select(col("col_name"), col("nr").cast("long").as("n_hll_regs"),
        (col("sp") + (lit(Hll.M.toLong) - col("nr")) * lit(Hll.Pow52)).as("hll_intsum"))
  }

  /** The HLL NDV estimate off `hll_intsum` — one fixed-order IEEE
    * expression, identical text in the oracle. */
  private def estRCol: Column =
    round(lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))
      * lit(65536.0) * lit(4.503599627370496e15)
      / col("hll_intsum").cast("double"), 3)

  /** q213: the 100 TB profile — q201's readout WITHOUT the exact-NDV
    * arm. The exact multi-distinct is the one piece of q201 whose
    * shuffle carries every distinct value through the Expand plan
    * (scan cost ×|cols|); dropping it leaves (1) ONE plain map-combined
    * wide aggregate for rows/nulls/min/max and (2) the register fold —
    * both flat in distinct-value volume. The NDV readout is the HLL
    * estimate (`est_r`), whose accuracy contract is AUDITED by q201's
    * exact arm at gate scale (the q74/q148 sketch-contract pattern:
    * the truth column is the first thing a 100 TB profile omits, so it
    * lives in the audit query, not the serving one). */
  def tableStatsSketch(s: SparkSession, dir: String): DataFrame =
    tableStatsSketch(Tables.orders(s, dir))

  def tableStatsSketch(df: DataFrame): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: ProfiledCols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nnull"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = ProfiledCols.map { c =>
      s"'$c', ${c}__nnull, ${c}__min, ${c}__max"
    }.mkString(", ")
    val long = wide.select(col("n_rows"),
      expr(s"stack(${ProfiledCols.size}, $stackArgs) AS " +
        "(col_name, n_null, min_s, max_s)"))
    long.join(hllSketch(df), Seq("col_name"))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("min_s"), col("max_s"), col("n_hll_regs"), col("hll_intsum"),
        estRCol.as("est_r"))
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

  /** q213 oracle: q201's replay without the exact-NDV column. */
  def tableStatsSketchOracleSql: String = {
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
       |    CAST(SUM(CASE WHEN val_s IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
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
       |SELECT st.col_name, n.n_rows, st.n_null, mm.min_s, mm.max_s,
       |  sk.n_hll_regs, sk.hll_intsum,
       |  ROUND(0.7213e0 / (1.0e0 + 1.079e0 / 256.0e0)
       |    * 65536.0e0 * 4503599627370496.0e0
       |    / CAST(sk.hll_intsum AS DOUBLE), 3) AS est_r
       |FROM st JOIN mm USING (col_name) JOIN sk USING (col_name) CROSS JOIN n
       |ORDER BY col_name""".stripMargin
  }

  /** Column pairs probed for functional dependency / correlation. The
    * (o_orderkey, o_custkey) pair plants a TRUE dependency (the key
    * determines everything); the other two probe real-world soft
    * correlation. */
  val FdPairs: Seq[(String, String)] = Seq(
    ("o_custkey", "o_orderstatus"),
    ("o_orderkey", "o_custkey"),
    ("o_orderpriority", "o_orderstatus"))

  /** q206: functional-dependency / correlated-columns audit — for each
    * probed column pair of `orders`, the three distinct counts a
    * cost-based optimizer combines cardinalities from: ndv(a), ndv(b),
    * ndv(a,b). fd(a→b) = ndv(a)/ndv(a,b) is 1.0 exactly when a
    * determines b (the FD-discovery readout; schema normalization and
    * denormalization-detection both start here); ndv(a,b)/(ndv(a)·ndv(b))
    * ≈ 1 means the columns are independent — the correction factor that
    * keeps a CBO from multiplying correlated selectivities (the classic
    * underestimation bug q201's per-column stats alone cannot see).
    *
    * Engine-exact: counts are exact BIGINTs on the pair's both-non-null
    * subset (explicitly filtered on BOTH engines — the two disagree on
    * NULL tuple distincts); each ratio is one identically-associated
    * division. Scale: ONE corpus scan — the pair list explodes to
    * (pair, a, b) rows and a single distinct-expand aggregate computes
    * every count (the q201 stance; the documented 100 TB swap is the
    * same aggregate over q74 HLL registers per pair element). */
  def fdAudit(s: SparkSession, dir: String): DataFrame =
    fdAudit(Tables.orders(s, dir))

  def fdAudit(df: DataFrame): DataFrame = {
    val arr = array(FdPairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(a).cast("string").as("a_s"), col(b).cast("string").as("b_s"))
    }: _*)
    df.select(explode(arr).as("p")).select(col("p.*"))
      .filter(col("a_s").isNotNull && col("b_s").isNotNull)
      .groupBy(col("col_a"), col("col_b"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("a_s")).as("ndv_a"),
        countDistinct(col("b_s")).as("ndv_b"),
        countDistinct(col("a_s"), col("b_s")).as("ndv_ab"))
      .select(col("col_a"), col("col_b"), col("n"),
        col("ndv_a"), col("ndv_b"), col("ndv_ab"),
        round(col("ndv_a").cast("double") / col("ndv_ab").cast("double"), 9)
          .as("fd_ab_r"),
        round(col("ndv_b").cast("double") / col("ndv_ab").cast("double"), 9)
          .as("fd_ba_r"),
        round(col("ndv_ab").cast("double") /
          (col("ndv_a").cast("double") * col("ndv_b").cast("double")), 9)
          .as("indep_r"))
      .orderBy(col("col_a"), col("col_b"))
  }

  /** q206 oracle: per-pair blocks on the both-non-null subset, row-value
    * distinct for the pair NDV. */
  def fdAuditOracleSql: String = {
    val blocks = FdPairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_a, '$b' AS col_b, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(DISTINCT CAST($a AS VARCHAR)) AS BIGINT) AS ndv_a,
         |  CAST(COUNT(DISTINCT CAST($b AS VARCHAR)) AS BIGINT) AS ndv_b,
         |  CAST(COUNT(DISTINCT (CAST($a AS VARCHAR), CAST($b AS VARCHAR))) AS BIGINT) AS ndv_ab
         |FROM orders WHERE $a IS NOT NULL AND $b IS NOT NULL""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH g AS ($blocks)
       |SELECT col_a, col_b, n, ndv_a, ndv_b, ndv_ab,
       |  ROUND(CAST(ndv_a AS DOUBLE) / CAST(ndv_ab AS DOUBLE), 9) AS fd_ab_r,
       |  ROUND(CAST(ndv_b AS DOUBLE) / CAST(ndv_ab AS DOUBLE), 9) AS fd_ba_r,
       |  ROUND(CAST(ndv_ab AS DOUBLE) /
       |    (CAST(ndv_a AS DOUBLE) * CAST(ndv_b AS DOUBLE)), 9) AS indep_r
       |FROM g ORDER BY col_a, col_b""".stripMargin
  }
}
