package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{ArtifactStore, Tables}

/** Bucketed (co-located) join layout — the one join strategy the
  * inventory still lacked: q03 broadcasts small dims, q53 salts skew,
  * but a large-×-large equi-join that RECURS (fact-to-fact, orders to
  * customer360, events to documents) should not pay its two-sided
  * shuffle on every run. Bucketing pays ONE layout shuffle at write
  * time — both tables hash-clustered into the same number of buckets on
  * the join key, bucket id burned into the file name — and every
  * subsequent join on that key reads co-located buckets with NO
  * Exchange on either side, Spark's files-on-disk equivalent of a
  * co-partitioned MPP table (the reference's Postgres serving store
  * gets the same effect from its custkey b-tree; curated_to_postgres.py
  * :66-75 is the write side of that trade).
  *
  * The layout is a build-once [[graft.ArtifactStore]] artifact: the
  * bucketed files are written through a staging catalog name into a
  * staging dir, atomically renamed, then every session (re-)attaches an
  * EXTERNAL bucketed table over the published files via
  * `CREATE TABLE … USING parquet CLUSTERED BY … LOCATION` — metadata is
  * session-scoped in the in-memory catalog, the bytes are shared, and
  * the fingerprinted name means a source-data change mints a new layout
  * instead of serving a stale one. Each side is `repartition(buckets,
  * key)` before the write: repartition and bucketing use the same
  * Murmur3 hash, so every task holds exactly one bucket's rows and each
  * bucket lands as ONE file (many files per bucket would cost a
  * per-bucket merge sort at read).
  *
  * Scale notes: the gated query (per-customer order rollup through the
  * bucketed join, grouped ON the bucket key) runs with ZERO Exchange
  * nodes — scan → zipped-bucket SortMergeJoin → partial+final agg all
  * inherit the bucket partitioning (PlanSpec pins this). At 100 TB the
  * layout shuffle amortizes across every consumer of the key; 16
  * buckets here is the local[32] fixture sizing — a cluster sizes
  * buckets to executor×core counts, the constant is one literal. */
object Bucketing {

  val Buckets = 16

  /** Layout version literal — bump to invalidate published layouts when
    * the bucketing scheme (count, sort, file shape) changes. */
  private val Version = "bk1"

  /** Ensure a bucketed copy of `df` exists in the warehouse and a
    * catalog table points at it; returns the attached table. */
  private def bucketedTable(s: SparkSession, base: String, fingerprint: String,
      df: => DataFrame, key: String): DataFrame = {
    val src = df
    val schemaDdl = src.schema.toDDL
    val path = ArtifactStore.ensureCurrent(s, s"${base}_$Version", fingerprint) {
      staging =>
        // UUID-suffixed staging name (mirroring ArtifactStore.ensure's
        // staging dirs): a deterministic name would let two concurrent
        // builders in one session race on DROP/saveAsTable of the same
        // catalog entry
        val tmpName = s"${base}_staging_${fingerprint.take(12)}_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        s.sql(s"DROP TABLE IF EXISTS $tmpName")
        src.repartition(Buckets, col(key))
          .write.bucketBy(Buckets, key).sortBy(key)
          .option("path", staging).saveAsTable(tmpName)
        // external table: DROP detaches the catalog entry, keeps the files
        s.sql(s"DROP TABLE IF EXISTS $tmpName")
    }
    // catalog name == artifact dir name: base_version_fingerprint
    val name = s"${base}_${Version}_$fingerprint"
    if (!s.catalog.tableExists(name))
      s.sql(s"""CREATE TABLE $name ($schemaDdl) USING parquet
               |CLUSTERED BY ($key) SORTED BY ($key) INTO $Buckets BUCKETS
               |LOCATION '$path'""".stripMargin)
    s.table(name)
  }

  /** q210: per-customer order rollup served THROUGH the bucketed layout
    * — orders and customer both bucketed by custkey, joined and
    * aggregated on the bucket key, end-to-end Exchange-free. */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val fp = Tables.dirFingerprint(s, dir)
    val orders = bucketedTable(s, "bucketed_orders", fp,
      Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
      "o_custkey")
    val customer = bucketedTable(s, "bucketed_customer", fp,
      Tables.customer(s, dir).select("c_custkey", "c_mktsegment"),
      "c_custkey")
    joinPlan(orders, customer)
  }

  /** The join+rollup itself, factored for plan assertions in PlanSpec. */
  private[graft] def joinPlan(orders: DataFrame, customer: DataFrame): DataFrame =
    orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,4)")).cast("double").as("revenue"))
      .orderBy("c_custkey")

  /** Test hook: the two attached bucketed tables for a dir. */
  private[graft] def tablesFor(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val fp = Tables.dirFingerprint(s, dir)
    (bucketedTable(s, "bucketed_orders", fp,
      Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
      "o_custkey"),
      bucketedTable(s, "bucketed_customer", fp,
        Tables.customer(s, dir).select("c_custkey", "c_mktsegment"),
        "c_custkey"))
  }

  /** q214: the layout generalization proof — a SECOND recurring join
    * shape (lineitem×orders, the TPC-H fact-to-fact spine) co-located
    * on a DIFFERENT key (the ORDER key; q210's pair clusters on the
    * customer key). Same artifact machinery, same zero-Exchange
    * contract (PlanSpec pins the join, the rollup on the bucket key,
    * AND the point-read bucket pruning — an o_orderkey = k probe reads
    * 1 of [[Buckets]] buckets off the file metadata alone). At 100 TB
    * lineitem×orders is THE join every mart query repays: one layout
    * shuffle at landing, zero on every read after. */
  def bucketedLineitemJoin(s: SparkSession, dir: String): DataFrame = {
    val (li, ord) = lineitemTablesFor(s, dir)
    lineitemJoinPlan(li, ord)
  }

  /** The q214 join+rollup, factored for plan assertions in PlanSpec. */
  private[graft] def lineitemJoinPlan(li: DataFrame, ord: DataFrame): DataFrame =
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(12,4)")).cast("double").as("sum_qty"))
      .orderBy("o_orderkey")

  /** Test hook: the two order-key bucketed tables for a dir. */
  private[graft] def lineitemTablesFor(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val fp = Tables.dirFingerprint(s, dir)
    (bucketedTable(s, "bucketed_lineitem", fp,
      Tables.lineitem(s, dir).select("l_orderkey", "l_quantity"),
      "l_orderkey"),
      bucketedTable(s, "bucketed_orders_ok", fp,
        Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
        "o_orderkey"))
  }

  /** q214 oracle: the same join+rollup straight off the source tables. */
  val bucketedLineitemJoinOracleSql: String =
    """SELECT o_orderkey, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
      |    AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  /** q210 oracle: the same join+rollup straight off the source tables —
    * bucketing is a LAYOUT, the values must be layout-invariant. */
  val bucketedJoinOracleSql: String =
    """SELECT c_custkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
      |    AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin
}
