package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Gold→serving export shaping (curated_to_postgres.py:27-75): JSON
  * payload parse to typed columns, timestamp formatting, final
  * select/cast into the serving schema. Pure narrow projection — no
  * shuffle; at 100 TB this is bounded by JDBC sink parallelism, not the
  * plan. */
object Serving {

  /** Faceted-search filter spec (app.py:120-140 builds WHERE clauses
    * from equality / IN-list / array-contains selections). */
  sealed trait Facet
  final case class Eq(column: String, value: Any) extends Facet
  final case class In(column: String, values: Seq[Any]) extends Facet
  final case class ArrayContains(column: String, value: Any) extends Facet

  /** Dashboard faceted search: AND of the selected facets, as pushable
    * predicates (equality and IN reach the parquet scan as
    * PushedFilters; array_contains evaluates in the codegen'd filter). */
  def facetSearch(df: DataFrame, facets: Seq[Facet]): DataFrame =
    facets.foldLeft(df) {
      case (d, Eq(c, v)) => d.filter(col(c) === lit(v))
      case (d, In(c, vs)) => d.filter(col(c).isin(vs.map(lit): _*))
      case (d, ArrayContains(c, v)) => d.filter(array_contains(col(c), lit(v)))
    }

  /** q55: representative dashboard search — equality + IN-list +
    * array-contains facets ANDed over the documents table, the exact
    * WHERE-builder shape of app.py:120-140. Equality and IN push down to
    * the parquet scan; array_contains runs in the codegen'd filter. */
  def facetSearchQ(s: SparkSession, dir: String): DataFrame =
    facetSearch(
      Tables.documents(s, dir).withColumn("words", split(col("text"), " ")),
      Seq(Eq("lang", "en"),
        In("source", Seq("src1", "src2", "src3", "src4", "src5")),
        ArrayContains("words", "data")))
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")

  val facetSearchOracleSql: String =
    """SELECT doc_id, lang, source, n_chars FROM documents
      |WHERE lang = 'en' AND source IN ('src1','src2','src3','src4','src5')
      |  AND list_contains(string_split(text, ' '), 'data')
      |ORDER BY doc_id""".stripMargin

  /** q38: filtered grouped count-distinct (app.py:140 COUNT(DISTINCT
    * guid) under facet filters). Distinct-within-group is the expensive
    * dashboard aggregate at scale — Spark plans it as a two-phase
    * (partial per-key distinct, then merge), no driver-side set. */
  def countDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("value") > 5.0)
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** Sketch-based variant of [[countDistinct]] for the 100 TB path:
    * approx_count_distinct is a fixed-size HyperLogLog++ per group —
    * constant memory and one narrow shuffle regardless of cardinality,
    * where exact distinct must shuffle every (group, user) pair. */
  def countDistinctApprox(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events
      .filter(col("value") > 5.0)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("n_users_approx"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** q39: deterministic sample pagination — the dashboard's seeded
    * ORDER BY RANDOM() LIMIT/OFFSET page (app.py:120,147) re-expressed
    * as a hash order, which is reproducible on any engine and any
    * cluster size (a seeded RNG is not). */
  def samplePaginate(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(":seed42"))).as("page_key"))
      .orderBy(col("page_key"), col("doc_id"))
      .offset(50).limit(25)

  /** q18: serving export shape over the events table. */
  def servingExport(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("event_date"),
        upper(col("event_type")).as("event_type"),
        col("value").cast("decimal(12,2)").cast("double").as("value"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id")
}
