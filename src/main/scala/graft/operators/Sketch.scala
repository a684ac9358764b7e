package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fixed-size frequency sketches for streaming/serving stats — the
  * count-min sketch (Cormode & Muthukrishnan 2005): d hash rows × w
  * counters; point estimate = min over rows of the hashed counter.
  * Always an overestimate, error ≤ N·e/w with probability 1−e^−d.
  *
  * The dashboard's per-facet counters (app.py:140) recomputed exactly
  * per query don't survive a 100 TB event stream; a CMS is the standard
  * fixed-memory stand-in. Scale notes: sketch construction is ONE
  * map-side-combined aggregate (the d×w counter table is the whole
  * shuffle — at most d·w rows regardless of input size, the definition
  * of a sketch); estimation broadcasts the tiny counter table. Hashes
  * are md5-derived, so any engine reproduces the same cells — which is
  * what lets the DuckDB oracle value-check est AND true counts. */
object Sketch {

  val D = 4    // hash rows
  val W = 512  // counters per row
  val ProbeMax = 25L

  /** Cell column for hash row r: md5("r:key") folded to [0, W). */
  private def cell(r: Int, key: Column): Column =
    TextAnalysis.md5Long(concat_ws(":", lit(r.toString), key.cast("string"))) % W

  private def cells(key: Column): Column =
    array((0 until D).map(r => struct(lit(r).as("r"), cell(r, key).as("c"))): _*)

  /** q68: CMS over the events stream keyed by user_id, probed for
    * user_id < [[ProbeMax]] — est_cnt (sketch) alongside true_cnt, so
    * the overestimate property is visible in the gated output. */
  def cmsUserCounts(s: SparkSession, dir: String): DataFrame =
    cmsUserCounts(Tables.events(s, dir))

  def cmsUserCounts(events: DataFrame): DataFrame = {
    val entries = events
      .select(explode(cells(col("user_id"))).as("rc"))
      .select(col("rc.r").as("r"), col("rc.c").as("c"))
    val sketch = entries.groupBy(col("r"), col("c")).agg(count(lit(1)).as("cnt"))
    val probes = events.filter(col("user_id") < ProbeMax)
      .groupBy(col("user_id")).agg(count(lit(1)).as("true_cnt"))
    val probeCells = probes
      .select(col("user_id"), col("true_cnt"), explode(cells(col("user_id"))).as("rc"))
      .select(col("user_id"), col("true_cnt"), col("rc.r").as("r"), col("rc.c").as("c"))
    probeCells.join(broadcast(sketch), Seq("r", "c"))
      .groupBy(col("user_id"), col("true_cnt"))
      .agg(min(col("cnt")).as("est_cnt"))
      .select(col("user_id"), col("est_cnt"), col("true_cnt"))
      .orderBy("user_id")
  }

  /** q68 oracle: same md5-derived cells, same counters. */
  def cmsOracleSql: String = {
    val rs = (0 until D).mkString("[", ",", "]")
    val cellSql = (rExpr: String, kExpr: String) =>
      s"CAST(('0x' || substring(md5(CAST($rExpr AS VARCHAR) || ':' || CAST($kExpr AS VARCHAR)), 1, 15)) AS BIGINT) % $W"
    s"""WITH entries AS (SELECT t.r, ${cellSql("t.r", "e.user_id")} AS c
       |  FROM events e CROSS JOIN (SELECT unnest($rs) AS r) t),
       |sketch AS (SELECT r, c, COUNT(*) AS cnt FROM entries GROUP BY r, c),
       |probes AS (SELECT user_id, COUNT(*) AS true_cnt FROM events
       |  WHERE user_id < $ProbeMax GROUP BY user_id),
       |pc AS (SELECT p.user_id, p.true_cnt, t.r, ${cellSql("t.r", "p.user_id")} AS c
       |  FROM probes p CROSS JOIN (SELECT unnest($rs) AS r) t)
       |SELECT pc.user_id, MIN(s.cnt) AS est_cnt, pc.true_cnt
       |FROM pc JOIN sketch s USING (r, c)
       |GROUP BY pc.user_id, pc.true_cnt ORDER BY pc.user_id""".stripMargin
  }
}
