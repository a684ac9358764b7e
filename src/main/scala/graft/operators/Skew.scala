package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join split handles most cases at
  * runtime; explicit salting remains necessary when one join key is so
  * hot that even a split partition overwhelms a task (the classic
  * power-law entity in a 100 TB fact table).
  */
object Skew {

  /** Salted equi-join: the large side gets a deterministic salt derived
    * from its full row content (not rand(), so the plan stays
    * deterministic and retry-safe); the small side is replicated once per
    * salt. Result equals `large.join(small, Seq(key))` row-for-row; the
    * hot key's rows spread over `salts` reducers instead of one. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val saltedLarge = large.withColumn("__salt",
      F.pmod(F.xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(salts)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** q53: the salted join gated against the plain-join oracle. The
    * events fact joins a tiny derived event-type dimension — every one
    * of the 5 type keys is a hot key (perfect power-law shape), so the
    * salt spreads each over `salts` reducers; the oracle is the UNSALTED
    * join, proving the rewrite is result-identical. */
  def saltedJoinQ(s: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables.events(s, dir)
    val dim = e.select(col("event_type")).distinct()
      .withColumn("type_len", F.length(col("event_type")).cast("long"))
    saltedJoin(e, dim, "event_type", salts = 8)
      .select(col("event_id"), col("event_type"), col("type_len"))
      .orderBy("event_id")
  }

  val saltedJoinOracleSql: String =
    """SELECT event_id, e.event_type, d.type_len
      |FROM events e
      |JOIN (SELECT DISTINCT event_type, CAST(length(event_type) AS BIGINT) AS type_len
      |      FROM events) d USING (event_type)
      |ORDER BY event_id""".stripMargin
}
