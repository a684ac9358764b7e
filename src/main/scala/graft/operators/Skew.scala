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

  /** Modeled reducer count for [[joinSkewAudit]] — matches the session's
    * shuffle-partition sizing so the audit reads as "what each reducer
    * would receive". */
  val SkewParts = 32L

  /** q212: pre-join shuffle-skew audit — the diagnosis that decides
    * BETWEEN this file's two medicines (AQE's runtime split vs q53's
    * explicit salt) before a 100 TB join is launched, completing the
    * pre-join planning family: q205 estimates the join's output
    * cardinality, THIS profiles how its INPUT shuffle distributes. For
    * each side, rows are assigned to [[SkewParts]] modeled reducers by
    * a salted-md5 of the join key (a deterministic model of hash
    * partitioning — Murmur3 itself is not replayable in the oracle,
    * and the skew STRUCTURE is hash-invariant: a key's rows always
    * land together); per reducer the audit reports row count, distinct
    * keys, and the largest single key's rows — max_key_rows ≈ n_rows
    * says one hot key owns the reducer and salting is the only fix
    * (AQE can split a partition, not a key); many keys with skew_r ≈ 1
    * says the shuffle is healthy. Gated sides: the 5-value event_type
    * (every key hot — q53's fixture) against the uniform o_custkey,
    * so both diagnoses appear in one output.
    *
    * skew_r = n_rows·P/total — exact BIGINTs into one
    * identically-associated ROUND(...,9) expression. NULL keys are
    * excluded (they never shuffle into an inner join).
    *
    * Scale notes: per side ONE map-combined (part, key) count (shuffle
    * ≤ distinct keys), one ≤P-row rollup, one 1-row total broadcast —
    * the corpus is scanned once per side and nothing key-sized ever
    * sorts. At 100 TB this audit costs two narrow scans; the join it
    * de-risks costs the cluster. */
  def joinSkewAudit(s: SparkSession, dir: String): DataFrame = {
    val events = graft.Tables.events(s, dir)
    val orders = graft.Tables.orders(s, dir)
    sideAudit(events, "event_type", "events_by_type")
      .unionByName(sideAudit(orders, "o_custkey", "orders_by_custkey"))
      .orderBy("side", "part")
  }

  private def sideAudit(df: DataFrame, key: String, side: String): DataFrame = {
    val part = F.pmod(
      TextAnalysis.md5Long(concat_ws(":", lit("skew"), col(key).cast("string"))),
      lit(SkewParts))
    val perKey = df.filter(col(key).isNotNull)
      .select(part.as("part"), col(key).cast("string").as("k"))
      .groupBy(col("part"), col("k"))
      .agg(count(lit(1)).as("kn"))
    val perPart = perKey.groupBy(col("part"))
      .agg(sum(col("kn")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("kn")).as("max_key_rows"))
    val total = perPart.agg(sum(col("n_rows")).as("total"))
    perPart.crossJoin(broadcast(total))
      .select(lit(side).as("side"), col("part"), col("n_rows"),
        col("n_keys"), col("max_key_rows"),
        round(col("n_rows").cast("double") * lit(SkewParts.toDouble) /
          col("total").cast("double"), 9).as("skew_r"))
  }

  /** q212 oracle: identical salted-md5 reducer model per side. */
  val joinSkewAuditOracleSql: String = {
    def sideSql(table: String, key: String, side: String) =
      s"""SELECT '$side' AS side, part, CAST(SUM(kn) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) AS BIGINT) AS n_keys, MAX(kn) AS max_key_rows
         |FROM (SELECT (CAST(('0x' || substring(md5('skew:' || CAST($key AS VARCHAR)), 1, 15)) AS BIGINT)) % $SkewParts AS part,
         |    $key AS k, CAST(COUNT(*) AS BIGINT) AS kn
         |  FROM $table WHERE $key IS NOT NULL GROUP BY 1, 2)
         |GROUP BY 1, 2""".stripMargin
    s"""WITH sides AS (${sideSql("events", "event_type", "events_by_type")}
       |UNION ALL
       |${sideSql("orders", "o_custkey", "orders_by_custkey")}),
       |tot AS (SELECT side, SUM(n_rows) AS total FROM sides GROUP BY 1)
       |SELECT s.side, s.part, s.n_rows, s.n_keys, s.max_key_rows,
       |  ROUND(CAST(s.n_rows AS DOUBLE) * ${SkewParts}.0 / CAST(t.total AS DOUBLE), 9)
       |    AS skew_r
       |FROM sides s JOIN tot t ON t.side = s.side
       |ORDER BY 1, 2""".stripMargin
  }
}
