package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Bronze→silver cleansing operators, re-expressing the reference's
  * raw→cleansed jobs (eu_raw_to_cleansed_merge.py:40-69,
  * ugc_raw_to_cleansed.py:51-84) over the test schema.
  *
  * Scale notes: every step is a narrow projection/filter except the
  * dedup, which is one hash shuffle on the dedup key; the required-field
  * filters are Catalyst-pushed into the parquet scan.
  */
object Cleanse {

  /** ""→NULL normalization, the reference's `normalize_empty_strings`
    * (eu_raw_to_cleansed_merge.py:46-54 applies it to 13 string fields). */
  def normalizeEmpty(df: DataFrame, fields: Seq[String]): DataFrame =
    fields.foldLeft(df)((d, f) =>
      d.withColumn(f, when(trim(col(f)) === "", lit(null)).otherwise(col(f))))

  /** Drop rows with a NULL/empty required field
    * (eu_raw_to_cleansed_merge.py:40-44 guid/image_url guard). */
  def requireFields(df: DataFrame, fields: Seq[String]): DataFrame =
    fields.foldLeft(df)((d, f) =>
      d.filter(col(f).isNotNull && trim(col(f).cast("string")) =!= ""))

  /** Deterministic dedup-keep-first: unlike dropDuplicates (which keeps an
    * arbitrary row per key and is not stable across cluster runs), this
    * keeps the row_number()=1 row under an explicit order — one shuffle on
    * the key. (eu_raw_to_cleansed_merge.py:45 dropDuplicates(guid).) */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** q13: metadata cleanse — require doc_id+text, dedup keep-first per
    * doc_id, then ""→NULL on lang/source. The dedup tie-break orders the
    * RAW source with explicit NULLS LAST: normalizing first would turn ""
    * into NULL and Spark sorts NULLs first while DuckDB sorts them last,
    * so the two engines could keep different rows for a tied doc_id. */
  def cleanseMetadata(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val kept = requireFields(docs, Seq("doc_id", "text"))
    val deduped = dedupKeepFirst(kept, Seq("doc_id"),
      Seq(col("n_chars").desc, col("source").asc_nulls_last))
    normalizeEmpty(deduped, Seq("lang", "source"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** q14: UGC cleanse — JSON-parse the props payload, incremental
    * watermark filter (ingestion_time > cutoff, ugc_raw_to_cleansed.py:62),
    * composite-key dedup keep-earliest. */
  def cleanseUgc(s: SparkSession, dir: String): DataFrame = {
    val cutoff = to_timestamp(lit("2024-01-10"))
    val e = Tables.events(s, dir)
      .filter(col("ts") > cutoff)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
    dedupKeepFirst(e, Seq("user_id", "event_type"), Seq(col("ts"), col("event_id")))
      .select("user_id", "event_type", "ts", "event_id", "k", "value")
      .orderBy("user_id", "event_type")
  }

  /** q84: data-quality profile of the documents table — per-column
    * null / empty-string / distinct counts in one row, the audit every
    * ingest run logs before the cleanse rules (this is how the q13/q14
    * required-field and ""→NULL thresholds get CHOSEN). One wide row
    * beats per-column rows here: the whole profile is one scan.
    *
    * Scale notes: a single aggregate pass; the distinct counts make
    * Catalyst plan an Expand (one stream per DISTINCT column), which is
    * the standard exact-profile cost — swap in approx_count_distinct
    * per column when 2% error is acceptable and the Expand matters. */
  def profileAudit(s: SparkSession, dir: String): DataFrame =
    profileAudit(Tables.documents(s, dir))

  def profileAudit(docs: DataFrame): DataFrame = {
    def nulls(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_null")
    def empties(c: String) = sum(when(col(c) === "", 1L).otherwise(0L)).as(s"${c}_empty")
    def uniq(c: String) = countDistinct(col(c)).as(s"${c}_distinct")
    docs.agg(count(lit(1)).as("n_rows"),
      nulls("text"), empties("text"), uniq("text"),
      nulls("lang"), empties("lang"), uniq("lang"),
      nulls("source"), empties("source"), uniq("source"))
  }

  /** q84 oracle: the same profile (COUNT(DISTINCT) skips NULLs in both
    * engines). */
  def profileAuditOracleSql: String = {
    def cols(c: String) =
      s"""CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ${c}_null,
         |  CAST(SUM(CASE WHEN $c = '' THEN 1 ELSE 0 END) AS BIGINT) AS ${c}_empty,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS ${c}_distinct""".stripMargin
    s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  ${cols("text")},
       |  ${cols("lang")},
       |  ${cols("source")}
       |FROM documents""".stripMargin
  }

  /** q139: bucketed content checksum — the merkle-lite anti-entropy
    * audit two replicas of a 100 TB corpus exchange to find divergent
    * key ranges without moving data: 64 buckets × (row count,
    * order-independent content checksum, min/max content hash). The
    * checksum is the int64 SUM of each row's first-8-hex-chars of
    * md5(text) — commutative/associative, so partial aggregation
    * combines freely across 1000 executors, and any single-row
    * corruption shifts the bucket sum. Compare two runs bucket-wise;
    * only mismatched buckets need a row-level diff (q86). ONE
    * map-combined aggregate pass, 64 output rows, no shuffle beyond the
    * 64-group exchange.
    *
    * Cross-engine: md5 of the UTF-8 bytes is identical everywhere;
    * Spark's `conv(hex,16,10)` and DuckDB's `CAST('0x'||hex AS BIGINT)`
    * parse the same 32-bit value, and 10⁹ rows × 2³² fits int64 with
    * 2³⁰ headroom. NULL text hashes as the empty string, so a
    * NULL↔''-flip corruption still needs the min/max columns — which
    * catch it lexicographically. */
  def partitionChecksum(s: SparkSession, dir: String): DataFrame =
    partitionChecksum(Tables.documents(s, dir))

  /** The (bucket, n_rows, checksum, min/max hash) table — q139's core,
    * shared with q160's repair pass so auditor and repairer can never
    * disagree on what "matching" means. */
  private def bucketChecksums(docs: DataFrame): DataFrame =
    docs
      .select(pmod(col("doc_id"), lit(64L)).as("bucket"),
        md5(coalesce(col("text"), lit(""))).as("h"),
        expr("cast(conv(substring(md5(coalesce(text, '')), 1, 8), 16, 10) as bigint)").as("h8"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("h8")).as("checksum"),
        min(col("h")).as("min_hash"),
        max(col("h")).as("max_hash"))

  def partitionChecksum(documents: DataFrame): DataFrame =
    bucketChecksums(documents).orderBy(col("bucket").asc_nulls_last)

  /** q147: referential-integrity audit — orphan/NULL foreign-key counts
    * for every FK relation in the star schema, one output row per
    * relation. The standing data-quality gate between ingest and the
    * join-heavy layers: every orphan row silently VANISHES from an
    * inner join downstream (q03/q16/q136 would under-count revenue with
    * no error anywhere), so the audit quantifies that loss up front.
    *
    * Scale notes: each relation costs one left-anti join of the child's
    * FK projection against the parent key — dimension parents broadcast,
    * the two fact-fact relations shuffle on the FK they'd shuffle on
    * anyway; the relations are independent (Spark runs the 7 audit
    * subplans' jobs from one action), and each reduces to a 1-row
    * count before the union. */
  def refIntegrity(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{count => cnt}
    def rel(name: String, child: DataFrame, fk: String,
        parent: DataFrame, pk: String): DataFrame = {
      val c = child.select(col(fk).as("fk"))
      val orphan = c.filter(col("fk").isNotNull)
        .join(parent.select(col(pk).as("pk")), col("fk") === col("pk"), "left_anti")
        .agg(cnt(lit(1)).as("n_orphan"))
      val base = c.agg(cnt(lit(1)).as("n_child"),
        sum(when(col("fk").isNull, 1L).otherwise(0L)).as("n_null_fk"))
      base.join(orphan)
        .select(lit(name).as("relation"), col("n_child"), col("n_null_fk"),
          col("n_orphan"))
    }
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    Seq(
      rel("customer.nation", Tables.customer(s, dir), "c_nationkey", Tables.nation(s, dir), "n_nationkey"),
      rel("lineitem.orders", li, "l_orderkey", o, "o_orderkey"),
      rel("lineitem.part", li, "l_partkey", Tables.part(s, dir), "p_partkey"),
      rel("lineitem.supplier", li, "l_suppkey", Tables.supplier(s, dir), "s_suppkey"),
      rel("nation.region", Tables.nation(s, dir), "n_regionkey", Tables.region(s, dir), "r_regionkey"),
      rel("orders.customer", o, "o_custkey", Tables.customer(s, dir), "c_custkey"),
      rel("supplier.nation", Tables.supplier(s, dir), "s_nationkey", Tables.nation(s, dir), "n_nationkey"))
      .reduce(_ unionAll _)
      .orderBy("relation")
  }

  def refIntegrityOracleSql: String = {
    def rel(name: String, child: String, fk: String, parent: String, pk: String) =
      s"""SELECT '$name' AS relation,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $child) AS n_child,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $child WHERE $fk IS NULL) AS n_null_fk,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $child c WHERE c.$fk IS NOT NULL
         |     AND NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk)) AS n_orphan""".stripMargin
    Seq(
      rel("customer.nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      rel("lineitem.orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      rel("lineitem.part", "lineitem", "l_partkey", "part", "p_partkey"),
      rel("lineitem.supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      rel("nation.region", "nation", "n_regionkey", "region", "r_regionkey"),
      rel("orders.customer", "orders", "o_custkey", "customer", "c_custkey"),
      rel("supplier.nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY relation")
  }

  /** The bucket expression matches the engine's `pmod(doc_id, 64)` for
    * NEGATIVE ids too (DuckDB's bare % follows the sign), and the plain
    * ORDER BY sorts NULLS LAST like the engine's asc_nulls_last — a
    * NULL or negative doc_id must not flip the gate. */
  def partitionChecksumOracleSql: String =
    """SELECT (doc_id % 64 + 64) % 64 AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST('0x' || substr(md5(COALESCE(text, '')), 1, 8) AS BIGINT)) AS BIGINT) AS checksum,
      |  MIN(md5(COALESCE(text, ''))) AS min_hash,
      |  MAX(md5(COALESCE(text, ''))) AS max_hash
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** The deterministic damaged replica q160 repairs against — the two
    * damage classes an anti-entropy pass hunts: silent row corruption
    * (every 97th doc's text flips) and a lost row (every 211th doc
    * missing). Id-less rows are out of scope by contract: a row with no
    * key cannot be repaired by key. */
  private[graft] def replicaB(documents: DataFrame): DataFrame =
    documents.filter(col("doc_id").isNotNull && col("doc_id") % 211 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 97 === 0,
          concat(coalesce(col("text"), lit("")), lit("~CORRUPT")))
          .otherwise(col("text")))

  /** q160: checksum-guided anti-entropy REPAIR diff — the op q139's
    * audit exists to feed: compare the two replicas' 64-row checksum
    * tables, then run the row-level diff ONLY inside mismatched buckets
    * (status ∈ changed / missing_in_b / extra_in_b — the repair
    * worklist). The undamaged buckets never join a single row: at
    * 100 TB with bucket-partitioned replicas the flagged-bucket filter
    * is a partition prune, so the expensive row diff touches
    * mismatched/64ths of the data — the merkle-descent move, one level
    * deep.
    *
    * Scale notes: two map-combined 64-row checksum aggregates, a 64-row
    * mismatch join, then one keyed full-outer join over flagged-bucket
    * rows only (the flag list broadcasts). */
  def antiEntropyRepair(s: SparkSession, dir: String): DataFrame =
    antiEntropyRepair(Tables.documents(s, dir))

  def antiEntropyRepair(documents: DataFrame): DataFrame =
    antiEntropyRepair(
      documents.filter(col("doc_id").isNotNull),
      replicaB(documents))

  /** The general two-replica form (specs feed arbitrary replicas). */
  private[graft] def antiEntropyRepair(a: DataFrame, b: DataFrame): DataFrame = {
    val neq = (l: Column, r: Column) => !(l <=> r)
    val ca = bucketChecksums(a)
    val cb = bucketChecksums(b)
      .select(col("bucket"), col("n_rows").as("nb"), col("checksum").as("cb"),
        col("min_hash").as("mnb"), col("max_hash").as("mxb"))
    val bad = ca.join(cb, Seq("bucket"), "full_outer")
      .filter(neq(col("n_rows"), col("nb")) || neq(col("checksum"), col("cb")) ||
        neq(col("min_hash"), col("mnb")) || neq(col("max_hash"), col("mxb")))
      .select(col("bucket"))
    def keyed(df: DataFrame, h: String) = df
      .select(pmod(col("doc_id"), lit(64L)).as("bucket"), col("doc_id"),
        md5(coalesce(col("text"), lit(""))).as(h))
      .join(broadcast(bad), Seq("bucket"))
    keyed(a, "ha").withColumnRenamed("bucket", "ba")
      .join(keyed(b, "hb").withColumnRenamed("bucket", "bb"), Seq("doc_id"), "full_outer")
      .filter(col("ha").isNull || col("hb").isNull || col("ha") =!= col("hb"))
      // a row missing from one replica has only the other's bucket
      .select(col("doc_id"), coalesce(col("ba"), col("bb")).as("bucket"),
        when(col("hb").isNull, lit("missing_in_b"))
          .when(col("ha").isNull, lit("extra_in_b"))
          .otherwise(lit("changed")).as("status"))
      .orderBy("doc_id")
  }

  /** q160 oracle: identical damage rules, checksums, mismatch set, and
    * in-bucket row diff. */
  val antiEntropyRepairOracleSql: String =
    """WITH a AS (SELECT doc_id, (doc_id % 64 + 64) % 64 AS bucket,
      |    md5(COALESCE(text, '')) AS h,
      |    CAST('0x' || substr(md5(COALESCE(text, '')), 1, 8) AS BIGINT) AS h8
      |  FROM documents WHERE doc_id IS NOT NULL),
      |braw AS (SELECT doc_id,
      |    CASE WHEN doc_id % 97 = 0 THEN COALESCE(text, '') || '~CORRUPT'
      |      ELSE text END AS text
      |  FROM documents WHERE doc_id IS NOT NULL AND doc_id % 211 <> 0),
      |b AS (SELECT doc_id, (doc_id % 64 + 64) % 64 AS bucket,
      |    md5(COALESCE(text, '')) AS h,
      |    CAST('0x' || substr(md5(COALESCE(text, '')), 1, 8) AS BIGINT) AS h8
      |  FROM braw),
      |ca AS (SELECT bucket, COUNT(*) AS n, SUM(h8) AS c, MIN(h) AS mn, MAX(h) AS mx
      |  FROM a GROUP BY 1),
      |cb AS (SELECT bucket, COUNT(*) AS n, SUM(h8) AS c, MIN(h) AS mn, MAX(h) AS mx
      |  FROM b GROUP BY 1),
      |bad AS (SELECT bucket FROM ca FULL OUTER JOIN cb USING (bucket)
      |  WHERE ca.n IS DISTINCT FROM cb.n OR ca.c IS DISTINCT FROM cb.c
      |     OR ca.mn IS DISTINCT FROM cb.mn OR ca.mx IS DISTINCT FROM cb.mx),
      |av AS (SELECT a.* FROM a JOIN bad USING (bucket)),
      |bv AS (SELECT b.* FROM b JOIN bad USING (bucket))
      |SELECT COALESCE(av.doc_id, bv.doc_id) AS doc_id,
      |  COALESCE(av.bucket, bv.bucket) AS bucket,
      |  CASE WHEN bv.doc_id IS NULL THEN 'missing_in_b'
      |       WHEN av.doc_id IS NULL THEN 'extra_in_b'
      |       ELSE 'changed' END AS status
      |FROM av FULL OUTER JOIN bv ON av.doc_id = bv.doc_id
      |WHERE av.doc_id IS NULL OR bv.doc_id IS NULL OR av.h <> bv.h
      |ORDER BY doc_id""".stripMargin
}
