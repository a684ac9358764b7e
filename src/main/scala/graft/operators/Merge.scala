package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Snapshot upsert — the reference's Delta `MERGE whenMatchedUpdate /
  * whenNotMatchedInsert` (eu_raw_to_cleansed_merge.py:62-69,
  * join_eu_ugc_qdrant_merge.py:390-401) re-expressed as a pure
  * union/anti-join plan over immutable snapshots.
  *
  * Scale notes: one shuffle on the merge key (the anti-join); batch side
  * is usually much smaller than the base snapshot, so AQE will broadcast
  * it when it fits — the base table is never rewritten more than once.
  */
object Merge {

  /** Upsert `batch` into `base` on `keys`: matched keys take the batch
    * row, unmatched base rows pass through.
    *
    * PRECONDITION: `batch` must be unique per `keys` — like the
    * reference's Delta MERGE (which errors on multiple matching source
    * rows), two batch rows for one key would both land in the snapshot.
    * Dedup upstream with an explicit order (Cleanse.dedupKeepFirst, or
    * dedupReplays in the streaming sink path) — this operator cannot
    * pick a winner itself because no universal ordering column exists.
    * NULL-key batch rows never match and insert each time, matching the
    * reference MERGE's NULL-semantics. */
  def upsertSnapshot(base: DataFrame, batch: DataFrame, keys: Seq[String]): DataFrame =
    batch.unionByName(base.join(batch, keys, "left_anti"))

  /** q15: simulated incremental merge over the orders snapshot — batch =
    * even order keys repriced (+10.0, an exact double op so both engines
    * agree bit-for-bit), base = current snapshot; result is the
    * post-MERGE table. */
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val base = o.filter(col("o_orderkey") % 3 =!= 0)
    val batch = o.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 10.0)
      .withColumn("o_orderstatus", lit("U"))
    upsertSnapshot(base, batch, Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }

  /** Diff two snapshots of a keyed table: one row per key present in
    * either, classified `added` / `removed` / `changed` / `unchanged`
    * (changed = any compared column differs, null-safe). The inverse of
    * [[upsertSnapshot]]: this is how a medallion pipeline derives the
    * CDC feed when the upstream hands it full snapshots instead of a
    * changelog (the reference pulls full EU API dumps each run —
    * eu_raw_to_cleansed_merge.py — so snapshot diff IS its real delta).
    *
    * Scale notes: one full-outer shuffle join on the key; the change
    * classification is a narrow projection of null-safe comparisons.
    * At 100 TB both sides are bucketed/partitioned on the key, making
    * the join co-located (Sinks.bucketedTable + PlanSpec prove that
    * path shuffle-free). */
  def snapshotDiff(old: DataFrame, neu: DataFrame, key: String,
      compare: Seq[String]): DataFrame = {
    val o = old.select((key +: compare).map(c => col(c).as(s"o_$c")): _*)
    val n = neu.select((key +: compare).map(c => col(c).as(s"n_$c")): _*)
    val changed = compare
      .map(c => !(col(s"o_$c") <=> col(s"n_$c")))
      .reduce(_ || _)
    o.join(n, col(s"o_$key") === col(s"n_$key"), "full_outer")
      .select(coalesce(col(s"o_$key"), col(s"n_$key")).as(key),
        when(col(s"o_$key").isNull, "added")
          .when(col(s"n_$key").isNull, "removed")
          .when(changed, "changed")
          .otherwise("unchanged").as("change"))
  }

  /** q86: snapshot diff over two simulated orders versions — v_old drops
    * keys ≡ 0 (mod 7) [they become `added`], v_new drops keys ≡ 0
    * (mod 5) [`removed`] and reprices keys ≡ 0 (mod 2) [`changed`]. */
  def snapshotDiffQ(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val vOld = o.filter(col("o_orderkey") % 7 =!= 0)
    val vNew = o.filter(col("o_orderkey") % 5 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 2 === 0, col("o_totalprice") + 10.0)
          .otherwise(col("o_totalprice")))
    snapshotDiff(vOld, vNew, "o_orderkey",
      Seq("o_custkey", "o_orderstatus", "o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** q86 oracle: the same diff classification in SQL. */
  def snapshotDiffOracleSql: String =
    """WITH vo AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 7 <> 0),
      |vn AS (SELECT o_orderkey, o_custkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 10.0
      |      ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 5 <> 0)
      |SELECT COALESCE(vo.o_orderkey, vn.o_orderkey) AS o_orderkey,
      |  CASE WHEN vo.o_orderkey IS NULL THEN 'added'
      |    WHEN vn.o_orderkey IS NULL THEN 'removed'
      |    WHEN NOT (vo.o_custkey IS NOT DISTINCT FROM vn.o_custkey)
      |      OR NOT (vo.o_orderstatus IS NOT DISTINCT FROM vn.o_orderstatus)
      |      OR NOT (vo.o_totalprice IS NOT DISTINCT FROM vn.o_totalprice)
      |      THEN 'changed'
      |    ELSE 'unchanged' END AS change
      |FROM vo FULL OUTER JOIN vn ON vo.o_orderkey = vn.o_orderkey
      |ORDER BY o_orderkey""".stripMargin
}
