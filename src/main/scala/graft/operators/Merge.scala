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
}
