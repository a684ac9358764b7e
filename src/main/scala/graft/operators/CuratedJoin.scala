package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Silver→gold curated enrichment, re-expressing the reference's curated
  * join job (join_eu_ugc_qdrant_merge.py:191-351): left join of the
  * entity table with its aggregated annotations, a validated-set semi
  * filter, NULL-coalescing for the no-annotation branch, and canonical-id
  * remapping through a broadcast mapping table (py:256-273).
  *
  * Scale notes: the annotation aggregate is map-side partial (one shuffle
  * on the entity key, reused by the subsequent left join — same key, so
  * Catalyst plans a single exchange); the validated-nation filter rides a
  * broadcast semi join; the canonical mapping is tiny and broadcast.
  */
object CuratedJoin {

  /** q16: customer enriched with per-customer order stats, restricted to
    * validated (EUROPE) nations, missing stats coalesced to zero.
    *
    * Covers both reference variants: the incremental MERGE join
    * (join_eu_ugc_qdrant_merge.py:191-351) and the full-recompute
    * overwrite join (join_eu_ugc_qdrant_overwrite.py:180, a right join
    * keeping every validated metadata record) — "entity left-joins its
    * aggregated annotations" is the same plan with the sides named from
    * the entity's perspective. */
  def curatedJoin(s: SparkSession, dir: String): DataFrame = {
    val validatedNations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val ann = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(14,4)")).cast("double").as("total_spent"))
    Tables.customer(s, dir)
      .join(broadcast(validatedNations), col("c_nationkey") === col("n_nationkey"), "left_semi")
      .join(ann, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("total_spent"), lit(0.0)).as("total_spent"))
      .orderBy("c_custkey")
  }

  /** q17: canonical-id remap — per-cluster canonical member (min id),
    * broadcast back onto every member, plus resulting cluster size
    * (the reference's Qdrant canonical_id inheritance,
    * deduplicate_from_qdrant.py:160-186 + join_…_merge.py:256-273). */
  def canonicalRemap(s: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(s, dir).select("vec_id", "label")
    val mapping = vecs.groupBy(col("label"))
      .agg(min(col("vec_id")).as("canonical_id"),
        count(lit(1)).as("cluster_size"))
    vecs.join(broadcast(mapping), Seq("label"))
      .select(col("vec_id"), col("label"), col("canonical_id"), col("cluster_size"))
      .orderBy("vec_id")
  }
}
