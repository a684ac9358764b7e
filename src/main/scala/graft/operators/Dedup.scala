package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps._

/** Deduplication family for a training-data pipeline.
  *
  * Reference analog: Qdrant semantic dedup — cosine ≥ 0.97 on the image
  * vector inherits the neighbor's canonical_id, else a new one
  * (deduplicate_from_qdrant.py:17,160-186). Here the clustering rule is
  * the order-independent "canonical = min id over the ≥τ neighborhood
  * (including self)", which a distributed engine can compute without the
  * reference's sequential greedy scan.
  *
  * Each operator has a frame-based core (bring your own
  * `documents(doc_id, text)` / `embeddings(vec_id, embedding)` frame) and
  * a `(spark, testDir)` wrapper for the driver contract.
  *
  * Scale notes:
  *  - exact dedup is ONE hash shuffle on the content hash — no pairwise
  *    work, the pattern that survives 100 TB unchanged.
  *  - embedding near-dup as written is the exact O(n²) pair join used for
  *    oracle parity at test SF; at cluster scale use
  *    [[nearDupPairsBlocked]] — the same verification join restricted to
  *    sign-LSH buckets.
  */
object Dedup {

  /** q22: exact duplicate clusters via md5 of normalized text; canonical
    * member = min doc_id of the cluster. */
  def exact(s: SparkSession, dir: String): DataFrame = exact(Tables.documents(s, dir))

  def exact(docs: DataFrame): DataFrame = {
    val hashed = docs
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("content_hash"))
    val clusters = hashed.groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("cluster_size"))
      .withColumnRenamed("content_hash", "__cluster_hash")
    // null-safe join: null-text rows form their own cluster instead of
    // silently dropping out of the result
    hashed.join(clusters, col("content_hash") <=> col("__cluster_hash"))
      .select("doc_id", "content_hash", "canonical_id", "cluster_size")
      .orderBy("doc_id")
  }

  /** All vecs with embedding cast to double + precomputed norm. */
  def normalized(s: SparkSession, dir: String): DataFrame = normalized(Tables.embeddings(s, dir))

  def normalized(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))

  /** ≥τ cosine pairs (a_id < b_id). */
  def nearDupPairs(s: SparkSession, dir: String, tau: Double): DataFrame =
    nearDupPairs(Tables.embeddings(s, dir), tau)

  def nearDupPairs(embeddings: DataFrame, tau: Double): DataFrame = {
    val v = normalized(embeddings)
    val a = v.select(col("vec_id").as("a_id"), col("e").as("ea"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("b_id"), col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        cosinePre(col("ea"), col("eb"), col("na"), col("nb")).as("sim"))
      .filter(col("sim") >= tau)
  }

  /** LSH-blocked ≥τ cosine pairs: identical scoring join but restricted
    * to same-sign-LSH-bucket pairs — the 100 TB path (each bucket holds
    * ~n/2^bits vectors, so pairwise work drops by ~4^bits while near-dups
    * at τ≈0.97 almost never straddle a plane). Output ⊆ the exact pairs;
    * the spec pins planted near-dups to survive blocking. */
  def nearDupPairsBlocked(s: SparkSession, dir: String, tau: Double, bits: Int): DataFrame =
    nearDupPairsBlocked(Tables.embeddings(s, dir), tau, bits)

  def nearDupPairsBlocked(embeddings: DataFrame, tau: Double, bits: Int): DataFrame = {
    val planes = Similarity.hyperplanesFor(bits)
    val v = normalized(embeddings).withColumn("bucket", Similarity.lshBucket(col("e"), planes))
    val a = v.select(col("vec_id").as("a_id"), col("e").as("ea"), col("nrm").as("na"), col("bucket"))
    val b = v.select(col("vec_id").as("b_id"), col("e").as("eb"), col("nrm").as("nb"), col("bucket"))
    a.join(b, Seq("bucket")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        cosinePre(col("ea"), col("eb"), col("na"), col("nb")).as("sim"))
      .filter(col("sim") >= tau)
  }

  /** q26: embedding near-dup — per-vector canonical id = min vec_id over
    * its cosine ≥ 0.97 neighborhood (self included), plus neighbor count. */
  def embeddingThreshold(s: SparkSession, dir: String): DataFrame =
    embeddingThreshold(Tables.embeddings(s, dir))

  def embeddingThreshold(embeddings: DataFrame): DataFrame = {
    val pairs = nearDupPairs(embeddings, 0.97)
    val neighbors = pairs.select(col("a_id").as("vec_id"), col("b_id").as("nbr"))
      .unionByName(pairs.select(col("b_id").as("vec_id"), col("a_id").as("nbr")))
    val agg = neighbors.groupBy(col("vec_id"))
      .agg(min(col("nbr")).as("min_nbr"), count(lit(1)).as("n_neighbors"))
    embeddings.select(col("vec_id"))
      .join(agg, Seq("vec_id"), "left")
      .select(col("vec_id"),
        least(col("vec_id"), coalesce(col("min_nbr"), col("vec_id"))).as("canonical_id"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"))
      .orderBy("vec_id")
  }
}
