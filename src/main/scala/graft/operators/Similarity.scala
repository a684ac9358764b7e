package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorOps._

/** Similarity search over the embeddings table (reference analog: the
  * dashboard's top-10 combined-vector Qdrant search, app.py:239).
  *
  * Scale notes: brute-force is the exactness baseline — the pair join is
  * a broadcast of the (small) query side against the full corpus, then a
  * per-query top-k window. With thousands of queries you'd flip to
  * [[lshBuckets]]-blocked scoring (q28) so each query only scores its
  * candidate buckets. The k-NN self-join is the O(n²) exact variant kept
  * for oracle parity; its scale path is identical blocking.
  */
object Similarity {

  /** q27: exact top-k cosine neighbors for a small query set (vec_id <
    * 10), k=10. Query side broadcast; rank ties broken by neighbor id. */
  def bruteForceTopK(s: SparkSession, dir: String): DataFrame = {
    val v = Dedup.normalized(s, dir)
    val q = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("e").as("eq"), col("nrm").as("nq"))
    val c = v.select(col("vec_id").as("neighbor_id"), col("e").as("ec"), col("nrm").as("nc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(col("eq"), col("ec"), col("nq"), col("nc")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("sim"), 9).as("sim_r"))
      .orderBy("query_id", "rank")
  }

  /** q29: exact k-NN self-join, k=3 — every vector gets its 3 nearest
    * neighbors (recommendation precompute shape). */
  def knnJoin(s: SparkSession, dir: String): DataFrame = {
    val v = Dedup.normalized(s, dir)
    val a = v.select(col("vec_id").as("src_id"), col("e").as("ea"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("nbr_id"), col("e").as("eb"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("sim").desc, col("nbr_id"))
    a.join(b, col("src_id") =!= col("nbr_id"))
      .select(col("src_id"), col("nbr_id"),
        cosinePre(col("ea"), col("eb"), col("na"), col("nb")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("src_id"), col("nbr_id"), col("rank"), round(col("sim"), 9).as("sim_r"))
      .orderBy("src_id", "rank")
  }
}
