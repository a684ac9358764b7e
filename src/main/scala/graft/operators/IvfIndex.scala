package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps._

/** Persisted IVF index: the serving-side layout for ANN at scale.
  *
  * [[build]] trains the coarse quantizer and writes
  *   path/centroids.parquet          (cell, center)       — tiny, broadcast
  *   path/corpus/cell=<c>/...        (vec_id, e, nrm)     — hive-partitioned
  * [[search]] ranks cells per query against the broadcast centroids and
  * joins only the probed cells; because `cell` is the partition column,
  * Spark's dynamic partition pruning skips the unprobed directories — at
  * 100 TB each query batch physically reads nprobe/nlist of the corpus. */
object IvfIndex {

  def build(embeddings: DataFrame, path: String, nlist: Int = 16): Unit = {
    val (assigned, centers) = Similarity.kmeansCells(embeddings, nlist)
    centers.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids.parquet")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(s"$path/corpus")
  }

  def search(spark: SparkSession, path: String, queries: DataFrame,
      nprobe: Int = 4, k: Int = 10): DataFrame = {
    val centers = spark.read.parquet(s"$path/centroids.parquet")
    val corpus = spark.read.parquet(s"$path/corpus")
      .select(col("vec_id").as("__cand_id"), col("e").as("ec"),
        col("nrm").as("nc"), col("cell"))
    val q = Dedup.normalized(queries)
      .select(col("vec_id").as("query_id"), col("e").as("eq"), col("nrm").as("nq"))
    val probed = Similarity.probeCells(q, centers, nprobe)
    val scored = broadcast(probed).join(corpus, Seq("cell"))
      .filter(col("query_id") =!= col("__cand_id"))
      .select(col("query_id"), col("__cand_id"),
        cosinePre(col("eq"), col("ec"), col("nq"), col("nc")).as("sim"))
    Similarity.explodeTopKPerGroup(scored, "query_id", "neighbor_id", k)
      .orderBy("query_id", "rank")
  }
}
