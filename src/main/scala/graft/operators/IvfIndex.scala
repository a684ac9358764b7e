package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val v = Dedup.normalized(embeddings).withColumn("features", array_to_vector(col("e")))
    val model = new KMeans().setK(nlist).setSeed(42L).setFeaturesCol("features")
      .setPredictionCol("cell").fit(v)
    val spark = embeddings.sparkSession
    spark.createDataFrame(
        model.clusterCenters.toIndexedSeq.zipWithIndex.map { case (c, i) => (i, c.toArray) })
      .toDF("cell", "center")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids.parquet")
    model.transform(v).select(col("vec_id"), col("e"), col("nrm"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/corpus")
  }

  def search(spark: SparkSession, path: String, queries: DataFrame,
      nprobe: Int = 4, k: Int = 10): DataFrame = {
    val centers = spark.read.parquet(s"$path/centroids.parquet")
    val corpus = spark.read.parquet(s"$path/corpus")
      .select(col("vec_id").as("__cand_id"), col("e").as("ec"),
        col("nrm").as("nc"), col("cell"))
    val q = Dedup.normalized(queries)
      .select(col("vec_id").as("query_id"), col("e").as("eq"), col("nrm").as("nq"))
    val wCell = Window.partitionBy(col("query_id")).orderBy(col("dist2"), col("cell"))
    val probed = q.crossJoin(broadcast(centers))
      .withColumn("dist2",
        col("nq") * col("nq") - lit(2.0) * dot(col("eq"), col("center"))
          + dot(col("center"), col("center")))
      .withColumn("cell_rank", row_number().over(wCell))
      .filter(col("cell_rank") <= nprobe)
      .select("query_id", "eq", "nq", "cell")
    val scored = broadcast(probed).join(corpus, Seq("cell"))
      .filter(col("query_id") =!= col("__cand_id"))
      .select(col("query_id"), col("__cand_id"),
        cosinePre(col("eq"), col("ec"), col("nq"), col("nc")).as("sim"))
    Similarity.explodeTopKPerGroup(scored, "query_id", "neighbor_id", k)
      .orderBy("query_id", "rank")
  }
}
