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

  /** [[build]] with the deterministic [[KMeansOp]] quantizer — the
    * persisted twin of q65's in-memory pipeline. Same layout; the train
    * loop, cell assignment, and stored doubles are all engine-exact, so
    * the READ path ([[searchExact]]) is value-oracle-checkable. */
  def buildExact(embeddings: DataFrame, path: String): Unit = {
    val spark = embeddings.sparkSession
    val (qv, cents) = KMeansOp.trainCents(embeddings)
    val assigned = KMeansOp.assignAuto(qv, cents).select(col("vec_id"), col("cell"))
    spark.createDataFrame(cents.map { case (id, c) => (id, c) })
      .toDF("cell", "center")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids.parquet")
    Dedup.normalized(embeddings).join(assigned, Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/corpus")
  }

  /** Search the exact persisted index: probe ranking replays q65's
    * exact-dist2 cell sort against the (collected, K-row) centroid
    * table; the probed (query, cell) rows broadcast against the
    * hive-partitioned corpus, so the scan physically reads only the
    * probed cell directories (dynamic partition pruning — PlanSpec
    * locks it in). Output is identical to [[Similarity.ivfTopKExact]],
    * which is what lets q72 share q65's generated oracle. */
  def searchExact(spark: SparkSession, path: String, queries: DataFrame,
      nprobe: Int = 3, k: Int = 10): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids.parquet")
      .orderBy("cell").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
    // an index built from an EMPTY corpus has no corpus part files at
    // all (a partitioned write of zero rows emits only _SUCCESS), so
    // the parquet read can't infer a schema — and there is nothing to
    // read: serve the typed empty candidate set instead
    val corpus =
      if (cents.isEmpty)
        Dedup.normalized(queries)
          .select(col("vec_id").as("__cand_id"), col("e").as("ec"),
            col("nrm").as("nc"), lit(null).cast("long").as("cell"))
          .limit(0)
      else spark.read.parquet(s"$path/corpus")
        .select(col("vec_id").as("__cand_id"), col("e").as("ec"),
          col("nrm").as("nc"), col("cell"))
    // probe + score through the ONE shared pipeline (Similarity
    // .ivfProbeScore) so this read path can never drift from q65's
    // in-memory path, whose generated oracle q72 shares
    Similarity.ivfProbeScore(KMeansOp.quantized(queries),
      Dedup.normalized(queries), cents, corpus, nprobe, k)
  }

  /** Layout version baked into the index name: bump when the stored
    * schema or quantizer changes so a stale on-disk index can never
    * satisfy the existence check after a code change. */
  private val LayoutVersion = "v2"

  /** q72: build-once + search the exact persisted index in one gated
    * query — result equals q65 (shared oracle), but the candidates come
    * off the cell-partitioned on-disk layout through partition pruning.
    * The index lives in [[graft.ArtifactStore]] (Hadoop FS, built into a
    * staging dir and atomically renamed — so the centroids and corpus
    * appear together or not at all) and builds only when absent: a
    * persisted index is built once and served many times, so repeat
    * invocations (and the bench's warm pass) measure the READ path,
    * which is the number that matters for a serving layout. */
  def ivfIndexedTopK(s: SparkSession, dir: String): DataFrame = {
    val em = graft.Tables.embeddings(s, dir)
    val path = graft.ArtifactStore.ensureCurrent(s,
      s"ivf_exact_$LayoutVersion", graft.Tables.dirFingerprint(s, dir)) {
      staging => buildExact(em, staging)
    }
    searchExact(s, path, em.filter(col("vec_id") < 10))
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
