package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (reference analog: the CLIP image branch's
  * fetch/decode/normalize pipeline, extracting_embeddings.py:154-183).
  * Media lives in opaque `binary` columns with typed metadata alongside;
  * no image/audio codecs exist in this environment, so the decode step is
  * a clearly-marked deterministic STUB — everything around it (schema,
  * batching, partition-parallel execution) is the real shape a featurizer
  * runs in.
  *
  * Scale notes: q35 is a narrow projection (codegen'd). q36 is
  * mapPartitions with an internal micro-batch loop — the exact execution
  * shape of a GPU/ONNX batch featurizer (one model invocation per batch,
  * not per row); output is per-row deterministic, so results don't depend
  * on partitioning.
  */
object Multimodal {

  /** q35: binary payload + typed metadata — byte length, content hash,
    * and stub-decoded dimensions derived from the hash (deterministic,
    * engine-portable). The payload surfaces as `payload_hex` (hex of the
    * raw bytes) so the compared output is a plain sortable string; the
    * in-pipeline representation stays `binary` (see [[binaryPayload]]). */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame = multimodalMeta(Tables.documents(s, dir))

  /** The opaque binary media column as a pipeline would carry it. */
  def binaryPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  def multimodalMeta(docs: DataFrame): DataFrame = {
    val h = TextAnalysis.md5Long(col("text"))
    docs.select(
        col("doc_id"),
        hex(col("text").cast("binary")).as("payload_hex"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        md5(col("text")).as("content_hash"),
        lit("image/png").as("mime"),
        (h % 1920L + 1L).as("width"),
        (shiftright(h, 8) % 1080L + 1L).as("height"))
      .orderBy("doc_id")
  }

  val FeatureDim = 6
  val BatchSize = 32

  /** STUB decode+featurize for one media payload. Stands in for a real
    * image decode + model forward pass; deterministic per payload so the
    * operator is testable. Replace with a real codec/model at the marked
    * line when the runtime has one. */
  def featurizeStub(bytes: Array[Byte]): Array[Double] = {
    // ??? <- real impl: decode(bytes) -> tensor -> model.forward(batch)
    if (bytes.isEmpty) Array.fill(FeatureDim)(0.0)
    else {
      val u = bytes.map(b => (b & 0xff).toDouble)
      val mean = u.sum / u.length
      val variance = u.map(x => (x - mean) * (x - mean)).sum / u.length
      Array(u.length.toDouble, mean, variance, u.min, u.max,
        u.foldLeft(0L)((acc, x) => (acc * 31 + x.toLong) % 1000000007L).toDouble)
    }
  }

  /** Partition-parallel batched featurization over binary payloads.
    * Batches of [[BatchSize]] rows are featurized together (the GPU
    * shape); per-row output is independent of batch/partition layout.
    * Returns the feature vector as an `array<double>` column. */
  def imageFeaturize(s: SparkSession, dir: String): DataFrame = imageFeaturize(Tables.documents(s, dir))

  def imageFeaturize(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.grouped(BatchSize).flatMap { batch =>
          // one "model call" per micro-batch
          batch.map { case (id, bytes) =>
            (id, bytes.length.toLong, featurizeStub(bytes).toSeq)
          }
        }
      }
      .toDF("doc_id", "n_bytes", "features")
      .orderBy("doc_id")
  }

  /** q36: [[imageFeaturize]] with the feature vector flattened to scalar
    * columns f0..f5 — the rows-only gate sorts/hashes every output
    * column, so the compared surface must be scalar, not array. */
  def imageFeaturizeFlat(s: SparkSession, dir: String): DataFrame =
    imageFeaturizeFlat(Tables.documents(s, dir))

  def imageFeaturizeFlat(docs: DataFrame): DataFrame =
    imageFeaturize(docs)
      .select(col("doc_id") +: col("n_bytes") +:
        (0 until FeatureDim).map(i => element_at(col("features"), i + 1).as(s"f$i")): _*)
      .orderBy("doc_id")

  /** q36 oracle: [[featurizeStub]]'s arithmetic replayed in SQL over the
    * UTF-8 bytes of `text` (recovered by parsing hex(encode(text)) two
    * chars at a time) — the q40/q54 baked-constants technique applied to
    * the stub itself. Every fold is a sequential left fold with the same
    * seed and association as the Scala code (`list_prepend` +
    * `list_reduce` ≡ `foldLeft`), so the doubles are bit-identical. */
  val imageFeaturizeOracleSql: String =
    """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
      |    CAST(strlen(text) AS BIGINT) AS n_bytes FROM documents),
      |u AS (SELECT doc_id, n_bytes,
      |    list_transform(range(0, CAST(n_bytes AS INTEGER)),
      |      i -> CAST(('0x' || substring(hx, CAST(i AS INTEGER)*2 + 1, 2)) AS BIGINT)) AS ub
      |  FROM b),
      |d AS (SELECT doc_id, n_bytes, ub,
      |    list_transform(ub, x -> CAST(x AS DOUBLE)) AS ud FROM u),
      |m AS (SELECT doc_id, n_bytes, ub, ud,
      |    CASE WHEN n_bytes = 0 THEN CAST(0 AS DOUBLE) ELSE
      |      list_reduce(list_prepend(CAST(0 AS DOUBLE), ud), (x,y) -> x+y) / len(ud)
      |    END AS mean
      |  FROM d)
      |SELECT doc_id, n_bytes,
      |  CAST(n_bytes AS DOUBLE) AS f0,
      |  mean AS f1,
      |  CASE WHEN n_bytes = 0 THEN CAST(0 AS DOUBLE) ELSE
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(ud, x -> (x - mean) * (x - mean))), (x,y) -> x+y) / len(ud)
      |  END AS f2,
      |  CASE WHEN n_bytes = 0 THEN CAST(0 AS DOUBLE)
      |    ELSE list_aggregate(ud, 'min') END AS f3,
      |  CASE WHEN n_bytes = 0 THEN CAST(0 AS DOUBLE)
      |    ELSE list_aggregate(ud, 'max') END AS f4,
      |  CASE WHEN n_bytes = 0 THEN CAST(0 AS DOUBLE) ELSE
      |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), ub),
      |      (a, x) -> (a * 31 + x) % 1000000007) AS DOUBLE) END AS f5
      |FROM m ORDER BY doc_id""".stripMargin
}
