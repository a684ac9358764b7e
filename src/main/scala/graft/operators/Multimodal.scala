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
      // Option: a NULL payload (doc with no media) must flow through the
      // encoder — it surfaces as NULL n_bytes/features, exactly what the
      // oracle's strlen(NULL)/list ops propagate
      .as[(Long, Option[Array[Byte]])]
      .mapPartitions { iter =>
        iter.grouped(BatchSize).flatMap { batch =>
          // one "model call" per micro-batch
          batch.map { case (id, bytes) =>
            (id, bytes.map(_.length.toLong), bytes.map(featurizeStub(_).toSeq))
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

  val FrameBytes = 16
  val FrameSampleK = 4

  /** q105: uniform frame sampling over a binary payload — the standard
    * video-model preprocessing step (sample K representative frames, not
    * every frame). The payload is treated as a sequence of fixed
    * [[FrameBytes]]-byte frames; sampled indices are
    * `floor(j * n_frames / K)` for `j = 0..K-1` (deduplicated when the
    * clip is shorter than K frames), the same uniform rule CLIP-style
    * video featurizers use. Frames surface as hex strings so the gated
    * output is plain sortable text; zero-byte payloads have no frames and
    * emit nothing.
    *
    * Scale notes: narrow per-row projection + a bounded explode (≤ K rows
    * out per doc) — no shuffle, fully codegen'd, embarrassingly parallel
    * over any partitioning. Reference analog: the frame-subsampling done
    * before batching media through the CLIP branch
    * (extracting_embeddings.py:154-183). */
  def frameSample(s: SparkSession, dir: String): DataFrame = frameSample(Tables.documents(s, dir))

  def frameSample(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
        octet_length(col("text")).cast("long").as("n_bytes"))
      .withColumn("n_frames", ceil(col("n_bytes") / lit(FrameBytes.toDouble)).cast("long"))
      .where(col("n_frames") > 0)
      // slice the ≤K frames out of the BINARY payload and hex only those
      // ≤K·FrameBytes bytes BEFORE the explode — hexing the whole payload
      // first would materialize a 2×-size string copy of the entire
      // corpus and duplicate it per frame row through the generate
      .select(col("doc_id"), explode(transform(
        array_distinct(transform(sequence(lit(0), lit(FrameSampleK - 1)),
          j => floor(j * col("n_frames") / lit(FrameSampleK.toDouble)).cast("long"))),
        i => struct(i.as("frame_idx"),
          hex(col("payload").substr((i * lit(FrameBytes) + lit(1)).cast("int"),
            lit(FrameBytes))).as("frame_hex")))).as("fr"))
      .select(col("doc_id"), col("fr.frame_idx").as("frame_idx"),
        col("fr.frame_hex").as("frame_hex"))
      .orderBy("doc_id", "frame_idx")

  /** q105 oracle: the same frame geometry in SQL — hex the UTF-8 bytes,
    * ceil to frame count, uniform floor-sampled indices, substring out
    * each 32-hex-char frame. Both engines do the index arithmetic in
    * doubles (`floor(j * n_frames / 4.0)`), so indices are bit-identical. */
  val frameSampleOracleSql: String =
    s"""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
       |    CAST(strlen(text) AS BIGINT) AS n_bytes FROM documents),
       |f AS (SELECT doc_id, hx,
       |    CAST(ceil(n_bytes / $FrameBytes.0) AS BIGINT) AS n_frames FROM b),
       |s AS (SELECT doc_id, hx, n_frames,
       |    unnest(list_distinct(list_transform(range(0, $FrameSampleK),
       |      j -> CAST(floor(j * n_frames / $FrameSampleK.0) AS BIGINT)))) AS frame_idx
       |  FROM f WHERE n_frames > 0)
       |SELECT doc_id, frame_idx,
       |  substring(hx, CAST(frame_idx * ${2 * FrameBytes} + 1 AS INTEGER), ${2 * FrameBytes}) AS frame_hex
       |FROM s ORDER BY doc_id, frame_idx""".stripMargin

  val ResizeDim = 8

  /** STUB resize for one media payload: "resize" the byte sequence to a
    * fixed [[ResizeDim]]-sample signal by segment-mean pooling — segment
    * k covers bytes `[floor(k*n/D), floor((k+1)*n/D))` and contributes
    * its mean. Deterministic and engine-portable; stands in for a real
    * decode → bilinear-resize → normalize step (no image codecs in this
    * runtime — replace at the marked line). */
  def resizeStub(bytes: Array[Byte]): Array[Double] = {
    // ??? <- real impl: decode(bytes) -> image -> resize(D) -> pixels
    val n = bytes.length
    Array.tabulate(ResizeDim) { k =>
      val lo = (k.toLong * n / ResizeDim).toInt
      val hi = ((k + 1).toLong * n / ResizeDim).toInt
      if (hi <= lo) 0.0
      else {
        var s = 0L
        var i = lo
        while (i < hi) { s += (bytes(i) & 0xff); i += 1 }
        s.toDouble / (hi - lo)
      }
    }
  }

  /** Partition-parallel batched resize over binary payloads — the same
    * [[BatchSize]]-row micro-batch mapPartitions shape as
    * [[imageFeaturize]] (one "codec/accelerator call" per batch); per-row
    * output is independent of batch and partition layout. */
  def imageResize(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      // NULL payload -> NULL outputs, same as [[imageFeaturize]]
      .as[(Long, Option[Array[Byte]])]
      .mapPartitions { iter =>
        iter.grouped(BatchSize).flatMap { batch =>
          // one "codec call" per micro-batch
          batch.map { case (id, bytes) =>
            (id, bytes.map(_.length.toLong), bytes.map(resizeStub(_).toSeq))
          }
        }
      }
      .toDF("doc_id", "n_bytes", "pixels")
      .orderBy("doc_id")
  }

  /** q106: [[imageResize]] flattened to scalar columns r0..r7 for the
    * value gate (same reason as [[imageFeaturizeFlat]]). */
  def imageResizeFlat(s: SparkSession, dir: String): DataFrame =
    imageResizeFlat(Tables.documents(s, dir))

  def imageResizeFlat(docs: DataFrame): DataFrame =
    imageResize(docs)
      .select(col("doc_id") +: col("n_bytes") +:
        (0 until ResizeDim).map(i => element_at(col("pixels"), i + 1).as(s"r$i")): _*)
      .orderBy("doc_id")

  /** q106 oracle: [[resizeStub]]'s segment-mean pooling replayed in SQL —
    * byte list recovered from hex as in the q36 oracle, segment bounds as
    * `floor(k*n/D)` (exact in doubles at these magnitudes, matching the
    * Scala integer division), sum as BIGINT then one double division, so
    * every mean is bit-identical to the Scala fold. */
  val imageResizeOracleSql: String = {
    val bounds = (0 until ResizeDim).map { k =>
      s"CAST(floor($k * n_bytes / $ResizeDim.0) AS BIGINT) AS lo$k, " +
        s"CAST(floor(${k + 1} * n_bytes / $ResizeDim.0) AS BIGINT) AS hi$k"
    }.mkString(",\n    ")
    val cols = (0 until ResizeDim).map { k =>
      s"""  CASE WHEN hi$k <= lo$k THEN CAST(0 AS DOUBLE)
         |    ELSE CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_slice(ub, lo$k + 1, hi$k)), (a, x) -> a + x) AS DOUBLE)
         |      / (hi$k - lo$k) END AS r$k""".stripMargin
    }.mkString(",\n")
    s"""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
       |    CAST(strlen(text) AS BIGINT) AS n_bytes FROM documents),
       |u AS (SELECT doc_id, n_bytes,
       |    list_transform(range(0, CAST(n_bytes AS INTEGER)),
       |      i -> CAST(('0x' || substring(hx, CAST(i AS INTEGER)*2 + 1, 2)) AS BIGINT)) AS ub
       |  FROM b),
       |g AS (SELECT doc_id, n_bytes, ub,
       |    $bounds
       |  FROM u)
       |SELECT doc_id, n_bytes,
       |$cols
       |FROM g ORDER BY doc_id""".stripMargin
  }

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
      |  CASE WHEN n_bytes IS NULL THEN NULL WHEN n_bytes = 0 THEN CAST(0 AS DOUBLE) ELSE
      |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), ub),
      |      (a, x) -> (a * 31 + x) % 1000000007) AS DOUBLE) END AS f5
      |FROM m ORDER BY doc_id""".stripMargin
}
