package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {

  test("q35 metadata: hex payload round-trips the bytes and hash-derived dims are in range") {
    val out = Multimodal.multimodalMeta(spark, sfDir).collect()
    out.foreach { r =>
      val hexPayload = r.getAs[String]("payload_hex")
      assert(hexPayload.length === 2 * r.getAs[Long]("n_bytes"))
      assert(hexPayload.forall(c => (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F')))
      assert(r.getAs[Long]("width") >= 1 && r.getAs[Long]("width") <= 1920)
      assert(r.getAs[Long]("height") >= 1 && r.getAs[Long]("height") <= 1080)
      assert(r.getAs[String]("content_hash").length === 32)
    }
  }

  test("q36 flat surface matches the array featurizer, all-scalar columns") {
    val flat = Multimodal.imageFeaturizeFlat(spark, sfDir)
    assert(flat.schema.fields.forall(f => !f.dataType.typeName.contains("array")))
    val arr = Multimodal.imageFeaturize(spark, sfDir).collect()
    val fl = flat.collect()
    assert(arr.length === fl.length)
    arr.zip(fl).foreach { case (a, f) =>
      assert(a.getAs[Long]("doc_id") === f.getAs[Long]("doc_id"))
      val feats = a.getSeq[Double](a.fieldIndex("features"))
      (0 until Multimodal.FeatureDim).foreach { i =>
        assert(feats(i) === f.getAs[Double](s"f$i"))
      }
    }
  }

  test("featurize stub is deterministic and shaped") {
    val bytes = "hello world".getBytes("UTF-8")
    val f1 = Multimodal.featurizeStub(bytes)
    val f2 = Multimodal.featurizeStub(bytes)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.length === Multimodal.FeatureDim)
    assert(f1(0) === 11.0) // n bytes
    assert(Multimodal.featurizeStub(Array.empty).toSeq === Seq.fill(Multimodal.FeatureDim)(0.0))
  }

  test("q105 frame sample: ≤K frames per doc, uniform indices, frames are real payload slices") {
    val docs = Tables.documents(spark, sfDir)
    val out = Multimodal.frameSample(spark, sfDir).collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.forall(_._2.length <= Multimodal.FrameSampleK))
    val texts = docs.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    byDoc.foreach { case (id, frames) =>
      val bytes = texts(id).getBytes("UTF-8")
      val nFrames = math.ceil(bytes.length / Multimodal.FrameBytes.toDouble).toLong
      val expectIdx = (0 until Multimodal.FrameSampleK)
        .map(j => math.floor(j * nFrames / Multimodal.FrameSampleK.toDouble).toLong)
        .distinct.sorted
      assert(frames.map(_.getAs[Long]("frame_idx")).sorted.toSeq === expectIdx)
      frames.foreach { f =>
        val idx = f.getAs[Long]("frame_idx").toInt
        val slice = bytes.slice(idx * Multimodal.FrameBytes, (idx + 1) * Multimodal.FrameBytes)
        assert(f.getAs[String]("frame_hex") === slice.map("%02X".format(_)).mkString)
      }
    }
    // zero-byte payloads emit no frames
    assert(!byDoc.keySet.exists(id => texts(id).isEmpty))
  }

  test("resize stub: segment means cover the whole payload, deterministic, zero-pads empty") {
    val bytes = (0 until 37).map(_.toByte).toArray
    val r = Multimodal.resizeStub(bytes)
    assert(r.length === Multimodal.ResizeDim)
    assert(r.toSeq === Multimodal.resizeStub(bytes).toSeq)
    // segment-mean of a 0..n-1 ramp stays within the byte range and is increasing
    assert(r.forall(x => x >= 0.0 && x <= 36.0))
    assert(r.sliding(2).forall(p => p(0) < p(1)))
    assert(Multimodal.resizeStub(Array.empty).toSeq === Seq.fill(Multimodal.ResizeDim)(0.0))
    // short payload (n < D): leading segments carry the bytes, empty ones are 0
    val short = Multimodal.resizeStub(Array[Byte](10, 20))
    assert(short.count(_ != 0.0) <= 2)
  }

  test("q106 flat surface matches the array resize, all-scalar columns") {
    val flat = Multimodal.imageResizeFlat(spark, sfDir)
    assert(flat.schema.fields.forall(f => !f.dataType.typeName.contains("array")))
    val arr = Multimodal.imageResize(Tables.documents(spark, sfDir)).collect()
    val fl = flat.collect()
    assert(arr.length === fl.length)
    arr.zip(fl).foreach { case (a, f) =>
      assert(a.getAs[Long]("doc_id") === f.getAs[Long]("doc_id"))
      val px = a.getSeq[Double](a.fieldIndex("pixels"))
      (0 until Multimodal.ResizeDim).foreach { i =>
        assert(px(i) === f.getAs[Double](s"r$i"))
      }
    }
  }

  test("q36 output is independent of partition/batch layout") {
    val out = Multimodal.imageFeaturize(spark, sfDir).collect()
    assert(out.length === Tables.documents(spark, sfDir).count())
    // rerun with a different partitioning upstream: same rows
    val docs = Tables.documents(spark, sfDir).repartition(13)
    docs.createOrReplaceTempView("unused") // force distinct lineage
    import spark.implicits._
    val re = docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(Multimodal.BatchSize).flatMap(_.map { case (id, b) =>
        (id, b.length.toLong, Multimodal.featurizeStub(b).toSeq) }))
      .toDF("doc_id", "n_bytes", "features")
      .orderBy("doc_id").collect()
    assert(out.map(_.toString).toSeq === re.map(_.toString).toSeq)
  }
}
