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
