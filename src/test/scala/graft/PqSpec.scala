package graft

import org.apache.spark.sql.functions._
import graft.operators.{PqOp, Similarity}

/** Product quantization (q111/q112): codebook geometry, ADC ranking
  * behavior on planted structure, and the rerank contract (shortlist
  * honesty + exact-top-1 recovery). */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  /** Planted 64-dim corpus with two tight clusters along different
    * axes plus the query's exact twin — PQ must rank the twin first
    * and the same-cluster vectors above the far cluster. Base vectors
    * get small deterministic jitter so Lloyd rounds see real spread. */
  private lazy val planted = {
    def v(axis: Int, jitter: Int): Array[Float] = {
      val a = Array.fill(64)(0.0f)
      a(axis) = 10.0f
      a((axis + 7) % 64) = 0.01f * jitter
      a
    }
    // ids ≥ PqOp.Ks so seeds (vec_id < Ks) come from the mixed head rows
    val head = (0 until PqOp.Ks).map(i => (i.toLong, v(i % 4, i)))
    val clusterA = (20 until 26).map(i => (i.toLong, v(0, i - 20)))
    val clusterB = (30 until 36).map(i => (i.toLong, v(32, i - 30)))
    (head ++ clusterA ++ clusterB).toDF("vec_id", "embedding")
  }

  test("fused trainSubs equals the per-subspace trainSub reference bitwise") {
    // the fused one-aggregate-per-round trainer must reproduce the M
    // independent Lloyd chains exactly (same seeds, same assignments,
    // same recenter sums) on the planted corpus AND the real one
    for (em <- Seq(planted, Tables.embeddings(spark, sfDir))) {
      val qv = PqOp.unitQuantized(em).localCheckpoint()
      val fused = PqOp.trainSubs(qv)
      val ref = (0 until PqOp.M).map(m => PqOp.trainSub(qv, m))
      assert(fused === ref)
    }
  }

  test("q111 ADC: exact twin ranks first; same-axis cluster beats far cluster") {
    val out = PqOp.pqAdcTopK(planted).collect()
    // query 0 is axis-0: its candidates at rank 1..k must all be axis-0
    // vectors (head ids 0/4 pattern or clusterA 20..25), never clusterB
    val q0 = out.filter(_.getAs[Long]("query_id") == 0L)
    assert(q0.nonEmpty)
    val topIds = q0.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("neighbor_id"))
    assert(!topIds.take(3).exists(id => id >= 30L && id < 36L),
      s"far-cluster id in ADC top-3: ${topIds.mkString(",")}")
    // ADC distances are nonnegative (squared L2 in original units) and
    // nondecreasing with rank
    val dists = q0.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("dist_r"))
    assert(dists.forall(_ >= -1e-9))
    assert(dists.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
  }

  test("q112 rerank: exact cosine top-1 of the shortlist, ranks by true sim") {
    val out = PqOp.pqRerankTopK(planted).collect()
    val q0 = out.filter(_.getAs[Long]("query_id") == 0L).sortBy(_.getAs[Long]("rank"))
    // rank-1 neighbor for the axis-0 query must be an axis-0 vector with
    // sim ~1 (the cluster is nearly collinear)
    assert(q0.head.getAs[Double]("sim_r") > 0.999,
      s"rerank top-1 sim ${q0.head.getAs[Double]("sim_r")}")
    // sims nonincreasing with rank
    val sims = q0.map(_.getAs[Double]("sim_r"))
    assert(sims.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("rerank with full shortlist EQUALS brute-force cosine ranking") {
    // the machinery-correctness limit: shortlistK ≥ corpus size means
    // nothing is pruned, so two-stage retrieval must reproduce q27's
    // exact ranking (sim desc, id asc ties) row for row
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Similarity.bruteForceTopK(emb).collect()
      .filter(r => r.getAs[Long]("query_id") < PqOp.NQ && r.getAs[Long]("rank") <= PqOp.TopK)
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim_r"))).toSet
    val full = PqOp.pqRerankTopK(emb, emb.count().toInt).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim_r"))).toSet
    assert(full === exact)
  }

  test("rerank top-1 recall on the real corpus is high at the default shortlist") {
    // ADC is approximate: on a mostly-random corpus some queries' true
    // NN is only marginally better than the pack, so demand a floor,
    // not perfection (the planted-structure tests above pin the cases
    // where a real neighbor signal exists)
    val exact = Similarity.bruteForceTopK(spark, sfDir).collect()
      .filter(r => r.getAs[Long]("rank") == 1L && r.getAs[Long]("query_id") < PqOp.NQ)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val rr = PqOp.pqRerankTopK(spark, sfDir).collect()
      .filter(_.getAs[Long]("rank") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val agree = exact.keySet.count(q => rr.get(q).contains(exact(q)))
    assert(agree * 4 >= exact.size * 3,
      s"rerank top-1 recall $agree/${exact.size}: exact=$exact rr=$rr")
  }

  test("q183: recall audit — truth-sized rows, rerank never below raw ADC") {
    val out = PqOp.pqRecall(spark, sfDir).collect()
    assert(out.length === PqOp.NQ)
    out.foreach { r =>
      assert(r.getAs[Long]("n_truth") === PqOp.TopK.toLong)
      val adc = r.getAs[Long]("hits_adc")
      val rr = r.getAs[Long]("hits_rerank")
      assert(adc >= 0L && adc <= PqOp.TopK)
      assert(rr >= 0L && rr <= PqOp.TopK)
      // the 50-shortlist rerank scores the ADC top-5's superset with
      // exact cosine, so every truth member ADC surfaced stays surfaced
      assert(rr >= adc,
        s"query ${r.getAs[Long]("query_id")}: rerank $rr < adc $adc")
    }
    // the rerank stage must be worth its cost somewhere on the corpus
    assert(out.map(_.getAs[Long]("hits_rerank")).sum >=
      out.map(_.getAs[Long]("hits_adc")).sum)
  }

  test("persisted index path equals the inline train path, row for row") {
    // the gated (s, dir) entry serves codebooks + codes from the
    // ArtifactStore; values must be identical to training in place —
    // run twice so the second call provably serves the existing artifact
    val emb = Tables.embeddings(spark, sfDir)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id"),
        r.getDouble(3))
    val inlineAdc = PqOp.pqAdcTopK(emb).collect().map(key).toSeq
    assert(PqOp.pqAdcTopK(spark, sfDir).collect().map(key).toSeq === inlineAdc)
    assert(PqOp.pqAdcTopK(spark, sfDir).collect().map(key).toSeq === inlineAdc)
    val inlineRr = PqOp.pqRerankTopK(emb).collect().map(key).toSeq
    assert(PqOp.pqRerankTopK(spark, sfDir).collect().map(key).toSeq === inlineRr)
  }

  test("wrong-dimension and NULL vectors cannot poison the codebooks") {
    val damaged = planted
      .union(Seq((100L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val out = PqOp.pqAdcTopK(damaged).collect()
    assert(out.nonEmpty)
    assert(!out.exists(_.getAs[Long]("neighbor_id") == 100L))
  }
}
