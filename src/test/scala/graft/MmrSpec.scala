package graft

import org.apache.spark.sql.functions._
import graft.operators.Mmr

class MmrSpec extends SparkTestBase {
  import spark.implicits._

  test("q168 mmr: redundant near-dup is deferred behind the diverse pick") {
    // query 0; c1/c2 identical high-rel twins, c3 moderately relevant but
    // far from c1 — plain top-k returns (c1, c2, c3); MMR must interleave
    // the diverse c3 before the redundant twin c2. Only 3 candidates, so
    // rounds 4-5 no-op (the early-stop LEFT-join edge).
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.3f, 0.0f)),
      (2L, Array(0.9f, 0.3f, 0.0f)),
      (3L, Array(0.85f, 0.0f, 0.4f))
    ).toDF("vec_id", "embedding")
    val out = Mmr.mmrDiversify(vecs)
      .filter(col("query_id") === 0L).collect()
      .sortBy(_.getAs[Long]("mmr_step"))
      .map(r => (r.getAs[Long]("mmr_step"), r.getAs[Long]("cand_id")))
    assert(out.toSeq === Seq((1L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("q168 mmr: equal-score ties break on the LOWER cand_id") {
    // c1 and c2 are the same vector (identical rel to the query, and
    // psim(c1,c2)=1): step 1 must take cand_id 1, and after the winner
    // saturates the twin's msim the diverse c3 must precede it
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.3f, 0.0f)),
      (1L, Array(0.9f, 0.3f, 0.0f)),
      (3L, Array(0.85f, 0.0f, 0.4f))
    ).toDF("vec_id", "embedding")
    val out = Mmr.mmrDiversify(vecs)
      .filter(col("query_id") === 0L).collect()
      .sortBy(_.getAs[Long]("mmr_step"))
      .map(r => (r.getAs[Long]("mmr_step"), r.getAs[Long]("cand_id")))
    assert(out.toSeq === Seq((1L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("q168 mmr: step 1 is the relevance argmax; picks are distinct (corpus)") {
    val out = Mmr.mmrDiversify(spark, sfDir).collect()
    assert(out.nonEmpty)
    val perQuery = out.groupBy(_.getAs[Long]("query_id"))
    perQuery.foreach { case (_, rows) =>
      val steps = rows.map(_.getAs[Long]("mmr_step")).sorted
      assert(steps.toSeq === (1L to steps.length).toSeq)
      assert(steps.length <= Mmr.SelK)
      val cands = rows.map(_.getAs[Long]("cand_id"))
      assert(cands.distinct.length === cands.length)
      // step 1 must be the pure-relevance winner (λ·rel with empty S)
      val first = rows.minBy(_.getAs[Long]("mmr_step"))
      val maxRel = rows.map(_.getAs[Double]("rel_r")).max
      assert(first.getAs[Double]("rel_r") === maxRel ||
        // a later pick can only out-rel step 1 if it tied and lost on id
        rows.filter(r => r.getAs[Double]("rel_r") == maxRel)
          .minBy(_.getAs[Long]("cand_id")) == first)
      // margins never increase along the greedy sequence (pool shrinks,
      // msim only grows)
      val scores = rows.sortBy(_.getAs[Long]("mmr_step")).map(_.getAs[Double]("mmr_margin"))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    }
  }
}
