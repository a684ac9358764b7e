package graft

import org.apache.spark.sql.functions._
import graft.operators.Fusion

class FusionSpec extends SparkTestBase {
  import spark.implicits._

  test("q162 rrf: agreement across arms beats the best single-arm rank") {
    // query 0: cand 2 is the PERFECT semantic match (cosine 1) but shares
    // no words; cand 1 is semantically orthogonal but rank-1 lexically AND
    // rank-2 semantically — RRF must fuse cand 1 above cand 2.
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha beta gamma"),
      (2L, "delta epsilon zeta")
    ).toDF("doc_id", "text")
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Fusion.hybridRrf(docs, vecs)
      .filter(col("query_id") === 0L).collect()
    val byCand = out.map(r => r.getAs[Long]("cand_id") ->
      (r.getAs[Long]("rank_sem"), r.getAs[Long]("rank_lex"),
        r.getAs[Double]("rrf_r"), r.getAs[Long]("fused_rank"))).toMap
    // semantic arm: cand2 sim=1 (rank 1), cand1 sim=0 (rank 2);
    // lexical arm: cand1 jaccard=1 (rank 1), cand2 inter=0 (absent)
    assert(byCand(2L)._1 === 1L && byCand(2L)._2 === 0L)
    assert(byCand(1L)._1 === 2L && byCand(1L)._2 === 1L)
    // fused: 1/(60+2)+1/(60+1) > 1/(60+1)
    assert(byCand(1L)._4 === 1L && byCand(2L)._4 === 2L)
    val expect1 = BigDecimal(1.0 / 62.0 + 1.0 / 61.0)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byCand(1L)._3 === expect1)
  }

  test("q162 rrf: corpus run — ranks well-formed, rrf matches its ranks") {
    val out = Fusion.hybridRrf(spark, sfDir).collect()
    assert(out.nonEmpty)
    val perQuery = out.groupBy(_.getAs[Long]("query_id"))
    perQuery.foreach { case (_, rows) =>
      val franks = rows.map(_.getAs[Long]("fused_rank")).sorted
      assert(franks.toSeq === (1L to franks.length).toSeq) // contiguous
      assert(franks.length <= Fusion.FusedK)
    }
    out.foreach { r =>
      def c(rank: Long) = if (rank > 0) 1.0 / (Fusion.RrfK + rank.toDouble) else 0.0
      val expect = BigDecimal(c(r.getAs[Long]("rank_sem")) + c(r.getAs[Long]("rank_lex")))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("rrf_r") === expect)
      assert(r.getAs[Long]("rank_sem") > 0 || r.getAs[Long]("rank_lex") > 0)
    }
  }
}
