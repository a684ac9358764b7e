package graft

import graft.operators.Search

class SearchSpec extends SparkTestBase {
  import spark.implicits._

  test("q60 bm25: ranking follows tf saturation and doc-length normalization") {
    val d = Seq(
      // two hits of one term, short doc -> best
      (1L, "spark spark runs fast"),
      // one hit each of two terms beats two of one (idf-weighted sum)
      (2L, "spark join runs fast"),
      (3L, "spark runs fast here"),
      // same tf as 3 but longer doc -> length-normalized below 3
      (4L, "spark runs very very very very very very fast today"),
      (5L, "nothing relevant at all")
    ).toDF("doc_id", "text")
    val out = Search.bm25(d).collect()
    val ids = out.map(_.getAs[Long]("doc_id"))
    assert(!ids.contains(5L)) // zero-score docs never rank
    val score = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score_r")).toMap
    assert(score(2L) > score(3L)) // two distinct terms beat one
    assert(score(3L) > score(4L)) // shorter doc wins at equal tf
    assert(score(1L) > score(3L)) // higher tf wins at equal length
  }

  test("q60 on the corpus: exactly TopN rows, scores positive and descending") {
    val out = Search.bm25(spark, sfDir).collect()
    assert(out.length === Search.TopN)
    val scores = out.map(_.getAs[Double]("score_r"))
    assert(scores.forall(_ > 0.0))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b })
  }
}
