package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketch

/** KMV distinct-overlap sketch (q209): closed forms on identical and
  * disjoint sources, multiset-invariance (distinct semantics), the
  * saturated estimator branch, and exact truth arms. */
class KmvSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")

  test("identical sources: sketch is exact below K and rho saturates") {
    val d = docs((1L to 5L).flatMap(i =>
      Seq((i, s"text $i", "A"), (i + 10, s"text $i", "B"))): _*)
    val out = Sketch.kmvOverlap(d).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("source_a") == "A" && r.getAs[String]("source_b") == "B")
    assert(r.getAs[Long]("k_used") == 5L)
    assert(r.getAs[Long]("rho") == 5L)
    assert(r.getAs[Long]("exact_union") == 5L)
    assert(r.getAs[Long]("exact_intersect") == 5L)
    assert(r.getAs[Double]("est_union_r") == 5.0)
    assert(r.getAs[Double]("est_intersect_r") == 5.0)
  }

  test("disjoint sources: rho and both intersection arms are zero") {
    val d = docs(
      (1L, "alpha", "A"), (2L, "beta", "A"), (3L, "gamma", "A"),
      (4L, "delta", "B"), (5L, "epsilon", "B"), (6L, "zeta", "B"))
    val r = Sketch.kmvOverlap(d).collect().head
    assert(r.getAs[Long]("k_used") == 6L)
    assert(r.getAs[Long]("rho") == 0L)
    assert(r.getAs[Long]("exact_union") == 6L)
    assert(r.getAs[Long]("exact_intersect") == 0L)
    assert(r.getAs[Double]("est_union_r") == 6.0)
    assert(r.getAs[Double]("est_intersect_r") == 0.0)
  }

  test("multiset-invariant: duplicate texts inside a source change nothing") {
    val base = docs((1L, "x", "A"), (2L, "y", "A"), (3L, "x", "B"))
    val duped = docs((1L, "x", "A"), (2L, "y", "A"), (9L, "x", "A"),
      (8L, "y", "A"), (3L, "x", "B"), (7L, "x", "B"))
    assert(Sketch.kmvOverlap(base).collect().toSeq ==
      Sketch.kmvOverlap(duped).collect().toSeq)
  }

  test("partial overlap: truth arms are exact") {
    val d = docs(
      (1L, "only a 1", "A"), (2L, "only a 2", "A"), (3L, "shared 1", "A"),
      (4L, "shared 2", "A"),
      (5L, "only b 1", "B"), (6L, "shared 1", "B"), (7L, "shared 2", "B"))
    val r = Sketch.kmvOverlap(d).collect().head
    assert(r.getAs[Long]("exact_intersect") == 2L)
    assert(r.getAs[Long]("exact_union") == 5L)
    assert(r.getAs[Long]("k_used") == 5L) // union below K: sketch == set
    assert(r.getAs[Long]("rho") == 2L)
    assert(r.getAs[Double]("est_intersect_r") == 2.0)
  }

  test("saturated branch: 600-distinct identical sources estimate within " +
      "the KMV error envelope and keep exact arms exact") {
    val n = 600
    val d = docs((1 to n).flatMap(i =>
      Seq((i.toLong, s"document number $i body", "A"),
        (i.toLong + 10000, s"document number $i body", "B"))): _*)
    val r = Sketch.kmvOverlap(d).collect().head
    assert(r.getAs[Long]("k_used") == Sketch.KmvK.toLong)
    assert(r.getAs[Long]("rho") == Sketch.KmvK.toLong) // identical sets agree everywhere
    assert(r.getAs[Long]("exact_union") == n.toLong)
    assert(r.getAs[Long]("exact_intersect") == n.toLong)
    val est = r.getAs[Double]("est_union_r")
    // (K-1)/U_(K) with K=256 has ~6% relative sigma; 400..900 is >5 sigma
    assert(est > 400 && est < 900, s"NDV estimate $est implausible for n=$n")
    // identical sources: intersection estimate equals the union estimate
    assert(r.getAs[Double]("est_intersect_r") == r.getAs[Double]("est_union_r"))
  }

  test("three sources yield all three ordered pairs") {
    val d = docs((1L, "t1", "A"), (2L, "t2", "B"), (3L, "t3", "C"))
    val pairs = Sketch.kmvOverlap(d).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b"))).toSeq
    assert(pairs == Seq(("A", "B"), ("A", "C"), ("B", "C")))
  }

  test("null text and null source rows are excluded, not hashed") {
    val d = Seq(
      (1L, "x", "A"), (2L, null.asInstanceOf[String], "A"),
      (3L, "x", null.asInstanceOf[String]), (4L, "y", "B"))
      .toDF("doc_id", "text", "source")
    val r = Sketch.kmvOverlap(d).collect().head
    assert(r.getAs[Long]("exact_union") == 2L)
    assert(r.getAs[Long]("exact_intersect") == 0L)
  }
}
