package graft

import graft.operators.Cluster

/** k-core peel (q195): planted peel semantics, cascade removal,
  * parameterized k, fixture convergence inside the fixed rounds. */
class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  private def edges(rows: (Long, Long)*) =
    rows.toDF("a_id", "b_id")

  private def result(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("triangle survives the 2-core; chain and pendant peel away") {
    // triangle {1,2,3}; chain 4-5-6; pendant 7 hanging off the triangle
    val out = Cluster.kcoreGraph(edges(
      (1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (1L, 7L))).collect()
    assert(result(out) == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("peeling cascades: removing a leaf re-exposes its neighbor") {
    // path 1-2-3-4-5: every interior node has degree 2 at the START,
    // but peeling the endpoints cascades until nothing is left
    val out = Cluster.kcoreGraph(edges(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))).collect()
    assert(out.isEmpty)
  }

  test("a 4-cycle is exactly its own 2-core but has no 3-core; K4 does") {
    val cyc = edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    assert(result(Cluster.kcoreGraph(cyc).collect()) ==
      Seq((1L, 2L), (2L, 2L), (3L, 2L), (4L, 2L)))
    assert(Cluster.kcoreGraph(cyc, k = 3).collect().isEmpty)
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(result(Cluster.kcoreGraph(k4, k = 3).collect()) ==
      Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("empty edge set yields an empty core") {
    assert(Cluster.kcoreGraph(edges()).collect().isEmpty)
  }

  test("fixture graph reaches fixpoint inside the fixed rounds") {
    val sfDir = "/root/testdata/sf0.001"
    val atR = Cluster.kcore(spark, sfDir).collect()
    // run with extra rounds over the same edge table
    val pairs = graft.operators.ApproxDedup
      .ngramJaccardPairs(graft.Tables.documents(spark, sfDir))
      .select("a_id", "b_id")
    val atMore = Cluster.kcoreGraph(pairs, rounds = Cluster.KCoreRounds + 2)
      .collect()
    assert(result(atR).nonEmpty)
    assert(result(atR) == result(atMore))
  }
}
