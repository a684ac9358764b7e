package graft

import graft.operators.Cluster

/** k-core peel (q195): planted peel semantics, cascade removal,
  * parameterized k, fixpoint on deep chains, throwing rounds cap. */
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

  test("deep chain peels to fixpoint: a 12-node path fully dissolves " +
      "while an attached triangle survives") {
    // a 12-node path needs 6 synchronous peel rounds to empty — the old
    // fixed 4-round peel left a 4-node remnant and mislabeled it "core".
    // Hang a triangle off node 1 so the true 2-core is non-empty.
    val chain = (1L to 11L).map(i => (i, i + 1))
    val tri = Seq((1L, 100L), (1L, 101L), (100L, 101L))
    val out = Cluster.kcoreGraph(edges(chain ++ tri: _*)).collect()
    assert(result(out) == Seq((1L, 2L), (100L, 2L), (101L, 2L)))
  }

  test("rounds cap throws instead of truncating") {
    // a 10-node path needs 5 rounds; cap at 2 must fail loudly
    val chain = (1L to 9L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] {
      Cluster.kcoreGraph(edges(chain: _*), maxRounds = 2).collect()
    }
    assert(ex.getMessage.contains("refusing to truncate"))
  }

  test("fixture pair graph converges well inside the oracle unroll") {
    val sfDir = "/root/testdata/sf0.001"
    val atFix = Cluster.kcore(spark, sfDir).collect()
    assert(result(atFix).nonEmpty)
    // the converged core is a genuine fixpoint: one more synchronous
    // peel over the result's own edge restriction changes nothing —
    // equivalently, every reported core_degree is ≥ K
    assert(atFix.forall(_.getLong(1) >= Cluster.KCoreK.toLong))
  }
}
