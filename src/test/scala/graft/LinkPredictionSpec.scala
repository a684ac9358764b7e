package graft

import graft.operators.Cluster

/** Common-neighbor link prediction (q208): wedge counting, adjacency
  * exclusion, global degrees, multi-neighbor accumulation. */
class LinkPredictionSpec extends SparkTestBase {
  import spark.implicits._

  private def edges(rows: (Long, Long)*) =
    rows.toDF("a_id", "b_id")

  private def rows(out: Array[org.apache.spark.sql.Row]) =
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq

  test("open wedge predicts its missing link; a closed triangle predicts nothing") {
    val open = Cluster.commonNeighborsGraph(edges((1L, 2L), (2L, 3L))).collect()
    assert(rows(open) == Seq((1L, 3L, 1L, 1L, 1L)))
    val closed = Cluster.commonNeighborsGraph(
      edges((1L, 2L), (2L, 3L), (1L, 3L))).collect()
    assert(closed.isEmpty, "adjacent pairs must be anti-joined away")
  }

  test("counts accumulate over multiple shared neighbors") {
    // 1 and 2 both neighbor 3 and 4: candidates (1,2) and (3,4), two
    // common neighbors each, every degree 2
    val out = Cluster.commonNeighborsGraph(
      edges((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))).collect()
    assert(rows(out) == Seq((1L, 2L, 2L, 2L, 2L), (3L, 4L, 2L, 2L, 2L)))
  }

  test("hub leaves pair up through the center with the hub's degree visible") {
    val out = Cluster.commonNeighborsGraph(
      edges((0L, 1L), (0L, 2L), (0L, 3L))).collect()
    assert(rows(out) == Seq(
      (1L, 2L, 1L, 1L, 1L), (1L, 3L, 1L, 1L, 1L), (2L, 3L, 1L, 1L, 1L)))
  }

  test("empty edge set predicts nothing") {
    assert(Cluster.commonNeighborsGraph(edges()).collect().isEmpty)
  }
}
