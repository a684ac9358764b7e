package graft

import graft.operators.TableStats

/** q201 per-column stats: typed min/max, exact NDV/null counts, HLL
  * registers present and sane beside the exact truth. */
class TableStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def orders(rows: (Option[Long], Option[Long], Option[String], Option[String])*) =
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

  test("typed min/max: integer 10 ranks above 9 (no lexicographic ordering)") {
    val out = TableStats.tableStats(orders(
      (Some(9L), Some(1L), Some("A"), Some("x")),
      (Some(10L), Some(1L), None, Some("x")),
      (None, Some(2L), Some("B"), Some("x"))))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val ok = out("o_orderkey")
    assert(ok.getAs[Long]("n_rows") == 3L && ok.getAs[Long]("n_null") == 1L)
    assert(ok.getAs[Long]("ndv") == 2L)
    assert(ok.getAs[String]("min_s") == "9" && ok.getAs[String]("max_s") == "10")
    val ck = out("o_custkey")
    assert(ck.getAs[Long]("n_null") == 0L && ck.getAs[Long]("ndv") == 2L)
    assert(ck.getAs[String]("min_s") == "1" && ck.getAs[String]("max_s") == "2")
    val st = out("o_orderstatus")
    assert(st.getAs[Long]("n_null") == 1L && st.getAs[Long]("ndv") == 2L)
    assert(st.getAs[String]("min_s") == "A" && st.getAs[String]("max_s") == "B")
    val pr = out("o_orderpriority")
    assert(pr.getAs[Long]("ndv") == 1L)
  }

  test("HLL sketch arm: registers bounded by M, estimate positive, tracks NDV direction") {
    val rows = (1L to 300L).map(i =>
      (Some(i), Some(i % 7), Option(s"s${i % 3}"), Some("p")))
    val out = TableStats.tableStats(orders(rows: _*))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    for ((_, r) <- out) {
      assert(r.getAs[Long]("n_hll_regs") >= 1L &&
        r.getAs[Long]("n_hll_regs") <= graft.operators.Hll.M.toLong)
      assert(r.getAs[Double]("est_r") > 0.0)
    }
    // 300 distinct keys fill far more registers than a 3-value enum
    assert(out("o_orderkey").getAs[Long]("n_hll_regs") >
      out("o_orderstatus").getAs[Long]("n_hll_regs"))
    assert(out("o_orderpriority").getAs[Long]("ndv") == 1L &&
      out("o_orderpriority").getAs[Long]("n_hll_regs") == 1L)
  }

  test("sf gate shape: one row per profiled column, n_rows constant") {
    val out = TableStats.tableStats(spark, sfDir).collect()
    assert(out.map(_.getAs[String]("col_name")).toSeq ===
      TableStats.ProfiledCols.sorted)
    assert(out.map(_.getAs[Long]("n_rows")).distinct.length == 1)
    assert(out.forall(r => r.getAs[Long]("ndv") >= 1L))
  }
}
