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

  test("q206 FD audit: a determining column scores 1.0; a full cross scores independent") {
    // o_orderkey unique -> o_orderkey determines o_custkey (fd 1.0);
    // (o_custkey, o_orderstatus) covers all 2x2 combos -> indep_r = 1.0
    val out = TableStats.fdAudit(orders(
      (Some(1L), Some(10L), Some("A"), Some("p")),
      (Some(2L), Some(10L), Some("B"), Some("p")),
      (Some(3L), Some(20L), Some("A"), Some("p")),
      (Some(4L), Some(20L), Some("B"), Some("p"))))
      .collect().map(r => (r.getAs[String]("col_a"), r.getAs[String]("col_b")) -> r).toMap
    val key = out(("o_orderkey", "o_custkey"))
    assert(key.getAs[Long]("ndv_a") == 4L && key.getAs[Long]("ndv_ab") == 4L)
    assert(key.getAs[Double]("fd_ab_r") == 1.0)
    val cross = out(("o_custkey", "o_orderstatus"))
    assert(cross.getAs[Long]("ndv_ab") == 4L)
    assert(cross.getAs[Double]("indep_r") == 1.0)
    assert(cross.getAs[Double]("fd_ab_r") == 0.5)
  }

  test("q206 FD audit: NULL in either column drops the row from that pair only") {
    val out = TableStats.fdAudit(orders(
      (Some(1L), Some(10L), Some("A"), Some("p")),
      (Some(2L), None, Some("B"), Some("p")),
      (None, Some(30L), Some("C"), Some("p"))))
      .collect().map(r => (r.getAs[String]("col_a"), r.getAs[String]("col_b")) -> r).toMap
    assert(out(("o_orderkey", "o_custkey")).getAs[Long]("n") == 1L)
    assert(out(("o_custkey", "o_orderstatus")).getAs[Long]("n") == 2L)
    assert(out(("o_orderpriority", "o_orderstatus")).getAs[Long]("n") == 3L)
  }
}
