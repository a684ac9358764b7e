package graft

import graft.operators.Itemsets

/** Association rules (q189): planted-basket arithmetic, a-priori
  * pruning, per-basket distinctness, NULL handling. */
class ItemsetsSpec extends SparkTestBase {
  import spark.implicits._

  private def li(rows: (Long, Long)*) =
    rows.toDF("l_orderkey", "l_partkey")
  private def parts(rows: (Long, String)*) =
    rows.toDF("p_partkey", "p_brand")

  test("pair support, confidence, and lift on a planted basket set") {
    val p = parts((1L, "A"), (2L, "B"), (3L, "C"), (4L, "D"))
    // baskets: 1={A,B,C} 2={A,B} 3={A,C} 4={B,C} 5={A,D}
    val l = li((1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (3L, 1L), (3L, 3L),
      (4L, 2L), (4L, 3L), (5L, 1L), (5L, 4L))
    val out = Itemsets.brandAffinity(l, p).collect()
    // item supports: A=4 B=3 C=3 D=1; frequent pairs AB=2 AC=2 BC=2
    assert(out.length == 3)
    val ab = out.find(r => r.getString(0) == "A" && r.getString(1) == "B").get
    assert(ab.getAs[Long]("support") == 2L)
    assert(ab.getAs[Long]("n_a") == 4L && ab.getAs[Long]("n_b") == 3L)
    assert(ab.getAs[Long]("n_baskets") == 5L)
    assert(ab.getAs[Double]("conf_ab_r") == 0.5)           // 2/4
    assert(ab.getAs[Double]("conf_ba_r") == 0.666666667)   // 2/3 @9
    assert(ab.getAs[Double]("lift_r") == 0.833333333)      // 2*5/(4*3) @9
    // D is infrequent (support 1): downward closure prunes pair (A,D)
    assert(!out.exists(r => r.getString(0) == "D" || r.getString(1) == "D"))
  }

  test("duplicate same-brand lines count once per basket; NULL brands drop") {
    val p = parts((1L, "A"), (2L, "A"), (3L, "B"), (4L, null.asInstanceOf[String]))
    // basket 1 touches brand A twice (parts 1 and 2), B, and a NULL
    // brand; basket 2 = {A, B}
    val l = li((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (2L, 3L))
    val out = Itemsets.brandAffinity(l, p).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(r.getAs[Long]("support") == 2L)
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("n_baskets") == 2L)
    assert(r.getAs[Double]("lift_r") == 1.0) // 2*2/(2*2)
  }

  test("no frequent pair → empty result with the full schema") {
    val p = parts((1L, "A"), (2L, "B"))
    val l = li((1L, 1L), (2L, 2L)) // singleton baskets, no co-occurrence
    val out = Itemsets.brandAffinity(l, p)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq == Seq("item_a", "item_b", "support",
      "n_a", "n_b", "n_baskets", "conf_ab_r", "conf_ba_r", "lift_r"))
  }

  test("support ladder: base at TPC-H density, doubles with density, capped") {
    import Itemsets._
    assert(scaledMinSup(0L, 0L) == BaseSup)
    assert(scaledMinSup(30L * 1000, 1000L) == BaseSup) // density 30 ≤ 128
    assert(scaledMinSup(200L * 1000, 1000L) == 4)      // 128 < 200 ≤ 256
    assert(scaledMinSup(3000L * 1000, 1000L) == 64)    // 2048 < 3000 ≤ 4096
    assert(scaledMinSup(Long.MaxValue / 2, 1L) == MaxSup)
  }

  test("SQL ladder twin matches the Scala ladder") {
    val cases = Seq((0L, 0L), (30000L, 1000L), (200000L, 1000L),
      (3000000L, 1000L), (Long.MaxValue / 2, 1L))
    cases.foreach { case (nr, ni) =>
      val sql = Itemsets.scaledMinSupSql(nr.toString, ni.toString)
      val got = spark.sql(s"SELECT CAST($sql AS BIGINT) AS v").first().getLong(0)
      assert(got == Itemsets.scaledMinSup(nr, ni).toLong,
        s"SQL ladder diverges at (nr=$nr, ni=$ni)")
    }
  }

  test("gated entry runs on the fixture tables and orders by pair") {
    val out = Itemsets.brandAffinity(spark, sfDir).collect()
    assert(out.nonEmpty)
    val keys = out.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted)
    assert(keys.forall { case (a, b) => a < b })
  }

  test("artifact-backed entry equals the frame-built chain") {
    val viaArtifact = Itemsets.brandAffinity(spark, sfDir).collect().toSeq
    val direct = Itemsets.brandAffinity(
      graft.Tables.lineitem(spark, sfDir), graft.Tables.part(spark, sfDir))
      .collect().toSeq
    assert(viaArtifact == direct)
  }
}
