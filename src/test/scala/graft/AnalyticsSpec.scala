package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

class AnalyticsSpec extends SparkTestBase {

  test("q01 pricing summary: grouped totals are consistent") {
    val df = Analytics.pricingSummary(spark, sfDir).collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      val sumQty = r.getAs[Double]("sum_qty")
      val n = r.getAs[Long]("count_order")
      assert(math.abs(r.getAs[Double]("avg_qty") - sumQty / n) < 1e-9)
      assert(n > 0 && sumQty > 0)
    }
  }

  test("q02 topk revenue: at most 10 rows, descending") {
    val rev = Analytics.topkRevenue(spark, sfDir).collect().map(_.getAs[Double]("revenue"))
    assert(rev.length <= 10)
    assert(rev.sameElements(rev.sorted(Ordering[Double].reverse)))
  }

  test("q04 representative per group: one row per customer, matches min orderdate") {
    val out = Analytics.representativePerGroup(spark, sfDir)
    val keys = out.select("o_custkey").collect().map(_.getLong(0))
    assert(keys.distinct.length === keys.length)
    val expect = Tables.orders(spark, sfDir)
      .groupBy("o_custkey").agg(min("o_orderdate").as("md")).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    out.collect().foreach { r =>
      assert(r.getAs[Any]("first_orderdate") === expect(r.getAs[Long]("o_custkey")))
    }
  }

  test("q05/q06 semi+anti partition the customer table") {
    val nSemi = Analytics.validatedSemiJoin(spark, sfDir).count()
    val nAnti = Analytics.newRecordsAntiJoin(spark, sfDir).count()
    val nAll = Tables.customer(spark, sfDir).count()
    assert(nSemi + nAnti === nAll)
  }

  test("q07 full outer covers all nation keys from both sides") {
    val out = Analytics.fullOuterEnrich(spark, sfDir)
    val nKeys = (Tables.customer(spark, sfDir).select(col("c_nationkey")).distinct().collect().map(_.getInt(0)) ++
      Tables.supplier(spark, sfDir).select(col("s_nationkey")).distinct().collect().map(_.getInt(0))).distinct
    assert(out.count() === nKeys.length)
  }

  test("q08 rollup grand total equals customer count") {
    val rows = Analytics.rollupFacets(spark, sfDir).collect()
    val grand = rows.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(grand.getAs[Long]("n_customers") === Tables.customer(spark, sfDir).count())
  }

  test("q11 running window is monotone per user") {
    val rows = Analytics.runningWindow(spark, sfDir).collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val counts = rs.map(_.getAs[Long]("running_events"))
      assert(counts.sameElements(1L to counts.length))
    }
  }

  test("q50 funnel: stage ordering is view -> click-after-view -> purchase-after-click") {
    import spark.implicits._
    def ev(id: Long, u: Long, t: String, sec: Int) =
      (id, new java.sql.Timestamp(1700000000000L + sec * 1000L), u, t, 1.0)
    val e = Seq(
      ev(1, 1, "view", 1), ev(2, 1, "click", 2), ev(3, 1, "purchase", 3), // stage 3
      ev(4, 2, "click", 1), ev(5, 2, "view", 2),                          // click BEFORE view: stage 1
      ev(6, 3, "purchase", 1),                                            // no view: stage 0
      ev(7, 4, "view", 1), ev(8, 4, "purchase", 2)                        // no click: stage 1
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analytics.funnel(e).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("stage")).toMap
    assert(out === Map(1L -> 3L, 2L -> 1L, 3L -> 0L, 4L -> 1L))
  }

  test("q51 quantiles: rank selection picks the exact elements") {
    import spark.implicits._
    val e = (1 to 10).map(i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L), 1L, "click", i.toDouble))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Analytics.groupQuantiles(e).collect().head
    assert(r.getAs[Long]("n_events") === 10L)
    assert(r.getAs[Double]("p50") === 5.0)  // ceil(10*0.5)  = 5
    assert(r.getAs[Double]("p90") === 9.0)  // ceil(10*0.9)  = 9
    assert(r.getAs[Double]("p99") === 10.0) // ceil(10*0.99) = 10
  }

  test("q50/q51 on the corpus: one row per user / per event_type") {
    val f = Analytics.funnel(spark, sfDir)
    assert(f.count() === f.select("user_id").distinct().count())
    val q = Analytics.groupQuantiles(spark, sfDir).collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p90"))
      assert(r.getAs[Double]("p90") <= r.getAs[Double]("p99"))
    }
  }

  test("q115: only below-20%-of-avg lines survive, per-brand exact") {
    import spark.implicits._
    // part 1: quantities 1,9,10 (sum=20, cnt=3): threshold qty*15 < 20
    // -> only qty=1 survives. part 2: 5,5 (sum=10,cnt=2): qty*10 < 10
    // -> none survive (strict).
    val li = Seq(
      (1L, 1.0, 100.0), (1L, 9.0, 200.0), (1L, 10.0, 300.0),
      (2L, 5.0, 400.0), (2L, 5.0, 500.0)
    ).toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((1L, "B1"), (2L, "B2")).toDF("p_partkey", "p_brand")
    val out = Analytics.belowAvgRevenue(li, part).collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Long]("n_lines"),
        r.getAs[Double]("revenue")))
    assert(out.toSeq === Seq(("B1", 1L, 100.0)))
  }

  test("q116: lone late supplier in multi-supplier orders, once per order") {
    import spark.implicits._
    // order 10: supp 1 late (twice - counts once), supp 2 clean -> supp 1
    // order 20: supp 1 late, sole supplier -> excluded (no EXISTS other)
    // order 30: supp 1 and 2 both late -> excluded (NOT EXISTS fails)
    // order 40: supp 2 late, supp 3 clean -> supp 2
    val li = Seq(
      (10L, 1L, "R"), (10L, 1L, "R"), (10L, 2L, "N"),
      (20L, 1L, "R"),
      (30L, 1L, "R"), (30L, 2L, "R"),
      (40L, 2L, "R"), (40L, 3L, "N")
    ).toDF("l_orderkey", "l_suppkey", "l_returnflag")
    val sup = Seq((1L, "S1"), (2L, "S2"), (3L, "S3")).toDF("s_suppkey", "s_name")
    val out = Analytics.loneLateSupplier(li, sup).collect()
      .map(r => (r.getAs[String]("s_name"), r.getAs[Long]("numwait")))
    assert(out.toSeq === Seq(("S1", 1L), ("S2", 1L)))
  }
}
