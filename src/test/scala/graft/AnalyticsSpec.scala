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
}
