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
}
