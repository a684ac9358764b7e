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

  test("q123: argmax keeps exact-decimal TIES; window filter applies") {
    import spark.implicits._
    // supp 1: 100.10 + 99.90 = 200.00; supp 2: 200.00 in one line (tie);
    // supp 3: 150.00 (loses); supp 4: 999.0 but OUTSIDE the window.
    val in = "2000-02-01 00:00:00"
    val out18 = "1999-06-01 00:00:00"
    val li = Seq(
      (1L, 100.10, 0.0, in), (1L, 99.90, 0.0, in),
      (2L, 200.00, 0.0, in),
      (3L, 150.00, 0.0, in),
      (4L, 999.00, 0.0, out18)
    ).toDF("l_suppkey", "l_extendedprice", "l_discount", "sd")
      .withColumn("l_shipdate", to_timestamp(col("sd"))).drop("sd")
    val sup = Seq((1L, "S1"), (2L, "S2"), (3L, "S3"), (4L, "S4"))
      .toDF("s_suppkey", "s_name")
    val out = Analytics.topSupplier(li, sup).collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Double]("total_revenue")))
    assert(out.toSeq === Seq((1L, 200.0), (2L, 200.0)))
  }

  test("q126: strict above-positive-average balance AND no recent order") {
    import spark.implicits._
    // positive balances: 100, 300 -> avg 200. cust 1 (100) below; cust 2
    // (300) above but ordered in 2001 -> anti-joined away; cust 3 (300)
    // above, old order only -> kept; cust 4 (-50) negative, never above.
    val cust = Seq(
      (1L, "A", 100.0), (2L, "A", 300.0), (3L, "B", 300.0), (4L, "B", -50.0)
    ).toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val od = Seq((2L, "2001-05-01 00:00:00"), (3L, "1999-01-01 00:00:00"))
      .toDF("o_custkey", "od")
      .withColumn("o_orderdate", to_timestamp(col("od"))).drop("od")
    val out = Analytics.dormantCustomers(cust, od).collect()
      .map(r => (r.getAs[String]("c_mktsegment"), r.getAs[Long]("n_custs"),
        r.getAs[Long]("acctbal_mu")))
    assert(out.toSeq === Seq(("B", 1L, 3000000L)))
  }

  test("q127: dominance needs share strictly over 2x the average share") {
    import spark.implicits._
    // part 1, three suppliers, qtys 8/1/1 (total 10): 8*3=24 > 2*10 ->
    // supp 1 dominates. part 2, two suppliers 6/4: 6*2=12 < 20 -> nobody.
    val li = Seq(
      (1L, 1L, 8.0), (1L, 2L, 1.0), (1L, 3L, 1.0),
      (2L, 1L, 6.0), (2L, 2L, 4.0)
    ).toDF("l_partkey", "l_suppkey", "l_quantity")
    val sup = Seq((1L, "S1"), (2L, "S2"), (3L, "S3")).toDF("s_suppkey", "s_name")
    val out = Analytics.dominantSupplier(li, sup).collect()
      .map(r => (r.getAs[String]("s_name"), r.getAs[Long]("n_dominated"),
        r.getAs[Long]("qty_sum")))
    assert(out.toSeq === Seq(("S1", 1L, 8L)))
  }

  test("q161 pareto: sort-scan equals the naive O(n²) dominance filter") {
    // the real corpus at the smallest SF — the sort-scan decomposition
    // must reproduce the textbook NOT EXISTS definition point for point
    Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority").isNotNull && col("o_totalprice").isNotNull
        && col("o_orderdate").isNotNull)
      .groupBy(col("o_orderpriority"), col("o_totalprice"), col("o_orderdate"))
      .agg(count(lit(1)).as("n_orders"))
      .createOrReplaceTempView("q161_pts")
    val naive = spark.sql(
      """SELECT * FROM q161_pts p WHERE NOT EXISTS (
        |  SELECT 1 FROM q161_pts q
        |  WHERE q.o_orderpriority = p.o_orderpriority
        |    AND q.o_totalprice >= p.o_totalprice AND q.o_orderdate >= p.o_orderdate
        |    AND (q.o_totalprice > p.o_totalprice OR q.o_orderdate > p.o_orderdate))
        |""".stripMargin)
      .collect().map(_.toString).toSet
    val engine = Analytics.paretoFront(spark, sfDir).collect().map(_.toString).toSet
    assert(engine === naive)
    assert(engine.nonEmpty)
  }

  test("q161 pareto: duplicates both survive, dominated ties drop") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val orders = Seq(
      // (10, t1) dominates (10, t0) [equal price, newer] and (5, t0);
      // the duplicate (10, t1) pair collapses to one row, n_orders 2;
      // (20, t0) survives (higher price, older date — a true tradeoff)
      (1L, "P", 10.0, t1), (2L, "P", 10.0, t1), (3L, "P", 10.0, t0),
      (4L, "P", 5.0, t0), (5L, "P", 20.0, t0)
    ).toDF("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate")
      .withColumn("o_custkey", lit(1L)).withColumn("o_orderstatus", lit("O"))
    val out = Analytics.paretoFront(orders).collect()
      .map(r => (r.getDouble(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(out === Set((10.0, t1, 2L), (20.0, t0, 1L)), s"got $out")
  }

  test("q164 welch: hand-checked t statistic on a planted split") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // control (even users): 1.0, 2.0 — treatment (odd users): 3.0, 5.0
    val ev = Seq(
      (0L, "t", 1.0), (2L, "t", 2.0), (1L, "t", 3.0), (3L, "t", 5.0)
    ).map { case (u, et, v) => (u, et, v, ts) }
      .toDF("user_id", "event_type", "value", "ts")
    val r = Analytics.abWelch(ev).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("nc") === 2L && row.getAs[Long]("nt") === 2L)
    assert(row.getAs[Double]("mean_c_r") === 1.5)
    assert(row.getAs[Double]("mean_t_r") === 4.0)
    // milli: vc = 500000^2*2/2 ... recompute exactly as the operator does
    val (sc1, sc2, st1, st2) = (3000.0, 5000000.0, 8000.0, 34000000.0)
    val vc = (2.0 * sc2 - sc1 * sc1) / (2.0 * 1.0)
    val vt = (2.0 * st2 - st1 * st1) / (2.0 * 1.0)
    val se2 = vc / 2.0 + vt / 2.0
    val t = (st1 / 2.0 - sc1 / 2.0) / math.sqrt(se2)
    val expT = BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("t_welch_r") === expT)
    val dof = se2 * se2 / ((vc / 2.0) * (vc / 2.0) / 1.0 + (vt / 2.0) * (vt / 2.0) / 1.0)
    val expD = BigDecimal(dof).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("dof_r") === expD)
  }

  test("q164 welch: zero-variance both arms yields NULL t, not NaN") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq((0L, "z", 2.0), (2L, "z", 2.0), (1L, "z", 2.0), (3L, "z", 2.0))
      .map { case (u, et, v) => (u, et, v, ts) }
      .toDF("user_id", "event_type", "value", "ts")
    val row = Analytics.abWelch(ev).collect().head
    assert(row.isNullAt(row.fieldIndex("t_welch_r")))
    assert(row.isNullAt(row.fieldIndex("dof_r")))
  }

  test("q170 rfm: clean separation puts each user in its own quintile") {
    import spark.implicits._
    def t(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // user k: recency/frequency/monetary all rank k — with 5 users the
    // quintile formula degenerates to q = rank
    val ev = Seq(
      (1L, t(10), 100.0), (1L, t(10), 100.0), (1L, t(10), 100.0),
      (1L, t(10), 100.0), (1L, t(10), 100.0),
      (2L, t(9), 50.0), (2L, t(9), 50.0), (2L, t(9), 50.0), (2L, t(9), 50.0),
      (3L, t(8), 10.0), (3L, t(8), 10.0), (3L, t(8), 10.0),
      (4L, t(7), 5.0), (4L, t(7), 5.0),
      (5L, t(1), 1.0)
    ).toDF("user_id", "ts", "value")
    val out = Analytics.rfmSegment(ev).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("recency_days"), r.getAs[Long]("r_q"), r.getAs[Long]("f_q"),
          r.getAs[Long]("m_q"), r.getAs[String]("segment"))).toMap
    assert(out(1L) === ((0L, 1L, 1L, 1L, "champion")))
    assert(out(3L) === ((2L, 3L, 3L, 3L, "regular")))
    assert(out(5L) === ((9L, 5L, 5L, 5L, "lost")))
    assert(out.values.map(v => (v._2, v._3, v._4)).toSet ===
      (1 to 5).map(k => (k.toLong, k.toLong, k.toLong)).toSet)
  }

  test("q170 rfm: quintiles are balanced on the corpus") {
    val out = Analytics.rfmSegment(spark, sfDir).collect()
    assert(out.nonEmpty)
    val n = out.length
    Seq("r_q", "f_q", "m_q").foreach { qc =>
      val hist = out.groupBy(_.getAs[Long](qc)).view.mapValues(_.length).toMap
      assert(hist.keySet === (1L to 5L).toSet, s"$qc buckets: ${hist.keySet}")
      // explicit-formula quintiles: bucket sizes differ by at most 1
      assert(hist.values.max - hist.values.min <= 1, s"$qc skew: $hist (n=$n)")
    }
  }

  test("q164 welch: arms below n=2 drop; corpus run is sane") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq((0L, "only_control", 1.0), (2L, "only_control", 2.0))
      .map { case (u, et, v) => (u, et, v, ts) }
      .toDF("user_id", "event_type", "value", "ts")
    assert(Analytics.abWelch(ev).collect().isEmpty)
    val corpus = Analytics.abWelch(spark, sfDir).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      assert(r.getAs[Long]("nc") >= 2L && r.getAs[Long]("nt") >= 2L)
      // a 50/50 user split should never be pathologically lopsided
      val ratio = r.getAs[Long]("nc").toDouble / r.getAs[Long]("nt").toDouble
      assert(ratio > 0.2 && ratio < 5.0)
    }
  }
}
