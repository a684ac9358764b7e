package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{SemDedup, Temporal}

class TemporalSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("asofJoin picks the most recent prior click, inclusive at ts ties") {
    import spark.implicits._
    val e = Seq(
      E(1, ts(0), 1, "click", 1.0),
      E(2, ts(10), 1, "click", 2.0),
      E(3, ts(10), 1, "purchase", 30.0), // tie with click 2 -> matches it
      E(4, ts(20), 1, "purchase", 40.0), // after click 2
      E(5, ts(5), 2, "purchase", 50.0),  // user 2 has no clicks -> nulls
      E(6, ts(30), 3, "click", 3.0),
      E(7, ts(5), 3, "purchase", 60.0)   // click is AFTER -> no match
    ).toDF()
    val out = Temporal.asofJoin(e).collect()
      .map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Long]("click_event_id")).map(_.toLong)))
    assert(out.toSeq === Seq(
      (3L, Some(2L)), (4L, Some(2L)), (5L, None), (7L, None)))
  }

  test("asofJoin ts-tied clicks resolve to the max event_id row") {
    import spark.implicits._
    val e = Seq(
      E(1, ts(0), 1, "click", 1.0),
      E(2, ts(0), 1, "click", 2.0), // same user+ts -> this one wins
      E(3, ts(5), 1, "purchase", 9.0)
    ).toDF()
    val out = Temporal.asofJoin(e).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("click_event_id") === 2L)
    assert(out.head.getAs[Double]("click_value") === 2.0)
  }

  test("asofJoin: a NULL click value stays with ITS click row (no per-column mixing)") {
    // the latest prior click has value NULL; the whole payload must come
    // from that row — not its id with an older click's non-null value
    val rows = Seq(
      (1L, ts(0), 1L, "click", Some(1.0)),
      (2L, ts(10), 1L, "click", None),
      (3L, ts(20), 1L, "purchase", Some(9.0)))
    import spark.implicits._
    val e = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Temporal.asofJoin(e).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("click_event_id") === 2L)
    assert(out.head.isNullAt(out.head.fieldIndex("click_value")),
      "click_value must be the matched click's NULL, not an older click's value")
  }

  test("intervalJoin pairs respect the (view, view+30m] bound") {
    import spark.implicits._
    val e = Seq(
      E(1, ts(0), 1, "view", 0.0),
      E(2, ts(30), 1, "purchase", 5.0),  // exactly +30m -> inclusive
      E(3, ts(31), 1, "purchase", 6.0),  // +31m -> out
      E(4, ts(0), 2, "purchase", 7.0)    // same ts as a view of user 1 only
    ).toDF()
    val out = Temporal.intervalJoin(e).collect()
      .map(r => (r.getAs[Long]("view_event_id"), r.getAs[Long]("purchase_event_id"),
        r.getAs[Long]("gap_us")))
    assert(out.toSeq === Seq((1L, 2L, 1800L * 1000000L)))
  }

  test("semDedup: planted near-identical vectors dedup within their cell") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = SemDedup.semDedup(emb)
    val n = emb.count()
    assert(out.count() === n)
    // cluster ids in [0, K)
    val cl = out.select(min("cluster_id"), max("cluster_id")).head()
    assert(cl.getLong(0) >= 0L && cl.getLong(1) < SemDedup.K)
    // every duplicate's canonical is a smaller id in the SAME cluster
    val byId = out.collect().map(r => r.getAs[Long]("vec_id") ->
      (r.getAs[Long]("cluster_id"), r.getAs[Long]("canonical_id"))).toMap
    byId.foreach { case (id, (cluster, canon)) =>
      assert(canon <= id)
      assert(byId(canon)._1 === cluster)
    }
  }

  test("q122: transition counts follow each user's (ts, event_id) order") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-03-01 10:$m%02d:00")
    val events = Seq(
      (1L, ts(1), 1L, "view", 1.0, "{}"),
      (2L, ts(2), 1L, "click", 1.0, "{}"),
      (3L, ts(3), 1L, "view", 1.0, "{}"),
      (4L, ts(1), 2L, "view", 1.0, "{}"),
      (5L, ts(2), 2L, "click", 1.0, "{}"),
      // same ts as event 5: event_id breaks the tie -> click precedes purchase
      (6L, ts(2), 2L, "purchase", 1.0, "{}"),
      (7L, null.asInstanceOf[Timestamp], 2L, "view", 1.0, "{}") // excluded
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = graft.operators.Temporal.eventTransitions(events).collect()
      .map(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type")) ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("p_r"))).toMap
    assert(out(("view", "click")) === ((2L, 1.0)))
    assert(out(("click", "view")) === ((1L, 0.5)))
    assert(out(("click", "purchase")) === ((1L, 0.5)))
    assert(out.size === 3)
  }

  test("q159 nearestEventJoin: direction, ties to prev, equal-ts, dedup, no-click") {
    import spark.implicits._
    val e = Seq(
      // user 1: clicks at :00 and :30; purchases probe both directions
      E(1, ts(0), 1, "click", 1.0), E(2, ts(30), 1, "click", 2.0),
      E(100, ts(10), 1, "purchase", 0.0),  // prev(1) 600s < next(2) 1200s
      E(101, ts(25), 1, "purchase", 0.0),  // next(2) 300s < prev(1) 1500s
      E(102, ts(30), 1, "purchase", 0.0),  // equal ts -> prev(2), gap 0
      // user 2: no clicks at all
      E(103, ts(0), 2, "purchase", 0.0),
      // user 3: exact tie (15 min each way) -> prev wins
      E(3, ts(0), 3, "click", 1.0), E(4, ts(30), 3, "click", 1.0),
      E(104, ts(15), 3, "purchase", 0.0),
      // user 4: duplicate-ts clicks dedup to max event_id
      E(5, ts(0), 4, "click", 1.0), E(6, ts(0), 4, "click", 1.0),
      E(105, ts(5), 4, "purchase", 0.0)
    ).toDF()
    val out = Temporal.nearestEventJoin(e).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("nearest_click_id")).map(_.toLong),
          r.getAs[String]("direction"),
          Option(r.getAs[java.lang.Long]("gap_us")).map(_.toLong))).toMap
    assert(out(100L) === ((Some(1L), "prev", Some(600000000L))))
    assert(out(101L) === ((Some(2L), "next", Some(300000000L))))
    assert(out(102L) === ((Some(2L), "prev", Some(0L))))
    assert(out(103L) === ((None, null, None)))
    assert(out(104L) === ((Some(3L), "prev", Some(900000000L))), "tie must go prev")
    assert(out(105L) === ((Some(6L), "prev", Some(300000000L))), "dup-ts click must dedup to max id")
  }

  test("q166 cusum: the level-shift day carries the peak deviation") {
    import spark.implicits._
    def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // level 1.0 for two days, then 5.0: the ML changepoint is day 2
    val ev = Seq((t(1), 1.0), (t(2), 1.0), (t(3), 5.0), (t(4), 5.0))
      .toDF("ts", "value")
    val out = Temporal.cusumChangepoint(ev).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Double]("cusum_r"), r.getAs[Boolean]("is_changepoint"))).toMap
    // scaled: c_t = 4·P_t − t·12000 → −8000, −16000, −8000, 0 (milli)
    assert(out("2024-01-01") === ((-2.0, false)))
    assert(out("2024-01-02") === ((-4.0, true)))
    assert(out("2024-01-03") === ((-2.0, false)))
    assert(out("2024-01-04") === ((0.0, false)))
  }

  test("q169 seasonal: same-hour baseline, zero-variance NULL, cnt<2 drop") {
    import spark.implicits._
    def t(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:15:00")
    val ev = Seq(
      // hour 3: 2 events each day -> zero variance -> NULL z
      t(1, 3), t(1, 3), t(2, 3), t(2, 3),
      // hour 5: 1 event day 1, 3 events day 2 -> z = ∓1/√2
      t(1, 5), t(2, 5), t(2, 5), t(2, 5),
      // hour 7: single day -> profile cnt=1 -> excluded
      t(1, 7)
    ).map(ts => (ts, "click")).toDF("ts", "event_type")
    val out = Temporal.seasonalAnomaly(ev).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("hod")) ->
        Option(r.getAs[java.lang.Double]("z_season_r")).map(_.doubleValue)).toMap
    assert(!out.keySet.exists(_._2 == 7L))
    assert(out(("2024-01-01", 3L)) === None)
    assert(out(("2024-01-02", 3L)) === None)
    val z = 1.0 / (2.0 * math.sqrt((2.0 * 10.0 - 16.0) / 2.0)) * 2.0 // |n·cnt−s1|/den
    val zr = BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("2024-01-01", 5L)) === Some(-zr))
    assert(out(("2024-01-02", 5L)) === Some(zr))
  }

  test("q166 cusum: exactly one changepoint, cusum ends at zero (corpus)") {
    val out = Temporal.cusumChangepoint(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.count(_.getAs[Boolean]("is_changepoint")) === 1)
    // telescoping: D·P_D − D·S = 0 by construction
    val last = out.maxBy(_.getAs[java.sql.Date]("day").toString)
    assert(last.getAs[Double]("cusum_r") === 0.0)
  }
}
