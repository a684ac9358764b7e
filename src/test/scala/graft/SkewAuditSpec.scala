package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Pre-join shuffle-skew audit (q212): hot-key vs uniform diagnosis,
  * conservation, NULL exclusion. */
class SkewAuditSpec extends SparkTestBase {
  import spark.implicits._

  test("a single hot key owns its whole reducer: max_key_rows == n_rows, " +
      "skew_r == parts") {
    val events = Seq.fill(100)(("view", 1L)).zipWithIndex
      .map { case ((t, u), i) => (i.toLong, u, t) }
      .toDF("event_id", "user_id", "event_type")
    val orders = Seq((1L, 1L)).toDF("o_orderkey", "o_custkey")
    val out = Skew.joinSkewAudit(
      spark,
      stage(events, orders))
    val ev = out.filter(col("side") === "events_by_type").collect()
    assert(ev.length == 1, "one key → one occupied reducer")
    val r = ev.head
    assert(r.getAs[Long]("n_rows") == 100L)
    assert(r.getAs[Long]("n_keys") == 1L)
    assert(r.getAs[Long]("max_key_rows") == 100L)
    assert(r.getAs[Double]("skew_r") == Skew.SkewParts.toDouble)
  }

  test("uniform keys spread: every occupied reducer holds distinct keys " +
      "and row totals are conserved") {
    val events = Seq((1L, 1L, "view")).toDF("event_id", "user_id", "event_type")
    val orders = (1L to 500L).map(k => (k, k)).toDF("o_orderkey", "o_custkey")
    val out = Skew.joinSkewAudit(spark, stage(events, orders))
      .filter(col("side") === "orders_by_custkey").collect()
    assert(out.map(_.getAs[Long]("n_rows")).sum == 500L)
    assert(out.map(_.getAs[Long]("n_keys")).sum == 500L)
    assert(out.forall(_.getAs[Long]("max_key_rows") == 1L),
      "unique keys can never pile up inside a reducer")
    assert(out.length > Skew.SkewParts / 2,
      "500 uniform keys must occupy most of the 32 modeled reducers")
  }

  test("NULL join keys are excluded — they never shuffle into an inner join") {
    val events = Seq((1L, 1L, null.asInstanceOf[String]), (2L, 1L, "view"))
      .toDF("event_id", "user_id", "event_type")
    val orders = Seq((1L, 1L)).toDF("o_orderkey", "o_custkey")
    val out = Skew.joinSkewAudit(spark, stage(events, orders))
      .filter(col("side") === "events_by_type").collect()
    assert(out.map(_.getAs[Long]("n_rows")).sum == 1L)
  }

  /** Writes minimal events/orders parquet into a temp dir shaped like a
    * testdata sfDir. */
  private def stage(events: org.apache.spark.sql.DataFrame,
      orders: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("skew_audit").toString
    events
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    orders
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_totalprice", lit(1.0))
      .withColumn("o_orderdate", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }
}
