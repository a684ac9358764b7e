package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.streaming.Streams

class SkewSpec extends SparkTestBase {

  test("saltedJoin equals the plain join row-for-row") {
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.customer(spark, sfDir).select(
      col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = orders.join(cust, Seq("o_custkey"))
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(orders, cust, "o_custkey", salts = 8)
      .collect().map(_.toString).sorted.toSeq
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("enrichStream annotates batch frames through the same broadcast join") {
    val events = Tables.events(spark, sfDir).limit(100)
    val dims = events.select(col("user_id")).distinct()
      .withColumn("segment", concat(lit("seg"), col("user_id") % 3))
    val out = Streams.enrichStream(events, dims, "user_id")
    assert(out.count() === 100)
    assert(out.filter(col("segment").isNull).count() === 0)
  }
}
