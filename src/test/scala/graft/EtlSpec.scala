package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cleanse, CuratedJoin, Merge}

class EtlSpec extends SparkTestBase {
  import spark.implicits._

  test("normalizeEmpty turns blank strings to NULL, leaves content alone") {
    val df = Seq(("a", ""), ("b", "  "), ("c", "x")).toDF("id", "v")
    val out = Cleanse.normalizeEmpty(df, Seq("v")).collect()
    assert(out.map(r => Option(r.getString(1))).toSeq === Seq(None, None, Some("x")))
  }

  test("requireFields drops null and blank required values") {
    val df = Seq((Some("a"), "1"), (None, "2"), (Some(" "), "3")).toDF("k", "v")
    val out = Cleanse.requireFields(df, Seq("k")).collect()
    assert(out.map(_.getString(1)).toSeq === Seq("1"))
  }

  test("dedupKeepFirst is deterministic under explicit order") {
    val df = Seq((1, "b", 10), (1, "a", 20), (2, "c", 30)).toDF("k", "tag", "v")
    val out = Cleanse.dedupKeepFirst(df, Seq("k"), Seq(col("tag"))).collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq === Seq((1, "a"), (2, "c")))
  }

  test("upsertSnapshot: batch wins on matched keys, base survives otherwise") {
    val base = Seq((1, "old1"), (2, "old2")).toDF("k", "v")
    val batch = Seq((2, "new2"), (3, "new3")).toDF("k", "v")
    val out = Merge.upsertSnapshot(base, batch, Seq("k")).collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq === Seq((1, "old1"), (2, "new2"), (3, "new3")))
  }

  test("q14 cleanse_ugc: composite key unique, all rows past watermark") {
    val out = Cleanse.cleanseUgc(spark, sfDir).collect()
    val keys = out.map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    assert(keys.distinct.length === keys.length)
    assert(out.nonEmpty)
  }

  test("q17 canonical remap: canonical_id is min vec_id within each label") {
    val out = CuratedJoin.canonicalRemap(spark, sfDir).collect()
    out.groupBy(_.getAs[Int]("label")).foreach { case (_, rs) =>
      val ids = rs.map(_.getAs[Long]("vec_id"))
      assert(rs.forall(_.getAs[Long]("canonical_id") === ids.min))
      assert(rs.forall(_.getAs[Long]("cluster_size") === ids.length))
    }
  }
}
