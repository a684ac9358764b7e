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

  test("q150 applyChangelog: latest op wins — update, insert, delete, delete-then-reinsert") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val log = Seq(
      (1L, 1L, "U", "a2", 11.0),             // plain update
      (4L, 1L, "U", "d", 40.0),              // insert via U on a fresh key
      (2L, 1L, "U", "bX", 21.0), (2L, 2L, "D", "x", 0.0),  // update then delete → gone
      (3L, 1L, "D", "x", 0.0), (3L, 2L, "U", "c3", 33.0))  // delete then reinsert → lives
      .toDF("k", "seq", "op", "s", "v")
    val out = operators.Merge.applyChangelog(base, log, "k", Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out == Map(
      1L -> (("a2", 11.0)), 3L -> (("c3", 33.0)), 4L -> (("d", 40.0))),
      s"got $out — key 2 must be deleted, key 3 reinstated at seq 3's payload")
  }

  test("q150 applyChangelog: duplicate (key, seq) resolves deterministically") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0)).toDF("k", "s", "v")
    // key 1: a redelivered duplicate (identical rows) — must collapse;
    // key 2: a CONFLICTING same-seq pair (a broken feed) — the
    // (seq, op, payload) total order must pick the same winner every
    // run: op 'U' > 'D', then payload ("z2", 2.0) > ("z1", 1.0)
    val log = Seq(
      (1L, 5L, "U", "a9", 99.0), (1L, 5L, "U", "a9", 99.0),
      (2L, 1L, "D", "x", 0.0), (2L, 1L, "U", "z1", 1.0), (2L, 1L, "U", "z2", 2.0))
      .toDF("k", "seq", "op", "s", "v")
      // a few layouts so a shuffle-order-dependent winner would flip
      .repartition(7)
    def run() = operators.Merge.applyChangelog(base, log, "k", Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val expected = Map(1L -> (("a9", 99.0)), 2L -> (("z2", 2.0)))
    assert(run() === expected)
    assert(run() === expected, "winner flipped between runs")
  }

  test("q160 antiEntropyRepair: identical replicas diff empty; every damage class surfaces") {
    import spark.implicits._
    def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    val a = docs((0L to 129L).map(i => i -> s"t$i"): _*)
    // clean pair: no flagged buckets, no rows joined
    assert(operators.Cleanse.antiEntropyRepair(a, a).count() === 0L)
    // damaged replica: id 3 corrupted, id 64 lost, id 999 alien
    val b = docs(((0L to 129L).filter(_ != 64L).map(i =>
      i -> (if (i == 3L) "tX" else s"t$i")) :+ (999L -> "alien")): _*)
    val out = operators.Cleanse.antiEntropyRepair(a, b).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // statuses exact; bucket = pmod(id, 64) rides along as the worklist key
    assert(out === Map(
      3L -> ((3L, "changed")),
      64L -> ((0L, "missing_in_b")),
      999L -> ((39L, "extra_in_b"))), s"got $out")
  }

  test("q146: perfect linear data recovers the exact slope; zero time-variance is NULL") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(h: Int) = java.sql.Timestamp.valueOf(s"2024-01-01 0$h:00:00")
    val events = Seq(
      // v = 2·t + 5 (in raw units) at t = 0,1,2,3 hours
      (1L, at(0), 1L, "lin", 5.0, "{}"), (2L, at(1), 1L, "lin", 7.0, "{}"),
      (3L, at(2), 1L, "lin", 9.0, "{}"), (4L, at(3), 1L, "lin", 11.0, "{}"),
      // all events in the same hour: den = 0
      (5L, at(1), 1L, "flat", 1.0, "{}"), (6L, at(1), 1L, "flat", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = operators.Analytics.groupTrend(events).collect()
      .map(r => r.getString(0) -> r).toMap
    // slope in milli-units/hour = 2000
    assert(out("lin").getDouble(6) == 2000.0, s"got ${out("lin").getDouble(6)}")
    assert(out("flat").isNullAt(6), "zero time-variance must yield NULL, not NaN/inf")
  }

  test("q147: planted orphans and NULL FKs are counted per relation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ri").toString
    Seq((0, 0), (1, 0)).toDF("n_nationkey", "n_regionkey").write.parquet(s"$dir/nation.parquet")
    Seq(0).toDF("r_regionkey").write.parquet(s"$dir/region.parquet")
    Seq((10L, Some(0)), (11L, Some(7)), (12L, None))  // 7 = orphan, None = null FK
      .toDF("c_custkey", "c_nationkey").write.parquet(s"$dir/customer.parquet")
    Seq((100L, 10L)).toDF("o_orderkey", "o_custkey").write.parquet(s"$dir/orders.parquet")
    Seq((100L, 1L, 1L), (999L, 1L, 1L))  // 999 = orphan order ref
      .toDF("l_orderkey", "l_partkey", "l_suppkey").write.parquet(s"$dir/lineitem.parquet")
    Seq(1L).toDF("p_partkey").write.parquet(s"$dir/part.parquet")
    Seq((1L, 0)).toDF("s_suppkey", "s_nationkey").write.parquet(s"$dir/supplier.parquet")
    val out = operators.Cleanse.refIntegrity(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("customer.nation") == ((3L, 1L, 1L)), s"got ${out("customer.nation")}")
    assert(out("lineitem.orders") == ((2L, 0L, 1L)), s"got ${out("lineitem.orders")}")
    assert(out("orders.customer") == ((1L, 0L, 0L)))
    assert(out.size == 7)
  }

  test("q139 checksum: a single-char corruption moves exactly its bucket's checksum") {
    import spark.implicits._
    val docs = (0L until 128L).map(i => (i, s"doc body $i", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val corrupted = docs.withColumn("text",
      when(col("doc_id") === 77L, lit("doc body 77X")).otherwise(col("text")))
    val a = Cleanse.partitionChecksum(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = Cleanse.partitionChecksum(corrupted).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val moved = a.keySet.filter(k => a(k) != b(k))
    assert(moved == Set(77L % 64L), s"expected only bucket 13 to move, got $moved")
    assert(a(13L)._1 == b(13L)._1, "row count must not move on content corruption")
  }

  test("q140 incremental maintenance ≡ direct recompute (group migration + retirement)") {
    import spark.implicits._
    // old = %7≠0: {3 F, 15 Z, 11 O, 22 O, 9 P}; new = %5≠0 with evens
    // repriced to U: {3 F, 14 U(added), 11 O, 22 U(migrated O→U), 9 P};
    // 15 removed — status Z's only member, so Z must RETIRE from output
    val orders = Seq(
      (3L, 1L, "F", 100.0), (14L, 1L, "F", 200.0), (15L, 1L, "Z", 300.0),
      (11L, 2L, "O", 50.0), (22L, 2L, "O", 60.0), (9L, 2L, "P", 70.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(lit("2024-01-01")))
      .withColumn("o_orderpriority", lit("1-URGENT"))
    val out = Merge.incrementalAgg(orders).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // new snapshot: 3(F,100), 14(U,210), 11(O,50), 22(U,70), 9(P,70) — 35 dropped
    assert(out == Map(
      "F" -> (1L, 100.0), "U" -> (2L, 280.0),
      "O" -> (1L, 50.0), "P" -> (1L, 70.0)),
      s"maintained aggregate diverged: $out — Z must be retired, F->U migration applied")
  }
}
