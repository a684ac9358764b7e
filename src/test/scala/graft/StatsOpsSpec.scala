package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, ApproxDedup, Chunking, Curation, Hll, Temporal}

/** Specs for the sketch/chunking/stats operators (q74-q79). */
class StatsOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- q74 HLL ----

  test("q74 hll: corrected estimate lands within the m=256 error envelope") {
    val out = Hll.hllDistinct(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val raw = r.getAs[Double]("est_r")
      val tru = r.getAs[Long]("true_distinct").toDouble
      // the operator emits the deterministic RAW estimator plus the
      // zero-register count; the standard small-range linear-counting
      // correction (needs ln, engine-specific libm → applied downstream,
      // here) recovers accuracy for n << m
      val zeros = 256L - r.getAs[Long]("n_hll_regs")
      val est = if (raw <= 2.5 * 256 && zeros > 0) 256.0 * math.log(256.0 / zeros) else raw
      // 1.04/sqrt(256) = 6.5% standard error; allow 4 sigma + slack
      assert(math.abs(est - tru) <= 0.26 * tru + 3,
        s"${r.getAs[String]("event_type")}: corrected $est (raw $raw) vs true $tru")
      assert(r.getAs[Long]("n_hll_regs") <= 256L)
    }
  }

  test("q74 hll: register tables merge by max (sketch of union = merged sketches)") {
    val events = Tables.events(spark, sfDir)
    val whole = Hll.hllDistinct(events)
      .select("event_type", "hll_intsum").as[(String, Long)].collect().toMap
    // split on event_id parity, merge the two sketches' register tables
    val lo = Hll.hllDistinct(events.filter(col("event_id") % 2 === 0))
    val hi = Hll.hllDistinct(events.filter(col("event_id") % 2 === 1))
    // intsum is a bijection of the register table only when registers
    // agree; merging uses the raw tables and takes per-register max
    val merged = Hll.registerTable(events.filter(col("event_id") % 2 === 0))
      .unionByName(Hll.registerTable(events.filter(col("event_id") % 2 === 1)))
      .groupBy("event_type", "j").agg(max("mj").as("mj"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("nr"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(52 - mj AS INT))")).as("sp"))
      .select(col("event_type"),
        (col("sp") + (lit(256L) - col("nr")) * lit(4503599627370496L)).as("intsum"))
      .as[(String, Long)].collect().toMap
    assert(merged == whole, "max-merged split sketches must equal the whole-corpus sketch")
    assert(lo.count() > 0 && hi.count() > 0)
  }

  // ---- q75 chunking ----

  test("q75 chunks: full coverage, stride arithmetic, short docs keep one chunk") {
    val docs = Seq(
      (1L, Array.fill(100)("w").mkString(" ")),    // 100 words -> 3 chunks
      (2L, "a b c"),                                // short -> 1 chunk
      (3L, (1 to 40).map(i => s"t$i").mkString(" ")) // exactly W -> 1 chunk
    ).toDF("doc_id", "text")
    val out = Chunking.docChunks(docs).collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc(1L).length == 3 && byDoc(2L).length == 1 && byDoc(3L).length == 1)
    // chunk 0 starts at word 1; last chunk of doc 1 covers through word 100
    val last1 = byDoc(1L).maxBy(_.getAs[Long]("chunk_idx"))
    assert(last1.getAs[Long]("n_words") == 100 - 2 * 30)
    // every word position is inside >= 1 chunk: sum of per-chunk spans
    // with overlap removed equals total words
    assert(byDoc(2L).head.getAs[String]("chunk_text") == "a b c")
  }

  test("q75 chunks: consecutive chunks overlap by window - stride words") {
    val docs = Seq((7L, (1 to 75).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = Chunking.docChunks(docs).orderBy("chunk_idx").collect()
    assert(out.length == 3)
    val c0 = out(0).getAs[String]("chunk_text").split(" ")
    val c1 = out(1).getAs[String]("chunk_text").split(" ")
    assert(c0.takeRight(10).sameElements(c1.take(10)), "10-word overlap")
    assert(c0.head == "w1" && c1.head == "w31")
  }

  // ---- q76 bigrams ----

  test("q76 bigrams: positional (non-distinct) counts match a hand count") {
    val docs = Seq((1L, "x y x y"), (2L, "x y z")).toDF("doc_id", "text")
    val out = Curation.bigramCounts(docs).as[(String, Long)].collect().toMap
    assert(out == Map("x y" -> 3L, "y x" -> 1L, "y z" -> 1L))
  }

  // ---- q77 winsorize ----

  test("q77 winsorize: bounds are data values, clamp counts consistent") {
    val out = Analytics.winsorize(spark, sfDir).collect()
    val events = Tables.events(spark, sfDir)
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val lo = r.getAs[Double]("lo"); val hi = r.getAs[Double]("hi")
      assert(lo <= hi)
      val vals = events.filter(col("event_type") === et).select("value")
        .as[Double].collect()
      assert(vals.contains(lo) && vals.contains(hi), "bounds must be exact data values")
      assert(r.getAs[Long]("n_clamped_lo") == vals.count(_ < lo))
      assert(r.getAs[Long]("n_clamped_hi") == vals.count(_ > hi))
      val micro = vals.map(v => math.floor(math.min(math.max(v, lo), hi) * 1e6).toLong).sum
      assert(r.getAs[Long]("clamped_sum_micro") == micro)
    }
  }

  // ---- q78 time decay ----

  test("q78 time decay: hand-computed dyadic weights on a tiny frame") {
    val ts0 = java.sql.Timestamp.valueOf("2024-06-15 12:00:00")
    def at(days: Int) = new java.sql.Timestamp(ts0.getTime - days * 86400000L)
    val events = Seq(
      (1L, at(0), "click"), (2L, at(0), "click"), (3L, at(1), "click"),
      (4L, at(40), "click"), (5L, at(2), "view")
    ).toDF("event_id", "ts", "event_type")
    val out = Temporal.timeDecay(events).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("decay_intsum")).toMap
    val p30 = 1L << 30
    // clicks: 2 events day0 + 1 day1 + 1 beyond the 2^-30 cut
    assert(out("click") == 2 * p30 + p30 / 2)
    // view is 2 days old relative to max ts (day0), weight 2^-2
    assert(out("view") == p30 / 4)
  }

  test("q78 time decay: intsum bounded by n * 2^30 and deterministic") {
    val a = Temporal.timeDecay(spark, sfDir).collect()
    val b = Temporal.timeDecay(spark, sfDir).collect()
    assert(a.sameElements(b))
    a.foreach { r =>
      assert(r.getAs[Long]("decay_intsum") <= r.getAs[Long]("n_events") * (1L << 30))
    }
  }

  // ---- q79 containment ----

  test("q79 containment: catches strict inclusion Jaccard misses, both dirs for twins") {
    val quote = (1 to 30).map(i => s"q$i").mkString(" ")
    val filler = (1 to 200).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (1L, quote),                    // short doc
      (2L, quote + " " + filler),     // contains doc 1 wholesale
      (3L, quote)                     // exact twin of doc 1
    ).toDF("doc_id", "text")
    val out = ApproxDedup.containmentPairs(docs).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("containment"))
      .toMap
    // 1 ⊂ 2: containment(1→2) = 1.0 even though Jaccard ~ 28/228 << τ
    assert(out((1L, 2L)) == 1.0)
    assert(!out.contains((2L, 1L)), "reverse direction fails τ: |2∩1|/|2| is small")
    // twins appear in both directions
    assert(out((1L, 3L)) == 1.0 && out((3L, 1L)) == 1.0)
    // sanity: Jaccard at τ=0.8 does NOT pair 1 with 2
    val jac = ApproxDedup.ngramJaccard(docs).select("a_id", "b_id")
      .as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L)))
  }

  test("q215 blocked containment: sound vs the exact twin, catches the " +
      "planted inclusion and both twin directions") {
    val quote = (1 to 30).map(i => s"q$i").mkString(" ")
    val filler = (1 to 60).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (1L, quote),                // short doc
      (2L, quote + " " + filler), // contains doc 1 wholesale, ~3x larger
      (3L, quote)                 // exact twin of doc 1
    ).toDF("doc_id", "text")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        (r.getAs[Long]("common"), r.getAs[Long]("na"), r.getAs[Double]("containment")))
      .toMap
    val exact = asMap(ApproxDedup.containmentPairs(docs))
    val blocked = asMap(ApproxDedup.containmentBlocked(docs))
    // soundness: every banded pair verifies to the exact twin's values
    blocked.foreach { case (k, v) =>
      assert(exact.get(k).contains(v), s"blocked pair $k diverges: $v vs ${exact.get(k)}")
    }
    // the planted strict inclusion (J ~ 0.33, invisible to the 32x4
    // geometry) and both twin directions are caught
    assert(blocked((1L, 2L))._3 == 1.0)
    assert(!blocked.contains((2L, 1L)))
    assert(blocked((1L, 3L))._3 == 1.0 && blocked((3L, 1L))._3 == 1.0)
  }

  test("q215 LSH-ensemble recall: planted 4x and 8x inclusions recalled at >= 0.8") {
    // 50 independent inclusions per ratio; tokens are pair-unique so no
    // cross-pair shingles exist. Quote = 40 words (38 shingles, bucket 5);
    // 4x container = 160 words (158 shingles, bucket 7, d=2, J=0.24);
    // 8x container = 320 words (318 shingles, bucket 8, d=3, J=0.12).
    // Deterministic: fixed ids/text + seeded permutations -> recall is a
    // constant of the geometry, not a sample. Expected detection
    // 1-(1-J^2)^128: ~0.9995 at 4x, ~0.84 at 8x (round 9's single 64x2
    // cut measured ~0.24 at 4x and ~0 at 8x).
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val pairs4 = (0 until 50).map { i =>
      (Seq((1000L + i, words(s"a${i}q", 40)),
        (2000L + i, words(s"a${i}q", 40) + " " + words(s"a${i}f", 120))),
        (1000L + i, 2000L + i))
    }
    val pairs8 = (0 until 50).map { i =>
      (Seq((3000L + i, words(s"b${i}q", 40)),
        (4000L + i, words(s"b${i}q", 40) + " " + words(s"b${i}f", 280))),
        (3000L + i, 4000L + i))
    }
    val docs = (pairs4 ++ pairs8).flatMap(_._1).toDF("doc_id", "text")
    val found = ApproxDedup.containmentBlocked(docs)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val r4 = pairs4.count(p => found.contains(p._2)) / 50.0
    val r8 = pairs8.count(p => found.contains(p._2)) / 50.0
    info(s"planted recall: 4x=$r4 8x=$r8")
    assert(r4 >= 0.8, s"4x inclusion recall $r4 below 0.8")
    assert(r8 >= 0.8, s"8x inclusion recall $r8 below 0.8")
  }

  test("q215 on the corpus: banded recall matches the exact twin at test scale") {
    val docs = graft.Tables.documents(spark, sfDir)
    val exact = ApproxDedup.containmentPairs(docs)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val blocked = ApproxDedup.containmentBlocked(docs)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(blocked.subsetOf(exact), "blocked must verify exactly")
    assert(blocked == exact,
      s"recall gap at test scale: missing ${(exact -- blocked).take(5)}")
  }

  // ---- q80 rolling features ----

  test("q80 rolling: hand-checked ROWS and RANGE frames on a tiny user") {
    val t0 = java.sql.Timestamp.valueOf("2024-06-15 10:00:00")
    def at(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val events = Seq(
      (1L, at(0), 5L, "e", 1.0), (2L, at(10), 5L, "e", 2.0),
      (3L, at(50), 5L, "e", 3.0), (4L, at(75), 5L, "e", 4.0),
      (5L, at(80), 5L, "e", 5.0), (6L, at(200), 5L, "e", 6.0),
      (7L, at(0), 9L, "e", 7.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analytics.rollingFeatures(events).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("roll5_n"), r.getAs[Long]("roll5_sum_micro"), r.getAs[Long]("hour_n")))
      .toMap
    assert(out(1L) == ((1L, 1000000L, 1L)))
    // e5@80min: ROWS frame = e1..e5 (n=5, Σv=15); RANGE hour = {e3@50, e4@75, e5@80}
    assert(out(5L) == ((5L, 15000000L, 3L)))
    // e6@200min: ROWS frame = e2..e6 (n=5, Σv=20); nothing else in its trailing hour
    assert(out(6L) == ((5L, 20000000L, 1L)))
    // the other user's lone event is isolated in both frames
    assert(out(7L) == ((1L, 7000000L, 1L)))
  }

  // ---- q81 percentile rank ----

  test("q81 percentile rank: exact ratios, bounds, singleton group edge") {
    val docs = Seq(
      (1L, "en", 10L), (2L, "en", 20L), (3L, "en", 30L), (4L, "de", 5L)
    ).toDF("doc_id", "lang", "n_chars")
    val out = Analytics.percentileRank(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("pct_rank"), r.getAs[Double]("cume"))).toMap
    assert(out(1L) == ((0.0, 1.0 / 3)))
    assert(out(2L) == ((0.5, 2.0 / 3)))
    assert(out(3L) == ((1.0, 1.0)))
    assert(out(4L) == ((0.0, 1.0))) // singleton group: defined, not NaN
  }

  // ---- q82 schema merge ----

  test("q82 schema merge: old-snapshot rows surface the new column as NULL") {
    val out = graft.sources.Ingest.schemaMergeRead(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = r.getAs[Long]("o_orderkey")
      if (key % 2 == 0) assert(r.isNullAt(r.fieldIndex("o_totalprice")),
        s"old-snapshot row $key must have NULL o_totalprice")
      else assert(!r.isNullAt(r.fieldIndex("o_totalprice")))
    }
    val n = Tables.orders(spark, sfDir).count()
    assert(rows.length.toLong == n, "no rows lost across snapshots")
  }

  // ---- q83 heavy hitters ----

  test("q83 heavy hitters: rank caps at 3, counts sum to facet totals") {
    val docs = Seq(
      (1L, "en", "a"), (2L, "en", "a"), (3L, "en", "b"), (4L, "en", "c"),
      (5L, "en", "d"), (6L, "de", null)
    ).toDF("doc_id", "lang", "source")
    val out = Analytics.heavyHitters(docs).collect()
    val en = out.filter(_.getAs[String]("lang") == "en")
    assert(en.length == 3)
    assert(en.map(r => (r.getAs[String]("source"), r.getAs[Long]("cnt"), r.getAs[Long]("rank"))).toSeq
      == Seq(("a", 2L, 1L), ("b", 1L, 2L), ("c", 1L, 3L)))
    val de = out.filter(_.getAs[String]("lang") == "de")
    assert(de.map(r => (r.getAs[String]("source"), r.getAs[Long]("cnt"))).toSeq
      == Seq(("", 1L)), "NULL source normalizes to ''")
  }

  // ---- q84 profile audit ----

  test("q84 profile: null/empty/distinct counted per column in one row") {
    val docs = Seq(
      (1L, "x", "en", "s1"), (2L, "", "en", null), (3L, "y", null, "s1")
    ).toDF("doc_id", "text", "lang", "source")
    val r = graft.operators.Cleanse.profileAudit(docs).collect().head
    assert(r.getAs[Long]("n_rows") == 3)
    assert(r.getAs[Long]("text_empty") == 1 && r.getAs[Long]("text_null") == 0)
    assert(r.getAs[Long]("text_distinct") == 3)
    assert(r.getAs[Long]("lang_null") == 1 && r.getAs[Long]("lang_distinct") == 1)
    assert(r.getAs[Long]("source_null") == 1 && r.getAs[Long]("source_distinct") == 1)
  }

  // ---- q85 event gaps ----

  test("q85 gaps: hand-checked bands and gap sums") {
    val t0 = java.sql.Timestamp.valueOf("2024-06-15 10:00:00")
    def at(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    val events = Seq(
      (1L, at(0), 5L), (2L, at(30), 5L), (3L, at(2000), 5L),
      (4L, at(0), 9L), (5L, at(90000), 9L)
    ).toDF("event_id", "ts", "user_id")
    val out = Temporal.eventGaps(events).collect()
      .map(r => r.getAs[String]("band") -> (r.getAs[Long]("n"), r.getAs[Long]("gap_sum_s")))
      .toMap
    assert(out("0_first") == ((2L, 0L)))
    assert(out("1_under_1m") == ((1L, 30L)))      // 30s gap
    assert(out("2_under_1h") == ((1L, 1970L)))    // 2000-30
    assert(out("4_over_1d") == ((1L, 90000L)))
    assert(!out.contains("3_under_1d"))
  }

  // ---- q86 snapshot diff ----

  test("q86 snapshot diff: added/removed/changed/unchanged classified null-safely") {
    val vOld = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, null.asInstanceOf[String], 30.0))
      .toDF("k", "st", "price")
    val vNew = Seq((2L, "b", 25.0), (3L, null.asInstanceOf[String], 30.0), (4L, "d", 40.0))
      .toDF("k", "st", "price")
    val out = graft.operators.Merge.snapshotDiff(vOld, vNew, "k", Seq("st", "price"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("change")).toMap
    assert(out == Map(1L -> "removed", 2L -> "changed", 3L -> "unchanged", 4L -> "added"))
  }

  // ---- q87 pagerank ----

  test("q87 pagerank: hand-checked fixed-point ranks on a 3-node path + isolate") {
    val nodes = Seq(1L, 2L, 3L, 9L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val out = graft.operators.Cluster.pagerankGraph(nodes, edges, 4L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pr_int")).toMap
    // replay the integer recurrence in Scala
    val R = graft.operators.Cluster.PrMass
    val r0 = R / 4; val base = 15L * r0 / 100L
    var r = Map(1L -> r0, 2L -> r0, 3L -> r0)
    val deg = Map(1L -> 1L, 2L -> 2L, 3L -> 1L)
    val inN = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L))
    for (_ <- 1 to graft.operators.Cluster.PrRounds)
      r = r.map { case (v, _) =>
        v -> (base + 85L * inN(v).map(u => r(u) / deg(u)).sum / 100L) }
    assert(out(1L) == r(1L) && out(2L) == r(2L) && out(3L) == r(3L))
    assert(out(9L) == base, "isolated node takes the closed-form base")
    // the middle of the path concentrates rank
    assert(out(2L) > out(1L) && out(1L) == out(3L))
    // leaky by design: total never exceeds the mass
    assert(out.values.sum <= R)
  }

  // ---- q88 cohort retention ----

  test("q88 cohort: offsets count distinct users per return day") {
    val d = java.sql.Timestamp.valueOf("2024-06-01 08:00:00")
    def at(day: Int, h: Int = 0) = new java.sql.Timestamp(d.getTime + (day * 24L + h) * 3600000L)
    val events = Seq(
      (1L, at(0), 5L), (2L, at(0, 3), 5L), (3L, at(2), 5L),   // user 5: cohort d0, returns d2
      (4L, at(0), 6L), (5L, at(1), 6L),                       // user 6: cohort d0, returns d1
      (6L, at(1), 7L)                                         // user 7: cohort d1
    ).toDF("event_id", "ts", "user_id")
    val out = Analytics.cohortRetention(events).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_day").toString,
        r.getAs[Long]("day_offset")) -> r.getAs[Long]("n_users")).toMap
    assert(out(("2024-06-01", 0L)) == 2) // users 5 and 6 on their cohort day
    assert(out(("2024-06-01", 1L)) == 1) // user 6 returns next day
    assert(out(("2024-06-01", 2L)) == 1) // user 5 returns on day 2
    assert(out(("2024-06-02", 0L)) == 1) // user 7's own cohort
    assert(out.size == 4)
  }

  // ---- q89 feature hash ----

  test("q89 feature hash: bucket counts sum to the word count, fixed schema") {
    val docs = Seq((1L, "a b c a"), (2L, "x")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.featureHash(docs).collect()
    assert(out.head.schema.fieldNames.toSeq ==
      ("doc_id" +: (0 until 16).map(i => s"f$i")))
    val sums = out.map(r => r.getAs[Long]("doc_id") ->
      (0 until 16).map(i => r.getAs[Long](s"f$i")).sum).toMap
    assert(sums == Map(1L -> 4L, 2L -> 1L))
    // same word -> same bucket: doc 1 has a bucket holding exactly 2 ('a' twice)
    val d1 = out.find(_.getAs[Long]("doc_id") == 1L).get
    assert((0 until 16).map(i => d1.getAs[Long](s"f$i")).count(_ == 2L) == 1)
  }

  // ---- q90 group correlation ----

  test("q90 corr: perfectly correlated / anti-correlated hand data") {
    val events = Seq(
      ("a", 1.0, """{"k": 10}"""), ("a", 2.0, """{"k": 20}"""), ("a", 3.0, """{"k": 30}"""),
      ("b", 1.0, """{"k": 30}"""), ("b", 2.0, """{"k": 20}"""), ("b", 3.0, """{"k": 10}"""),
      ("c", 5.0, null.asInstanceOf[String])  // null props drop out
    ).toDF("event_type", "value", "props")
    val out = Analytics.groupCorr(events).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("corr_r"))).toMap
    assert(out("a") == ((3L, 1.0)))
    assert(out("b") == ((3L, -1.0)))
    assert(!out.contains("c"))
  }

  test("q90 corr: zero-variance group yields NULL, not NaN") {
    val events = Seq(
      ("a", 2.0, """{"k": 7}"""), ("a", 2.0, """{"k": 7}""")
    ).toDF("event_type", "value", "props")
    val r = Analytics.groupCorr(events).collect().head
    assert(r.isNullAt(r.fieldIndex("corr_r")))
  }

  // ---- q91 histogram ----

  test("q91 histogram: buckets partition the rows, micro-sums exact") {
    val out = Analytics.valueHistogram(spark, sfDir).collect()
    val events = Tables.events(spark, sfDir)
    val total = events.filter(col("value").isNotNull).count()
    assert(out.map(_.getAs[Long]("n")).sum == total, "buckets partition all rows")
    out.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0, "values are non-negative so buckets are too")
    }
  }

  // ---- q92 facet cube ----

  test("q92 cube: subtotal NULLs stay distinct from normalized '' facets") {
    val docs = Seq(
      (1L, "en", "a", 10L), (2L, "en", null, 20L), (3L, "de", "b", 30L)
    ).toDF("doc_id", "lang", "source", "n_chars")
    val out = Analytics.facetCube(docs).collect()
      .map(r => (Option(r.getAs[String]("lang")), Option(r.getAs[String]("source")))
        -> (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_chars"))).toMap
    assert(out((Some("en"), Some(""))) == ((1L, 20L)), "data NULL became ''")
    assert(out((Some("en"), None)) == ((2L, 30L)), "cube subtotal row is NULL")
    assert(out((None, None)) == ((3L, 60L)), "grand total")
    assert(out.size == 3 + 3 + 2 + 1) // cells + lang subtotals + source subtotals + total
  }

  // ---- q93 dedup survivor ----

  test("q93 survivor: longest doc wins its cluster, ties to lowest id, singletons self-survive") {
    val dup = ((1 to 40).map(i => s"w$i")).mkString(" ")
    val docs = Seq(
      (1L, dup), (2L, dup + " extra tail words here"), (3L, dup), // one cluster
      (9L, "totally unrelated text that stands alone by itself now")
    ).toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    val labels = graft.operators.Cluster.connectedComponents(
      docs.select(col("doc_id").as("id")),
      graft.operators.ApproxDedup.ngramJaccardPairs(docs).select("a_id", "b_id"))
    // survivorship over explicit frames mirrors the gated path's rule
    val clustered = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clustered(1L) == clustered(2L) && clustered(2L) == clustered(3L))
    assert(clustered(9L) == 9L)
    val out = graft.operators.Cluster.dedupSurvivor(spark, sfDir).collect()
    // gated-path invariants at sf0.001: every cluster has exactly one
    // survivor, and it maximizes (n_chars, -doc_id) within the cluster
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    val chars = Tables.documents(spark, sfDir).select("doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byCluster.foreach { case (_, rows) =>
      val survivors = rows.filter(_.getAs[Boolean]("is_survivor"))
      assert(survivors.length == 1)
      val s = survivors.head.getAs[Long]("survivor_id")
      rows.foreach { r =>
        val m = r.getAs[Long]("doc_id")
        assert(r.getAs[Long]("survivor_id") == s)
        assert((chars(s), -s) == Seq((chars(s), -s), (chars(m), -m)).max)
      }
    }
  }

  // ---- q94 source gate ----

  test("q94 gate: kept docs all come from their language's top-3 sources") {
    val out = Analytics.sourceGate(spark, sfDir).collect()
    val top = Analytics.heavyHitters(Tables.documents(spark, sfDir)).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source"))).toSet
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(top.contains((r.getAs[String]("lang"), r.getAs[String]("source"))))
    }
    assert(out.length < Tables.documents(spark, sfDir).count(), "gate actually drops rows")
  }

  // ---- q96 rate anomaly ----

  test("q96 anomaly: an outlier hour scores high, trailing window caps at 24") {
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 00:30:00")
    def at(hour: Int, m: Int) = new java.sql.Timestamp(t0.getTime + (hour * 60L + m) * 60000L)
    // 30 baseline hours alternating 4/6 events (mean 5, sd > 0), then 50
    val rows = (0 until 30).flatMap(h =>
      (0 until (4 + (h % 2) * 2)).map(m => at(h, m))) ++
      (0 until 50).map(m => at(30, m))
    val events = rows.zipWithIndex
      .map { case (ts, i) => (i.toLong, ts, "a") }
      .toDF("event_id", "ts", "event_type")
    val out = Temporal.rateAnomaly(events).collect()
      .map(r => r.getAs[java.sql.Timestamp]("hour").toString ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("z_r"))).toMap
    // 32 observed hours (t0 at :30 splits the outlier block across two
    // truncated hours) minus the first two (cnt<2 filtered)
    assert(out.size == 30)
    val (cnt, z) = out("2024-06-02 06:00:00.0") // t0 + 30h, truncated
    assert(cnt == 24, "trailing window caps at 24 observed buckets")
    assert(z > 10.0, s"outlier hour must score extreme, got $z")
    assert(out.values.filter(_._1 == 24).map(_._2).count(math.abs(_) < 3) >= 5,
      "baseline hours stay inside 3 sigma")
  }

  test("q97: two-pass bucket selection equals the q51 window-sort quantiles") {
    val ev = Tables.events(spark, sfDir).filter(col("value").isNotNull)
    val exact = Analytics.groupQuantiles(ev).collect().map(_.toString).toSeq
    val twoPass = Analytics.groupQuantiles2Pass(ev).collect().map(_.toString).toSeq
    assert(exact == twoPass)
  }

  test("q97: null values drop, a null group survives the bucket joins") {
    val df = Seq(
      (Some("a"), Some(1.0), 1L), (Some("a"), Some(2.0), 2L),
      (Some("a"), Option.empty[Double], 3L),
      (Option.empty[String], Some(5.0), 4L),
      (Option.empty[String], Some(7.0), 5L),
      (Some("b"), Some(3.0), 6L)
    ).toDF("event_type", "value", "event_id")
    val out = Analytics.groupQuantiles2Pass(df).collect()
    // ascending with nulls first: (null), a, b
    assert(out.length == 3)
    val byKey = out.map(r => Option(r.getAs[String]("event_type")) ->
      (r.getAs[Long]("n_events"), r.getAs[Double]("p50"),
        r.getAs[Double]("p90"), r.getAs[Double]("p99"))).toMap
    assert(byKey(None) == ((2L, 5.0, 7.0, 7.0)), "null group must survive")
    assert(byKey(Some("a")) == ((2L, 1.0, 2.0, 2.0)), "null value must drop")
    assert(byKey(Some("b")) == ((1L, 3.0, 3.0, 3.0)))
  }

  test("q98/q99: two-pass twins equal their window-sort originals") {
    val docs = Tables.documents(spark, sfDir)
    assert(Analytics.percentileRank(docs).collect().map(_.toString).toSeq ==
      Analytics.percentileRank2Pass(docs).collect().map(_.toString).toSeq)
    val ev = Tables.events(spark, sfDir).filter(col("value").isNotNull)
    assert(Analytics.winsorize(ev).collect().map(_.toString).toSeq ==
      Analytics.winsorize2Pass(ev).collect().map(_.toString).toSeq)
  }

  test("q79 containment: agrees with a naive all-pairs computation at sf0.001") {
    val docs = Tables.documents(spark, sfDir)
    val sh = ApproxDedup.shingleSets(docs).filter(size(col("shingles")) > 0)
      .select("doc_id", "shingles").as[(Long, Seq[String])].collect()
    val naive = (for {
      (a, sa) <- sh; (b, sb) <- sh if a != b
      common = sa.toSet.intersect(sb.toSet).size
      if common.toDouble / sa.size >= 0.9
    } yield (a, b)).toSet
    val got = ApproxDedup.containmentPairs(docs).select("a_id", "b_id")
      .as[(Long, Long)].collect().toSet
    assert(got == naive)
  }

  test("q120: merged window sketch equals the sketch of the unioned hours") {
    import spark.implicits._
    import java.sql.Timestamp
    // three consecutive hours with overlapping user sets; the trailing-3
    // window ending at h2 covers everything, so its merged registers
    // must equal the one-shot sketch of ALL events (mergeability), and
    // every window truth is the exact distinct over its hours
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")
    val events = (
      (1 to 40).map(u => (u.toLong, ts(10, u % 60), u.toLong, "view", 1.0, "{}")) ++
      (21 to 60).map(u => (100 + u.toLong, ts(11, u % 60), u.toLong, "view", 1.0, "{}")) ++
      (41 to 80).map(u => (200 + u.toLong, ts(12, u % 60), u.toLong, "view", 1.0, "{}"))
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val win = graft.operators.Hll.hllWindowDistinct(events).collect()
    assert(win.length === 3)
    val byHour = win.map(r => r.getAs[java.sql.Timestamp]("window_end_hour").toLocalDateTime.getHour ->
      (r.getAs[Long]("hll_intsum"), r.getAs[Long]("true_distinct"))).toMap
    assert(byHour(10)._2 === 40L)   // users 1..40
    assert(byHour(11)._2 === 60L)   // 1..60
    assert(byHour(12)._2 === 80L)   // 1..80 (all three hours)
    val full = graft.operators.Hll.hllDistinct(events).collect()
    assert(full.length === 1)
    assert(byHour(12)._1 === full.head.getAs[Long]("hll_intsum"),
      "trailing window over all hours must merge to the one-shot sketch")
  }
}
