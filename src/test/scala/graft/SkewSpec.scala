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

  test("q109 lookup under one stopword-hot term: exact result, hot list never shuffles") {
    import spark.implicits._
    import graft.operators.PostingsIndex
    // "hot" is in every doc (a stopword); "rare" in 3; conjunctive
    // lookup must return exactly the 3, scored by summed tf
    val docs = (0 until 1000).map { i =>
      val rare = if (i % 333 == 0 && i > 0) " rare" else ""
      (i.toLong, s"hot hot$rare filler$i")
    }.toDF("doc_id", "text")
    val idxDir = java.nio.file.Files.createTempDirectory("graft_postings_skew")
      .resolve("idx").toString
    PostingsIndex.buildIndex(docs, idxDir)
    val out = PostingsIndex.lookupTerms(spark, idxDir, Seq("hot", "rare"))
    val rows = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === Map(333L -> 3L, 666L -> 3L, 999L -> 3L), s"got $rows")
    // the hot list must stream through broadcast semi-joins — any
    // exchange feeding a join means a 500k-posting stopword moved
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"hot postings list shuffled:\n$p")
  }

  /** 100k-row fact where ONE key owns half the rows (power-law head) and
    * 999 cold keys share the rest — the shape that wedges an unsalted
    * shuffle join on a single reducer. Payload pads rows so AQE's
    * byte-based skew detector sees the hot partition. */
  private def skewedFact(rows: Int = 100000) = {
    import spark.implicits._
    spark.range(rows).select(
      col("id"),
      when(col("id") % 2 === 0, 0L).otherwise(col("id") % 999 + 1).as("key"),
      concat(lit("p" * 64), col("id")).as("payload"))
  }

  test("skewed fixture: salting collapses the max-reducer load, result-identical") {
    val fact = skewedFact()
    val dim = fact.select(col("key")).distinct()
      .withColumn("key_len", length(col("key").cast("string")).cast("long"))
    // result identity on the skewed fixture (the oracle property of q53)
    val plain = fact.join(dim, Seq("key")).select("id", "key", "key_len")
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(fact, dim, "key", salts = 16)
      .select("id", "key", "key_len")
      .collect().map(_.toString).sorted.toSeq
    assert(salted === plain && plain.nonEmpty)
    // The scale property, measured deterministically: rows per reducer
    // under the shuffle's own hash. Wall-clock on this box varies ±20%
    // run to run, so the assertion targets the thing that MAKES salting
    // faster at scale — the hot key's rows spreading over `salts`
    // reducers — not a timing sample of it.
    val parts = 32
    def maxLoad(keys: org.apache.spark.sql.Column*): Long =
      fact.groupBy(pmod(hash(keys: _*), lit(parts)).as("p"))
        .count().agg(max("count")).first().getLong(0)
    val unsaltedMax = maxLoad(col("key"))
    val saltedMax = maxLoad(col("key"),
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(16)).cast("int"))
    assert(unsaltedMax >= 50000L, s"fixture must be skewed (got $unsaltedMax)")
    assert(saltedMax * 4 <= unsaltedMax,
      s"salting must spread the hot reducer: $saltedMax vs $unsaltedMax")
  }

  test("AQE splits the skewed partition of a fact-fact sort-merge join") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val a = skewedFact().select(col("key"), col("payload").as("pa"))
      // the other side is key-uniform and hot-key-free: the skewed
      // PARTITION (a's) is what AQE must split — a hot×hot key would
      // also explode the join output
      val b = spark.range(1, 1000).select(
        col("id").as("key"), concat(lit("q" * 64), col("id")).as("pb"))
      val joined = a.join(b, Seq("key"))
      // collect() executes joined's OWN QueryExecution — count() would
      // build a different one and leave this plan isFinalPlan=false
      assert(joined.collect().length > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a shuffle join:\n$plan")
      assert(plan.toLowerCase.contains("skew"),
        s"AQE must mark the hot partition's join as skew-split:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
