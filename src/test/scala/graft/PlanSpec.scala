package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Similarity}

/** Plan-hygiene regression tests: these lock in the physical-plan
  * properties the 100 TB design depends on, so a refactor that silently
  * loses a pushdown or broadcasts-to-sort-merge regression fails CI. */
class PlanSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01: ship-date filter and column pruning reach the parquet scan") {
    val p = plan(Analytics.pricingSummary(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.contains("ReadSchema") && !p.contains("l_orderkey"), "unused columns must be pruned")
  }

  test("q03: star join broadcasts every dimension (no sort-merge join)") {
    val p = plan(Analytics.starJoin(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "dims must broadcast, not shuffle")
  }

  test("q27: top-k runs as a partial aggregate, not a window sort") {
    val p = plan(Similarity.bruteForceTopK(spark, sfDir))
    assert(p.contains("topk_sim_id"))
    assert(!p.contains("Window"), "bounded-heap agg must replace the rank window")
  }

  test("q24: minhash signature is computed behind an exchange barrier") {
    val p = plan(graft.operators.ApproxDedup.minhashLsh(spark, sfDir))
    assert(p.contains("minhash_signature"))
    // the signature projection must feed an Exchange so CollapseProject
    // cannot re-inline the fold into the 32-band posexplode
    val sigIdx = p.indexOf("minhash_signature")
    assert(p.lastIndexOf("Exchange hashpartitioning(doc_id") > 0)
    assert(sigIdx > p.indexOf("Generate explode"), "signature computed below the band explode")
  }

  test("q41/q40/q42 blocked paths plan equi-joins on the bucket, never nested-loop") {
    // the whole point of the blocked variants: candidate generation is a
    // hash-partitioned equi-join on the LSH bucket, so no plan may fall
    // back to BroadcastNestedLoopJoin/CartesianProduct the way the exact
    // q26/q29 non-equi joins do
    Seq(
      Similarity.knnJoinLshBlocked(spark, sfDir),
      graft.operators.Dedup.embeddingBlockedPairs(spark, sfDir),
      graft.operators.Dedup.dedupIncrementalQ(spark, sfDir)
    ).foreach { df =>
      val p = plan(df)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"blocked path degenerated to a pairwise scan:\n$p")
    }
  }

  test("q25: simhash runs as the native kernel, no interpreted nested fold") {
    val p = plan(graft.operators.ApproxDedup.simhash(spark, sfDir))
    assert(p.contains("simhash64"))
    assert(!p.contains("aggregate(sequence"), "nested HOF fold must be gone")
  }

  test("q33: fingerprint runs as the native kernel") {
    val p = plan(graft.operators.TextAnalysis.fingerprint(spark, sfDir))
    assert(p.contains("poly_fingerprint"))
  }

  test("q46: connected-components rounds plan equi-joins only, never nested-loop") {
    // every CC round is two hash equi-joins on node id; a refactor that
    // turns one into a non-equi predicate would silently go cartesian
    val docs = Tables.documents(spark, sfDir)
    val edges = graft.operators.ApproxDedup.ngramJaccardPairs(docs).select("a_id", "b_id")
    val nodes = docs.select(col("doc_id").as("id"))
    // smallGraphMax = 0 forces the distributed loop (the shape this
    // asserts on); small graphs take the single-task union-find path
    val p = plan(graft.operators.Cluster.connectedComponents(nodes, edges,
      maxIter = 2, smallGraphMax = 0))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"CC round degenerated to a pairwise scan:\n$p")
  }

  test("q47: stratified sample is a zero-shuffle narrow filter over the scan") {
    val p = plan(graft.operators.Sampling.stratifiedSample(spark, sfDir))
    // the only exchange allowed is the final presentation sort's range
    // partitioning; the sampling itself is filter-on-scan
    assert(!p.contains("Exchange hashpartitioning"),
      s"hash-bucket sampling must not shuffle:\n$p")
    assert(!p.contains("text"), "unused text column must be pruned from the scan")
  }

  test("q49: mixture rebalance broadcasts the per-stratum thresholds") {
    val p = plan(graft.operators.Sampling.domainRebalance(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"stratum thresholds (rows = #strata) must broadcast onto the corpus scan:\n$p")
    assert(!p.contains("SortMergeJoin"), "corpus side must not shuffle for the join")
  }

  test("q57: as-of join plans as ONE user_id shuffle + window, no join node") {
    val p = plan(graft.operators.Temporal.asofJoin(spark, sfDir))
    assert(!p.contains("Join"), s"union-trick as-of must not plan any join:\n$p")
    assert(p.contains("Window"), "running last_value window expected")
  }

  test("q58: interval join is an equi-join on (user_id, cell), never nested-loop") {
    val p = plan(graft.operators.Temporal.intervalJoin(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bucketed interval join degenerated to a range scan:\n$p")
  }

  test("q59: centroid assignment is a narrow projection (no join before the pair stage)") {
    val p = plan(graft.operators.SemDedup.semDedup(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"semdedup must only pair within cells via equi-join:\n$p")
    assert(p.contains("dot_product_double"), "native kernel expected in assignment/scoring")
  }

  test("q60: bm25 reads the corpus twice at most and takes top-k bounded") {
    val p = plan(graft.operators.Search.bm25(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), "top-k must be bounded, not a global sort")
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans <= 2, s"bm25 must be two corpus passes, saw $scans scans:\n$p")
  }

  test("q64: per-group sample ranks via the bounded heap, not a window sort") {
    val p = plan(graft.operators.Sampling.groupSample(spark, sfDir))
    assert(p.contains("topk_sim_id"))
    assert(!p.contains("Window"), "k-per-group must be a partial top-k aggregate")
  }

  test("q175: weighted sample ranks via the bounded heap and broadcasts " +
      "the winners back, never sorting a whole source") {
    val p = plan(graft.operators.Sampling.weightedSample(spark, sfDir))
    assert(p.contains("topk_sim_id"))
    assert(!p.contains("Window"), "per-source selection must be a partial top-k aggregate")
    assert(p.contains("BroadcastHashJoin"), "winners must broadcast onto the n_chars scan")
  }

  test("q49: stratum totals ride a broadcast, no single-partition window") {
    val p = plan(graft.operators.Sampling.domainRebalance(spark, sfDir))
    assert(!p.contains("Window"), s"global window must not appear:\n$p")
  }

  test("q29 pair scoring applies dot_product_double to bare attributes") {
    // the interpreted toDouble transform must stay below the join
    // boundary: if it fuses into the O(n²) scoring projection, every pair
    // re-runs the per-element HOF cast and the native kernel gains nothing
    val p = plan(Similarity.knnJoin(spark, sfDir))
    val scoringLine = p.linesIterator
      .find(l => l.contains("dot_product_double") && l.contains("Project"))
    assert(scoringLine.isDefined, s"no scoring projection found:\n$p")
    assert(!scoringLine.get.contains("lambdafunction"),
      s"HOF fused into pair scoring:\n${scoringLine.get}")
  }

  test("q69: tf-idf ranks via the bounded heap, not a window sort") {
    val p = plan(graft.operators.Search.tfidfTopTerms(spark, sfDir))
    assert(p.contains("topk_sim_id"), s"expected heap aggregate:\n$p")
    assert(!p.contains("RunningWindowFunction") && !p.contains("row_number"),
      s"tf-idf ranking fell back to a window sort:\n$p")
  }

  test("q70: bloom words ride a broadcast, probe side never shuffles for the join") {
    val p = plan(graft.operators.Sketch.bloomMembership(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast bloom join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"bloom probe picked a heavyweight join:\n$p")
  }

  test("q65: IVF candidate scoring is an equi-join on the cell, never nested-loop") {
    val p = plan(graft.operators.Similarity.ivfTopKExact(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"IVF pair stage planned a nested loop:\n$p")
  }

  test("q72: persisted IVF corpus scan is dynamically partition-pruned to probed cells") {
    val em = graft.Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_plan").toString
    graft.operators.IvfIndex.buildExact(em, dir)
    val p = graft.operators.IvfIndex
      .searchExact(spark, dir, em.filter(col("vec_id") < 10))
      .queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"corpus scan reads every cell directory (no partition pruning):\n$p")
  }

  test("q109: postings lookup reads ONLY the queried terms' buckets — " +
      "static partition pruning, no corpus scan") {
    import graft.operators.PostingsIndex
    val p = plan(PostingsIndex.lookup(spark, sfDir))
    // the bucket IN (…) literals must land as partition filters on the
    // index scan, not as a post-scan row filter
    assert(p.contains("PartitionFilters") && p.contains("bucket"),
      s"bucket predicate did not prune partitions:\n$p")
    // serving path must never fall back to scanning documents.parquet
    assert(!p.contains("documents.parquet"),
      s"lookup re-scanned the corpus instead of the index:\n$p")
    // engine-side bucket layout and driver-side literal buckets agree —
    // a divergence would silently prune AWAY the queried terms
    val dfB = graft.Tables.documents(spark, sfDir).sparkSession
      .sql(s"SELECT pmod(cast(conv(substring(md5('${PostingsIndex.Terms.head}'), 1, 15), 16, 10) AS BIGINT), ${PostingsIndex.NumBuckets})")
      .first().getLong(0)
    assert(dfB === PostingsIndex.bucketOf(PostingsIndex.Terms.head))
  }

  test("q197: ranked BM25 serves the postings index — static bucket " +
      "pruning, no corpus scan, bounded top-k") {
    import graft.operators.PostingsIndex
    val p = plan(PostingsIndex.bm25TopK(spark, sfDir))
    assert(p.contains("PartitionFilters") && p.contains("bucket"),
      s"bucket predicate did not prune partitions:\n$p")
    assert(!p.contains("documents.parquet"),
      s"ranked lookup re-scanned the corpus instead of the index:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must be bounded, not a global sort:\n$p")
  }

  test("q109: conjunction runs rarest-first as a broadcast semi-join chain") {
    import graft.operators.PostingsIndex
    val p = plan(PostingsIndex.lookup(spark, sfDir))
    // |terms|−1 intersection steps + the final survivor probe, every
    // one a BROADCAST semi (the big postings list streams, never moves)
    val semis = "BroadcastHashJoin \\[doc_id".r.findAllIn(p).length
    assert(semis === PostingsIndex.Terms.size,
      s"expected ${PostingsIndex.Terms.size} broadcast semi-joins, got $semis:\n$p")
    assert(p.contains("LeftSemi"), s"conjunction must be semi-joins:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a term list shuffled into a sort-merge join:\n$p")
  }

  test("q111: ADC serves the persisted codes artifact — no retrain, no corpus scan") {
    import graft.operators.PqOp
    // first call may build; the second must be the pure read path
    PqOp.pqAdcTopK(spark, sfDir).count()
    // scan locations checked programmatically: the plan STRING truncates
    // Location metadata at 100 chars, which can swallow the path suffix
    // (sparkPlan, not executedPlan: AQE's wrapper hides its subtree from
    // collect, and scan sources don't change at runtime)
    val scanPaths = PqOp.pqAdcTopK(spark, sfDir).queryExecution.sparkPlan
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString) }
      .flatten
    assert(scanPaths.exists(_.contains("codes.parquet")),
      s"ADC search must scan the persisted codes artifact: $scanPaths")
    // an embeddings.parquet scan in the SERVING plan would mean the
    // corpus is re-encoded (or worse, retrained) per query batch
    assert(!scanPaths.exists(_.contains("embeddings.parquet")),
      s"ADC serving plan re-reads the raw embeddings table: $scanPaths")
  }

  test("q74: hll sketch is aggregate-only — no window, no join before the estimate") {
    val p = plan(graft.operators.Hll.hllDistinct(spark, sfDir))
    assert(!p.contains("Window"), "register build must be a grouped agg, not a window")
    assert(p.contains("partial_max") || p.contains("HashAggregate"),
      "register max must be map-side combined")
  }

  test("q75: chunking is narrow — only the presentation sort exchanges") {
    val p = plan(graft.operators.Chunking.docChunks(spark, sfDir))
    assert(!p.contains("hashpartitioning"),
      s"chunk explode must not shuffle:\n$p")
  }

  test("q76: bigram top-50 is a bounded TakeOrdered, not a global sort") {
    val p = plan(graft.operators.Curation.bigramCounts(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"),
      s"limit must fold into a bounded per-partition heap:\n$p")
    assert(p.contains("word_shingles"), "gram build must run as the native kernel")
  }

  test("q182: co-occurrence pairs build array-locally — zero joins in the plan") {
    val p = plan(graft.operators.Curation.cooccurrence(spark, sfDir))
    assert(!p.contains("Join"), s"pair stream must not come from a positional self-join:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 must be a bounded per-partition heap:\n$p")
  }

  test("q180: anchors broadcast into both arms; the corpus never hash-shuffles pre-agg") {
    val p = plan(graft.operators.Similarity.hardNegatives(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"anchor side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a sort-merge join means the corpus shuffled for the anchor set:\n$p")
  }

  test("q181: silhouette scoring is a narrow projection — no join, one agg shuffle") {
    val p = plan(graft.operators.KMeansOp.silhouette(spark, sfDir))
    assert(!p.contains("Join"),
      s"centroids must ride as literals, not a join:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 1, s"expected at most the cell-agg exchange, got $hashEx:\n$p")
  }

  test("q79: containment candidates come from an equi-join, never nested-loop") {
    val p = plan(graft.operators.ApproxDedup.containmentPairs(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"containment degenerated to a pairwise scan:\n$p")
  }

  test("q80: both rolling frames ride one user_id shuffle (plus the output sort)") {
    val p = plan(Analytics.rollingFeatures(spark, sfDir))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"expected a single user_id exchange, got $hashEx:\n$p")
  }

  test("q87: pagerank rounds plan equi-joins only, never nested-loop") {
    val p = plan(graft.operators.Cluster.pagerank(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"pagerank degenerated to a pairwise scan:\n$p")
  }

  test("bucketed tables join co-located: no shuffle exchange on either side") {
    import graft.sources.Sinks
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "n_chars")
    Sinks.bucketedTable(docs, "bt_plan_a", "doc_id")
    Sinks.bucketedTable(docs.select(col("doc_id"), col("n_chars").as("len2")),
      "bt_plan_b", "doc_id")
    // suppress broadcast so the test exercises the shuffle-vs-bucket
    // decision a big fact-fact join faces
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bt_plan_a").join(spark.table("bt_plan_b"), "doc_id")
      assert(j.count() === docs.count())
      val p = plan(j)
      assert(!p.contains("Exchange"),
        s"bucketed join should be shuffle-free:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bt_plan_a")
      spark.sql("DROP TABLE IF EXISTS bt_plan_b")
    }
  }

  test("q105: frame slices come off the binary column before the explode; " +
      "one exchange total (the gated output sort)") {
    val df = graft.operators.Multimodal.frameSample(spark, sfDir)
    val p = plan(df)
    // IsNotNull(text) reaches the scan and only (doc_id, text) is read
    assert(p.contains("PushedFilters: [IsNotNull(text)]"))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
    // hex runs on per-frame substrings inside the generate's array — a
    // regression to hexing the whole payload would hoist hex(...) into a
    // projection below the Generate
    assert(p.contains("hex(substr("), "hex must apply to the frame slice, not the payload")
    // narrow pipeline: the only exchange is the output range sort
    df.collect()
    val exec = df.queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val fin = exec match { case a: AdaptiveSparkPlanExec => a.executedPlan; case o => o }
    val exchanges = fin.collect { case e: Exchange => e }
    assert(exchanges.size <= 1, s"q105 must not shuffle beyond the output sort:\n$fin")
  }

  test("q97/q98/q99: no window sorts a whole raw group — every window " +
      "runs over an aggregate or a bucket-filtered join") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.{ProjectExec, SortExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.Exchange
    // The node the window ACTUALLY sorts: walk through the window's own
    // machinery (sort / shuffle / projection) only. collectFirst over the
    // whole subtree would accept a regression that window-sorts raw rows
    // as long as an agg or broadcast join appears ANYWHERE deeper (the
    // stats join feeding the scan does), which is exactly the q51
    // scale-killer this test exists to catch.
    @scala.annotation.tailrec
    def gate(p: SparkPlan): SparkPlan = p match {
      case s: SortExec => gate(s.child)
      case e: Exchange => gate(e.child)
      case pr: ProjectExec => gate(pr.child)
      case other => other
    }
    Seq(
      Analytics.groupQuantiles2Pass(spark, sfDir),
      Analytics.percentileRank2Pass(spark, sfDir),
      Analytics.winsorize2Pass(spark, sfDir)
    ).foreach { df =>
      // sparkPlan (pre-AQE) so collect() can traverse the whole tree
      val exec = df.queryExecution.sparkPlan
      val windows = exec.collect { case w: WindowExec => w }
      assert(windows.nonEmpty, "expected the cum-count and rank windows")
      windows.foreach { w =>
        val ok = gate(w.child) match {
          // cum window: over the ≤256-row-per-group bucket-count aggregate
          case _: HashAggregateExec => true
          // rank window: over the (gkey, bucket) bucket-gate join — TWO
          // join keys. The scale-killer's stats join is on gkey alone, so
          // requiring the bucket key in the join distinguishes them.
          case j: BroadcastHashJoinExec => j.leftKeys.length >= 2
          case _ => false
        }
        assert(ok,
          s"window runs over raw ungated rows (the q51 scale-killer); " +
            s"gate node = ${gate(w.child).nodeName}:\n$w")
      }
    }
  }

  test("q136: nation filter reaches the supplier/customer scans; dims broadcast") {
    val p = plan(Analytics.tradeVolume(spark, sfDir))
    // filter-early contract: the 2-row nation slice broadcasts into the
    // dim scans, so the fact join tree never sees out-of-pair suppliers
    assert(p.contains("BroadcastHashJoin"), "nation slice must broadcast")
    assert(p.contains("PushedFilters: [In(n_name") ||
      p.contains("PushedFilters: [Or(EqualTo(n_name"),
      s"nation-name filter must push into the nation scan:\n$p")
  }

  test("q137: ONE aggregate pass computes numerator and denominator") {
    val exec = Analytics.marketShare(spark, sfDir).queryExecution.sparkPlan
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val finalAggs = exec.collect {
      case a: HashAggregateExec if a.aggregateExpressions.exists(
        _.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Final) => a
    }
    assert(finalAggs.size == 1,
      s"num+den must share one conditional aggregate, got ${finalAggs.size} final aggs")
    assert(finalAggs.head.aggregateExpressions.size == 2,
      "the single agg carries both sums")
  }

  test("cartesian guard: large×large condition-less joins fail at PLAN time; " +
      "stat-row and small-corpus cartesians pass") {
    val big = spark.range(100000000L)   // ~800 MB estimated, never executed
    val e = intercept[IllegalStateException] {
      big.crossJoin(spark.range(100000000L)).queryExecution.optimizedPlan
    }
    assert(e.getMessage.contains("GRAFT_GUARD_CARTESIAN"))
    // the legitimate shapes: 1-row stat side / small exact-twin corpus
    spark.range(1).crossJoin(spark.range(100000000L)).queryExecution.optimizedPlan
    spark.range(10000L).crossJoin(spark.range(10000L)).queryExecution.optimizedPlan
    // and the guard is a conf, not a hardcode
    spark.conf.set("spark.graft.guard.cartesianMinBytes", "-1")
    try big.crossJoin(spark.range(100000000L)).queryExecution.optimizedPlan
    finally spark.conf.unset("spark.graft.guard.cartesianMinBytes")
    // a typo'd conf fails with the guard's own message, not a bare
    // NumberFormatException from inside the optimizer
    spark.conf.set("spark.graft.guard.cartesianMinBytes", "256MB")
    try {
      val bad = intercept[IllegalArgumentException] {
        big.crossJoin(spark.range(100000000L)).queryExecution.optimizedPlan
      }
      assert(bad.getMessage.contains("GRAFT_GUARD_CARTESIAN"), bad.getMessage)
    } finally spark.conf.unset("spark.graft.guard.cartesianMinBytes")
  }

  test("q210: bucketed join + rollup plan no hash exchange anywhere — " +
      "only the deterministic output sort repartitions") {
    // suppress broadcast: at fixture scale customer would broadcast and
    // trivially hide the co-location the layout exists to provide
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan(graft.operators.Bucketing.bucketedJoin(spark, sfDir))
      assert(p.contains("SortMergeJoin"), s"expected a zipped-bucket SMJ:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"join and rollup must inherit the bucket partitioning:\n$p")
      val rangeEx = "Exchange rangepartitioning".r.findAllIn(p).length
      assert(rangeEx <= 1, s"only the output orderBy may exchange:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q214: the second bucketed layout (order key) joins and rolls up " +
      "exchange-free, and a point read prunes to one bucket") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan(graft.operators.Bucketing.bucketedLineitemJoin(spark, sfDir))
      assert(p.contains("SortMergeJoin"), s"expected a zipped-bucket SMJ:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"join and rollup must inherit the bucket partitioning:\n$p")
      val rangeEx = "Exchange rangepartitioning".r.findAllIn(p).length
      assert(rangeEx <= 1, s"only the output orderBy may exchange:\n$p")
      // bucket pruning: an equality probe on the bucket key reads 1 of
      // Buckets buckets straight off the file layout. autoBucketedScan
      // turns bucketed reading off for a bare filter (no join/agg to
      // co-partition for), which also forfeits the pruning — disable it
      // to assert the layout's point-read contract
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      try {
        val (li, _) = graft.operators.Bucketing.lineitemTablesFor(spark, sfDir)
        val probe = li.filter(org.apache.spark.sql.functions.col("l_orderkey") === 1L)
        val pp = probe.queryExecution.executedPlan.toString
        assert(pp.contains(s"SelectedBucketsCount: 1 out of ${graft.operators.Bucketing.Buckets}"),
          s"point read must prune to one bucket:\n$pp")
      } finally
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q139: checksum is one map-combined aggregate over a 2-column scan") {
    val p = plan(graft.operators.Cleanse.partitionChecksum(spark, sfDir))
    assert(!p.contains("Window") && !p.contains("Join"), "audit must be agg-only")
    val read = p.substring(p.indexOf("ReadSchema"))
    assert(read.contains("doc_id") && read.contains("text") &&
      !read.contains("lang"), s"scan must read only (doc_id, text):\n$read")
  }
}
