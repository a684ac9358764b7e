package graft

import org.apache.spark.sql.functions._
import graft.operators.{ApproxDedup, Similarity}

class ApproxDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("q23 finds the planted near-dup pairs with high Jaccard") {
    val out = ApproxDedup.ngramJaccard(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("jaccard") >= ApproxDedup.Tau))
    assert(out.forall(r => r.getAs[Long]("a_id") < r.getAs[Long]("b_id")))
  }

  test("native WordShingles matches the interpreted HOF shingling exactly") {
    val native = ApproxDedup.shingleSets(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val hof = ApproxDedup.shingleSetsHof(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(native === hof)
    assert(native.values.exists(_.nonEmpty))
  }

  test("prefix-filtered q23 equals the naive blocked join exactly") {
    val fast = ApproxDedup.ngramJaccard(spark, sfDir).collect().map(_.toString).toSeq
    val naive = ApproxDedup.ngramJaccardNaive(spark, sfDir).collect().map(_.toString).toSeq
    assert(fast === naive)
  }

  test("df-cap keeps every planted tau=0.8 pair while dropping hot shingles") {
    // cap=5 is below the max df in the corpus, so some shingles ARE
    // dropped from candidate generation — the τ≥0.8 pair set must survive
    val uncapped = ApproxDedup.ngramJaccard(Tables.documents(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val capped = ApproxDedup.ngramJaccard(Tables.documents(spark, sfDir), dfCap = 5L)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(uncapped.nonEmpty)
    assert(capped === uncapped)
  }

  test("df-cap excludes a synthetic viral shingle from the candidate join") {
    // 60 identical boilerplate docs (every shingle df=60 > cap) plus a
    // planted near-dup pair built from rare words: 32 words, last changed
    // → 30 shingles sharing 27 → J = 27/33 ≈ 0.818 ≥ τ
    val boiler = (1 to 60).map(i => (i.toLong, "click here to subscribe now"))
    val base = (1 to 31).map(i => s"r$i").mkString(" ")
    val docs = (boiler :+ (1000L, s"$base endA") :+ (1001L, s"$base endB"))
      .toDF("doc_id", "text")
    val out = ApproxDedup.ngramJaccard(docs, dfCap = 30L).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    // planted pair survives on its rare shingles
    assert(out === Set((1000L, 1001L)))
    // without the cap the boilerplate clique explodes into 60·59/2 J=1 pairs
    val uncapped = ApproxDedup.ngramJaccard(docs, dfCap = Long.MaxValue).collect()
    assert(uncapped.length === 60 * 59 / 2 + 1)
  }

  test("q24 MinHash+LSH recovers exactly the exact-Jaccard pairs (full recall here)") {
    val exact = ApproxDedup.ngramJaccard(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val lsh = ApproxDedup.minhashLsh(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(lsh === exact)
  }

  test("minhash signature: identical shingle sets → identical signatures") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val sh = df.select(col("doc_id"), filter(split(col("text"), " "), w => w =!= "").as("ws"))
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(0), size(col("ws")) - 3),
        i => concat_ws(" ", element_at(col("ws"), i + 1),
          element_at(col("ws"), i + 2), element_at(col("ws"), i + 3)))).as("shingles"))
    val sigs = sh.select(col("doc_id"), ApproxDedup.signature(col("shingles")).as("sig"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
    assert(sigs(1L).length === ApproxDedup.NumPerms)
  }

  test("native minhash signature matches the interpreted HOF fold exactly") {
    val sh = ApproxDedup.shingleSets(spark, sfDir)
      .filter(size(col("shingles")) > 0).limit(50)
    val both = sh.select(
        ApproxDedup.signature(col("shingles")).as("native"),
        ApproxDedup.signatureHof(col("shingles")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("q25 simhash: near-dup docs land within Hamming 3") {
    val out = ApproxDedup.simhash(spark, sfDir).collect()
    assert(out.length === Tables.documents(spark, sfDir).count())
    // the corpus has planted near-dups (q23 found pairs), simhash should
    // see at least one of them within the Hamming band
    assert(out.map(_.getAs[Long]("n_hamming_le3")).sum > 0)
  }

  test("native SimHash64 matches the interpreted nested HOF fold bit-for-bit") {
    val d = Tables.documents(spark, sfDir)
    val native = ApproxDedup.simhash(d).select("doc_id", "simhash").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val hof = ApproxDedup.simhashHof(d).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(native.sameElements(hof))
  }

  test("q28 LSH top-k: results are a subset of same-bucket candidates and " +
    "rank-1 hits overlap exact search") {
    val exact = Similarity.bruteForceTopK(spark, sfDir).collect()
      .filter(_.getAs[Int]("rank") === 1)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val lsh = Similarity.lshTopK(spark, sfDir).collect()
    // every query produced some candidates at this corpus size
    assert(lsh.map(_.getAs[Long]("query_id")).distinct.length === 10)
    // recall of the true nearest neighbor is only guaranteed when it
    // shares the query's bucket; require it to happen for >= 1 query
    val hits = lsh.filter(r => exact.get(r.getAs[Long]("query_id"))
      .contains(r.getAs[Long]("neighbor_id")))
    assert(hits.nonEmpty)
  }

  test("q71 incremental: corpus match inherits canonical, batch-only dups self-mint") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliett " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
    val docs = Seq(
      (1L, base),                              // corpus
      (2L, "completely different text here entirely unrelated words flowing onward"),
      (10L, base + " extra"),                  // batch: near-dup of corpus doc 1
      (11L, base + " extra"),                  // batch: near-dup of 10 AND of corpus 1
      (12L, "unique batch document with its own strange vocabulary nothing shared at all " +
        "spanning enough words to actually shingle properly today")
    ).toDF("doc_id", "text")
    val out = ApproxDedup.dedupIncrementalText(docs, corpusMax = 10L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.keySet === Set(10L, 11L, 12L)) // corpus docs are not re-emitted
    assert(out(10L) === ((1L, true)))  // inherits the validated canonical
    assert(out(11L) === ((1L, true)))  // via the corpus, NOT via batch doc 10
    assert(out(12L) === ((12L, false))) // no corpus match -> mints itself
  }

  test("q163 fuzzy: blocked edit-distance match with deterministic argmin") {
    val part = Seq(
      (1L, "red ring", "A"),
      (2L, "red king", "A"),   // d=1 from 1
      (3L, "red rink", "A"),   // d=1 from 1, d=2 from 2
      (4L, "blue gear", "A"),  // d>2 from everything in A
      (5L, "red ring", "B"),   // other block: never matches A
      (6L, "réd ring", "A") // non-ASCII: excluded (byte vs codepoint metrics)
    ).toDF("p_partkey", "p_name", "p_brand")
    val out = ApproxDedup.fuzzyMatch(part).collect()
      .map(r => r.getAs[Long]("p_partkey") ->
        (r.getAs[Long]("n_fuzzy"), r.getAs[Long]("min_dist"),
          r.getAs[Long]("best_match_key"))).toMap
    assert(out.keySet === Set(1L, 2L, 3L)) // 4 unmatched, 5 alone in B, 6 dropped
    assert(out(1L) === ((2L, 1L, 2L))) // ties on dist=1 -> smallest key (2)
    assert(out(2L) === ((2L, 1L, 1L)))
    assert(out(3L) === ((2L, 1L, 1L)))
  }

  test("q163 fuzzy: corpus pairs are symmetric and within threshold") {
    val out = ApproxDedup.fuzzyMatch(spark, sfDir).collect()
    assert(out.nonEmpty)
    val keys = out.map(_.getAs[Long]("p_partkey")).toSet
    out.foreach { r =>
      assert(r.getAs[Long]("min_dist") <= ApproxDedup.FuzzyMaxDist)
      assert(r.getAs[Long]("n_fuzzy") >= 1L)
      // fuzzy-match is symmetric: my best match must itself be matched
      assert(keys.contains(r.getAs[Long]("best_match_key")))
    }
  }

  test("q187: identical docs calibrate exactly — est = exact = 1, zero error") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),  // exact dup of 1
      (3L, "totally different words here now") // no shared shingles
    ).toDF("doc_id", "text")
    val out = ApproxDedup.minhashCalibration(d).collect()
    assert(out.length === 1, "only the dup pair is a band candidate")
    val r = out.head
    assert(r.getAs[Long]("j_bucket") === 10L)
    assert(r.getAs[Long]("n_pairs") === 1L)
    assert(r.getAs[Long]("sum_est") === 1000000L)
    assert(r.getAs[Long]("sum_exact") === 1000000L)
    assert(r.getAs[Long]("sum_err") === 0L)
    assert(r.getAs[Long]("max_abs_err") === 0L)
  }

  test("q187: a planted mid-J pair lands in its exact-J bucket with bounded error") {
    import spark.implicits._
    // A = {abc,bcd,cde}, B = {abc,bcd,cdz}: common 2, union 4 — exact
    // J = 0.5 ⇒ ex_micro = 500000, bucket 5. The pair must surface as a
    // BAND candidate (≥1 of the 32 four-row bands colliding — the
    // round-10 ADVICE scenario exercised only at J = 1.0 before) and
    // its 128-perm estimate must sit within 3σ = 0.133 of the truth.
    val d = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d z"),
      (3L, "totally different words here now"))
      .toDF("doc_id", "text")
    val out = ApproxDedup.minhashCalibration(d).collect()
    assert(out.length === 1, "the mid-J pair must be a band candidate")
    val r = out.head
    assert(r.getAs[Long]("j_bucket") === 5L)
    assert(r.getAs[Long]("n_pairs") === 1L)
    assert(r.getAs[Long]("sum_exact") === 500000L)
    assert(r.getAs[Long]("max_abs_err") <= 133000L,
      s"estimate off truth by ${r.getAs[Long]("max_abs_err")} > 3σ")
    assert(r.getAs[Long]("sum_est") === 500000L + r.getAs[Long]("sum_err"))
  }

  test("q187 on the corpus: the 128-perm estimator is tightly calibrated") {
    val out = ApproxDedup.minhashCalibration(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val b = r.getAs[Long]("j_bucket")
      assert(b >= 0L && b <= 10L)
      assert(r.getAs[Long]("n_pairs") >= 1L)
      assert(r.getAs[Long]("max_abs_err") <= 1000000L)
      // σ(Ĵ) = √(J(1−J)/128) ≤ 0.045; a biased bucket would blow this
      assert(r.getAs[Double]("mean_abs_err_r") < 0.1,
        s"bucket $b mean error ${r.getAs[Double]("mean_abs_err_r")}")
    }
  }

  test("q202: identical sources agree on every permutation; disjoint sources share nothing") {
    val docs = Seq(
      (1L, "a b c d", "s1"), (2L, "a b c d", "s2"),   // identical shingle sets
      (3L, "x y z w v", "s3"),                          // disjoint from both
      (4L, "a b", "s3"),                                // shingle-less: no effect
      (5L, "q r s t", null.asInstanceOf[String]))       // NULL source: excluded
      .toDF("doc_id", "text", "source")
    val out = ApproxDedup.sourceSimilarity(docs).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) -> r).toMap
    assert(out.keySet === Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
    val dup = out(("s1", "s2"))
    assert(dup.getAs[Long]("common") == 2L && dup.getAs[Long]("uni") == 2L)
    assert(dup.getAs[Long]("n_agree") == ApproxDedup.SrcPerms.toLong)
    assert(dup.getAs[Long]("est_j_micro") == 1000000L &&
      dup.getAs[Long]("exact_j_micro") == 1000000L)
    for (p <- Seq(("s1", "s3"), ("s2", "s3"))) {
      assert(out(p).getAs[Long]("common") == 0L)
      assert(out(p).getAs[Long]("exact_j_micro") == 0L)
      assert(out(p).getAs[Long]("est_j_micro") < 1000000L)
    }
  }

  test("q202: source signature is the signature of the UNION of its docs' shingles") {
    // s1 split across two docs vs s2 holding the union in one doc:
    // the source-level sketches (and exact sets) must coincide.
    val docs = Seq(
      (1L, "a b c d", "s1"), (2L, "m n o p", "s1"),
      (3L, "a b c d", "s2"), (4L, "m n o p", "s2"))
      .toDF("doc_id", "text", "source")
    val out = ApproxDedup.sourceSimilarity(docs).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Long]("n_agree") == ApproxDedup.SrcPerms.toLong)
    assert(r.getAs[Long]("exact_j_micro") == 1000000L)
  }
}
