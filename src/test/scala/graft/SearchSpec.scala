package graft

import graft.operators.Search

class SearchSpec extends SparkTestBase {
  import spark.implicits._

  test("q60 bm25: ranking follows tf saturation and doc-length normalization") {
    val d = Seq(
      // two hits of one term, short doc -> best
      (1L, "spark spark runs fast"),
      // one hit each of two terms beats two of one (idf-weighted sum)
      (2L, "spark join runs fast"),
      (3L, "spark runs fast here"),
      // same tf as 3 but longer doc -> length-normalized below 3
      (4L, "spark runs very very very very very very fast today"),
      (5L, "nothing relevant at all")
    ).toDF("doc_id", "text")
    val out = Search.bm25(d).collect()
    val ids = out.map(_.getAs[Long]("doc_id"))
    assert(!ids.contains(5L)) // zero-score docs never rank
    val score = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score_r")).toMap
    assert(score(2L) > score(3L)) // two distinct terms beat one
    assert(score(3L) > score(4L)) // shorter doc wins at equal tf
    assert(score(1L) > score(3L)) // higher tf wins at equal length
  }

  test("q109 postings lookup: conjunctive semantics on planted docs, " +
      "served from the persisted index") {
    import graft.operators.PostingsIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_postings").toString
    Seq(
      (1L, "spark join window extra words", "en", "s", 5L),
      (2L, "spark spark join window", "en", "s", 4L),   // tf sum 4 → ranks first
      (3L, "spark join only two terms", "en", "s", 5L), // conjunction fails
      (4L, null.asInstanceOf[String], "en", "s", 0L)    // null text: no postings
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = PostingsIndex.lookup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score"))
    assert(out.toSeq === Seq(2L -> 4L, 1L -> 3L),
      s"conjunctive top-k wrong: ${out.mkString(",")}")
    // build-once: a second lookup serves the SAME artifact path
    val p1 = PostingsIndex.ensureIndex(spark, dir)
    val p2 = PostingsIndex.ensureIndex(spark, dir)
    assert(p1 === p2)
  }

  test("q60 on the corpus: exactly TopN rows, scores positive and descending") {
    val out = Search.bm25(spark, sfDir).collect()
    assert(out.length === Search.TopN)
    val scores = out.map(_.getAs[Double]("score_r"))
    assert(scores.forall(_ > 0.0))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b })
  }

  test("q69 tf-idf: a distinctive rare term outranks ubiquitous filler") {
    val d = Seq(
      (1L, "filler filler filler zebra"),
      (2L, "filler filler filler"),
      (3L, "filler filler filler"),
      (4L, "filler filler filler")
    ).toDF("doc_id", "text")
    val out = Search.tfidfTopTerms(d).collect()
    val doc1 = out.filter(_.getLong(0) == 1L).sortBy(_.getAs[Long]("rank"))
    // zebra: df=1, idf high; filler: df=4, idf = ln(5/5) = 0
    assert(doc1.head.getAs[String]("term") === "zebra")
    assert(doc1.head.getAs[Long]("score") > 0L)
    out.foreach { r =>
      if (r.getAs[String]("term") == "filler")
        assert(r.getAs[Long]("score") === 0L) // df == N -> idf exactly 0
    }
  }

  test("q69 on the corpus: ranks dense per doc, scores non-increasing") {
    val out = Search.tfidfTopTerms(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq === (1L to rs.length).toSeq, s"doc $id")
      val sc = sorted.map(_.getAs[Long]("score"))
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b }, s"doc $id")
    }
  }

  test("q118: the three backoff tiers order fluent > unseen-bigram > OOV") {
    import spark.implicits._
    // reference half (even ids) sees "the cat" / "cat sat" twice each;
    // doc 1 repeats an attested sentence (every bigram c12/c1 = 1 ->
    // logp 0), doc 3 uses attested WORDS in an unseen order (backoff to
    // 0.4*c2/N), doc 5 is pure OOV (the 0.4*0.4/N floor)
    val docs = Seq(
      (0L, "the cat sat"), (2L, "the cat sat"),
      (1L, "the cat sat"),
      (3L, "cat the cat"),
      (5L, "zz qq")
    ).toDF("doc_id", "text")
    val out = graft.operators.Search.bigramLmScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("avg_logp_micro")).toMap
    assert(out(1L) === 0L, s"attested-bigram doc must score ln(1)=0, got ${out(1L)}")
    assert(out(1L) > out(3L), s"fluent ${out(1L)} !> reordered ${out(3L)}")
    assert(out(3L) > out(5L), s"backoff ${out(3L)} !> OOV floor ${out(5L)}")
  }

  test("q184: OLS fit matches a BigInt model; single-word lang yields NULL fit") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a b b c", "xx"),  // freqs 4,2,1 at ranks 1,2,3
      (2L, "solo solo", "yy")       // one distinct word → n_ranks=1 → NULL
    ).toDF("doc_id", "text", "lang")
    val out = graft.operators.Search.zipfFit(docs).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    // the engine's exact integer chain, replayed with BigInt
    val fs = Seq(4L, 2L, 1L)
    val xs = fs.indices.map(i => BigInt(math.round(math.log(i + 1.0) * 1e6)))
    val ys = fs.map(f => BigInt(math.round(math.log(f.toDouble) * 1e6)))
    val n = BigInt(3)
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    val inum = sy * sxx - sx * sxy
    val slope = out("xx").getAs[Double]("slope_r")
    val icept = out("xx").getAs[Double]("intercept_r")
    assert(math.abs(slope - num.toDouble / den.toDouble) < 1e-6)
    assert(math.abs(icept - inum.toDouble / den.toDouble / 1e6) < 1e-6)
    assert(slope < 0.0, "rank-frequency must fall")
    assert(out("xx").getAs[Long]("n_ranks") === 3L)
    assert(out("yy").getAs[Long]("n_ranks") === 1L)
    assert(out("yy").isNullAt(out("yy").fieldIndex("slope_r")))
    assert(out("yy").isNullAt(out("yy").fieldIndex("intercept_r")))
  }

  test("q197 indexed BM25 == q60 scan-scoring, with pruning engaged " +
      "(planted corpus: stopword-hot list, rarest df past TopN)") {
    import spark.implicits._
    import graft.operators.{PostingsIndex, Search}
    // 1200 docs, every one contains the hot term "join"; "spark" in 60
    // (> TopN=20, so the seed threshold engages and the hot list is
    // prunable); "window" in 25; lengths vary so dl matters
    val docs = (1L to 1200L).map { i =>
      val sb = new StringBuilder("join")
      if (i % 20 == 0) sb.append(" spark spark")
      if (i % 48 == 0) sb.append(" window")
      sb.append(" filler" * (i % 7).toInt)
      (i, sb.toString, "en", "s", sb.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_wand").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val expect = Search.bm25(docs).collect().map(_.toString).toSeq
    val got = PostingsIndex.bm25TopK(spark, dir).collect().map(_.toString).toSeq
    assert(got === expect, "indexed top-k diverged from scan-scoring")
  }

  test("q197 on the corpus equals q60 row for row (no pruning needed " +
      "at this SF — the fallback path)") {
    import graft.operators.{PostingsIndex, Search}
    val expect = Search.bm25(spark, sfDir).collect().map(_.toString).toSeq
    val got = PostingsIndex.bm25TopK(spark, sfDir).collect().map(_.toString).toSeq
    assert(got === expect)
  }

  test("q197 empty and absent-term edges return empty with q60's schema") {
    import spark.implicits._
    import graft.operators.PostingsIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_wand_empty").toString
    Seq((1L, "nothing matches here", "en", "s", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = PostingsIndex.bm25TopK(spark, dir)
    assert(out.columns.toSeq ===
      Seq("doc_id", "dl") ++ PostingsIndex.Terms.map(t => s"tf_$t") :+ "score_r")
    assert(out.collect().isEmpty)
  }

  test("q184 on the corpus: every lang fits a falling line near Zipf") {
    val out = graft.operators.Search.zipfFit(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_ranks") >= 1L &&
        r.getAs[Long]("n_ranks") <= graft.operators.Search.ZipfRanks)
      if (!r.isNullAt(r.fieldIndex("slope_r")))
        assert(r.getAs[Double]("slope_r") < 0.0,
          s"lang ${r.getAs[String]("lang")} slope must be negative")
    }
  }
}
