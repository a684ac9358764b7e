package graft

import graft.operators.BpeTrain

class BpeTrainSpec extends SparkTestBase {
  import spark.implicits._

  test("q110: merge order follows pair frequency; merged symbols chain") {
    // "ab" dominates (weight via repetition), then the merged "ab"+"c"
    // 'a'=61 'b'=62 'c'=63
    val docs = Seq(
      (1L, "abc abc abc abc"),
      (2L, "abc abc ab ab"),
      (3L, "zq zq")
    ).toDF("doc_id", "text")
    val out = BpeTrain.bpeMerges(spark, docs).collect()
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[String]("merged"), r.getAs[Long]("pair_count")))
    // round 1: (61,62) i.e. a+b, count = 6 abc + 2 ab... every word
    // contributes pair-per-occurrence × word count
    assert(out.head === ((1L, "61", "62", "6162", 8L)), s"got ${out.head}")
    // round 2: merged ab pairs with c — (6162, 63) count 6
    assert(out(1) === ((2L, "6162", "63", "616263", 6L)), s"got ${out(1)}")
    // ranks are dense from 1 and counts non-increasing per BPE greedy
    assert(out.map(_._1).toSeq === (1L to out.length))
    assert(out.map(_._5).toSeq.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("q110: runs of an identical pair merge textbook-greedy (aaaa -> aa aa)") {
    // one word "aaaa" × 3: round-1 pair (61,61) counts 3 words × 3
    // adjacent pairs = 9; the merge must produce TWO "6161" symbols per
    // word (left-to-right non-overlap), so round 2 sees pair
    // (6161,6161) with count 3 — the single-pass-with-shared-boundary
    // bug would leave "6161 61 61" and round 2 would see (6161,61)
    val docs = Seq((1L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val out = BpeTrain.bpeMerges(spark, docs).collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"), r.getAs[Long]("pair_count")))
    assert(out(0) === (("61", "61", 9L)))
    assert(out(1) === (("6161", "6161", 3L)), s"run merge not textbook: ${out(1)}")
  }

  test("q110: multibyte text merges over UTF-8 bytes (no surrogate splits)") {
    // 'é' = C3 A9: the dominant pair is the multibyte char's own bytes
    val docs = Seq((1L, "ééé ééé ééé")).toDF("doc_id", "text")
    val out = BpeTrain.bpeMerges(spark, docs).collect()
    assert(out.head.getAs[String]("lhs") === "C3")
    assert(out.head.getAs[String]("rhs") === "A9")
    assert(out.head.getAs[Long]("pair_count") === 9L)
  }

  test("q113: encode tokenizes with the trained merges, word-exact") {
    // corpus from the first test: merges are (a,b) then (ab,c), so
    // "abc" encodes to ONE token, "ab" to one, "zq" to two bytes
    val docs = Seq(
      (1L, "abc abc abc abc"),
      (2L, "abc abc ab ab"),
      (3L, "zq zq")
    ).toDF("doc_id", "text")
    val out = BpeTrain.bpeEncode(spark, docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_bytes"))).toMap
    // merges run dry at round 3: (a,b) c=8, (ab,c) c=6, then (z,q)
    // c=2 meets MinPairCount — every vocab word ends fully merged
    assert(out(1L) === ((4L, 4L, 12L)), s"doc1 ${out(1L)}")
    assert(out(2L) === ((4L, 4L, 10L)), s"doc2 ${out(2L)}")
    assert(out(3L) === ((2L, 2L, 4L)), s"doc3 ${out(3L)}")
  }

  test("q113: token counts never exceed byte counts and cover every word") {
    val out = BpeTrain.bpeEncode(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("n_tokens") <= r.getAs[Long]("n_bytes")))
    assert(out.forall(r => r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_words")))
  }

  test("train-loop plan depth is bounded by the checkpoint interval, not the merge count") {
    // 20 distinct bytes repeated: every round has a count-3 pair, so the
    // greedy chain runs as long as we ask — plan depth must NOT follow
    val word = ('a' to 't').mkString
    val docs = Seq((1L, s"$word $word $word")).toDF("doc_id", "text")
    def hofs(df: org.apache.spark.sql.DataFrame): Int =
      "aggregate\\(".r.findAllIn(df.queryExecution.analyzed.toString).length
    val (found14, h14, v14) = BpeTrain.trainCore(docs, merges = 14)
    assert(found14.size === 14, s"expected 14 live merges, got ${found14.size}")
    assert(hofs(v14) <= BpeTrain.CheckpointEvery,
      s"plan carries ${hofs(v14)} stacked merge HOFs after 14 rounds")
    val (_, h6, v6) = BpeTrain.trainCore(docs, merges = 6)
    // same residual depth at any round count ≡ (mod interval): the loop
    // is lineage-flat, a 32k-merge run analyzes as fast as a 6-merge one
    assert(hofs(v14) === hofs(v6))
    h14.unpersist(); h6.unpersist()
  }

  test("persisted tokenizer path equals inline training, merge for merge") {
    // the gated (s, dir) entries serve the ArtifactStore tokenizer; the
    // values must equal training in place — run twice so the second
    // call provably serves the existing artifact
    val docs = Tables.documents(spark, sfDir)
    val inline = BpeTrain.bpeMerges(spark, docs).collect().map(_.toSeq).toSeq
    assert(BpeTrain.bpeMerges(spark, sfDir).collect().map(_.toSeq).toSeq === inline)
    assert(BpeTrain.bpeMerges(spark, sfDir).collect().map(_.toSeq).toSeq === inline)
    val inlineEnc = BpeTrain.bpeEncode(spark, docs).collect().map(_.toSeq).toSeq
    assert(BpeTrain.bpeEncode(spark, sfDir).collect().map(_.toSeq).toSeq === inlineEnc)
  }

  test("q110: empty and all-null corpora yield zero merges, not a crash") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(BpeTrain.bpeMerges(spark, empty).count() === 0L)
    val nulls = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(BpeTrain.bpeMerges(spark, nulls).count() === 0L)
  }

  test("q177: fertility arithmetic per lang; wordless lang keeps its doc bucket at 0") {
    // vocab: "ab" -> 1 token, "cd" -> 2 tokens
    val vocab = Seq(
      ("ab", "6162", 3L), ("cd", "63 64", 1L)).toDF("w", "seq", "cnt")
    val docs = Seq(
      (1L, "ab ab cd", "en"),
      (2L, "cd", "en"),
      (3L, null.asInstanceOf[String], "de")).toDF("doc_id", "text", "lang")
    val out = BpeTrain.fertilityWith(docs, vocab).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val en = out("en")
    assert(en.getAs[Long]("n_docs") === 2L)
    assert(en.getAs[Long]("n_words") === 4L)    // ab ab cd | cd
    assert(en.getAs[Long]("n_tokens") === 6L)   // 1+1+2 | 2
    assert(en.getAs[Long]("n_bytes") === 8L)
    assert(en.getAs[Double]("fertility") === 1.5)
    assert(en.getAs[Double]("bytes_per_token") === 1.333333) // round(8/6, 6)
    val de = out("de")
    assert(de.getAs[Long]("n_docs") === 1L)
    assert(de.getAs[Long]("n_words") === 0L)
    assert(de.isNullAt(de.fieldIndex("fertility")))
  }

  test("q177 on the corpus: every lang bucket tokenizes its whole word stream") {
    val out = BpeTrain.fertility(spark, sfDir).collect()
    assert(out.length >= 5)
    val docs = Tables.documents(spark, sfDir)
    val total = out.map(_.getAs[Long]("n_docs")).sum
    assert(total === docs.count())
    out.filter(_.getAs[Long]("n_docs") > 0).foreach { r =>
      if (r.getAs[Long]("n_words") > 0) {
        // every word is in the corpus-trained vocab -> >= 1 token each
        assert(r.getAs[Double]("fertility") >= 1.0, s"lang ${r.getAs[String]("lang")}")
        assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_words"))
      }
    }
  }
}
