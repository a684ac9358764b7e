package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.toDF("doc_id", "text")

  test("langId picks the profile with the most function-word hits") {
    val df = docs(
      1L -> "the cat is in the house and a dog",
      2L -> "el perro y la casa que en un dia",
      3L -> "der hund und die katze ist ein tier",
      4L -> "le chien et les chats des le un",
      5L -> "xxxx yyyy zzzz")
    df.createOrReplaceTempView("planted_docs")
    val ws = TextAnalysis.words(lower(col("text")))
    // reuse the operator's scoring on the planted frame via the same exprs
    val scored = df.select(col("doc_id") +: TextAnalysis.profiles.map { case (l, p) =>
      size(filter(ws, w => array_contains(array(p.map(lit): _*), w))).as(s"score_$l")
    }: _*)
    val best = scored.collect().map { r =>
      val scores = TextAnalysis.profiles.map { case (l, _) => l -> r.getAs[Int](s"score_$l") }
      r.getAs[Long]("doc_id") -> (if (scores.forall(_._2 == 0)) "unknown" else scores.maxBy(_._2)._1)
    }.toMap
    assert(best(1L) === "en" && best(2L) === "es" && best(3L) === "de" && best(4L) === "fr")
    assert(best(5L) === "unknown")
  }

  test("fingerprint is order-sensitive and deterministic") {
    val out = TextAnalysis.fingerprint(spark, sfDir).collect()
    assert(out.length === Tables.documents(spark, sfDir).count())
    // same input twice → same fingerprint
    val again = TextAnalysis.fingerprint(spark, sfDir).collect()
    assert(out.map(_.getLong(1)).sameElements(again.map(_.getLong(1))))
    // order sensitivity on planted rows
    val ab = docs(1L -> "alpha beta", 2L -> "beta alpha")
    val M = lit(1000000007L)
    val fp = ab.select(aggregate(
      transform(TextAnalysis.words(col("text")), w => TextAnalysis.md5Long(w) % M),
      lit(0L), (acc, x) => (acc * 31L + x) % M).as("fp")).collect().map(_.getLong(0))
    assert(fp(0) !== fp(1))
  }

  test("cdc chunk fingerprints are shift-resistant: an edit shares most chunks") {
    val base = (1 to 200).map(i => s"word$i").mkString(" ")
    val edited = base.replace("word100", "CHANGED")
    val df = docs(1L -> base, 2L -> edited, 3L -> base)
    val out = TextAnalysis.cdcChunkFingerprints(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) === out(3L))            // deterministic
    assert(out(1L).length > 3)             // several chunks at mask 16
    val shared = out(1L).toSet.intersect(out(2L).toSet).size
    assert(shared >= out(1L).length - 2,   // only the edited chunk region differs
      s"shared $shared of ${out(1L).length}")
    assert(out(1L) !== out(2L))
  }

  test("native PolyFingerprint matches the interpreted HOF fold bit-for-bit") {
    val native = TextAnalysis.fingerprint(spark, sfDir).collect().map(_.getLong(1))
    val hof = TextAnalysis.fingerprintHof(Tables.documents(spark, sfDir))
      .collect().map(_.getLong(1))
    assert(native.sameElements(hof))
  }

  test("native CdcChunkHashes matches the interpreted struct fold bit-for-bit") {
    val d = Tables.documents(spark, sfDir)
    val native = TextAnalysis.cdcChunkFingerprints(d).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    val hof = TextAnalysis.cdcChunkFingerprintsHof(d).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    assert(native.length === hof.length)
    native.zip(hof).foreach { case (n, h) => assert(n === h) }
  }

  test("q52 exploded chunks align with the array form, contiguous idx from 0") {
    val d = Tables.documents(spark, sfDir)
    val arrays = TextAnalysis.cdcChunkFingerprints(d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val exploded = TextAnalysis.cdcChunksExploded(spark, sfDir).collect()
      .groupBy(_.getLong(0))
    exploded.foreach { case (docId, rows) =>
      val byIdx = rows.sortBy(_.getAs[Long]("chunk_idx"))
      assert(byIdx.map(_.getAs[Long]("chunk_idx")).toSeq === (0L until rows.length).toSeq)
      assert(byIdx.map(_.getAs[Long]("chunk_hash")).toSeq === arrays(docId))
    }
    assert(exploded.values.map(_.length).sum === arrays.values.map(_.length).sum)
  }

  test("tokenCount: regex tokens >= whitespace tokens on punctuated text") {
    val df = docs(1L -> "hello, world! it's 42")
    val n = df.select(
      size(TextAnalysis.words(col("text"))).as("ws"),
      size(regexp_extract_all(col("text"), lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("re"))
      .collect()(0)
    assert(n.getAs[Int]("ws") === 4)
    assert(n.getAs[Int]("re") === 8) // hello , world ! it ' s 42
  }

  test("quality score stays in [0,1] on real docs") {
    val q = TextAnalysis.qualityScore(spark, sfDir).collect().map(_.getAs[Double]("quality"))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("preprocess truncates to 150 chars and casefolds") {
    val out = TextAnalysis.preprocess(spark, sfDir).collect()
    assert(out.forall(_.getString(1).length <= 150))
    assert(out.forall(r => r.getString(1) === r.getString(1).toLowerCase))
  }

  test("lowerX folds the two cross-engine case-mapping traps (İ, final sigma)") {
    import spark.implicits._
    val out = Seq("İstanbul", "ΛΟΓΟΣ", "weiß ẞ", "Plain ASCII")
      .toDF("t").select(TextAnalysis.lowerX(org.apache.spark.sql.functions.col("t")))
      .collect().map(_.getString(0))
    // plain 'i' (no combining dot U+0307 — Java's full mapping would add it)
    assert(out(0) === "istanbul")
    // simple sigma everywhere (Java's contextual rule would emit final ς)
    assert(out(1) === "λογοσ")
    assert(out(2) === "weiß ß")
    assert(out(3) === "plain ascii")
  }

  test("q102: NFC canonicalization merges combining-mark/case/whitespace variants") {
    import spark.implicits._
    val combining = "Cafe\u0301  AU   lait " // e + U+0301, case + ws runs
    val df = Seq(
      (1L, "Caf\u00e9 au lait"), // precomposed
      (2L, " " + combining),
      (3L, "something else")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.exactCanonical(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("canonical_id"), r.getAs[Long]("cluster_size"))).toMap
    assert(out(1L) === ((1L, 2L)), "representation variants must share a cluster")
    assert(out(2L) === ((1L, 2L)))
    assert(out(3L)._2 === 1L)
    // the SQL-registered native kernel agrees, and NFC input passes through
    val nfc = spark.sql("SELECT nfc_normalize('Cafe\u0301'), " +
      "nfc_normalize('plain ascii')").collect()(0)
    assert(nfc.getString(0) === "Caf\u00e9")
    assert(nfc.getString(1) === "plain ascii")
  }

  test("q102: U+000B vertical tab collapses like every other ASCII whitespace " +
      "(the \\s engine-vs-oracle divergence, round-6 task #6)") {
    import spark.implicits._
    // the two unicode_ws rows UnicodeInject plants: identical up to
    // whitespace runs (incl. VT) \u2014 must land in ONE cluster, and their
    // canonical form must be the single-space collapse both engines agree on
    val ws = graft.tools.UnicodeInject.Samples.filter(_._3 == "unicode_ws")
    assert(ws.size === 2, "UnicodeInject must carry the two ws-variant rows")
    val df = ws.zipWithIndex.map { case ((t, _, _), i) => ((i + 1).toLong, t) }
      .toDF("doc_id", "text")
    val canon = df.select(graft.operators.Dedup.canonicalText(col("text")))
      .collect().map(_.getString(0))
    assert(canon(0) === "mixed whitespace run collapse test")
    assert(canon(1) === canon(0), "ws-variant rows canonicalized differently")
    val out = graft.operators.Dedup.exactCanonical(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_size")).toMap
    assert(out === Map(1L -> 2L, 2L -> 2L))
    // U+00A0 (NBSP) is deliberately NOT in the collapse class: layout-
    // significant in scraped text, and outside the explicit ASCII set
    val nbsp = Seq((1L, "a\u00a0b"), (2L, "a b")).toDF("doc_id", "text")
    assert(graft.operators.Dedup.exactCanonical(nbsp).collect()
      .map(_.getAs[Long]("cluster_size")).forall(_ == 1L))
  }

  test("q165 entropy: closed-form values on planted distributions") {
    import spark.implicits._
    def h(counts: Seq[Long]): Double = {
      // replay the operator's quantized chain exactly
      val n = counts.sum
      val s = counts.map(c => c.toDouble * math.round(math.log(c.toDouble) * 1e6)).sum
      val v = (math.round(math.log(n.toDouble) * 1e6).toDouble * n - s) / (n * 1e6)
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val docs = Seq(
      (1L, "aaaa"),      // one symbol: H = 0
      (2L, "ab"),        // uniform 2: H = ln 2
      (3L, "abcd"),      // uniform 4: H = ln 4
      (4L, "aab")        // 2/3,1/3 mix
    ).toDF("doc_id", "text")
    val out = graft.operators.CharEntropy.charEntropy(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_cp"), r.getAs[Long]("n_distinct"),
          r.getAs[Double]("entropy_r"))).toMap
    assert(out(1L) === ((4L, 1L, 0.0)))
    assert(out(2L) === ((2L, 2L, h(Seq(1L, 1L)))))
    assert(out(3L) === ((4L, 4L, h(Seq(1L, 1L, 1L, 1L)))))
    assert(out(4L) === ((3L, 2L, h(Seq(2L, 1L)))))
    assert(math.abs(out(2L)._3 - math.log(2)) < 1e-5)
    assert(math.abs(out(3L)._3 - math.log(4)) < 1e-5)
  }

  test("q165 entropy: code points, not bytes; corpus values bounded") {
    import spark.implicits._
    val docs = Seq((1L, "\u00e9\u00e9\u00e9"), (2L, "h\u00e9\u00e9")).toDF("doc_id", "text")
    val out = graft.operators.CharEntropy.charEntropy(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_cp"), r.getAs[Double]("entropy_r"))).toMap
    assert(out(1L) === ((3L, 0.0))) // 3 code points, one symbol
    assert(out(2L)._1 === 3L)
    val corpus = graft.operators.CharEntropy.charEntropy(spark, sfDir).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      val hMax = math.log(r.getAs[Long]("n_distinct").toDouble)
      val h = r.getAs[Double]("entropy_r")
      assert(h >= -1e-6 && h <= hMax + 1e-6,
        s"doc ${r.getAs[Long]("doc_id")}: H=$h outside [0, ln distinct=$hMax]")
    }
  }

  test("q186: confusion cells, abstention, and NULL-label bucket by hand") {
    import spark.implicits._
    val d = Seq(
      (1L, "the of and", "en"),            // correct diagonal
      (2L, "el la de", "en"),              // en labeled, es predicted
      (3L, "zz zz", null.asInstanceOf[String]), // unknown pred, '' label
      (4L, "the of and", "en")             // second correct en
    ).toDF("doc_id", "text", "lang")
    val out = graft.operators.TextAnalysis.langidConfusion(d).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("pred_lang")) ->
        (r.getAs[Long]("cnt"), r.getAs[Long]("label_total"),
          r.getAs[Double]("share_r"))).toMap
    assert(out(("en", "en")) === ((2L, 3L, 0.666667)))
    assert(out(("en", "es")) === ((1L, 3L, 0.333333)))
    assert(out(("", "unknown")) === ((1L, 1L, 1.0)))
    assert(out.size === 3)
  }

  test("q186 on the corpus: shares sum to 1 per label, totals cover the corpus") {
    val out = graft.operators.TextAnalysis.langidConfusion(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byLabel = out.groupBy(_.getAs[String]("lang"))
    byLabel.foreach { case (l, rs) =>
      assert(rs.map(_.getAs[Long]("cnt")).sum === rs.head.getAs[Long]("label_total"), l)
      assert(math.abs(rs.map(_.getAs[Double]("share_r")).sum - 1.0) < 1e-4, l)
    }
    assert(out.map(_.getAs[Long]("cnt")).sum ===
      Tables.documents(spark, sfDir).count())
  }
}
