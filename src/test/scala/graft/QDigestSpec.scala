package graft

import graft.operators.QDigest

/** q203 q-digest: sketch mass conservation, size bound, the rank-error
  * guarantee on skewed fixtures, exactness when n < K, and the
  * mergeable-state property (per-split leaf profiles sum to the
  * whole-corpus sketch). */
class QDigestSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(values: Seq[Double]) =
    values.map(v => (Option(v), "e")).toDF("value", "event_type")

  test("sketch conserves mass and keeps at most K+1 heavy nodes") {
    val values = (1 to 5000).map(i => (i % 997).toDouble)
    val sk = QDigest.sketch(ev(values)).collect()
    assert(sk.map(_.getAs[Long]("cnt")).sum == 5000L)
    // every kept non-root node holds > t, so ≤ K of them exist
    assert(sk.length <= QDigest.QdK.toInt + 1)
    assert(sk.forall(r => r.getAs[Long]("level") >= 0L &&
      r.getAs[Long]("level") <= QDigest.QdLevels.toLong))
  }

  test("quantile audit: rank error within the 2·t·levels bound on a skewed corpus") {
    // zipf-ish: heavy mass at tiny values, long tail
    val values = (1 to 20000).map { i =>
      if (i % 2 == 0) 1.0 else if (i % 3 == 0) 2.5 else (i % 600).toDouble
    }
    val out = QDigest.qdigest(ev(values)).collect()
    assert(out.map(_.getAs[Long]("phi")).toSeq === Seq(25L, 50L, 75L, 90L, 99L))
    out.foreach { r =>
      assert(r.getAs[Long]("n") == 20000L)
      assert(r.getAs[Long]("rank_err") <= r.getAs[Long]("err_bound"),
        s"phi ${r.getAs[Long]("phi")}: err ${r.getAs[Long]("rank_err")} > bound")
      // the sketch answer can only sit at or above the exact quantile
      assert(r.getAs[Long]("est_x") >= r.getAs[Long]("exact_x"))
    }
  }

  test("small corpora (n < K) compress nothing: sketch is exact, error 0") {
    val values = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0)
    val out = QDigest.qdigest(ev(values)).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("t") == 0L && r.getAs[Long]("err_bound") == 0L)
      assert(r.getAs[Long]("rank_err") == 0L)
      assert(r.getAs[Long]("est_x") == r.getAs[Long]("exact_x"))
    }
    // ϕ=50 of 10 values 1..10 -> target rank 5 -> 5000 milli
    val p50 = out.find(_.getAs[Long]("phi") == 50L).get
    assert(p50.getAs[Long]("est_x") == 5000L)
  }

  test("mergeable state: leaf profiles of two halves sum to the whole-corpus sketch") {
    val a = (1 to 3000).map(i => (i % 311).toDouble)
    val b = (1 to 3000).map(i => (i % 577).toDouble)
    val whole = QDigest.sketch(ev(a ++ b)).collect()
      .map(r => (r.getAs[Long]("level"), r.getAs[Long]("node")) -> r.getAs[Long]("cnt"))
      .toMap
    // the mergeable state is the leaf profile: union the two halves'
    // rows and re-compress — identical to sketching the whole corpus
    val merged = QDigest.sketch(ev(a).unionByName(ev(b))).collect()
      .map(r => (r.getAs[Long]("level"), r.getAs[Long]("node")) -> r.getAs[Long]("cnt"))
      .toMap
    assert(merged === whole)
  }

  test("single-pass compression matches the level-by-level reference rule") {
    // pseudo-random skewed profile; reference replays the distributed
    // loop's exact per-level rule (cnt > t keep, else push to node div 2)
    val values = (1 to 4000).map(i => ((i * 2654435761L) % 1500).toDouble / 3.0)
    val n = values.size.toLong
    val t = n / QDigest.QdK
    val sk = QDigest.sketch(ev(values)).collect()
      .map(r => (r.getAs[Long]("level"), r.getAs[Long]("node")) -> r.getAs[Long]("cnt"))
      .toMap
    var cur: Map[Long, Long] = values
      .map(v => math.min(math.max(math.floor(v * 1e3).toLong, 0L), QDigest.QdU - 1L))
      .groupBy(identity).map { case (x, xs) => x -> xs.size.toLong }
    var ref = Map.empty[(Long, Long), Long]
    for (l <- 0 until QDigest.QdLevels) {
      val (keep, push) = cur.partition(_._2 > t)
      ref ++= keep.map { case (node, cnt) => (l.toLong, node) -> cnt }
      cur = push.toSeq.groupBy(_._1 / 2)
        .map { case (p, xs) => p -> xs.map(_._2).sum }
    }
    ref ++= cur.filter(_._2 > 0)
      .map { case (node, cnt) => (QDigest.QdLevels.toLong, node) -> cnt }
    assert(sk === ref)
  }

  test("clamping: negatives land at 0, huge values at the domain edge") {
    val out = QDigest.qdigest(ev(Seq(-5.0, -1.0, 2.0e9, 3.0e9)))
      .collect()
    val p25 = out.find(_.getAs[Long]("phi") == 25L).get
    val p99 = out.find(_.getAs[Long]("phi") == 99L).get
    assert(p25.getAs[Long]("exact_x") == 0L)
    assert(p99.getAs[Long]("exact_x") == QDigest.QdU - 1L)
    assert(out.forall(_.getAs[Long]("rank_err") == 0L))
  }
}
