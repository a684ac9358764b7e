package graft

import graft.operators.Eval

/** Ranking-quality eval (q192 AUC, q193 gains): closed forms on planted
  * rankings, tie handling, NULL policy, decile boundary determinism. */
class EvalSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(rows: (Option[String], Option[Double])*) =
    rows.toDF("event_type", "value")
  private def evId(rows: (Long, Option[String], Option[Double])*) =
    rows.toDF("event_id", "event_type", "value")

  test("auc: perfect separation scores 1 for the top type, 0 for the bottom") {
    val out = Eval.aucOneVsRest(ev(
      (Some("p"), Some(10.0)), (Some("p"), Some(9.0)),
      (Some("n"), Some(1.0)), (Some("n"), Some(2.0)))).collect()
    assert(out.length == 2)
    val p = out.find(_.getString(0) == "p").get
    val n = out.find(_.getString(0) == "n").get
    assert(p.getAs[Long]("n_pos") == 2L && p.getAs[Long]("n_neg") == 2L)
    assert(p.getAs[String]("u2_s") == "8" && p.getAs[Double]("auc_r") == 1.0)
    assert(n.getAs[String]("u2_s") == "0" && n.getAs[Double]("auc_r") == 0.0)
  }

  test("auc: an all-tied score column is chance level for every type") {
    val out = Eval.aucOneVsRest(ev(
      (Some("p"), Some(5.0)), (Some("p"), Some(5.0)),
      (Some("n"), Some(5.0)), (Some("n"), Some(5.0)))).collect()
    assert(out.forall(_.getAs[Double]("auc_r") == 0.5))
  }

  test("auc: one win one loss of two pairs is 0.5; u2 counts wins twice") {
    // desc order: 3.0(p) 2.0(n) 1.0(p) -> p beats n once, loses once
    val out = Eval.aucOneVsRest(ev(
      (Some("p"), Some(3.0)), (Some("p"), Some(1.0)), (Some("n"), Some(2.0))))
      .collect()
    val p = out.find(_.getString(0) == "p").get
    assert(p.getAs[Long]("n_pos") == 2L && p.getAs[Long]("n_neg") == 1L)
    assert(p.getAs[String]("u2_s") == "2" && p.getAs[Double]("auc_r") == 0.5)
  }

  test("auc: NULL rows drop; a single-type corpus yields NULL auc") {
    val out = Eval.aucOneVsRest(ev(
      (Some("only"), Some(1.0)), (Some("only"), Some(2.0)),
      (Some("only"), Some(3.0)), (None, Some(9.0)), (Some("only"), None)))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_pos") == 3L && r.getAs[Long]("n_neg") == 0L)
    assert(r.isNullAt(r.fieldIndex("auc_r")))
  }

  test("gains: planted 20-row ranking hits the closed-form capture and lift") {
    // ids 1..20, value 21-id (distinct, so rank i = id i); purchases at
    // ranks 1, 2 (decile 1) and 20 (decile 10); 2 rows per decile.
    val rows = (1L to 20L).map { id =>
      val t = if (id <= 2L || id == 20L) "purchase" else "view"
      (id, Option(t), Option(21.0 - id))
    }
    val out = Eval.gainsDeciles(evId(rows: _*)).collect()
    assert(out.length == 10)
    assert(out.map(_.getAs[Long]("n")).sum == 20L)
    val d1 = out.find(_.getAs[Long]("decile") == 1L).get
    assert(d1.getAs[Long]("n") == 2L && d1.getAs[Long]("n_pos") == 2L)
    assert(d1.getAs[Double]("pos_rate_r") == 1.0)
    assert(d1.getAs[Double]("cum_capture_r") == 0.666666667)
    assert(d1.getAs[Double]("lift_r") == 6.666666667)
    val d10 = out.find(_.getAs[Long]("decile") == 10L).get
    assert(d10.getAs[Long]("n_pos") == 1L)
    assert(d10.getAs[Double]("cum_capture_r") == 1.0)
    assert(d10.getAs[Double]("lift_r") == 3.333333333)
    val caps = out.sortBy(_.getAs[Long]("decile")).map(_.getAs[Double]("cum_capture_r"))
    assert(caps.zip(caps.tail).forall { case (a, b) => a <= b })
  }

  test("gains: tie groups split across deciles by event_id order") {
    // four rows, one score; ranks follow event_id asc, so the purchase
    // at the smallest id lands in the first decile deterministically
    val out = Eval.gainsDeciles(evId(
      (4L, Some("view"), Some(1.0)), (3L, Some("view"), Some(1.0)),
      (2L, Some("view"), Some(1.0)), (1L, Some("purchase"), Some(1.0))))
      .collect()
    assert(out.map(_.getAs[Long]("decile")).toSet == Set(1L, 3L, 6L, 8L))
    val d1 = out.find(_.getAs[Long]("decile") == 1L).get
    assert(d1.getAs[Long]("n") == 1L && d1.getAs[Long]("n_pos") == 1L)
    assert(out.filter(_.getAs[Long]("decile") != 1L)
      .forall(_.getAs[Long]("n_pos") == 0L))
  }

  test("gated entries run nonempty on the smoke fixture") {
    val auc = Eval.aucOneVsRest(spark, "/root/testdata/sf0.001")
    val g = Eval.gainsDeciles(spark, "/root/testdata/sf0.001")
    assert(auc.count() > 0 && g.count() == 10)
  }

  test("rank quality: hit counts agree with the recall audit; metrics bounded") {
    import graft.operators.Similarity
    val sfDir = "/root/testdata/sf0.001"
    val rq = Similarity.rankQuality(spark, sfDir).collect()
    assert(rq.nonEmpty)
    val recall = Similarity.annRecall(spark, sfDir).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("hits_lsh")).toMap
    rq.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val nTruth = r.getAs[Long]("n_truth")
      val nHits = r.getAs[Long]("n_hits")
      assert(nHits == recall(q), s"q$q: rankQuality hits $nHits != recall ${recall(q)}")
      assert(nHits <= nTruth)
      val mrr = r.getAs[Double]("mrr_r")
      val ndcg = r.getAs[Double]("ndcg_r")
      assert(mrr >= 0.0 && mrr <= 1.0)
      assert(ndcg >= 0.0 && ndcg <= 1.0)
      if (nHits == 0)
        assert(mrr == 0.0 && ndcg == 0.0 &&
          r.isNullAt(r.fieldIndex("first_hit_rank")))
      else {
        val first = r.getAs[Long]("first_hit_rank")
        assert(mrr == BigDecimal(1.0 / first)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
  }

  test("calibration: extreme scores land in the edge bins with closed-form Brier") {
    // x in {0, 1000}: p_micro is 0 or 1_000_000 -> bins 0 and 9 only.
    // Each bin holds one positive and one negative: frac_pos = 0.5,
    // mean_p is 0.0 / 1.0, gap is ∓0.5, Brier = 1e12 / (2 * 1e12) = 0.5.
    val out = Eval.calibration(ev(
      (Some("view"), Some(0.0)), (Some("purchase"), Some(0.0)),
      (Some("view"), Some(1.0)), (Some("purchase"), Some(1.0)))).collect()
    assert(out.map(_.getAs[Long]("bin")).toSeq === Seq(0L, 9L))
    val b0 = out(0); val b9 = out(1)
    assert(b0.getAs[Long]("n") == 2L && b0.getAs[Long]("n_pos") == 1L)
    assert(b0.getAs[String]("sum_p_micro_s") == "0")
    assert(b0.getAs[String]("sum_sq_err_s") == "1000000000000")
    assert(b0.getAs[Double]("mean_p_r") == 0.0 && b0.getAs[Double]("frac_pos_r") == 0.5)
    assert(b0.getAs[Double]("gap_r") == -0.5 && b0.getAs[Double]("brier_r") == 0.5)
    assert(b9.getAs[String]("sum_p_micro_s") == "2000000")
    assert(b9.getAs[Double]("mean_p_r") == 1.0 && b9.getAs[Double]("gap_r") == 0.5)
    assert(b9.getAs[Double]("brier_r") == 0.5)
  }

  test("calibration: a constant score column degenerates to one bin-0 row") {
    val out = Eval.calibration(ev(
      (Some("purchase"), Some(3.5)), (Some("view"), Some(3.5)),
      (Some("view"), Some(3.5)))).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("bin") == 0L && out(0).getAs[Long]("n") == 3L)
    assert(out(0).getAs[Double]("mean_p_r") == 0.0)
    // one positive predicted 0 -> Brier = 1e12 / (3 * 1e12)
    assert(out(0).getAs[Double]("brier_r") == 0.333333333)
  }

  test("calibration: NULL type or value rows are excluded") {
    val out = Eval.calibration(ev(
      (Some("purchase"), Some(1.0)), (None, Some(9.0)), (Some("view"), None)))
      .collect()
    assert(out.length == 1 && out(0).getAs[Long]("n") == 1L)
  }

  test("q219 acceptance report: 2 scorers x 10 deciles over the corpus, " +
      "monotone capture, full capture at decile 10, identical row universe") {
    val out = Eval.acceptanceReport(spark, sfDir).collect()
    val byScorer = out.groupBy(_.getAs[String]("scorer"))
    assert(byScorer.keySet === Set("trained", "heuristic"))
    byScorer.foreach { case (scorer, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("decile"))
      assert(sorted.map(_.getAs[Long]("decile")).toSeq === (1L to 10L),
        s"$scorer: deciles not 1..10")
      // equal-frequency deciles: sizes differ by at most 1
      val ns = sorted.map(_.getAs[Long]("n"))
      assert(ns.max - ns.min <= 1L, s"$scorer: deciles not equal-frequency")
      val caps = sorted.map(_.getAs[Double]("cum_capture_r"))
      assert(caps.zip(caps.tail).forall { case (a, b) => a <= b },
        s"$scorer: cumulative capture not monotone")
      assert(caps.last === 1.0, s"$scorer: decile 10 must capture all positives")
    }
    // both scorers rank the SAME documents with the SAME ground truth
    def tot(s: String, c: String) =
      byScorer(s).map(_.getAs[Long](c)).sum
    assert(tot("trained", "n") === tot("heuristic", "n"))
    assert(tot("trained", "n_pos") === tot("heuristic", "n_pos"))
  }

  test("q219 acceptance report: a perfectly separable planted corpus gives the " +
      "trained scorer front-loaded capture") {
    import graft.operators.QualityClassifier
    // the q217 digit rule labels doc_id-derived sources; plant texts the
    // trained classifier can separate (positives share a marker token)
    // while the heuristic sees near-identical quality features
    val docs = (0L until 40L).map { i =>
      val even = i % 2 == 0
      val marker = if (even) "alpha" else "beta"
      (i, s"doc$i", s"the quick brown fox $marker jumps over the lazy dog " * 3,
        s"so:$i")
    }.toDF("doc_id", "title", "text", "source")
    val out = Eval.acceptanceReport(docs).collect()
    val trained = out.filter(_.getAs[String]("scorer") == "trained")
      .sortBy(_.getAs[Long]("decile"))
    assert(trained.nonEmpty)
    // separable fixture: the top half of the trained ranking captures
    // every positive (labels = even doc_ids = the alpha-marked half)
    val cap5 = trained.filter(_.getAs[Long]("decile") <= 5L)
      .map(_.getAs[Long]("n_pos")).sum
    assert(cap5 === trained.map(_.getAs[Long]("n_pos")).sum,
      "trained ranking failed to front-load the separable positives")
  }
}
