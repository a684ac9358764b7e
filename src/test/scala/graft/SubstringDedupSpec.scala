package graft

import graft.operators.SubstringDedup

/** Span-level exact substring dedup (q216): planted shared spans,
  * same-doc repeats, offset independence, and the no-duplicates
  * negative. */
class SubstringDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def wordsOf(t: String): Vector[String] =
    t.split(" ").filter(_.nonEmpty).toVector

  private def regions(docs: org.apache.spark.sql.DataFrame) =
    SubstringDedup.duplicatedRegions(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start").toInt,
        r.getAs[Long]("span_end").toInt, r.getAs[Long]("n_anchors"),
        r.getAs[Long]("max_occ")))

  test("a span shared by two docs at DIFFERENT offsets is reported in " +
      "both, and every reported slice really occurs in the other doc") {
    val span = (1 to 64).map(i => s"s$i").mkString(" ")
    val pre = (1 to 17).map(i => s"a$i").mkString(" ")
    val post = (1 to 23).map(i => s"b$i").mkString(" ")
    val t1 = span + " " + post
    val t2 = pre + " " + span
    val t3 = (1 to 80).map(i => s"u$i").mkString(" ")
    val out = regions(Seq((1L, t1), (2L, t2), (3L, t3)).toDF("doc_id", "text"))
    val byDoc = out.groupBy(_._1)
    assert(byDoc.contains(1L) && byDoc.contains(2L),
      s"planted span missed: $out")
    assert(!byDoc.contains(3L), "unique doc must not be flagged")
    // alignment independence: each reported slice of doc 1 appears
    // verbatim (as a word run) inside doc 2, and vice versa
    val w1 = wordsOf(t1); val w2 = wordsOf(t2)
    byDoc(1L).foreach { case (_, a, b, _, _) =>
      val slice = w1.slice(a, b)
      assert(w2.containsSlice(slice), s"doc1 region [$a,$b) not in doc2")
    }
    byDoc(2L).foreach { case (_, a, b, _, _) =>
      val slice = w2.slice(a, b)
      assert(w1.containsSlice(slice), s"doc2 region [$a,$b) not in doc1")
    }
    // the region sits inside the planted span, occ = 2 (two copies)
    assert(out.filter(r => r._1 <= 2L).forall(_._5 == 2L))
  }

  test("a doc repeating its OWN paragraph is flagged (same-doc occurrences count)") {
    val para = (1 to 64).map(i => s"p$i").mkString(" ")
    val mid = (1 to 19).map(i => s"m$i").mkString(" ")
    val out = regions(Seq(
      (1L, para + " " + mid + " " + para),
      (2L, (1 to 40).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text"))
    assert(out.exists(_._1 == 1L), s"self-repeat missed: ${out.toSeq}")
    assert(!out.exists(_._1 == 2L))
    // both copies of the paragraph are covered by reported regions
    assert(out.count(_._1 == 1L) >= 2 || {
      // unless the mid-gap anchors fused them into one region spanning both
      val r = out.filter(_._1 == 1L).head
      r._3 - r._2 > 64
    })
  }

  test("an all-unique corpus reports nothing") {
    val docs = (1L to 5L).map(d =>
      (d, (1 to 100).map(i => s"w${d}_$i").mkString(" "))).toDF("doc_id", "text")
    assert(regions(docs).isEmpty)
  }

  test("empty and null texts are ignored") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "one two"))
      .toDF("doc_id", "text")
    assert(regions(docs).isEmpty)
  }
}
