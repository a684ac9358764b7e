package graft

import graft.operators.{KMeansOp, TopicProfile}

/** Cluster topic labels (q191): membership-consistency of top terms,
  * ranking shape, determinism. */
class TopicProfileSpec extends SparkTestBase {
  import spark.implicits._

  /** Two planted embedding groups with disjoint vocabularies: seeds
    * 0-3 on axis 0, seeds 4-7 on axis 32, members following. */
  private lazy val (docs, embeddings) = {
    def v(axis: Int, jitter: Int): Array[Float] = {
      val a = Array.fill(64)(0.0f)
      a(axis) = 10.0f
      a((axis + 5) % 64) = 0.01f * jitter
      a
    }
    val ids = (0L until 16L)
    val em = ids.map(i =>
      (i, v(if (i % 8 < 4) 0 else 32, i.toInt))).toDF("vec_id", "embedding")
    val dx = ids.map { i =>
      val txt =
        if (i % 8 < 4) s"apple orange shared u$i"
        else s"zebra lion shared u$i"
      (i, txt)
    }.toDF("doc_id", "text")
    (dx, em)
  }

  test("every cell's top terms occur in that cell's member documents") {
    val out = TopicProfile.clusterTerms(docs, embeddings).collect()
    assert(out.nonEmpty)
    val cellOf = KMeansOp.kmeans(embeddings).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    val wordsOf = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    val memberWords = cellOf.toSeq.groupBy(_._2).map { case (cell, ms) =>
      cell -> ms.flatMap(m => wordsOf.getOrElse(m._1, Set.empty)).toSet
    }
    out.foreach { r =>
      val cell = r.getAs[Long]("cell")
      val term = r.getAs[String]("term")
      assert(memberWords(cell).contains(term),
        s"cell $cell labeled with non-member term '$term'")
    }
    // disjoint vocab never crosses: a cell of axis-0 members can't be
    // labeled zebra/lion and vice versa — implied by the membership
    // check, stated for the reader
  }

  test("ranks are contiguous from 1, scores nonincreasing, terms distinct per cell") {
    val out = TopicProfile.clusterTerms(docs, embeddings).collect()
    out.groupBy(_.getAs[Long]("cell")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length.toLong))
      val scores = sorted.map(_.getAs[Long]("score"))
      assert(scores.sliding(2).forall {
        case Array(a, b) => a >= b; case _ => true })
      val terms = sorted.map(_.getAs[String]("term"))
      assert(terms.distinct.length == terms.length)
    }
  }

  test("deterministic across invocations; gated entry nonempty") {
    val a = TopicProfile.clusterTerms(docs, embeddings).collect().toSeq
    val b = TopicProfile.clusterTerms(docs, embeddings).collect().toSeq
    assert(a == b)
    val gated = TopicProfile.clusterTerms(spark, sfDir).collect()
    assert(gated.nonEmpty)
  }
}
