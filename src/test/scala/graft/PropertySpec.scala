package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.ApproxDedup
import graft.functions.VectorOps

/** Property-style checks of the native kernels against plain Scala
  * models, over seeded ScalaCheck generators (no scalatestplus bridge in
  * the offline cache, so sampling is driven explicitly). */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val word = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
  private val text = Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("WordShingles equals a plain Scala shingling model on random texts") {
    val texts = samples(text, 200)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = ApproxDedup.shingleSets(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val ws = t.split(" ", -1).filter(_.nonEmpty)
      val expect =
        if (ws.length < 3) Seq.empty
        else ws.sliding(3).map(_.mkString(" ")).toSeq.distinct
      assert(native(i.toLong) === expect, s"text='$t'")
    }
  }

  test("WordShingles(distinct=false) equals the sliding-window model with multiplicity") {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, WordShingles}
    val texts = samples(text, 200)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = df.select(col("doc_id"), ColumnBridge.column(
        WordShingles(ColumnBridge.expression(col("text")), 2, distinct = false)).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val ws = t.split(" ", -1).filter(_.nonEmpty)
      val expect =
        if (ws.length < 2) Seq.empty
        else ws.sliding(2).map(_.mkString(" ")).toSeq
      assert(native(i.toLong) === expect, s"text='$t'")
    }
  }

  test("TokenTermStats equals the split-filter-count model on random texts") {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, TokenTermStats}
    val terms = Seq("ab", "c", "dddd")
    // bias the alphabet so the terms actually occur
    val biasedWord = Gen.oneOf(word, Gen.oneOf("ab", "c", "dddd", "abc", "cc"))
    val biasedText = Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, biasedWord)).map(_.mkString(" "))
    val texts = samples(biasedText, 200)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = df.select(col("doc_id"), ColumnBridge.column(
        TokenTermStats(ColumnBridge.expression(col("text")), terms)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.split(" ", -1).filter(_.nonEmpty).toSeq
      val expect = toks.length.toLong +: terms.map(w => toks.count(_ == w).toLong)
      assert(native(i.toLong) === expect, s"text='$t'")
    }
  }

  test("native dot product equals a Scala fold bit-for-bit on random vectors") {
    val vec = Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0))
    val pairs = samples(Gen.zip(vec, vec), 100)
    val df = pairs.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a.toArray, b.toArray) }
      .toDF("id", "a", "b")
    val got = df.select(col("id"), VectorOps.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      val expect = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      assert(java.lang.Double.doubleToLongBits(got(i.toLong)) ===
        java.lang.Double.doubleToLongBits(expect), s"pair $i")
    }
  }

  test("native dot product NULLs ragged-length pairs like the zip_with HOF form") {
    val df = Seq(
      (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (2L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0)), // ragged -> NULL
      (3L, Array.empty[Double], Array.empty[Double])
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), VectorOps.dot(col("a"), col("b")).as("d"),
        VectorOps.dotHof(col("a"), col("b")).as("dh"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got(1L) === ((Some(32.0), Some(32.0))))
    assert(got(1L)._1 === got(1L)._2)
    assert(got(2L)._1 === None, "ragged pair must be NULL, not a prefix sum")
    assert(got(2L)._1 === got(2L)._2, "native and HOF must agree on ragged input")
    assert(got(3L) === ((Some(0.0), Some(0.0))))
  }

  test("TopKSimId equals sort-take-k on random scored pairs") {
    val pair = Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(-1.0, 1.0), Gen.chooseNum(0L, 1000L))
    val rows = samples(Gen.listOfN(80, pair), 5).flatten
    val df = rows.toDF("g", "sim", "__cand_id")
      // graft's operators always rank distinct candidates per group
      .dropDuplicates("g", "__cand_id")
    val base = df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val model = base.groupBy(_._1).map { case (g, rs) =>
      g -> rs.sortBy { case (_, s, i) => (-s, i) }.take(3).map(t => (t._3, t._2)).toSeq
    }
    val got = graft.operators.Similarity.topKExplodedForTest(df, 3).collect()
      .groupBy(_.getLong(0)).map { case (g, rs) =>
        g -> rs.sortBy(_.getAs[Int]("rank")).map(r => (r.getLong(1), r.getAs[Double]("sim"))).toSeq
      }
    assert(model.nonEmpty)
    model.foreach { case (g, expect) => assert(got(g) === expect, s"group $g") }
  }

  test("TopKSimId distinctIds equals dropDuplicates-then-top-k when dup ids share a score") {
    // the multi-table LSH contract: the same (group, id) pair may arrive
    // once per colliding table, always with the SAME pair-pure score —
    // in-heap id-dedup must match dedup-then-rank exactly
    val pair = Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 40L),
      Gen.chooseNum(1, 4))
    val rows = samples(Gen.listOfN(60, pair), 5).flatten
      // score derived from (g, id) so duplicates are value-identical
      .flatMap { case (g, id, dups) =>
        Seq.fill(dups)((g, math.sin(g * 37.0 + id).abs, id)) }
    val df = rows.toDF("g", "sim", "__cand_id")
    val model = rows.distinct.groupBy(_._1).map { case (g, rs) =>
      g -> rs.sortBy { case (_, s, i) => (-s, i) }.take(3).map(t => (t._3, t._2)).toSeq
    }
    val got = graft.operators.Similarity
      .topKExplodedForTest(df.repartition(7), 3, distinctIds = true).collect()
      .groupBy(_.getLong(0)).map { case (g, rs) =>
        g -> rs.sortBy(_.getAs[Int]("rank")).map(r => (r.getLong(1), r.getAs[Double]("sim"))).toSeq
      }
    assert(model.nonEmpty)
    model.foreach { case (g, expect) => assert(got(g) === expect, s"group $g") }
  }

  test("TopKSimId ranks NaN scores first, consistent with heap retention and DuckDB DESC") {
    val df = Seq((0L, 0.9, 1L), (0L, Double.NaN, 2L), (0L, 0.5, 3L), (0L, 0.7, 4L))
      .toDF("g", "sim", "__cand_id")
    val got = graft.operators.Similarity.topKExplodedForTest(df, 3).collect()
      .sortBy(_.getAs[Int]("rank")).map(_.getLong(1)).toSeq
    assert(got === Seq(2L, 1L, 4L))
  }

  test("minhash signature containment tracks Jaccard on random set pairs") {
    // J(A,B) ≈ fraction of matching signature slots — sanity-check the
    // estimator on disjoint vs identical sets
    val setGen = Gen.chooseNum(5, 25).flatMap(n => Gen.listOfN(n, word)).map(_.distinct)
    val sets = samples(setGen, 10)
    val df = sets.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "shingles")
    val sigs = df.select(col("doc_id"), ApproxDedup.signature(col("shingles")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    sets.indices.foreach { i =>
      assert(sigs(i.toLong) === sigs(i.toLong)) // deterministic
      sets.indices.foreach { j =>
        val inter = sets(i).toSet.intersect(sets(j).toSet).size.toDouble
        val union = sets(i).toSet.union(sets(j).toSet).size.toDouble
        val jac = if (union == 0) 0.0 else inter / union
        val est = sigs(i.toLong).zip(sigs(j.toLong)).count { case (x, y) => x == y }
          .toDouble / ApproxDedup.NumPerms
        // 128 perms: estimator within 0.35 absolute with overwhelming probability
        assert(math.abs(est - jac) < 0.35, s"sets $i,$j jac=$jac est=$est")
      }
    }
  }

  test("Int8QuantStats equals the HOF fold formulation bitwise on random vectors") {
    import graft.operators.Quantize
    val vecGen = Gen.chooseNum(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1000000, 1000000).map(_ / 10000.0)))
    val vecs = samples(vecGen, 200) :+ List.fill(8)(0.0) :+ List(-0.5, 0.5, 127.0) :+
      // scale = 127/127 = 1, so these hit the rounding kernel with the
      // JDK-6430675 edge doubles (floor(y+0.5) overshoots) and exact ties
      List(127.0, 0.49999999999999994, -0.49999999999999994, 0.5, -0.5, 126.5)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "e")
    val both = df.select(col("vec_id"),
        Quantize.int8Stats(col("e")).as("native"),
        Quantize.int8StatsHof(col("e")).as("hof"))
      .collect()
    assert(both.length === vecs.length)
    both.foreach { r =>
      val n = r.getSeq[Double](1)
      val h = r.getSeq[Double](2)
      assert(n.length === 6 && h.length === 6, s"vec_id=${r.getLong(0)}")
      n.zip(h).zipWithIndex.foreach { case ((a, b), fi) =>
        assert(java.lang.Double.doubleToLongBits(a) ===
          java.lang.Double.doubleToLongBits(b),
          s"vec_id=${r.getLong(0)} field=$fi native=$a hof=$b")
      }
    }
  }

  test("two-pass bucket selection equals the window-sort quantiles on random frames") {
    import graft.operators.Analytics
    // duplicates, negatives, single-element and all-equal groups, and a
    // null group key all mixed in — the shapes the fixture can't cover
    val groupGen = Gen.oneOf[Option[String]](Some("a"), Some("b"), Some("c"), None)
    val valueGen = Gen.oneOf(
      Gen.chooseNum(-1000L, 1000L).map(_ / 8.0), // duplicate-heavy grid
      Gen.const(42.0),                           // all-equal runs
      Gen.chooseNum(-1e6, 1e6))
    val rowGen = Gen.zip(groupGen, valueGen)
    (1 to 5).foreach { trial =>
      val rows = samples(rowGen, 400 * trial).zipWithIndex
        .map { case ((g, v), i) => (g, v, i.toLong) }
      val df = rows.toDF("event_type", "value", "event_id")
      val exact = Analytics.groupQuantiles(df).collect().map(_.toString).toSeq
      val twoPass = Analytics.groupQuantiles2Pass(df).collect().map(_.toString).toSeq
      assert(twoPass === exact, s"trial=$trial quantiles diverged")
      val w = Analytics.winsorize(df).collect().map(_.toString).toSeq
      val w2 = Analytics.winsorize2Pass(df).collect().map(_.toString).toSeq
      assert(w2 === w, s"trial=$trial winsorize diverged")
    }
  }

  test("two-pass percentile ranks equal the window-sort ranks on random frames") {
    import graft.operators.Analytics
    val langGen = Gen.oneOf[Option[String]](Some("en"), Some("es"), None)
    val lenGen = Gen.oneOf(Gen.chooseNum(0L, 50L), Gen.const(7L))
    (1 to 5).foreach { trial =>
      val rows = samples(Gen.zip(langGen, lenGen), 300 * trial).zipWithIndex
        .map { case ((l, n), i) => (i.toLong, l, n) }
      val df = rows.toDF("doc_id", "lang", "n_chars")
      val exact = Analytics.percentileRank(df).collect().map(_.toString).toSeq
      val twoPass = Analytics.percentileRank2Pass(df).collect().map(_.toString).toSeq
      assert(twoPass === exact, s"trial=$trial ranks diverged")
    }
  }
}
