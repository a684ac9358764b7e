package graft

import org.apache.spark.sql.functions._
import graft.operators.{KMeansOp, SemDedup}

class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  /** Four tight blobs of 50 vectors at distant corners; the FIRST 12
    * rows are exact copies of one boilerplate vector (the real-corpus
    * failure mode: the head of a scraped table is duplicated
    * boilerplate). */
  private def skewedFixture = {
    val rng = new scala.util.Random(11)
    val corners = Seq.tabulate(4) { c =>
      Array.tabulate(KMeansOp.Dim)(d => if (d % 4 == c) 1.0f else -1.0f)
    }
    val boiler = corners.head
    val dups = (0L until 12L).map(i => (i, boiler.clone()))
    val blobs = (0 until 4).flatMap { c =>
      (0 until 50).map { j =>
        (12L + c * 50 + j, corners(c).map(x => x + rng.nextFloat() * 0.01f))
      }
    }
    (dups ++ blobs).toDF("vec_id", "embedding")
  }

  test("q104: trained cells recover from degenerate seeds; q59's fixed cells collapse") {
    val df = skewedFixture
    val n = df.count()
    // q59: all 12 fixed centroids are the SAME boilerplate vector, so
    // every vector ties and lands in one cell — the within-cell pair
    // stage degenerates to all-pairs O(n²), the scale-killer
    val staticCells = SemDedup.semDedup(df)
      .groupBy(col("cluster_id")).count().collect()
    assert(staticCells.length === 1, "fixed first-K cells must collapse here")
    assert(staticCells.head.getLong(1) === n)
    // q104: the Lloyd rounds move centroids onto the data distribution
    val trainedCells = SemDedup.semDedupTrained(df, k = 12)
      .groupBy(col("cluster_id")).count().collect()
      .map(_.getLong(1))
    assert(trainedCells.length > 1, "trained cells must discriminate")
    assert(trainedCells.max < n, "no trained cell may hold the whole corpus")
    // pair volume Σ cellᵢ² — the cost the cells exist to bound. With the
    // fixed Rounds=2 the recovery from fully-degenerate seeds is partial
    // (Lloyd needs more rounds to peel every blob off the merged cell),
    // so the assertion is strict improvement, not a fixed factor — the
    // factor grows with k and rounds, the collapse never heals at all
    // with static cells.
    val staticPairVolume = n * n
    val trainedPairVolume = trainedCells.map(c => c * c).sum
    assert(trainedPairVolume < staticPairVolume,
      s"trained pair volume $trainedPairVolume must beat all-pairs $staticPairVolume")
  }

  test("q104: exact duplicates still dedup to the lowest vec_id canonical") {
    val out = SemDedup.semDedupTrained(skewedFixture, k = 12).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("canonical_id"), r.getAs[Long]("is_dup"))).toMap
    // the 12 boilerplate copies form one ≥τ neighborhood with canonical 0
    (0L until 12L).foreach { i =>
      assert(out(i)._1 === 0L, s"vec $i canonical")
      assert(out(i)._2 === (if (i == 0L) 0L else 1L), s"vec $i is_dup")
    }
  }

  test("q104: partition-count independence") {
    val df = skewedFixture
    val base = SemDedup.semDedupTrained(df, k = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val reparted = SemDedup.semDedupTrained(df.repartition(7), k = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(base === reparted)
  }

  test("broadcast assignment is bit-identical to the literal path") {
    val emb = Tables.embeddings(spark, sfDir)
    val (qv, cents) = KMeansOp.trainCents(emb)
    val literal = KMeansOp.assign(qv, cents)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val bcast = KMeansOp.assignBroadcast(qv, cents)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(literal === bcast)
    assert(literal.nonEmpty)
  }

  test("K=4096: broadcast assignment keeps plan size O(1) and stays shuffle-free") {
    val rng = new scala.util.Random(23)
    val bigCents: Seq[(Long, Seq[Double])] = Seq.tabulate(4096) { i =>
      i.toLong -> Seq.fill(KMeansOp.Dim)(math.round(rng.nextDouble() * 2e6 - 1e6).toDouble)
    }
    val qv = KMeansOp.quantized(Tables.embeddings(spark, sfDir))
    val assigned = KMeansOp.assignAuto(qv, bigCents)
    val planStr = assigned.queryExecution.sparkPlan.toString
    // a literal-matrix plan at K=4096 carries ~4096×64 literals (megabytes
    // of plan text); the broadcast path carries one column reference
    assert(planStr.length < 100000, s"plan blew up: ${planStr.length} chars")
    assert(planStr.contains("BroadcastNestedLoopJoin"),
      "centroids must arrive via a broadcast of the single packed row")
    assert(!planStr.contains("ShuffleExchange"),
      "assignment must not shuffle the corpus")
    val rows = assigned.select("vec_id", "cell").collect()
    assert(rows.length === qv.count())
    assert(rows.forall(r => !r.isNullAt(1)), "every vector must be assigned")
    assert(rows.map(_.getLong(1)).distinct.length > 1, "cells must discriminate")
  }

  test("nearest-cell kernel: interpreted eval matches codegen on edge shapes") {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, NearestCellDist2}
    val cents = Seq((5L, Seq(1.0, 0.0), 1.0), (7L, Seq(0.0, 1.0), 1.0))
    val df = Seq(
      (1L, Seq(1.0, 0.1)),   // nearest 5
      (2L, Seq(0.1, 1.0)),   // nearest 7
      (3L, Seq(0.5, 0.5))    // exact tie -> first (lowest cell id) = 5
    ).toDF("vec_id", "q")
      .crossJoin(cents.toDF("cell", "c", "cc")
        .select(struct(col("cell"), col("c"), col("cc")).as("entry"))
        .agg(sort_array(collect_list(col("entry"))).as("cells")))
    val out = df.withColumn("cell", ColumnBridge.column(NearestCellDist2(
        ColumnBridge.expression(col("q")), ColumnBridge.expression(col("cells")))))
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 5L, 2L -> 7L, 3L -> 5L))
    // dimension mismatch -> NULL, not a silent argmin winner
    val bad = Seq((9L, Seq(1.0, 0.0, 0.0))).toDF("vec_id", "q")
      .crossJoin(cents.toDF("cell", "c", "cc")
        .select(struct(col("cell"), col("c"), col("cc")).as("entry"))
        .agg(sort_array(collect_list(col("entry"))).as("cells")))
      .withColumn("cell", ColumnBridge.column(NearestCellDist2(
        ColumnBridge.expression(col("q")), ColumnBridge.expression(col("cells")))))
      .select("cell").collect()
    assert(bad.head.isNullAt(0))
  }
}
