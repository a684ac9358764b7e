package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfPq, KMeansOp}

/** Corpus-scaled IVF cell count (the round-9 fix for the q188/q72
  * fixed-nlist scale wall): the integer threshold ladder, its SQL
  * twin's thresholds, and the guarantee that gate-scale corpora keep
  * their pre-ladder sizing (so the round-8 oracle values carry over
  * unchanged at the gate SFs). */
class ScaledNListSpec extends SparkTestBase {
  import spark.implicits._

  test("ladder doubles cells until rows-per-cell <= target, capped") {
    val t = KMeansOp.TargetCellRows // 500
    assert(KMeansOp.scaledNList(0) == KMeansOp.K)
    assert(KMeansOp.scaledNList(500) == 8)          // gate SF: unchanged
    assert(KMeansOp.scaledNList(2000) == 8)         // bench SF: unchanged
    assert(KMeansOp.scaledNList(t * 8) == 8)
    assert(KMeansOp.scaledNList(t * 8 + 1) == 16)
    assert(KMeansOp.scaledNList(20000) == 64)       // sf1 corpus
    assert(KMeansOp.scaledNList(200000) == 512)     // sf10 corpus
    assert(KMeansOp.scaledNList(Long.MaxValue / 4) == KMeansOp.MaxNList)
    assert(KMeansOp.scaledNList(500, minNList = IvfPq.MinNList) == 16)
    assert(KMeansOp.scaledNList(t * 16 + 1, minNList = IvfPq.MinNList) == 32)
    // rows-per-cell stays <= target below the cap: the flat-read invariant
    for (n <- Seq(10000L, 100000L, 1000000L)) {
      val k = KMeansOp.scaledNList(n)
      if (k < KMeansOp.MaxNList) assert(n <= KMeansOp.TargetCellRows * k)
    }
    // non-power-of-two floor would let the Scala loop overshoot the cap
    // the SQL twin pins — rejected at the door
    assertThrows[IllegalArgumentException] {
      KMeansOp.scaledNList(100, minNList = 3)
    }
  }

  test("SQL ladder twin emits the same thresholds") {
    val sql = KMeansOp.scaledNListSql("N")
    assert(sql.contains(s"WHEN N <= ${KMeansOp.TargetCellRows * 8} THEN 8"))
    assert(sql.contains(s"WHEN N <= ${KMeansOp.TargetCellRows * 2048} THEN 2048"))
    assert(sql.endsWith(s"ELSE ${KMeansOp.MaxNList} END)"))
    // Spark SQL evaluates the identical CASE to the Scala ladder
    val ns = Seq(0L, 500L, 2000L, 4001L, 20000L, 200000L, 3000000L)
    val expr = KMeansOp.scaledNListSql("n")
    val got = ns.toDF("n").selectExpr("n", s"$expr AS k")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    ns.foreach { n =>
      assert(got(n) == KMeansOp.scaledNList(n), s"SQL twin diverges at n=$n")
    }
  }

  test("trainCentsScaled trains the ladder-derived cell count") {
    val rng = new scala.util.Random(7)
    val n = 4100 // > 8*500 -> 16 cells at the K=8 floor
    val vecs = (0L until n.toLong).map(i =>
      (i, Array.fill(KMeansOp.Dim)(rng.nextFloat()))).toDF("vec_id", "embedding")
    val (_, cents) = KMeansOp.trainCentsScaled(vecs)
    assert(cents.size == 16)
    // the fixed-k trainer is untouched (q63's clustering semantics)
    val (_, cents8) = KMeansOp.trainCents(vecs)
    assert(cents8.size == KMeansOp.K)
  }
}
