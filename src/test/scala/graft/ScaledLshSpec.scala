package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Corpus-scaled sign-LSH sizing (q40/q41/q42's round-8 fix): the
  * integer threshold ladder, its SQL twin's thresholds, and the
  * low-bit-mask equivalence the oracles rely on. */
class ScaledLshSpec extends SparkTestBase {
  import spark.implicits._

  test("ladder picks the smallest bit count keeping buckets <= target") {
    val t = Similarity.TargetBucket // 500
    assert(Similarity.scaledBits(0) == 4)
    assert(Similarity.scaledBits(t * 16) == 4)      // 8000 -> still 4
    assert(Similarity.scaledBits(t * 16 + 1) == 5)  // 8001 -> 5
    assert(Similarity.scaledBits(t * 32) == 5)
    assert(Similarity.scaledBits(200000) == 9)      // the sf10 corpus
    assert(Similarity.scaledBits(Long.MaxValue / 4) == Similarity.MaxLshBits)
    assert(Similarity.scaledBits(100, minBits = 2) == 2) // q42's floor
    assert(Similarity.scaledBits(t * 4 + 1, minBits = 2) == 3)
  }

  test("SQL ladder twin emits the same thresholds") {
    val sql = Similarity.scaledBitsSql("N", minBits = 2)
    assert(sql.contains(s"WHEN N <= ${Similarity.TargetBucket * 4} THEN 2"))
    assert(sql.contains(s"WHEN N <= ${Similarity.TargetBucket * 2048} THEN 11"))
    assert(sql.endsWith(s"ELSE ${Similarity.MaxLshBits} END)"))
  }

  test("masking the full-stack bucket to b low bits equals hashing with " +
      "the first b planes (prefix-consistent plane stream)") {
    val rng = new scala.util.Random(42)
    val vecs = (1L to 64L).map(i =>
      (i, Array.fill(Similarity.Dim)(rng.nextGaussian()))).toDF("vec_id", "embedding")
    val v = graft.operators.Dedup.normalized(vecs)
    val full = Similarity.lshBucket(col("e"),
      Similarity.hyperplanesFor(Similarity.MaxLshBits))
    for (b <- Seq(2, 4, 7)) {
      val direct = Similarity.lshBucket(col("e"), Similarity.hyperplanesFor(b))
      val mismatches = v.select(
        (pmod(full, lit(1L << b)) =!= direct).as("bad"))
        .filter(col("bad")).count()
      assert(mismatches == 0L, s"mask/prefix divergence at bits=$b")
    }
  }
}
