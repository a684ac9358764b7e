package graft

import org.apache.spark.sql.functions._
import graft.operators.{ApproxDedup, Similarity}

class ApproxDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("q23 finds the planted near-dup pairs with high Jaccard") {
    val out = ApproxDedup.ngramJaccard(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("jaccard") >= ApproxDedup.Tau))
    assert(out.forall(r => r.getAs[Long]("a_id") < r.getAs[Long]("b_id")))
  }

  test("native WordShingles matches the interpreted HOF shingling exactly") {
    val native = ApproxDedup.shingleSets(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val hof = ApproxDedup.shingleSetsHof(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(native === hof)
    assert(native.values.exists(_.nonEmpty))
  }

  test("prefix-filtered q23 equals the naive blocked join exactly") {
    val fast = ApproxDedup.ngramJaccard(spark, sfDir).collect().map(_.toString).toSeq
    val naive = ApproxDedup.ngramJaccardNaive(spark, sfDir).collect().map(_.toString).toSeq
    assert(fast === naive)
  }

  test("q24 MinHash+LSH recovers exactly the exact-Jaccard pairs (full recall here)") {
    val exact = ApproxDedup.ngramJaccard(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val lsh = ApproxDedup.minhashLsh(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(lsh === exact)
  }

  test("minhash signature: identical shingle sets → identical signatures") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val sh = df.select(col("doc_id"), filter(split(col("text"), " "), w => w =!= "").as("ws"))
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(0), size(col("ws")) - 3),
        i => concat_ws(" ", element_at(col("ws"), i + 1),
          element_at(col("ws"), i + 2), element_at(col("ws"), i + 3)))).as("shingles"))
    val sigs = sh.select(col("doc_id"), ApproxDedup.signature(col("shingles")).as("sig"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
    assert(sigs(1L).length === ApproxDedup.NumPerms)
  }

  test("native minhash signature matches the interpreted HOF fold exactly") {
    val sh = ApproxDedup.shingleSets(spark, sfDir)
      .filter(size(col("shingles")) > 0).limit(50)
    val both = sh.select(
        ApproxDedup.signature(col("shingles")).as("native"),
        ApproxDedup.signatureHof(col("shingles")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("q25 simhash: near-dup docs land within Hamming 3") {
    val out = ApproxDedup.simhash(spark, sfDir).collect()
    assert(out.length === Tables.documents(spark, sfDir).count())
    // the corpus has planted near-dups (q23 found pairs), simhash should
    // see at least one of them within the Hamming band
    assert(out.map(_.getAs[Long]("n_hamming_le3")).sum > 0)
  }

  test("q28 LSH top-k: results are a subset of same-bucket candidates and " +
    "rank-1 hits overlap exact search") {
    val exact = Similarity.bruteForceTopK(spark, sfDir).collect()
      .filter(_.getAs[Int]("rank") === 1)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val lsh = Similarity.lshTopK(spark, sfDir).collect()
    // every query produced some candidates at this corpus size
    assert(lsh.map(_.getAs[Long]("query_id")).distinct.length === 10)
    // recall of the true nearest neighbor is only guaranteed when it
    // shares the query's bucket; require it to happen for >= 1 query
    val hits = lsh.filter(r => exact.get(r.getAs[Long]("query_id"))
      .contains(r.getAs[Long]("neighbor_id")))
    assert(hits.nonEmpty)
  }
}
