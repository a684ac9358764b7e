package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer exposing graft's native expressions
  * to SQL. Activate with
  * `.config("spark.sql.extensions", "org.apache.spark.sql.graftbridge.GraftExtensions")`
  * (GraftSession does) — after which plain SQL can call:
  *
  *   dot_product_double(arr_a, arr_b)
  *   minhash_signature(hash_arr, num_perms, seed, p)
  *   word_shingles(text, k)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(
      classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def longLit(e: Expression, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def arity(args: Seq[Expression], n: Int, fn: String): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // plan-time guardrail: large×large cartesian joins fail fast (see
    // GuardCartesianProduct; spark.graft.guard.cartesianMinBytes)
    ext.injectOptimizerRule(GuardCartesianProduct)

    ext.injectFunction((
      FunctionIdentifier("dot_product_double"),
      info("dot_product_double", "dot_product_double(a, b) - left-to-right dot product of two array<double>"),
      (args: Seq[Expression]) => {
        arity(args, 2, "dot_product_double")
        DotProductDouble(args(0), args(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(s) - Unicode NFC normalization (dedup canonicalization)"),
      (args: Seq[Expression]) => {
        arity(args, 1, "nfc_normalize")
        NfcNormalize(args(0))
      }))

    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, k) - distinct space-joined word k-grams"),
      (args: Seq[Expression]) => {
        arity(args, 2, "word_shingles")
        WordShingles(args(0), longLit(args(1), "k").toInt)
      }))

    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(hashes, numPerms, seed, p) - MinHash signature from array<long> element hashes"),
      (args: Seq[Expression]) => {
        arity(args, 4, "minhash_signature")
        val numPerms = longLit(args(1), "numPerms").toInt
        val seed = longLit(args(2), "seed")
        val p = longLit(args(3), "p")
        // the coefficient draw uses Random.nextInt, so p must stay in int
        // range — silently truncating a larger prime would collapse the
        // coefficient space and quietly correlate every permutation
        if (numPerms < 1) throw new IllegalArgumentException(
          s"minhash_signature: numPerms must be >= 1, got $numPerms")
        if (p <= 1 || p > Int.MaxValue) throw new IllegalArgumentException(
          s"minhash_signature: p must be in (1, ${Int.MaxValue}], got $p")
        val rng = new scala.util.Random(seed)
        val a = Seq.fill(numPerms)(1L + rng.nextInt((p - 1).toInt).toLong)
        val b = Seq.fill(numPerms)(rng.nextInt(p.toInt).toLong)
        MinHashSignature(args(0), a, b, p)
      }))
  }
}
