package graft.tools

import org.apache.spark.sql.functions._

/** Sampled recall audit for the LSH-banded shared pair table (jpairs_v3)
  * — the observability tool for the one probabilistic link in the dedup
  * chain. The q23/q24 gates value-check banding recall against the exact
  * oracle at every GATED SF, but the 100 TB target runs ungated: a
  * near-threshold pair can silently drop from q23 and its nine
  * downstream graph consumers (banding miss probability at τ=0.8 is
  * ~(1−J⁴)³² per true pair). This audit makes that loss measurable at
  * ANY scale without a full oracle run: take a deterministic ~1/64
  * document sample (md5 of doc_id — unbiased w.r.t. id layout), compute
  * the EXACT within-sample τ-pairs via the exact-complete prefix-filter
  * path (cheap on the sample: its Σ prefix-df² cost is sample-sized),
  * and count how many the banded pair table recovered. A sample pair is
  * a uniform draw of true pairs whose BOTH endpoints landed in the
  * sample, so recovered/exact estimates corpus-wide banding recall.
  *
  * `sbt "runMain graft.tools.BandingRecallAudit /root/testdata/sf0.1 [mod]"`
  * prints one JSON line {"exact_sample_pairs":…,"recovered":…,
  * "recall_r":…}.
  */
object BandingRecallAudit {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mod = if (args.length > 1) args(1).toInt else 64
    val spark = graft.GraftSession.builder().getOrCreate()
    try {
      // md5-keyed sample, exactly as the scaladoc says: md5Long is
      // non-negative (60 bits), so % mod has no abs(Long.MinValue)
      // exclusion hole and the draw replays verbatim in DuckDB SQL.
      val docs = graft.Tables.documents(spark, dir)
        .filter(graft.operators.TextAnalysis.md5Long(
          col("doc_id").cast("string")) % mod === 0L)
        .localCheckpoint()
      val nDocs = docs.count()
      // exact within-sample τ-pairs via the exact-complete prefix path
      val exact = graft.operators.ApproxDedup.ngramJaccardPairs(docs)
        .select(col("a_id"), col("b_id")).localCheckpoint()
      val nExact = exact.count()
      // what the banded builder found for the same endpoints
      val banded = graft.operators.ApproxDedup
        .minhashLshPairs(graft.Tables.documents(spark, dir))
        .select(col("a_id"), col("b_id"))
      val recovered = exact.join(banded, Seq("a_id", "b_id")).count()
      val recall =
        if (nExact == 0) 1.0 else recovered.toDouble / nExact.toDouble
      // one line, driver-parsable
      println(s"""{"metric":"banding_recall","sample_docs":$nDocs,""" +
        s""""exact_sample_pairs":$nExact,"recovered":$recovered,""" +
        s""""recall_r":${math.rint(recall * 1e6) / 1e6}}""")
    } finally spark.stop()
  }
}
