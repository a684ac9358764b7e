package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import graft.operators.PhraseSearch

/** Phrase search (q194): planted adjacency semantics, 1-based
  * positions, overlap counting, pruned serving scan, empty corpus. */
class PhraseSearchSpec extends SparkTestBase {
  import spark.implicits._

  private def indexOf(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("phrase_idx").toString
    val staging = s"$dir/idx"
    PhraseSearch.buildPosIndex(docs.toDF("doc_id", "text"), staging)
    staging
  }

  test("adjacent tokens match; reversed order and fused tokens do not") {
    val path = indexOf(Seq(
      (1L, "a spark join b"),          // one occurrence at start 2
      (2L, "join spark"),              // reversed — no match
      (3L, "sparkx join"),             // fused token — no match
      (4L, "spark join spark join"),   // two occurrences, first at 1
      (5L, "spark joins")))            // different second token
    val out = PhraseSearch.lookupPhrase(spark, path, Seq("spark", "join"))
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((4L, 2L, 1L), (1L, 1L, 2L)))
  }

  test("a repeated-word phrase counts overlapping starts") {
    val path = indexOf(Seq((7L, "go go go stop")))
    val out = PhraseSearch.lookupPhrase(spark, path, Seq("go", "go")).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((7L, 2L, 1L)))
  }

  test("an empty corpus serves an empty result, not a throw") {
    val path = indexOf(Seq.empty)
    assert(PhraseSearch.lookupPhrase(spark, path, Seq("spark", "join"))
      .collect().isEmpty)
  }

  test("gated entry is nonempty and the index scan is bucket-pruned") {
    val df = PhraseSearch.phraseSearch(spark, "/root/testdata/sf0.001")
    val scans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.exists(
      _.references.exists(_.name == "bucket"))),
      "positional postings scan missing the bucket partition filter")
    assert(df.count() > 0)
  }
}
