package graft

import org.apache.spark.sql.functions._
import graft.operators.Compact

/** q114's physical claims — the value round-trip is the oracle gate's
  * job; this spec pins what compaction is FOR: fewer files, disjoint
  * per-file time ranges (file-level pruning), losslessness. */
class CompactionSpec extends SparkTestBase {

  private def partFiles(dir: String): Seq[java.io.File] = {
    val d = new java.io.File(new java.net.URI(dir).getPath)
    d.listFiles().toSeq.filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
  }

  test("q114: compaction collapses the file count and keeps every row") {
    val base = Compact.compactionArtifact(spark, sfDir)
    val frag = partFiles(s"$base/frag")
    val comp = partFiles(s"$base/compact")
    assert(frag.size >= Compact.CompactFiles * 4,
      s"fragmented state not fragmented: ${frag.size} files")
    assert(comp.size <= Compact.CompactFiles)
    val n = Tables.events(spark, sfDir).count()
    assert(spark.read.parquet(s"$base/compact").count() === n)
  }

  test("q114: compacted file time ranges are disjoint-ordered (pruneable)") {
    val base = Compact.compactionArtifact(spark, sfDir)
    val ranges = partFiles(s"$base/compact").map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).collect().head
      (r.get(0), r.get(1))
    }.filter(r => r._1 != null) // an all-null or empty split has no range
      .map(r => (r._1.toString, r._2.toString))
      .sortBy(_._1)
    assert(ranges.nonEmpty)
    ranges.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) =>
        assert(hiA <= loB, s"overlapping file ranges: $hiA > $loB")
      case _ =>
    }
  }

  test("q114: the gated read round-trips the source value-for-value") {
    val src = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .orderBy("event_id").collect()
    val rt = Compact.compactRead(spark, sfDir).collect()
    assert(rt.toSeq === src.toSeq)
  }
}
