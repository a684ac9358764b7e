package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.operators.{IvfPq, PqOp}

/** IVF-PQ (q188): degenerate-equality with q111, indexed ≡ inline,
  * partition-pruned serving scan, and probe-masking behavior. */
class IvfPqSpec extends SparkTestBase {
  import spark.implicits._

  /** PqSpec's planted geometry: two tight clusters on different axes —
    * coarse cells separate them, so small nprobe keeps the far cluster
    * out of every candidate set. */
  private lazy val planted = {
    def v(axis: Int, jitter: Int): Array[Float] = {
      val a = Array.fill(64)(0.0f)
      a(axis) = 10.0f
      a((axis + 7) % 64) = 0.01f * jitter
      a
    }
    val head = (0 until PqOp.Ks).map(i => (i.toLong, v(i % 4, i)))
    val clusterA = (20 until 26).map(i => (i.toLong, v(0, i - 20)))
    val clusterB = (30 until 36).map(i => (i.toLong, v(32, i - 30)))
    (head ++ clusterA ++ clusterB).toDF("vec_id", "embedding")
  }

  test("nprobe = NList degenerates to q111's full ADC ranking, bit-for-bit") {
    val em = Tables.embeddings(spark, sfDir)
    val full = PqOp.pqAdcTopK(em).collect().toSeq
    val ivf = IvfPq.ivfpqTopK(em, IvfPq.NList).collect().toSeq
    assert(ivf == full)
  }

  test("gated indexed path equals the inline twin") {
    val indexed = IvfPq.ivfpqTopK(spark, sfDir).collect().toSeq
    val inline = IvfPq.ivfpqTopK(Tables.embeddings(spark, sfDir), IvfPq.NProbe)
      .collect().toSeq
    assert(indexed == inline)
    // repeat call serves the same artifact — identical again
    assert(IvfPq.ivfpqTopK(spark, sfDir).collect().toSeq == indexed)
  }

  test("serving scan reads the codes artifact with a cell partition filter") {
    val df = IvfPq.ivfpqTopK(spark, sfDir)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }
    val codeScans = scans.filter(
      _.relation.location.rootPaths.exists(_.toString.contains("ivfpq_")))
    assert(codeScans.nonEmpty, s"no ivfpq artifact scan in:\n${scans.map(_.relation.location.rootPaths.mkString).mkString("\n")}")
    assert(codeScans.forall(_.partitionFilters.exists(
      _.references.exists(_.name == "cell"))),
      "codes scan missing the cell partition-pruning filter")
    // the embeddings TABLE is read only for the NQ query rows, never
    // scanned by the serving projection: every other scan must carry a
    // vec_id pushdown, not a full-corpus read of the vectors
    val emScans = scans.filterNot(
      _.relation.location.rootPaths.exists(_.toString.contains("ivfpq_")))
    assert(emScans.forall(_.dataFilters.nonEmpty))
  }

  test("small nprobe keeps the far cluster out (probe masking works)") {
    val out = IvfPq.ivfpqTopK(planted, 2).collect()
    val q0 = out.filter(_.getAs[Long]("query_id") == 0L)
      .sortBy(_.getAs[Long]("rank"))
    assert(q0.nonEmpty)
    assert(!q0.map(_.getAs[Long]("neighbor_id")).exists(id => id >= 30L && id < 36L),
      "far-cluster candidate leaked through a 2-cell probe")
  }

  test("empty and degenerate corpora serve typed-empty") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val out = IvfPq.ivfpqTopK(empty)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq ==
      Seq("query_id", "neighbor_id", "rank", "dist_r"))
    val zeros = Seq((0L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding")
    assert(IvfPq.ivfpqTopK(zeros).collect().isEmpty)
  }
}
