package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.operators.{IvfPq, PqOp}

/** IVF-PQ (q188/q198): residual-vs-raw recall, seed hardening,
  * indexed ≡ inline, partition-pruned serving scan, probe masking. */
class IvfPqSpec extends SparkTestBase {
  import spark.implicits._

  /** recall@TopK of an inline IVF-PQ variant against exact-cosine
    * truth, both computed on the same frame. */
  private def recallOf(em: org.apache.spark.sql.DataFrame,
      byResidual: Boolean, nprobe: Int = IvfPq.NProbe): Double = {
    val truth = PqOp.exactTruthTopK(em).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = IvfPq.ivfpqTopK(em, nprobe, byResidual).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    if (truth.isEmpty) 1.0
    else truth.intersect(got).size.toDouble / truth.size
  }

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

  test("residual codes recall ≥ raw codes at the same nprobe " +
      "(corpus and planted fixtures)") {
    val em = Tables.embeddings(spark, sfDir)
    val corpusRes = recallOf(em, byResidual = true)
    val corpusRaw = recallOf(em, byResidual = false)
    assert(corpusRes >= corpusRaw,
      s"corpus: residual $corpusRes < raw $corpusRaw")
    val plantedRes = recallOf(planted, byResidual = true)
    val plantedRaw = recallOf(planted, byResidual = false)
    assert(plantedRes >= plantedRaw,
      s"planted: residual $plantedRes < raw $plantedRaw")
    assert(plantedRes > 0.0, "residual variant found nothing")
  }

  test("coarse seed survives a boilerplate-duplicate id-prefix " +
      "(the q104 degenerate-prefix shape)") {
    // ids 0..15 — exactly the old `vec_id < NList` seed range — are ONE
    // repeated vector; the real structure lives at ids 100+: 4
    // orthogonal clusters of 16. First-N seeding handed Lloyd 16 copies
    // of one point (ties collapse every vector into the lowest cell);
    // the md5-scrambled seed samples across the id space instead.
    def v(axis: Int, jitter: Int): Array[Float] = {
      val a = Array.fill(64)(0.0f)
      a(axis) = 10.0f
      a((axis + 5) % 64) = 0.02f * jitter
      a
    }
    val dup = (0 until IvfPq.MinNList).map(i => (i.toLong, v(0, 0)))
    val rest = for (c <- 0 until 4; j <- 0 until 16)
      yield ((100 + c * 16 + j).toLong, v(8 + c * 12, j))
    val em = (dup ++ rest).toDF("vec_id", "embedding")
    val qv = PqOp.unitQuantized(em)
    val cents = IvfPq.trainCoarse(qv)
    val distinctCents = cents.map(_._2).distinct.size
    assert(distinctCents >= 4,
      s"seeds collapsed to $distinctCents distinct centroids")
    val cellsUsed = graft.operators.KMeansOp.assign(qv, cents)
      .select("cell").distinct().count()
    assert(cellsUsed >= 4, s"assignment collapsed to $cellsUsed cells")
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
