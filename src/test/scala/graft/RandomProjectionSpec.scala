package graft

import graft.operators.RandomProjection

/** JL signed random projection (q190): sign-matrix determinism,
  * exact invariants (identical / negated vectors), degenerate
  * filtering, and a JL distortion-bound sanity sweep. */
class RandomProjectionSpec extends SparkTestBase {
  import spark.implicits._

  test("sign matrix is ±1, 64×16, and roughly balanced") {
    val s = RandomProjection.signs
    assert(s.length == 64 && s.forall(_.length == RandomProjection.R))
    assert(s.flatten.forall(x => x == 1 || x == -1))
    val plus = s.flatten.count(_ == 1)
    assert(plus > 400 && plus < 624, s"badly unbalanced sign matrix: $plus of 1024")
  }

  test("identical pair projects to cosine 1; negated pair to -1; err 0") {
    val v = Array.tabulate(64)(i => 0.01f * ((i % 7) + 1))
    val em = Seq((0L, v), (1L, v), (2L, v.map(x => -x)))
      .toDF("vec_id", "embedding")
    val out = RandomProjection.jlDistortion(em).collect()
    assert(out.length == 2)
    val p01 = out.find(_.getAs[Long]("vec_id_a") == 0L).get
    assert(p01.getAs[Double]("cos_orig_r") == 1.0)
    assert(p01.getAs[Double]("cos_proj_r") == 1.0)
    assert(p01.getAs[Double]("err_r") == 0.0)
    val p12 = out.find(_.getAs[Long]("vec_id_a") == 1L).get
    assert(p12.getAs[Double]("cos_orig_r") == -1.0)
    assert(p12.getAs[Double]("cos_proj_r") == -1.0)
    assert(p12.getAs[Double]("err_r") == 0.0)
  }

  test("zero vectors and missing neighbors produce no pairs") {
    val v = Array.tabulate(64)(i => (i + 1).toFloat)
    val em = Seq((0L, Array.fill(64)(0.0f)), (1L, v), (3L, v))
      .toDF("vec_id", "embedding")
    // (0,1): zero-norm side filtered; (1,2)/(2,3): no vec 2; (3,4): none
    assert(RandomProjection.jlDistortion(em).collect().isEmpty)
  }

  test("JL distortion stays small on random gaussian vectors") {
    val rnd = new scala.util.Random(7)
    val em = (0L until 40L)
      .map(i => (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val out = RandomProjection.jlDistortion(em).collect()
    assert(out.length == 39)
    val errs = out.map(_.getAs[Double]("err_r"))
    assert(errs.forall(e => e >= 0.0 && e <= 1.0))
    // R=16 gives ~1/sqrt(16) per-pair jitter on near-orthogonal
    // vectors; the mean over 39 pairs concentrates well below it
    assert(errs.sum / errs.length < 0.45,
      s"mean JL distortion ${errs.sum / errs.length}")
  }
}
