package graft.tools

import java.time.LocalDateTime

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.{GraftSession, Tables}

/** Numeric-edge-injected copy of a fixture dir: `events` gains rows with
  * NaN / ±Infinity / ±1e308 / denormal-min measures, and `embeddings`
  * gains vectors with NaN, Infinity, and out-of-range components plus a
  * wrong-dimension vector.
  *
  * Under ANSI SQL (Spark 4's default) a single such row crashes every
  * exact-decimal aggregation with a cast overflow, and a NaN component
  * silently poisons every cosine/centroid downstream — so unlike the
  * other inject fixtures, the full gate is NOT expected to be green on
  * this one directly. The contract it proves is the boundary-validation
  * flow: q107/q108 (the quality gates) are value-gated ON this fixture,
  * and the full 108-query gate is green on the fixture produced by
  * writing the gates' output back ([[main]] with a third `gated` arg or
  * NumericGateSpec's flow).
  */
object NumericInject {

  val EventBase = 930000001L
  val VecBase = 940000001L

  val BadValues: Seq[Double] = Seq(Double.NaN, Double.PositiveInfinity,
    Double.NegativeInfinity, 1e308, -1e308, java.lang.Double.MIN_VALUE)

  def inject(spark: SparkSession, srcDir: String, outDir: String): Unit =
    Tables.names.foreach { n =>
      val base =
        if (n == "events") Tables.events(spark, srcDir) // ns→µs, see NullInject
        else spark.read.parquet(s"$srcDir/$n.parquet")
      import spark.implicits._
      val out = n match {
        case "events" =>
          val extra = BadValues.zipWithIndex.map { case (v, i) =>
            (EventBase + i, LocalDateTime.parse("2024-01-15T12:00:00").plusSeconds(i),
              EventBase, "num_edge", v, """{"k": 1}""")
          }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
            .select(base.columns.map(col): _*)
          base.unionByName(extra)
        case "embeddings" =>
          val dim = graft.operators.Similarity.Dim
          def vec(bad: Float, at: Int): Seq[Float] =
            Seq.tabulate(dim)(i => if (i == at) bad else 0.25f)
          val extra = Seq(
            (VecBase, vec(Float.NaN, 0), 0),
            (VecBase + 1, vec(Float.PositiveInfinity, 3), 0),
            (VecBase + 2, vec(Float.MaxValue, 7), 0),      // |x| > EmbBound
            (VecBase + 3, Seq.fill(5)(0.25f), 0))          // wrong dimension
            .toDF("vec_id", "embedding", "label")
            .select(base.columns.map(col): _*)
          base.unionByName(extra)
        case _ => base
      }
      out.write.mode("overwrite").parquet(s"$outDir/$n.parquet")
    }

  /** Writes the GATED view of an injected dir: events through q107's
    * predicate, embeddings through q108's (original columns kept),
    * everything else copied — the fixture downstream operators run on. */
  def writeGated(spark: SparkSession, injectedDir: String, outDir: String): Unit =
    Tables.names.foreach { n =>
      val base =
        if (n == "events") Tables.events(spark, injectedDir)
        else spark.read.parquet(s"$injectedDir/$n.parquet")
      val out = n match {
        case "events" =>
          import org.apache.spark.sql.functions.{abs, isnan}
          base.where(col("value").isNull ||
            (!isnan(col("value")) && abs(col("value")) < graft.operators.Curation.ValueBound))
        case "embeddings" =>
          import org.apache.spark.sql.functions.{abs, exists, isnan, size}
          import graft.functions.VectorOps.toDouble
          base.where(col("embedding").isNotNull &&
            size(col("embedding")) === graft.operators.Similarity.Dim &&
            !exists(toDouble(col("embedding")),
              x => isnan(x) || abs(x) > graft.operators.Curation.EmbBound))
        case _ => base
      }
      out.write.mode("overwrite").parquet(s"$outDir/$n.parquet")
    }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    try args match {
      case Array(src, out)          => inject(spark, src, out)
      case Array(src, out, "gated") => writeGated(spark, src, out)
    } finally spark.stop()
  }
}
