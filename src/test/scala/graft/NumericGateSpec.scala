package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.Curation

/** q107/q108 — the numeric boundary-validation gates. Under ANSI SQL one
  * NaN/Inf/1e308 measure kills a whole exact-decimal aggregation job;
  * the gates quarantine exactly those rows. The value gates run
  * out-of-band on the NumericInject fixture (see SURVEY §6); this spec
  * pins the predicate row-for-row.
  */
class NumericGateSpec extends SparkTestBase {
  import spark.implicits._

  test("q107: quarantines NaN/Inf/out-of-range measures, keeps NULL and finite") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val ts = java.sql.Timestamp.valueOf("2024-01-15 12:00:00")
    val rows = Seq[(Long, Double)](
      (1L, 1.5), (2L, Double.NaN), (3L, Double.PositiveInfinity),
      (4L, Double.NegativeInfinity), (5L, 1e308), (6L, -1e308),
      (7L, java.lang.Double.MIN_VALUE), (8L, -Curation.ValueBound * 2))
      .map { case (id, v) => Row(id, ts, 1L, "t", v, "{}") } :+
      Row(9L, ts, 1L, "t", null, "{}")
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val kept = Curation.eventsGate(df).collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 7L, 9L), "finite in-range, denormal-min, and NULL pass")
  }

  test("q108: drops NaN/Inf/out-of-range components, wrong dims, and NULL vectors") {
    val dim = graft.operators.Similarity.Dim
    def vec(bad: Float, at: Int): Seq[Float] =
      Seq.tabulate(dim)(i => if (i == at) bad else 0.25f)
    val good = Seq.fill(dim)(0.5f)
    val df = Seq(
      (1L, Option(good)),
      (2L, Option(vec(Float.NaN, 0).toSeq)),
      (3L, Option(vec(Float.PositiveInfinity, 5).toSeq)),
      (4L, Option(vec(Float.MaxValue, 9).toSeq)),
      (5L, Option(Seq.fill(5)(0.25f))),
      (6L, Option.empty[Seq[Float]])
    ).toDF("vec_id", "embedding")
    val out = Curation.embeddingsGate(df).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    // norm of the all-0.5 vector = 0.5 * sqrt(dim), exactly
    assert(out.head.getDouble(2) === BigDecimal(0.5 * math.sqrt(dim))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
