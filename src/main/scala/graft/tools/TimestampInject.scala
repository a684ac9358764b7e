package graft.tools

import java.time.LocalDateTime

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, Tables}

/** Timestamp-edge-injected copy of a fixture dir: the `events` table
  * gains rows at the classic ingest-damage instants — epoch zero,
  * PRE-1970 (negative epoch micros), a 1900 sentinel date, leap day,
  * and far future.
  *
  * The driver fixture spans one month of 2024, so every temporal
  * operator's window arithmetic is only ever exercised on positive
  * epoch values. Negative epochs are where engines classically diverge:
  * tumbling/hopping bucketing via integer division truncates toward
  * zero in one engine and floors in another, date truncation and
  * strftime disagree around year boundaries before 1970. Running the
  * full oracle gate on this fixture value-checks those planes the same
  * way [[NullInject]]/[[UnicodeInject]] gate theirs.
  */
object TimestampInject {

  val EventBase = 920000001L

  /** Edge instants (µs precision — the storage precision of the
    * fixture): pre-1970, epoch 0, 1900 sentinel, moon landing with
    * fractional seconds, leap day 2000, far future. */
  val Samples: Seq[LocalDateTime] = Seq(
    LocalDateTime.parse("1969-12-31T23:59:59.123456"),
    LocalDateTime.parse("1970-01-01T00:00:00"),
    LocalDateTime.parse("1900-06-15T12:00:00"),
    LocalDateTime.parse("1969-07-20T20:17:40.500"),
    LocalDateTime.parse("2000-02-29T00:00:00.000001"),
    LocalDateTime.parse("2200-01-01T00:00:00"))

  def inject(spark: SparkSession, srcDir: String, outDir: String): Unit =
    Tables.names.foreach { n =>
      val base =
        if (n == "events") Tables.events(spark, srcDir) // ns→µs, see NullInject
        else spark.read.parquet(s"$srcDir/$n.parquet")
      val out =
        if (n == "events") {
          import spark.implicits._
          val extra = Samples.zipWithIndex.map { case (t, i) =>
            (EventBase + i, t, EventBase, "ts_edge", i + 0.5, "edge")
          }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
            .select(base.columns.map(org.apache.spark.sql.functions.col): _*)
          base.unionByName(extra)
        } else base
      out.write.mode("overwrite").parquet(s"$outDir/$n.parquet")
    }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir) = args.take(2)
    val spark = GraftSession.builder().getOrCreate()
    try inject(spark, srcDir, outDir)
    finally spark.stop()
  }
}
