package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Z-order (Morton) clustering key for multi-dimensional data layout —
  * the curve behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleaving
  * the bits of two dimension buckets gives a 1-D sort key under which
  * points close in BOTH dimensions land close on disk, so every file
  * holds a tight (dim1, dim2) bounding box and min/max file statistics
  * prune 2-D range predicates — a plain single-column sort leaves every
  * file spanning the full range of the other dimension.
  *
  * Scale notes: the key is a narrow integer projection on the scan (32
  * shift-mask terms, whole-stage codegen'd); laying data out is then
  * `repartitionByRange(z)` + write, the same one-shuffle cost as any
  * sorted write. Bit arithmetic only — any engine reproduces the key,
  * which is what the q73 oracle does. The locality claim itself is
  * spec-quantified (mean per-file bounding-box area, z-sort vs
  * time-sort). */
object ZOrder {

  val Bits = 16
  val Mask = (1L << Bits) - 1

  /** Morton-interleave two [0, 2^Bits) bucket columns: bit i of `a` →
    * bit 2i, bit i of `b` → bit 2i+1. */
  def interleave(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Hour bucket of an event timestamp, folded to Bits. */
  def hourBucket(ts: Column): Column =
    expr("unix_micros(ts) div 3600000000").bitwiseAND(lit(Mask))

  /** Decimal-bucketed value dimension, folded to Bits. */
  def valueBucket(v: Column): Column =
    floor(v * 10.0).cast("long").bitwiseAND(lit(Mask))

  /** q73: z-order key per event over the (hour, value) dimensions. */
  def zorderEvents(s: SparkSession, dir: String): DataFrame =
    zorderEvents(Tables.events(s, dir))

  def zorderEvents(events: DataFrame): DataFrame =
    events.select(col("event_id"),
        hourBucket(col("ts")).as("tsb"),
        valueBucket(col("value")).as("vb"))
      .withColumn("z", interleave(col("tsb"), col("vb")))
      .orderBy("event_id")

  /** q73 oracle: identical bucket and interleave arithmetic. */
  def zorderOracleSql: String = {
    val terms = (0 until Bits).map { i =>
      s"(((tsb >> $i) & 1) << ${2 * i}) + (((vb >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
    s"""WITH b AS (SELECT event_id,
       |  (epoch_us(ts) // 3600000000) & $Mask AS tsb,
       |  CAST(floor(value * 10.0) AS BIGINT) & $Mask AS vb
       | FROM events)
       |SELECT event_id, tsb, vb, $terms AS z
       |FROM b ORDER BY event_id""".stripMargin
  }
}
