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

  /** q207: zone-map effectiveness audit — the measurement that
    * justifies q73's layout. Both candidate layouts cut the corpus into
    * [[ZmFiles]] equal-width key cells ("files"): the z layout on the
    * Morton key, the naive layout on the time bucket alone. For each
    * file the audit computes the (min,max) bounding box over BOTH
    * dimensions — exactly the min/max file statistics a parquet/Delta/
    * Iceberg reader prunes with — and counts what a mid-range 2-D
    * predicate box (the middle quartile-to-half of each observed
    * dimension range, derived from the data so the audit is
    * scale-independent) can SKIP. Time-sorting leaves every file
    * spanning the full value range, so the value half of the predicate
    * prunes nothing — the number this audit makes visible.
    *
    * Engine-exact: buckets, cell ids, boxes, and counts are exact
    * BIGINTs (equal-width cell id = ((key−min)·F) div (range+1); box
    * areas ≤ 2^32·files — int64-safe); the scan fraction is one
    * rounded division. Scale notes: one narrow codegen'd scan feeds a
    * map-combined global min/max (6 values), one map-combined
    * (layout, file) min/max aggregate, and a ≤ 2·[[ZmFiles]]-row
    * rollup — the same stats pass an OPTIMIZE job already does. */
  val ZmFiles = 64L

  def zonemapAudit(s: SparkSession, dir: String): DataFrame =
    zonemapAudit(Tables.events(s, dir))

  def zonemapAudit(events: DataFrame): DataFrame = {
    val b = events
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(hourBucket(col("ts")).as("tsb"), valueBucket(col("value")).as("vb"))
      .withColumn("z", interleave(col("tsb"), col("vb")))
    val mm = b.agg(min(col("tsb")).as("tmin"), max(col("tsb")).as("tmax"),
      min(col("vb")).as("vmin"), max(col("vb")).as("vmax"),
      min(col("z")).as("zmin"), max(col("z")).as("zmax"))
    val withMm = b.crossJoin(broadcast(mm))
    val files = withMm.select(
      explode(array(
        struct(lit("z_morton").as("layout"),
          expr(s"((z - zmin) * $ZmFiles) div (zmax - zmin + 1)").as("file_id"),
          col("tsb"), col("vb"),
          col("tmin"), col("tmax"), col("vmin"), col("vmax")),
        struct(lit("time").as("layout"),
          expr(s"((tsb - tmin) * $ZmFiles) div (tmax - tmin + 1)").as("file_id"),
          col("tsb"), col("vb"),
          col("tmin"), col("tmax"), col("vmin"), col("vmax")))).as("e"))
      .select(col("e.*"))
    val boxes = files.groupBy(col("layout"), col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("tsb")).as("min_t"), max(col("tsb")).as("max_t"),
        min(col("vb")).as("min_v"), max(col("vb")).as("max_v"),
        max(col("tmin")).as("tmin"), max(col("tmax")).as("tmax"),
        max(col("vmin")).as("vmin"), max(col("vmax")).as("vmax"))
      // predicate box: middle quartile-to-half of each dimension range
      .withColumn("t1", expr("tmin + (tmax - tmin) div 4"))
      .withColumn("t2", expr("tmin + (tmax - tmin) div 2"))
      .withColumn("v1", expr("vmin + (vmax - vmin) div 4"))
      .withColumn("v2", expr("vmin + (vmax - vmin) div 2"))
    val hit = col("max_t") >= col("t1") && col("min_t") <= col("t2") &&
      col("max_v") >= col("v1") && col("min_v") <= col("v2")
    boxes.groupBy(col("layout"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_rows")).as("n_rows"),
        sum(when(hit, 1L).otherwise(0L)).as("n_scanned_files"),
        sum(when(hit, col("n_rows")).otherwise(0L)).as("n_scanned_rows"),
        sum((col("max_t") - col("min_t") + 1L) * (col("max_v") - col("min_v") + 1L))
          .as("sum_box_area"))
      .select(col("layout"), col("n_files"), col("n_rows"),
        col("n_scanned_files"), col("n_scanned_rows"), col("sum_box_area"),
        round(col("n_scanned_rows").cast("double") / col("n_rows").cast("double"), 9)
          .as("scan_frac_r"))
      .orderBy(col("layout"))
  }

  /** q207 oracle: identical buckets, Morton terms, equal-width cells,
    * boxes, and predicate derivation. */
  def zonemapAuditOracleSql: String = {
    val terms = (0 until Bits).map { i =>
      s"(((tsb >> $i) & 1) << ${2 * i}) + (((vb >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
    s"""WITH b AS (SELECT
       |    (epoch_us(ts) // 3600000000) & $Mask AS tsb,
       |    CAST(floor(value * 10.0) AS BIGINT) & $Mask AS vb
       |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
       |z AS (SELECT tsb, vb, $terms AS z FROM b),
       |mm AS (SELECT MIN(tsb) AS tmin, MAX(tsb) AS tmax,
       |    MIN(vb) AS vmin, MAX(vb) AS vmax,
       |    MIN(z) AS zmin, MAX(z) AS zmax FROM z),
       |f AS (SELECT 'z_morton' AS layout,
       |    ((z - zmin) * $ZmFiles) // (zmax - zmin + 1) AS file_id, tsb, vb,
       |    tmin, tmax, vmin, vmax FROM z CROSS JOIN mm
       |  UNION ALL SELECT 'time',
       |    ((tsb - tmin) * $ZmFiles) // (tmax - tmin + 1), tsb, vb,
       |    tmin, tmax, vmin, vmax FROM z CROSS JOIN mm),
       |bx AS (SELECT layout, file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    MIN(tsb) AS min_t, MAX(tsb) AS max_t,
       |    MIN(vb) AS min_v, MAX(vb) AS max_v,
       |    MAX(tmin) + (MAX(tmax) - MAX(tmin)) // 4 AS t1,
       |    MAX(tmin) + (MAX(tmax) - MAX(tmin)) // 2 AS t2,
       |    MAX(vmin) + (MAX(vmax) - MAX(vmin)) // 4 AS v1,
       |    MAX(vmin) + (MAX(vmax) - MAX(vmin)) // 2 AS v2
       |  FROM f GROUP BY 1, 2),
       |h AS (SELECT *, CASE WHEN max_t >= t1 AND min_t <= t2
       |    AND max_v >= v1 AND min_v <= v2 THEN 1 ELSE 0 END AS hit FROM bx)
       |SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
       |  CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       |  CAST(SUM(hit) AS BIGINT) AS n_scanned_files,
       |  CAST(SUM(CASE WHEN hit = 1 THEN n_rows ELSE 0 END) AS BIGINT) AS n_scanned_rows,
       |  CAST(SUM((max_t - min_t + 1) * (max_v - min_v + 1)) AS BIGINT) AS sum_box_area,
       |  ROUND(CAST(SUM(CASE WHEN hit = 1 THEN n_rows ELSE 0 END) AS DOUBLE)
       |    / CAST(SUM(n_rows) AS DOUBLE), 9) AS scan_frac_r
       |FROM h GROUP BY layout ORDER BY layout""".stripMargin
  }
}
