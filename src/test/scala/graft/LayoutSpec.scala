package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Data-layout operators: z-order key correctness + the locality claim
  * that justifies it. */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  private def mortonModel(a: Long, b: Long): Long =
    (0 until ZOrder.Bits).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.sum

  test("interleave matches the bitwise Morton model") {
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 3L))
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.interleave(col("a"), col("b")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) === mortonModel(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z-order layout prunes 2-D range queries to fewer files than a 1-D sort") {
    // 64×64 grid, 64 files of 64 rows: z-sorted files are 8×8 quad tiles,
    // a-sorted files are single-a columns spanning the FULL b range. An
    // 8×8 range query can intersect at most 4 tiles but always needs ≥8
    // of the column files — min/max file-statistics pruning is the whole
    // point of the curve, so files-touched is the metric (mean bounding-
    // box AREA is a wash at low file counts: both layouts give ~TV/n).
    val grid = for { a <- 0L until 64L; b <- 0L until 64L } yield (a, b)
    val withZ = grid.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.interleave(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def filesTouched(sorted: Array[(Long, Long, Long)],
        qa: (Long, Long), qb: (Long, Long)): Int =
      sorted.grouped(64).count { f =>
        val as = f.map(_._1); val bs = f.map(_._2)
        as.min <= qa._2 && as.max >= qa._1 && bs.min <= qb._2 && bs.max >= qb._1
      }
    val zSorted = withZ.sortBy(_._3)
    val aSorted = withZ.sortBy(t => (t._1, t._2))
    val rects = Seq(((0L, 7L), (0L, 7L)), ((4L, 11L), (12L, 19L)),
      ((20L, 27L), (36L, 43L)), ((51L, 58L), (17L, 24L)))
    rects.foreach { case (qa, qb) =>
      val zt = filesTouched(zSorted, qa, qb)
      val at = filesTouched(aSorted, qa, qb)
      assert(zt < at, s"rect $qa x $qb: z-order touched $zt files, 1-D sort $at")
      assert(zt <= 4) // an 8x8 query spans at most 2x2 of the 8x8 tiles
    }
  }

  test("q207 zonemap: a clustered 2-D grid prunes under z but not under time-sort") {
    import spark.implicits._
    import java.sql.Timestamp
    // 16x16 grid of (hour, value) cells, 4 rows each: under the z
    // layout every file is a tight tile; under time-sort every file
    // spans the full value range and the value predicate prunes nothing
    val rows = for {
      h <- 0 until 16; v <- 0 until 16; r <- 0 until 4
    } yield (Timestamp.valueOf(f"2024-01-${h / 24 + 1}%02d ${h % 24}%02d:00:00"),
      v * 3.0 + r * 0.01)
    val df = rows.toDF("ts", "value")
    val out = graft.operators.ZOrder.zonemapAudit(df).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    assert(out.keySet === Set("time", "z_morton"))
    val z = out("z_morton"); val t = out("time")
    assert(z.getAs[Long]("n_rows") == 1024L && t.getAs[Long]("n_rows") == 1024L)
    // the time layout reads >= the z layout, strictly more here
    assert(t.getAs[Long]("n_scanned_rows") > z.getAs[Long]("n_scanned_rows"))
    assert(z.getAs[Double]("scan_frac_r") < 0.5)
    // z tiles have (far) smaller total bounding-box area
    assert(z.getAs[Long]("sum_box_area") < t.getAs[Long]("sum_box_area"))
  }

  test("q207 zonemap: single-cell corpus degenerates to one always-scanned file") {
    import spark.implicits._
    import java.sql.Timestamp
    val df = Seq.fill(8)((Timestamp.valueOf("2024-01-01 05:00:00"), 7.0))
      .toDF("ts", "value")
    val out = graft.operators.ZOrder.zonemapAudit(df).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_files") == 1L)
      assert(r.getAs[Long]("n_scanned_files") == 1L)
      assert(r.getAs[Double]("scan_frac_r") == 1.0)
      assert(r.getAs[Long]("sum_box_area") == 1L)
    }
  }
}
