package graft

/** Every gated query must survive a ZERO-ROW input fixture.
  *
  * At production scale an empty input is not exotic — a corpus filter
  * that matches nothing, a daily batch with no new files, a partition
  * predicate that prunes every file. Operators that collect a bounded
  * driver-side model (k-means centroids, SemDeDup cells, IVF index,
  * heavy-hitter sketches) are exactly the ones tempted to index into an
  * empty array; this sweep pins the contract: empty in → empty (or
  * schema-stable degenerate) out, never a throw.
  */
class EmptyInputSpec extends SparkTestBase {

  /** Zero-row copies of every fixture table, schema preserved (parquet
    * keeps schema for empty writes — SPARK-23271). */
  lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_sf").toString
    Tables.names.foreach { n =>
      spark.read.parquet(s"$sfDir/$n.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  test("all gated queries survive a zero-row fixture") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).collect(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(2).mkString(" / ")}")
        }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} queries crash on empty input:\n  ${failures.mkString("\n  ")}")
  }
}
