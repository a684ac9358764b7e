package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall-clock.
  *
  * Three passes: (1) warmup at the smallest SF — pays codegen/
  * footer-read/broadcast setup once so measurements reflect steady-state
  * execution, not first-run JIT; (2) the measured COLD pass at the target
  * SF (comparable to prior rounds' headline totals); (3) a second
  * measured WARM pass at the same SF, which isolates plan cost from
  * JVM/GC sequence noise (the r01 verdict flagged a 2.5× gap between the
  * in-sequence bench and per-query isolation timings).
  *
  * A query that throws is NOT silently timed: it is recorded as -1 in
  * `queries`, listed in `failed`, excluded from totals, and the process
  * exits nonzero so a broken query can't masquerade as a speedup. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val warmDir = "/root/testdata/sf0.001"
    val warmupDir =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(warmDir))) warmDir
      else sfDir
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmupDir).count()
      catch { case _: Throwable => () } // failures surface in the measured pass
    }

    def measure(): (Map[String, Double], List[String]) = {
      var failed = List.empty[String]
      val times = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        // queries are self-contained, so any persistent RDD still alive
        // between them is a leftover localCheckpoint block — drop it NOW
        // instead of waiting for the ContextCleaner, or block-manager
        // pressure grows across the 70+-query sequence and the warm pass
        // measures storage churn, not plan cost
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        // collect the previous queries' garbage OUTSIDE the timed section:
        // without this, mid-sequence queries absorb multi-second GC pauses
        // caused by earlier queries (r01 showed 42s vs 6.5s isolated for
        // the same plan) and the timings stop reflecting plan cost
        System.gc()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            failed ::= name
            false
          }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }.toMap
      (times, failed.reverse)
    }

    val (cold, failedCold) = measure()
    val (warm, failedWarm) = measure()
    val failed = (failedCold ++ failedWarm).distinct

    // The driver captures only a bounded tail of this process's stdout, so
    // the contract JSON line must stay SHORT: qNN keys (the contract's
    // example uses "q1"), 3-decimal timings, warm total as one scalar.
    // Full names + cold/warm detail go to stderr and target/bench_detail
    // .json for humans — round 2's full-fidelity line outgrew the capture
    // and the driver recorded parsed:null.
    // Locale.ROOT: a comma-decimal default locale would render "35,123"
    // and break the JSON
    def r3(v: Double): String =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def shortMap(m: Map[String, Double]): String =
      m.toSeq.sortBy(_._1)
        // key = the qNN prefix (up to the first underscore), not a fixed
        // take(3): "q100_x" must shorten to "q100", never collide with
        // "q10_y"'s "q10"
        .map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + r3(v) }
        .mkString("{", ",", "}")
    def fullMap(m: Map[String, Double]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    def total(m: Map[String, Double]): Double = m.values.filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // file only — sbt folds the forked process's stderr back into its
    // stdout log, so printing the long line anywhere would still reach
    // the driver's capture ahead of the compact contract line
    val detail = s"""{"metric":"total","value":${total(cold)},"unit":"sec"""" +
      s""","queries":${fullMap(cold)},"queries_warm":${fullMap(warm)}""" +
      s""","total_warm":${total(warm)},"failed":$failedJson,"sf":"$sfDir"}"""
    try {
      val out = java.nio.file.Paths.get("target", "bench_detail.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, detail.getBytes("UTF-8"))
    } catch { case _: Throwable => () } // detail dump is best-effort
    println(s"""{"metric":"total","value":${r3(total(cold))},"unit":"sec"""" +
      s""","queries":${shortMap(cold)},"total_warm":${r3(total(warm))}""" +
      s""","failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
