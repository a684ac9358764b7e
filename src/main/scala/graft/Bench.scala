package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall-clock.
  *
  * Passes: (1) warmup at the smallest SF — pays codegen/footer-read/
  * broadcast setup once so measurements reflect steady-state execution,
  * not first-run JIT; (2) the measured COLD pass at the target SF
  * (comparable to prior rounds' headline totals); (3) a second measured
  * WARM pass at the same SF **on a fresh SparkSession** — JIT and the
  * (JVM-static) codegen class cache stay hot, but block-manager/
  * broadcast/checkpoint state from the cold pass is gone. Round 3's warm
  * pass shared the session and measured exactly that accumulated state
  * (69.1s warm vs 55.1s cold, q79 3.5→10.3s): storage churn, not plan
  * cost. (4) the top-[[IsolatedN]] queries by cold time re-run one more
  * time, EACH on its own fresh session → target/bench_isolated.json, so
  * a regression in the in-sequence numbers is attributable to the plan
  * vs sequence noise without re-deriving it by hand.
  *
  * A query that throws is NOT silently timed: it is recorded as -1 in
  * `queries`, listed in `failed`, excluded from totals, and the process
  * exits nonzero so a broken query can't masquerade as a speedup.
  *
  * SPARK_GRAFT_REPEAT=K turns the warm pass into per-query
  * median-of-K (spread in bench_detail.json's `queries_warm_stats`);
  * `total_warm` is then the total-of-medians. */
object Bench {

  val IsolatedN = 10

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // scale-campaign knobs (unset in driver runs → behavior unchanged):
    // SKIP drops named queries (the deliberate exact-O(n²) oracle twins
    // at 100× data); ONLY restricts to the named queries (benching a
    // round's new adds at several SFs without re-running the inventory);
    // COLD_ONLY measures one pass, no warm/isolated re-runs — growth
    // RATIOS come from cold passes either way
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val coldOnly = sys.env.get("SPARK_GRAFT_COLD_ONLY").contains("1")
    // REPEAT=K (K ≥ 2): the steady-state (warm) pass runs each query K
    // times back-to-back and reports the per-query MEDIAN, with
    // {median,min,max} spread in bench_detail.json. Round 10 lost a day
    // to ±25 % machine variance (205.6/252.1/174.8 s on identical
    // code+data); medians-of-K make real regressions attributable
    // again. Unset (driver runs) → single-pass behavior unchanged.
    val repeat = sys.env.get("SPARK_GRAFT_REPEAT")
      .flatMap(v => scala.util.Try(v.toInt).toOption).filter(_ >= 2)
    val benchQueries = SparkEntry.queries
      .filterNot { case (n, _) => skip(n) }
      .filter { case (n, _) => only.forall(_.contains(n)) }
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    var spark = newSession()
    val warmDir = "/root/testdata/sf0.001"
    val warmupDir =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(warmDir))) warmDir
      else sfDir
    benchQueries.foreach { case (_, fn) =>
      try fn(spark, warmupDir).count()
      catch { case _: Throwable => () } // failures surface in the measured pass
    }

    def timeOne(s: SparkSession, name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        failed: String => Unit): Double = {
      // queries are self-contained, so any persistent RDD still alive
      // between them is a leftover localCheckpoint block — drop it NOW
      // (blocking, so removal can't bleed into the next timed section)
      // instead of waiting for the ContextCleaner
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      // collect the previous queries' garbage OUTSIDE the timed section:
      // without this, mid-sequence queries absorb multi-second GC pauses
      // caused by earlier queries (r01 showed 42s vs 6.5s isolated for
      // the same plan) and the timings stop reflecting plan cost
      System.gc()
      val t0 = System.nanoTime()
      try { fn(s, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        failed(name)
        -1.0
      }
    }

    def measure(s: SparkSession): (Map[String, Double], List[String]) = {
      var failed = List.empty[String]
      val times = benchQueries.toSeq.sortBy(_._1).map { case (name, fn) =>
        name -> timeOne(s, name, fn, failed ::= _)
      }.toMap
      (times, failed.reverse)
    }

    /** K back-to-back timings per query (repeat mode). A query that
      * fails ANY of its K runs is failed outright (-1 for all runs) —
      * a flake must not hide inside a median — and the remaining
      * repetitions are skipped: the result is already determined, so a
      * consistently failing query costs one run, not K. */
    def measureK(s: SparkSession, k: Int)
        : (Map[String, Seq[Double]], List[String]) = {
      var failed = List.empty[String]
      val times = benchQueries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val runs = Iterator.range(0, k)
          .map(_ => timeOne(s, name, fn, _ => ()))
          .takeWhile(_ >= 0).toSeq
        if (runs.size < k) { failed ::= name; name -> Seq.fill(k)(-1.0) }
        else name -> runs
      }.toMap
      (times, failed.reverse)
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    val (cold, failedCold) = measure(spark)
    // fresh session between passes: keeps JIT warm but drops accumulated
    // block-manager/broadcast state, so warm isolates PLAN cost
    spark.stop()
    // repeat mode: per-query K runs in the steady-state pass; warm =
    // the per-query MEDIANS, spread kept for the detail dump
    var warmRuns = Map.empty[String, Seq[Double]]
    val (warm, failedWarm) =
      if (coldOnly) (cold, List.empty[String])
      else {
        spark = newSession()
        val w = repeat match {
          case Some(k) =>
            val (runs, f) = measureK(spark, k)
            warmRuns = runs
            (runs.map { case (n, xs) =>
              n -> (if (xs.head < 0) -1.0 else median(xs)) }, f)
          case None => measure(spark)
        }
        spark.stop()
        w
      }
    val failed = (failedCold ++ failedWarm).distinct

    // isolated re-runs: top-N cold costs, each on its own fresh session
    val isolated: Seq[(String, Double)] =
      if (coldOnly) Seq.empty
      else cold.toSeq
        .filter(_._2 >= 0).sortBy(-_._2).take(IsolatedN).map(_._1).sorted
        .map { name =>
          val s = newSession()
          val t = timeOne(s, name, SparkEntry.queries(name), _ => ())
          s.stop()
          name -> t
        }

    // The driver captures only a bounded tail of this process's stdout, so
    // the contract JSON line must stay SHORT: qNN keys (the contract's
    // example uses "q1"), 3-decimal timings, warm total as one scalar.
    // Full names + cold/warm/isolated detail go to target/bench_detail
    // .json + bench_isolated.json for humans — round 2's full-fidelity
    // line outgrew the capture and the driver recorded parsed:null.
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
    def fullMap(m: Seq[(String, Double)]): String =
      m.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    def total(m: Map[String, Double]): Double = m.values.filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    def dump(rel: String, content: String): Unit =
      try {
        val out = java.nio.file.Paths.get("target", rel)
        java.nio.file.Files.createDirectories(out.getParent)
        java.nio.file.Files.write(out, content.getBytes("UTF-8"))
      } catch { case _: Throwable => () } // detail dumps are best-effort
    // repeat mode: per-query {median,min,max} so the campaign JSON
    // carries the spread (VERDICT r10 item 1)
    val statsJson = repeat.map { k =>
      val entries = warmRuns.toSeq.sortBy(_._1).map { case (n, xs) =>
        s""""$n":{"median":${r3(median(xs))},"min":${r3(xs.min)},"max":${r3(xs.max)}}"""
      }.mkString("{", ",", "}")
      s""","repeat":$k,"queries_warm_stats":$entries"""
    }.getOrElse("")
    dump("bench_detail.json",
      s"""{"metric":"total","value":${total(cold)},"unit":"sec"""" +
      s""","queries":${fullMap(cold.toSeq)},"queries_warm":${fullMap(warm.toSeq)}""" +
      s""","total_warm":${total(warm)},"failed":$failedJson,"sf":"$sfDir"$statsJson}""")
    dump("bench_isolated.json",
      s"""{"note":"top-$IsolatedN cold queries re-run on a fresh session each"""" +
      s""","sf":"$sfDir","queries_isolated":${fullMap(isolated)}}""")
    println(s"""{"metric":"total","value":${r3(total(cold))},"unit":"sec"""" +
      s""","queries":${shortMap(cold)},"total_warm":${r3(total(warm))}""" +
      s""","failed":$failedJson,"sf":"$sfDir"}""")
    if (failed.nonEmpty) sys.exit(1)
  }
}
