package graft

/** The standing "quarantine, don't crash" contract (round-6 task #8).
  *
  * NumericInject damages a fixture with NaN/±Inf/±1e308/denormal
  * measures and NaN/Inf/out-of-range/wrong-dimension embedding vectors —
  * the shapes a 100 TB ingest WILL contain. Under ANSI SQL a single such
  * row crashes exact-decimal aggregation, and one NaN component poisons
  * every cosine downstream, so the pipeline contract is: route inputs
  * through the boundary gates (q107 events, q108 embeddings), then run
  * everything else on the gated output. q107/q108 are value-gated on the
  * damaged fixture by the driver; THIS spec continuously proves the
  * other half — the full query surface runs green on the gates' output,
  * so the gates quarantine everything the operators can't absorb. */
class NumericGatedSweepSpec extends SparkTestBase {

  /** Damaged copy of sf0.001, then the gated view of it — the exact
    * `NumericInject <src> <out>` + `NumericInject <out> <gated> gated`
    * flow the verify harness drives, inlined so `sbt test` carries it. */
  lazy val gatedDir: String = {
    val injected = java.nio.file.Files.createTempDirectory("graft_numinj").toString
    val gated = java.nio.file.Files.createTempDirectory("graft_numgated").toString
    tools.NumericInject.inject(spark, sfDir, injected)
    tools.NumericInject.writeGated(spark, injected, gated)
    gated
  }

  test("the damaged rows really are quarantined by the gates") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, gatedDir)
    assert(ev.where(isnan(col("value")) || col("value") === Double.PositiveInfinity
      || col("value") === Double.NegativeInfinity).count() === 0L,
      "non-finite measures survived the q107 gate")
    val emb = Tables.embeddings(spark, gatedDir)
    assert(emb.where(size(col("embedding")) =!= graft.operators.Similarity.Dim)
      .count() === 0L, "wrong-dimension vectors survived the q108 gate")
    // and the gate kept every clean row — the source fixture plus the
    // injected values that legitimately satisfy the gate's predicate
    // (denormal-min is finite and in-range: valid data, not damage)
    val keptInjected = tools.NumericInject.BadValues.count(v =>
      !v.isNaN && !v.isInfinite && math.abs(v) < graft.operators.Curation.ValueBound)
    assert(ev.count() === Tables.events(spark, sfDir).count() + keptInjected)
    assert(emb.count() === Tables.embeddings(spark, sfDir).count())
  }

  test("all gated queries run green on the gate-quarantined fixture") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, gatedDir).collect(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(2).mkString(" / ")}")
        }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} queries crash on the gated fixture:\n  ${failures.mkString("\n  ")}")
  }
}
