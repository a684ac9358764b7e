package graft

/** Every gated query must survive a NULL-PAYLOAD fixture.
  *
  * [[graft.tools.NullInject]] appends rows whose key columns are fresh
  * non-null ids but whose payload columns (text, embedding, timestamps,
  * measures, facets) are all NULL — the shape of real 100 TB ingest
  * damage (scraped doc with no body, embedding that failed to compute,
  * event with no timestamp). The clean driver fixtures never exercise
  * those rows, so a lambda that dereferences a null payload passes every
  * value gate and still NPEs in production.
  *
  * This sweep pins the floor contract: null payloads never throw. The
  * stronger value contract (engine ≡ DuckDB oracle ON the injected
  * fixture) is run out-of-band via `graft.Verify` + tools/check.py
  * against a NullInject'd dir — see SURVEY §6.
  */
class NullPayloadSpec extends SparkTestBase {

  lazy val nullDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_null_sf").toString
    graft.tools.NullInject.inject(spark, sfDir, dir)
    dir
  }

  test("all gated queries survive a null-payload fixture") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, nullDir).collect(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(2).mkString(" / ")}")
        }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} queries crash on null payloads:\n  ${failures.mkString("\n  ")}")
  }
}
