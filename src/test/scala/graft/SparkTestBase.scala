package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one per suite, lazy). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = {
    // explicit file:/// warehouse override: proves the ArtifactStore
    // config path end-to-end and keeps spec artifacts out of the shared
    // default warehouse (getOrCreate reuses the first session in this
    // JVM, so all suites share one temp warehouse per test run)
    val s = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .config("spark.graft.warehouse",
        java.nio.file.Files.createTempDirectory("graft_wh_spec").toUri.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}
