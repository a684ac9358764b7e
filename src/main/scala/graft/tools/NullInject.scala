package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

import graft.{GraftSession, Tables}

/** Null-injected copy of a fixture dir: every table gains a handful of
  * rows whose KEY columns carry fresh non-null ids but whose payload
  * columns are all NULL.
  *
  * At 100 TB this is not a corner case — scraped documents with no
  * body, embedding rows whose vector failed to compute, events with no
  * timestamp. The clean driver fixtures never exercise those rows, so
  * an operator can pass every value gate and still NPE in production
  * the first time a lambda dereferences a null payload. This tool makes
  * the scenario a first-class fixture: run `graft.Verify` + the DuckDB
  * oracle compare against the injected dir and the null semantics of
  * BOTH engines are value-gated, not just "doesn't throw".
  *
  * Key columns (kept non-null, fresh values far above any fixture id):
  * `*key` (TPC-H primary/foreign keys) and `*_id` — a null PRIMARY key
  * row is garbage a real ingest would reject, whereas a null payload is
  * data you must survive. Everything else becomes NULL.
  */
object NullInject {

  val InjectRows = 3
  /** Fresh-key base: far above every fixture id at any SF in use. */
  val KeyBase = 900000001L

  private def freshKey(dt: DataType, i: Int): Any = dt match {
    case LongType    => KeyBase + i
    case IntegerType => (KeyBase + i).toInt
    case other       => throw new IllegalArgumentException(
      s"key column of unhandled type $other")
  }

  def isKeyCol(name: String): Boolean =
    name.endsWith("key") || name.endsWith("_id")

  /** Write the injected copy of `srcDir` into `outDir` (one
    * `<table>.parquet` per fixture table, same schema). */
  def inject(spark: SparkSession, srcDir: String, outDir: String): Unit =
    Tables.names.foreach { n =>
      // events: the fixture stores TIMESTAMP(NANOS), which Spark reads as
      // Long and can't write back as nanos — the DuckDB oracle side would
      // then see a bare INT64. Route through Tables.events (lossless
      // µs conversion, the data is µs-aligned) so both engines keep
      // reading a timestamp.
      val base =
        if (n == "events") Tables.events(spark, srcDir)
        else spark.read.parquet(s"$srcDir/$n.parquet")
      val rows = (0 until InjectRows).map { r =>
        Row.fromSeq(base.schema.fields.map { f =>
          if (isKeyCol(f.name)) freshKey(f.dataType, r) else null
        }.toSeq)
      }
      base.unionByName(
          spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), base.schema))
        .write.mode("overwrite").parquet(s"$outDir/$n.parquet")
    }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir) = args.take(2)
    val spark = GraftSession.builder().getOrCreate()
    try inject(spark, srcDir, outDir)
    finally spark.stop()
  }
}
