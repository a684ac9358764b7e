package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the test star schema + document/embedding tables.
  *
  * Plain parquet scans: Catalyst pushes filters and prunes columns into
  * these, so callers should NOT cache or materialize here — compose lazily
  * and let the optimizer see the whole plan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark only reads
    * via spark.sql.legacy.parquet.nanosAsLong=true (set in GraftSession /
    * Verify / Bench). The nanos in the test data are µs-aligned, so the
    * integer-division conversion back to a timestamp is lossless. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Cache key for per-source-dir persisted artifacts (the q72 IVF
    * index, q46/q87's pair table, q82's snapshots): fingerprints the
    * path PLUS each table file's (size, mtime), so regenerated source
    * data — same path, new content — can never satisfy an artifact's
    * existence check and serve stale results. Local-FS fixtures only;
    * production callers pass explicit artifact paths instead. */
  def dirFingerprint(dir: String): String = {
    val meta = names.map { n =>
      val f = new java.io.File(s"$dir/$n.parquet")
      s"$n:${f.length}:${f.lastModified}"
    }
    java.lang.Long.toHexString((dir + meta.mkString(",")).hashCode.toLong & 0xffffffffL)
  }
}
