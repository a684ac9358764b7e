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
    * existence check and serve stale results. Resolved through the
    * Hadoop FileSystem API (works for hdfs:///s3a:// source dirs, not
    * just local fixtures); 64 bits of md5 over the metadata string, so
    * a cross-dir collision (which would silently serve the wrong cached
    * artifact) needs ~2^32 distinct source dirs, vs 2^16 for the 32-bit
    * String.hashCode this replaces. */
  def dirFingerprint(spark: SparkSession, dir: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val meta = names.map { n =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$n.parquet")
      scala.util.Try {
        val st = p.getFileSystem(conf).getFileStatus(p)
        s"$n:${st.getLen}:${st.getModificationTime}"
      }.getOrElse(s"$n:0:0")
    }
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest((dir + meta.mkString(",")).getBytes("UTF-8"))
    md.take(8).map(b => f"$b%02x").mkString
  }
}
