package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Bucketed co-located join (q210): layout-invariant values, build-once
  * artifact reuse, one file per bucket. */
class BucketingSpec extends SparkTestBase {

  test("q210 values are layout-invariant: bucketed join equals plain join") {
    val bucketed = Bucketing.bucketedJoin(spark, sfDir).collect()
    val plain = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,4)")).cast("double").as("revenue"))
      .orderBy("c_custkey")
      .collect()
    assert(bucketed.toSeq == plain.toSeq)
  }

  test("layout is build-once: a second call re-attaches the same files") {
    Bucketing.bucketedJoin(spark, sfDir).count()
    val root = ArtifactStore.warehouseRoot(spark)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def snapshot() = fs.listStatus(root).map(s =>
      (s.getPath.getName, s.getModificationTime)).toSet
    val before = snapshot()
    Bucketing.bucketedJoin(spark, sfDir).count()
    assert(snapshot() == before, "second run must not rebuild the layout")
  }

  test("each bucket lands as one file (read-side merge stays trivial)") {
    val (orders, _) = Bucketing.tablesFor(spark, sfDir)
    orders.count() // force build
    val fp = Tables.dirFingerprint(spark, sfDir)
    val root = ArtifactStore.warehouseRoot(spark)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(root, s"bucketed_orders_bk1_$fp")
    val dataFiles = fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
    assert(dataFiles.length == Bucketing.Buckets,
      s"expected ${Bucketing.Buckets} bucket files, got ${dataFiles.length}: " +
        dataFiles.mkString(", "))
  }
}
