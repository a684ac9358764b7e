package graft.sources

import org.apache.spark.sql.DataFrame

/** Serving-side sinks (reference analog: curated→PostgreSQL JDBC export,
  * curated_to_postgres.py:50-75, and the Delta/MinIO medallion writes).
  *
  * Scale notes: partitioned parquet with sortWithinPartitions gives
  * partition-pruned, run-length-friendly files; JDBC export parallelism
  * is numPartitions connections writing batchsize-row inserts — the knobs
  * that matter at scale, assembled here so callers can't forget them. */
object Sinks {

  /** Write a frame as hive-partitioned parquet, sorted within partitions
    * on `sortCols` for downstream scan locality. */
  def writePartitionedParquet(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortCols.nonEmpty) df.sortWithinPartitions(sortCols.map(df.col): _*) else df
    sorted.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }

  /** JDBC export writer with explicit parallelism + batch size (the
    * curated→postgres shape). Connection is environment-provided; this
    * only assembles the write, so it is unit-testable up to `.save()`. */
  def jdbcWriter(df: DataFrame, url: String, table: String,
      numPartitions: Int = 8, batchSize: Int = 10000): org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] =
    df.repartition(numPartitions).write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .option("isolationLevel", "NONE")
}
