package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingestion-side source shaping (reference analog: the Kafka JSON
  * consumers, metadata_eu_to_raw.py:53-112 — `value` payload →
  * schema-applied columns + ingestion metadata, identical code for batch
  * backfill and the live stream).
  *
  * Scale notes: from_json with an explicit schema is a narrow codegen'd
  * projection; corrupt records surface as NULL structs routed to a
  * quarantine filter instead of killing the job. Never infer schemas on
  * the hot path — inference is a full extra scan and nondeterministic
  * under schema drift. */
object Ingest {

  /** Parse a Kafka-shaped envelope (key/value/timestamp[/topic/partition/
    * offset]) into typed columns. Works on batch frames and readStream
    * frames alike. Malformed payloads yield NULL parsed columns and are
    * kept (flagged) so the caller can quarantine them. */
  def parseJsonEnvelope(raw: DataFrame, schema: StructType): DataFrame = {
    val parsed = raw
      .withColumn("__payload", from_json(col("value").cast("string"), schema))
      .withColumn("ingestion_time", col("timestamp"))
    // PERMISSIVE from_json yields an all-NULL struct for malformed input
    // (never a NULL struct), so "malformed" = payload present but no
    // field parsed
    val anyFieldParsed = schema.fieldNames
      .map(f => col(s"__payload.$f").isNotNull)
      .reduce(_ || _)
    schema.fieldNames.foldLeft(
        parsed.withColumn("is_malformed", col("value").isNotNull && !anyFieldParsed))(
        (d, f) => d.withColumn(f, col(s"__payload.$f")))
      .drop("__payload", "value")
  }

  /** Schema-enforced JSON file reader (batch). FAILFAST surfaces drift
    * immediately instead of silently nulling columns. */
  def readJson(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Schema-enforced CSV reader (batch). */
  def readCsv(s: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    s.read.schema(schema).option("header", header.toString)
      .option("mode", "FAILFAST").csv(path)

  /** Streaming JSON-lines directory source with the same schema contract
    * (file-based stand-in for the Kafka source in this environment). */
  def readJsonStream(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.readStream.schema(schema).json(path)

  /** Kafka streaming source wired the way the reference consumers are
    * (metadata_eu_to_raw.py:53-71): subscribe to a topic, replay from
    * `startingOffsets`, and bound each micro-batch with
    * `maxOffsetsPerTrigger` (backpressure — without it the first batch
    * after downtime swallows the whole backlog). The returned frame is
    * the raw envelope (key/value/timestamp/topic/partition/offset), ready
    * for [[parseJsonEnvelope]].
    *
    * Needs the spark-sql-kafka connector jar at runtime; this environment
    * has neither Kafka nor the connector, so specs drive
    * [[readJsonStream]] + [[parseJsonEnvelope]] over the identical
    * envelope contract instead (compile-level coverage only here). */
  def readKafkaStream(s: SparkSession, bootstrapServers: String, topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = true): DataFrame = {
    val base = s.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("failOnDataLoss", failOnDataLoss.toString)
    maxOffsetsPerTrigger
      .foldLeft(base)((b, n) => b.option("maxOffsetsPerTrigger", n.toString))
      .load()
  }
}
