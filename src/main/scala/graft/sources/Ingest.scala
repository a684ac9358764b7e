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
}
