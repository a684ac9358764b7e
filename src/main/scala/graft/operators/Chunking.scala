package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Overlapping sliding-window document chunking — the RAG / long-context
  * preprocessing step: split each document into fixed-size word windows
  * with stride overlap, one output row per chunk, so downstream
  * embedding / indexing (q27/q65/q72) operates on retrieval-sized
  * passages instead of whole documents (reference analog: the per-item
  * text assembly fed to CLIP at extracting_embeddings.py:135-152, which
  * truncates instead of chunking and loses everything past the window).
  *
  * Scale notes: entirely narrow — split, sequence, explode, slice are
  * all codegen'd per-row work with NO shuffle (the presentation sort is
  * the only exchange, and real consumers drop it). Output size is
  * n_words/stride rows per doc, known up front; no driver involvement.
  */
object Chunking {

  val Window = 40  // words per chunk
  val Stride = 30  // window start spacing (10-word overlap)

  /** q75: (doc_id, chunk_idx, n_words, chunk_text) for every document
    * with non-null text; short docs yield exactly one (possibly short)
    * chunk, so no content is ever dropped. */
  def docChunks(s: SparkSession, dir: String): DataFrame =
    docChunks(Tables.documents(s, dir))

  def docChunks(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), TextAnalysis.words(col("text")).as("ws"))
      .withColumn("n", size(col("ws")).cast("long"))
      .withColumn("nc",
        when(col("n") <= Window, lit(1L))
          .otherwise(ceil((col("n") - Window) / lit(Stride.toDouble)).cast("long") + 1L))
      .select(col("doc_id"), col("ws"), col("n"),
        explode(sequence(lit(0L), col("nc") - 1L)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        least(lit(Window.toLong), col("n") - col("chunk_idx") * Stride).as("n_words"),
        array_join(slice(col("ws"), (col("chunk_idx") * Stride + 1).cast("int"),
          lit(Window)), " ").as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")

  /** q75 oracle: same split / window arithmetic / inclusive slice. */
  def chunkOracleSql: String =
    s"""WITH w AS (SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
       |  FROM documents WHERE text IS NOT NULL),
       |c AS (SELECT doc_id, ws, len(ws) AS n,
       |    unnest(generate_series(0, CASE WHEN len(ws) <= $Window THEN 0
       |      ELSE CAST(ceil((len(ws) - $Window) / ${Stride}.0e0) AS BIGINT) END)) AS chunk_idx
       |  FROM w)
       |SELECT doc_id, chunk_idx,
       |  least($Window, n - chunk_idx * $Stride) AS n_words,
       |  array_to_string(ws[chunk_idx * $Stride + 1 : chunk_idx * $Stride + $Window], ' ') AS chunk_text
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
}
