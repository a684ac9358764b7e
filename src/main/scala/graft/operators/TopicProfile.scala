package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Cluster topic profiling: label each k-means cell with its top
  * c-TF-IDF terms (Grootendorst 2022's BERTopic labeling step, binary
  * per-doc tf variant) — the "what IS this cluster" readout a curation
  * team runs after any embedding clustering (q63) to decide which
  * clusters to keep, merge, or drop. The reference browses galleries by
  * facet (app.py's panels); this produces those facet labels from the
  * embedding space itself.
  *
  * Chain: q63's deterministic Lloyd cells over `embeddings` (doc_id ≡
  * vec_id, the q162 cross-modal convention) × q69's tokenization and
  * quantized-idf conventions over `documents`. Per cell, terms rank by
  * score = tf_cell · idf_q where tf_cell counts member DOCS containing
  * the term (binary tf — robust to one spammy doc) and idf_q is the
  * corpus-wide micro-nat idf (round(ln((N+1)/(df+1))·10⁶) — integral,
  * so every score is exact integer arithmetic); ties break on the
  * term's folded md5 hash exactly like q69.
  *
  * Scale notes: the (doc, term) frame is occurrence-sized and
  * aggregates with map-side combine; the cells join is id-keyed; the
  * per-cell ranking is the bounded-heap TopKSimId aggregate (≤ K rows
  * per partition-cell enter the shuffle, no window sort); df skew
  * (Zipf) rides AQE exactly as q69. */
object TopicProfile {

  val K = 5
  private val HashFold = 1125899906842624L // 2^50, the q69 fold

  def clusterTerms(s: SparkSession, dir: String): DataFrame =
    clusterTerms(Tables.documents(s, dir), Tables.embeddings(s, dir))

  def clusterTerms(docs: DataFrame, embeddings: DataFrame): DataFrame = {
    val (qv, cents) = KMeansOp.trainCents(embeddings)
    val cells = KMeansOp.assignAuto(qv, cents)
      .select(col("vec_id"), col("cell"))
    // distinct (doc, term): binary per-doc tf; read by the cell tf AND
    // the corpus df, so materialized once
    val td = docs
      .select(col("doc_id"), explode(TextAnalysis.words(col("text"))).as("tok"))
      .distinct()
      .localCheckpoint()
    val df = td.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val idf = df.crossJoin(broadcast(nDocs))
      .select(col("tok"),
        round(log((col("n_docs").cast("double") + lit(1.0)) /
          (col("df").cast("double") + lit(1.0))) * 1e6).as("idf_q"))
    val ctf = td.join(cells, td("doc_id") === cells("vec_id"))
      .groupBy(col("cell"), col("tok")).agg(count(lit(1)).as("tf_cell"))
    val scored = ctf.join(idf, Seq("tok"))
      .select(col("cell"), col("tok"),
        (TextAnalysis.md5Long(col("tok")) % HashFold).as("tok_hash"),
        (col("tf_cell").cast("double") * col("idf_q")).as("score"))
      .localCheckpoint() // read by the heap ranking and the recovery join
    val top = scored.groupBy(col("cell"))
      .agg(Similarity.topKAgg(col("score"), col("tok_hash"), K).as("tk"))
      .select(col("cell"), posexplode(col("tk")))
      .select(col("cell"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("tok_hash"), col("col.sim").cast("long").as("score"))
    top.join(scored.select(col("cell"), col("tok_hash"), col("tok").as("term")),
        Seq("cell", "tok_hash"))
      .select(col("cell").cast("long").as("cell"), col("rank"),
        col("term"), col("score"))
      .orderBy("cell", "rank")
  }

  /** q191 oracle: q63's kmeans CTEs composed with q69's token/idf
    * chain; ranking replays as a window ordered score DESC, hash ASC. */
  def clusterTermsOracleSql: String =
    s"""WITH ${KMeansOp.kmeansCtes},
       |td AS (SELECT DISTINCT doc_id, tok FROM (
       |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS tok
       |  FROM documents)),
       |dfq AS (SELECT tok, COUNT(*) AS df FROM td GROUP BY tok),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |idf AS (SELECT tok,
       |  round(ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)) * 1000000.0) AS idf_q
       | FROM dfq CROSS JOIN n),
       |ctf AS (SELECT af.cell, td.tok, COUNT(*) AS tf_cell
       |  FROM td JOIN af ON af.vec_id = td.doc_id GROUP BY 1, 2),
       |sc AS (SELECT cell, tok,
       |  CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) % $HashFold AS tok_hash,
       |  CAST(tf_cell AS DOUBLE) * idf_q AS score
       | FROM ctf JOIN idf USING (tok)),
       |r AS (SELECT cell, tok, score,
       |  ROW_NUMBER() OVER (PARTITION BY cell ORDER BY score DESC, tok_hash) AS rank
       | FROM sc)
       |SELECT CAST(cell AS BIGINT) AS cell, CAST(rank AS BIGINT) AS rank,
       |  tok AS term, CAST(score AS BIGINT) AS score
       |FROM r WHERE rank <= $K ORDER BY cell, rank""".stripMargin
}
