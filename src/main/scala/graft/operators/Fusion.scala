package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps.cosinePre

/** Hybrid retrieval fusion — the serving-layer step the reference's UI
  * implies but performs as two separate panels: a lexical object search
  * (streamlit/app/app.py:110-147 filters + text facets over Postgres)
  * next to a Qdrant vector similar-items panel (app.py:237-254). A
  * production retrieval stack fuses the two rankings into one list;
  * reciprocal rank fusion (Cormack, Clarke & Buettcher, SIGIR'09) is the
  * standard score-free fuser: each ranker contributes 1/(k + rank), so
  * agreement between heterogeneous scorers (cosine vs Jaccard — scales
  * that cannot be averaged directly) floats shared candidates upward.
  *
  * Determinism: ranks are integers from total orders (cosine desc then
  * id; Jaccard-micro desc then id — the lexical score is an exact
  * integer `inter·10⁶ DIV union`), and the fused score is a fixed
  * two-term sum of IEEE divisions of those integers, identical in any
  * engine; ties in the fused order break by candidate id.
  *
  * Scale notes: the probe set broadcasts to both rankers, so the corpus
  * side never shuffles — the semantic arm is one broadcast-join scan
  * with map-side top-k partials ([[Similarity.explodeTopKPerGroup]]'s
  * TopKSimId agg ships ≤ k rows per partition-group), the lexical arm
  * the same over the word-set scan. The fusion join itself runs over
  * probe·k rows (hundreds), broadcast both sides. The semantic arm's
  * scale path at real corpus size is the persisted IVF index (q72) —
  * fusion composes with any ranker that emits (query, cand, rank). */
object Fusion {

  /** Probe set: doc_id/vec_id < QueryCount (the q27 convention). */
  val QueryCount = 10
  /** Depth of each ranker's list entering the fuser. */
  val PerListK = 20
  /** RRF smoothing constant (k=60, the SIGIR'09 default). */
  val RrfK = 60
  /** Fused results kept per query. */
  val FusedK = 10

  def hybridRrf(s: SparkSession, dir: String): DataFrame =
    hybridRrf(Tables.documents(s, dir), Tables.embeddings(s, dir))

  def hybridRrf(docs: DataFrame, embeddings: DataFrame): DataFrame = {
    // ---- semantic arm: exact cosine top-k (q27's ranker, depth 20) ----
    val v = Dedup.normalized(embeddings)
    val q = v.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("query_id"), col("e").as("eq"), col("nrm").as("nq"))
    val c = v.select(col("vec_id").as("__cand_id"), col("e").as("ec"), col("nrm").as("nc"))
    val semScored = broadcast(q).join(c, col("query_id") =!= col("__cand_id"))
      .select(col("query_id"), col("__cand_id"),
        cosinePre(col("eq"), col("ec"), col("nq"), col("nc")).as("sim"))
    val sem = Similarity.explodeTopKPerGroup(semScored, "query_id", "cand_id", PerListK)
      .select(col("query_id"), col("cand_id"), col("rank").as("rank_sem"))

    // ---- lexical arm: distinct-word Jaccard, integer micro score ----
    val ws = docs
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        array_distinct(TextAnalysis.words(TextAnalysis.lowerX(col("text")))).as("ws"))
    val qw = ws.filter(col("doc_id") < QueryCount)
      .select(col("doc_id").as("query_id"), col("ws").as("qs"))
    val cw = ws.select(col("doc_id").as("__cand_id"), col("ws").as("cs"))
    val lexScored = broadcast(qw).join(cw, col("query_id") =!= col("__cand_id"))
      .withColumn("inter", size(array_intersect(col("qs"), col("cs"))).cast("long"))
      .filter(col("inter") > 0L)
      .withColumn("uni",
        size(col("qs")).cast("long") + size(col("cs")).cast("long") - col("inter"))
      // exact integral score: ranker order is integer, never a float artifact
      .select(col("query_id"), col("__cand_id"),
        expr("cast((inter * 1000000) div uni as double)").as("sim"))
    val lex = Similarity.explodeTopKPerGroup(lexScored, "query_id", "cand_id", PerListK)
      .select(col("query_id"), col("cand_id"), col("rank").as("rank_lex"))

    // ---- RRF fusion: 1/(60+r) per arm, absent arm contributes 0 ----
    def contrib(rank: Column): Column =
      when(rank > 0L, lit(1.0) / (lit(RrfK.toDouble) + rank.cast("double")))
        .otherwise(lit(0.0))
    val fusedW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rrf_r").desc, col("cand_id"))
    sem.join(lex, Seq("query_id", "cand_id"), "full_outer")
      .select(col("query_id"), col("cand_id"),
        coalesce(col("rank_sem"), lit(0L)).as("rank_sem"),
        coalesce(col("rank_lex"), lit(0L)).as("rank_lex"))
      .withColumn("rrf_r",
        round(contrib(col("rank_sem")) + contrib(col("rank_lex")), 9))
      .withColumn("fused_rank", row_number().over(fusedW).cast("long"))
      .filter(col("fused_rank") <= FusedK)
      .select(col("query_id"), col("cand_id"), col("rank_sem"), col("rank_lex"),
        col("rrf_r"), col("fused_rank"))
      .orderBy("query_id", "fused_rank")
  }

  /** q162 oracle: both arms replayed as window ranks, fused identically.
    * The cosine CTEs mirror q27's; the lexical score is the same
    * integer `inter·10⁶ // union`. */
  def hybridRrfOracleSql: String =
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings WHERE embedding IS NOT NULL),
      |n AS (SELECT vec_id, e,
      |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(range(1, len(e)+1), i -> e[i]*e[i])), (x,y) -> x+y)) AS nrm FROM v),
      |sp AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
      |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(range(1, len(q.e)+1), i -> q.e[i]*c.e[i])), (x,y) -> x+y)
      |   / (q.nrm * c.nrm) AS sim
      |  FROM n q JOIN n c ON q.vec_id < $QueryCount AND q.vec_id <> c.vec_id),
      |semr AS (SELECT query_id, cand_id, rank_sem FROM (
      |  SELECT query_id, cand_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rank_sem
      |  FROM sp) WHERE rank_sem <= $PerListK),
      |w AS (SELECT doc_id,
      |  list_distinct(list_filter(string_split(translate(lower(text), 'ς', 'σ'), ' '), x -> x <> '')) AS ws
      |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
      |lp AS (SELECT q.doc_id AS query_id, c.doc_id AS cand_id,
      |  CAST(len(list_intersect(q.ws, c.ws)) AS BIGINT) AS inter,
      |  CAST(len(q.ws) AS BIGINT) + CAST(len(c.ws) AS BIGINT)
      |    - CAST(len(list_intersect(q.ws, c.ws)) AS BIGINT) AS uni
      |  FROM w q JOIN w c ON q.doc_id < $QueryCount AND q.doc_id <> c.doc_id),
      |lexr AS (SELECT query_id, cand_id, rank_lex FROM (
      |  SELECT query_id, cand_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY (inter * 1000000) // uni DESC, cand_id) AS rank_lex
      |  FROM lp WHERE inter > 0) WHERE rank_lex <= $PerListK),
      |f AS (SELECT COALESCE(s.query_id, l.query_id) AS query_id,
      |  COALESCE(s.cand_id, l.cand_id) AS cand_id,
      |  COALESCE(s.rank_sem, 0) AS rank_sem,
      |  COALESCE(l.rank_lex, 0) AS rank_lex
      |  FROM semr s FULL JOIN lexr l
      |    ON s.query_id = l.query_id AND s.cand_id = l.cand_id),
      |sc AS (SELECT query_id, cand_id, rank_sem, rank_lex,
      |  ROUND((CASE WHEN rank_sem > 0 THEN 1.0 / ($RrfK.0 + CAST(rank_sem AS DOUBLE)) ELSE 0.0 END)
      |      + (CASE WHEN rank_lex > 0 THEN 1.0 / ($RrfK.0 + CAST(rank_lex AS DOUBLE)) ELSE 0.0 END), 9) AS rrf_r
      |  FROM f)
      |SELECT query_id, cand_id, rank_sem, rank_lex, rrf_r, fused_rank FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY rrf_r DESC, cand_id) AS fused_rank FROM sc)
      |WHERE fused_rank <= $FusedK ORDER BY query_id, fused_rank""".stripMargin
}
