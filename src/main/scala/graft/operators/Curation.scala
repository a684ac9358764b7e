package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-curation operators a training-data pipeline runs between ingest
  * and training: PII scrubbing, benchmark decontamination, and the
  * Gopher/C4-style heuristic keep/drop filter. (The reference pipeline
  * curates cultural-heritage metadata — join_eu_ugc_qdrant_merge.py — at
  * web-corpus scale these are the steps that sit in the same position.)
  *
  * Scale notes: q43/q45 are single-pass narrow codegen'd projections
  * (regexp/arith on `functions._`, no UDFs, no shuffles). q44 joins the
  * corpus's exploded shingles against the benchmark shingle set — the
  * benchmark side (eval suites, ~MBs) is tiny relative to the corpus, so
  * it broadcasts and the corpus side never shuffles.
  */
object Curation {

  // PII patterns — identical semantics in Java regex (Spark) and RE2
  // (DuckDB): no backrefs, no lookaround.
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePat = "\\+?[0-9][0-9 -]{6,}[0-9]"
  val UrlPat = "https?://[^\\s]+"

  /** q43: PII scrub — count and redact URLs, then emails, then phone-ish
    * digit runs (order matters: an email inside a URL is already gone).
    * Redaction tokens are grep-able sentinels, the standard corpus
    * hygiene shape. */
  def piiRedact(s: SparkSession, dir: String): DataFrame = piiRedact(Tables.documents(s, dir))

  def piiRedact(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(UrlPat), lit(0))).cast("long").as("n_urls"),
        size(regexp_extract_all(col("text"), lit(EmailPat), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit(PhonePat), lit(0))).cast("long").as("n_phones"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), UrlPat, "[URL]"),
            EmailPat, "[EMAIL]"),
          PhonePat, "[PHONE]").as("redacted"))
      .orderBy("doc_id")

  /** Deterministic benchmark split for q44: every 50th doc plays the held
    * -out eval set. */
  val BenchModulus = 50

  /** q44: benchmark decontamination — per corpus document, how many of
    * its distinct 3-gram shingles appear anywhere in the benchmark set
    * (doc_id ≡ 0 mod [[BenchModulus]]), plus a contaminated flag. The
    * training-data hygiene step that keeps eval numbers honest: any doc
    * sharing n-grams with the benchmark is quarantined before training. */
  def decontaminate(s: SparkSession, dir: String): DataFrame =
    decontaminate(Tables.documents(s, dir))

  def decontaminate(docs: DataFrame): DataFrame = {
    val sized = ApproxDedup.shingleSets(docs)
      .select(col("doc_id"), col("shingles"), size(col("shingles")).cast("long").as("n_shingles"))
    val bench = sized.filter(col("doc_id") % BenchModulus === 0)
      .select(explode(col("shingles")).as("shingle")).distinct()
    val corpusShingles = sized.filter(col("doc_id") % BenchModulus =!= 0)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
    // shingle sets are distinct per doc, so count(*) = distinct shared
    val shared = corpusShingles.join(broadcast(bench), Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    sized.filter(col("doc_id") % BenchModulus =!= 0)
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        col("n_shingles"),
        when(coalesce(col("n_shared"), lit(0L)) > 0, 1L).otherwise(0L).as("contaminated"))
      .orderBy("doc_id")
  }

  /** Generated DuckDB oracle for q44 (same split, same shingling). */
  def decontaminateOracleSql: String =
    s"""WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS ws FROM documents),
       |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN []
       |  ELSE list_distinct(list_transform(range(1, len(ws)-1),
       |         i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) END AS s FROM w),
       |sz AS (SELECT doc_id, s, CAST(len(s) AS BIGINT) AS n_shingles FROM sh),
       |bench AS (SELECT DISTINCT unnest(s) AS shingle FROM sz WHERE doc_id % $BenchModulus = 0),
       |ce AS (SELECT doc_id, unnest(s) AS shingle FROM sz WHERE doc_id % $BenchModulus <> 0),
       |shared AS (SELECT ce.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
       |  FROM ce JOIN bench USING (shingle) GROUP BY ce.doc_id)
       |SELECT z.doc_id, COALESCE(shared.n_shared, 0) AS n_shared, z.n_shingles,
       |  CAST(CASE WHEN COALESCE(shared.n_shared, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
       |FROM sz z LEFT JOIN shared ON z.doc_id = shared.doc_id
       |WHERE z.doc_id % $BenchModulus <> 0 ORDER BY z.doc_id""".stripMargin

  // q45 rule thresholds (Gopher-style, calibrated so the test corpus has
  // both keeps and drops: docs run 10-99 words).
  val MinWords = 20L
  val MaxWords = 10000L
  val MinMeanWordLen = 2.0
  val MaxMeanWordLen = 12.0
  val MaxSymbolRatio = 0.3

  /** q45: heuristic corpus filter — the Gopher/C4-shaped rule stack:
    * word-count bounds, mean word length bounds, symbol-character ratio,
    * and at-least-one-stopword; per-rule flags plus the final keep bit so
    * downstream can audit WHY a document was dropped. Mean word length is
    * computed as non-space chars / words (pure codegen, no per-word HOF). */
  def corpusFilter(s: SparkSession, dir: String): DataFrame = corpusFilter(Tables.documents(s, dir))

  def corpusFilter(docs: DataFrame): DataFrame = {
    val ws = TextAnalysis.words(col("text"))
    val enStop = array(TextAnalysis.profiles.head._2.map(lit): _*)
    val flag = (c: Column) => when(c, 1L).otherwise(0L)
    docs.select(
        col("doc_id"),
        size(ws).cast("long").as("n_words"),
        (length(regexp_replace(col("text"), " ", "")).cast("double") /
          size(ws).cast("double")).as("mean_word_len"),
        (size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9 ]"), lit(0))).cast("double") /
          length(col("text")).cast("double")).as("symbol_ratio"),
        size(filter(TextAnalysis.words(lower(col("text"))),
          w => array_contains(enStop, w))).cast("long").as("n_stop"))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("symbol_ratio"), col("n_stop"),
        flag(col("n_words") >= MinWords && col("n_words") <= MaxWords).as("ok_words"),
        flag(col("mean_word_len") >= MinMeanWordLen &&
          col("mean_word_len") <= MaxMeanWordLen).as("ok_word_len"),
        flag(col("symbol_ratio") < MaxSymbolRatio).as("ok_symbols"),
        flag(col("n_stop") > 0).as("ok_stopwords"))
      .withColumn("keep",
        when(col("ok_words") + col("ok_word_len") + col("ok_symbols")
          + col("ok_stopwords") === 4L, 1L).otherwise(0L))
      .orderBy("doc_id")
  }
}
