package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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
  // q61 thresholds — calibrated on the test corpus (dup_word_frac runs
  // .25-.68 with median .54; top_bigram_frac median .033, p90 .069) so
  // both keeps and drops occur.
  val MaxDupWordFrac = 0.6
  val MaxTopBigramFrac = 0.05
  val MaxDupTrigramFrac = 0.1

  /** q61: Gopher-style repetition filter — the rule family the word-count
    * heuristics of q45 can't see: a document that says the same thing
    * over and over. Per doc: fraction of word occurrences that are
    * repeats, the most-frequent-bigram share, and the share of trigram
    * occurrences whose trigram repeats within the doc; per-rule flags +
    * keep, all ratios exact small-integer divisions so any engine agrees
    * bitwise.
    *
    * Scale: gram occurrences explode to (doc_id, gram) and aggregate
    * twice keyed by doc — fine-grained keys, map-side combine, no
    * corpus-global state; the gram arrays come from the native
    * WordShingles kernel (distinct = false), not an interpreted HOF. */
  def repetitionFilter(s: SparkSession, dir: String): DataFrame =
    repetitionFilter(Tables.documents(s, dir))

  def repetitionFilter(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, WordShingles}
    val grams = (k: Int) => ColumnBridge.column(
      WordShingles(ColumnBridge.expression(col("text")), k, distinct = false))
    val flag = (c: Column) => when(c, 1L).otherwise(0L)
    // materialized once: three aggregations consume this frame (word
    // stats + two gram rollups) and Catalyst would otherwise rerun the
    // scan + shingling per consumer — same trade as KMeansOp's qv
    val base = docs.select(col("doc_id"),
      TextAnalysis.words(col("text")).as("ws"),
      grams(2).as("g2"), grams(3).as("g3"))
      .localCheckpoint()
    def gramStats(gCol: String, top: Boolean): DataFrame = {
      val occ = base.select(col("doc_id"), explode(col(gCol)).as("gram"))
        .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("cnt"))
      val aggs =
        if (top) Seq(max(col("cnt")).as(s"top_$gCol"), sum(col("cnt")).as(s"n_$gCol"))
        else Seq(sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as(s"dup_$gCol"),
          sum(col("cnt")).as(s"n_$gCol"))
      occ.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    }
    val ratio = (num: Column, den: Column) =>
      when(den > 0L, num.cast("double") / den.cast("double")).otherwise(lit(0.0))
    base.select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        size(array_distinct(col("ws"))).cast("long").as("n_uniq"))
      .join(gramStats("g2", top = true), Seq("doc_id"), "left")
      .join(gramStats("g3", top = false), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        ratio(col("n_words") - col("n_uniq"), col("n_words")).as("dup_word_frac"),
        ratio(coalesce(col("top_g2"), lit(0L)), coalesce(col("n_g2"), lit(0L))).as("top_bigram_frac"),
        ratio(coalesce(col("dup_g3"), lit(0L)), coalesce(col("n_g3"), lit(0L))).as("dup_trigram_frac"))
      .select(col("doc_id"), col("n_words"), col("dup_word_frac"),
        col("top_bigram_frac"), col("dup_trigram_frac"),
        flag(col("dup_word_frac") <= MaxDupWordFrac).as("ok_dup_words"),
        flag(col("top_bigram_frac") <= MaxTopBigramFrac).as("ok_top_bigram"),
        flag(col("dup_trigram_frac") <= MaxDupTrigramFrac).as("ok_dup_trigrams"))
      .withColumn("keep",
        when(col("ok_dup_words") + col("ok_top_bigram") + col("ok_dup_trigrams") === 3L, 1L)
          .otherwise(0L))
      .orderBy("doc_id")
  }

  /** q61 oracle: identical gram occurrence counting via DuckDB list ops. */
  def repetitionFilterOracleSql: String =
    s"""WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS ws FROM documents),
       |g2 AS (SELECT doc_id, CASE WHEN len(ws) < 2 THEN []
       |  ELSE list_transform(range(1, len(ws)), i -> ws[i]||' '||ws[i+1]) END AS gs FROM w),
       |g3 AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN []
       |  ELSE list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) END AS gs FROM w),
       |c2 AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM
       |  (SELECT doc_id, unnest(gs) AS gram FROM g2) GROUP BY 1, 2),
       |a2 AS (SELECT doc_id, MAX(cnt) AS top_g2, SUM(cnt) AS n_g2 FROM c2 GROUP BY 1),
       |c3 AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM
       |  (SELECT doc_id, unnest(gs) AS gram FROM g3) GROUP BY 1, 2),
       |a3 AS (SELECT doc_id, SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_g3,
       |  SUM(cnt) AS n_g3 FROM c3 GROUP BY 1),
       |r AS (SELECT w.doc_id,
       |  CAST(len(ws) AS BIGINT) AS n_words,
       |  CASE WHEN len(ws) > 0 THEN CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE)
       |    / CAST(len(ws) AS DOUBLE) ELSE 0.0 END AS dup_word_frac,
       |  CASE WHEN COALESCE(n_g2, 0) > 0 THEN CAST(COALESCE(top_g2, 0) AS DOUBLE)
       |    / CAST(COALESCE(n_g2, 0) AS DOUBLE) ELSE 0.0 END AS top_bigram_frac,
       |  CASE WHEN COALESCE(n_g3, 0) > 0 THEN CAST(COALESCE(dup_g3, 0) AS DOUBLE)
       |    / CAST(COALESCE(n_g3, 0) AS DOUBLE) ELSE 0.0 END AS dup_trigram_frac
       | FROM w LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)),
       |f AS (SELECT *,
       |  CAST(CASE WHEN dup_word_frac <= $MaxDupWordFrac THEN 1 ELSE 0 END AS BIGINT) AS ok_dup_words,
       |  CAST(CASE WHEN top_bigram_frac <= $MaxTopBigramFrac THEN 1 ELSE 0 END AS BIGINT) AS ok_top_bigram,
       |  CAST(CASE WHEN dup_trigram_frac <= $MaxDupTrigramFrac THEN 1 ELSE 0 END AS BIGINT) AS ok_dup_trigrams
       | FROM r)
       |SELECT *, CAST(CASE WHEN ok_dup_words + ok_top_bigram + ok_dup_trigrams = 3
       |  THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM f ORDER BY doc_id""".stripMargin

  /** q62: corpus-level duplicated-passage fraction (the Lee et al. 2022
    * substring-dedup signal): for each document, the share of its 5-gram
    * occurrences whose exact 5-gram appears in MORE THAN ONE document —
    * high dup_frac means the doc is largely made of passages that exist
    * elsewhere in the corpus, even when no whole-doc near-dup fires.
    *
    * Scale: gram→df is one map-side-combined aggregate keyed by the gram
    * string; the occurrence→df lookup is an equi-join on the same key
    * (both sides already hash-partitioned by it, and AQE handles the
    * viral-gram skew); per-doc rollup shuffles doc-keyed counts. No
    * suffix array needed for the FRACTION signal — exact span removal
    * would add the positional variant over the same exploded frame. */
  val PassageK = 5

  def dupPassage(s: SparkSession, dir: String): DataFrame =
    dupPassage(Tables.documents(s, dir))

  def dupPassage(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, WordShingles}
    val occ = docs.select(col("doc_id"), explode(ColumnBridge.column(
        WordShingles(ColumnBridge.expression(col("text")), PassageK, distinct = false)))
        .as("gram"))
    val df = occ.select(col("doc_id"), col("gram")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val perDoc = occ.join(df, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_dup_grams"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"))
      .withColumn("dup_frac",
        when(col("n_grams") > 0L,
          col("n_dup_grams").cast("double") / col("n_grams").cast("double"))
          .otherwise(lit(0.0)))
      .orderBy("doc_id")
  }

  /** q62 oracle: same 5-gram occurrence stream and document-frequency
    * join in DuckDB. */
  def dupPassageOracleSql: String =
    s"""WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS ws FROM documents),
       |g AS (SELECT doc_id, CASE WHEN len(ws) < $PassageK THEN []
       |  ELSE list_transform(range(1, len(ws)+2-$PassageK),
       |    i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]) END AS gs FROM w),
       |occ AS (SELECT doc_id, unnest(gs) AS gram FROM g),
       |df AS (SELECT gram, COUNT(*) AS df FROM
       |  (SELECT DISTINCT doc_id, gram FROM occ) GROUP BY gram),
       |pd AS (SELECT occ.doc_id, COUNT(*) AS n_grams,
       |  SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS n_dup_grams
       | FROM occ JOIN df USING (gram) GROUP BY occ.doc_id)
       |SELECT w.doc_id,
       |  CAST(COALESCE(pd.n_grams, 0) AS BIGINT) AS n_grams,
       |  CAST(COALESCE(pd.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       |  CASE WHEN COALESCE(pd.n_grams, 0) > 0
       |    THEN CAST(COALESCE(pd.n_dup_grams, 0) AS DOUBLE) / CAST(pd.n_grams AS DOUBLE)
       |    ELSE 0.0 END AS dup_frac
       |FROM w LEFT JOIN pd USING (doc_id) ORDER BY w.doc_id""".stripMargin

  // ---- q178: line-level exact span dedup (positional removal) ----

  /** Words per "line" segment for q178. The synthetic corpus carries no
    * newline structure, so lines are the non-overlapping LineW-word
    * segments (the q75 chunk arithmetic with stride = window) — the
    * same normalization a newline-split would feed. */
  val LineW = 10

  /** q178: line-level exact deduplication with POSITIONAL removal — the
    * C4/RefinedWeb line-dedup step q62 only measures: every exact
    * duplicate line keeps its globally-first occurrence (min
    * (doc_id, chunk_idx)) and removes all others, then rolls up per
    * document what survives. Unlike whole-doc near-dup (q24/q25) this
    * kills boilerplate that rides inside otherwise-unique documents.
    *
    * Scale notes: one explode (corpus-sized line stream), ONE
    * map-side-combined min-aggregate keyed by line text, one equi-join
    * back on the same key (both sides hash-partitioned by it; AQE
    * handles viral-line skew), one doc-keyed rollup. The winner is a
    * single struct-min — order-independent, no window over the corpus.
    * doc_id is non-null-filtered on the line stream in BOTH engines so
    * the struct-min and the oracle's ROW_NUMBER tiebreak agree without
    * null-ordering hazards. */
  def lineDedup(s: SparkSession, dir: String): DataFrame =
    lineDedup(Tables.documents(s, dir))

  def lineDedup(docs: DataFrame): DataFrame = {
    val keyed = docs
      .filter(col("text").isNotNull && col("doc_id").isNotNull)
      .select(col("doc_id"), TextAnalysis.words(col("text")).as("ws"))
      .withColumn("n", size(col("ws")).cast("long"))
      .filter(col("n") > 0L)
      .withColumn("chunk_idx",
        explode(sequence(lit(0L),
          ceil(col("n").cast("double") / lit(LineW.toDouble)).cast("long") - 1L)))
      .select(col("doc_id"), col("chunk_idx"),
        array_join(slice(col("ws"),
          (col("chunk_idx") * LineW + 1L).cast("int"), lit(LineW)), " ").as("line"),
        least(lit(LineW.toLong), col("n") - col("chunk_idx") * LineW).as("nw"))
    val winner = keyed.groupBy(col("line"))
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("w"))
      .select(col("line"), col("w.doc_id").as("w_doc"), col("w.chunk_idx").as("w_idx"))
    val perDoc = keyed.join(winner, Seq("line"))
      .withColumn("kept",
        col("doc_id") === col("w_doc") && col("chunk_idx") === col("w_idx"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("kept"), col("nw")).otherwise(0L)).as("n_kept_words"))
    docs.select(col("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("n_kept_words"), lit(0L)).as("n_kept_words"))
      .withColumn("removed_frac",
        when(col("n_lines") > 0L,
          round(col("n_removed").cast("double") / col("n_lines").cast("double"), 6))
          .otherwise(lit(0.0)))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  /** q178 oracle: identical segment arithmetic; the struct-min winner
    * is ROW_NUMBER() = 1 under the same (doc_id, chunk_idx) order. */
  def lineDedupOracleSql: String =
    s"""WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
       |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
       |c AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n,
       |    unnest(generate_series(0, CAST(ceil(len(ws) / ${LineW}.0e0) AS BIGINT) - 1)) AS chunk_idx
       |  FROM w WHERE len(ws) > 0),
       |l AS (SELECT doc_id, chunk_idx,
       |    array_to_string(ws[chunk_idx * $LineW + 1 : chunk_idx * $LineW + $LineW], ' ') AS line,
       |    CAST(LEAST($LineW, n - chunk_idx * $LineW) AS BIGINT) AS nw
       |  FROM c),
       |r AS (SELECT doc_id, nw,
       |    ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, chunk_idx) AS rn
       |  FROM l),
       |pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
       |    CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |    CAST(SUM(CASE WHEN rn = 1 THEN nw ELSE 0 END) AS BIGINT) AS n_kept_words
       |  FROM r GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(pd.n_lines, 0) AS n_lines,
       |  COALESCE(pd.n_removed, 0) AS n_removed,
       |  COALESCE(pd.n_kept_words, 0) AS n_kept_words,
       |  CASE WHEN COALESCE(pd.n_lines, 0) > 0
       |    THEN ROUND(CAST(pd.n_removed AS DOUBLE) / CAST(pd.n_lines AS DOUBLE), 6)
       |    ELSE 0.0 END AS removed_frac
       |FROM (SELECT DISTINCT doc_id FROM documents) d
       |LEFT JOIN pd USING (doc_id) ORDER BY doc_id NULLS LAST""".stripMargin

  /** q76: corpus-wide adjacent-word-pair (bigram) counts, top 50 — the
    * statistic behind the first BPE merge step (Sennrich et al. 2016)
    * and a cheap corpus-drift monitor. Non-distinct positional bigrams
    * via the native [[org.apache.spark.sql.graftbridge.WordShingles]]
    * kernel (k=2, distinct=false), so the per-row gram build is one
    * codegen'd pass, no interpreted HOF.
    *
    * Scale notes: explode → ONE map-side-combined count shuffle on the
    * gram; top-50 is a TakeOrderedAndProject (bounded per-partition
    * heap), never a global sort. Ranking order (cnt DESC, gram ASC) is
    * total, so the cut at 50 is deterministic across engines. */
  def bigramCounts(s: SparkSession, dir: String): DataFrame =
    bigramCounts(Tables.documents(s, dir))

  def bigramCounts(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, WordShingles}
    docs.filter(col("text").isNotNull)
      .select(ColumnBridge.column(
        WordShingles(ColumnBridge.expression(col("text")), 2, distinct = false)).as("gs"))
      .select(explode(col("gs")).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(50)
  }

  /** q76 oracle: same split, positional bigrams, total order, cut. */
  def bigramOracleSql: String =
    """WITH w AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents WHERE text IS NOT NULL),
      |i AS (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
      |  FROM w WHERE len(ws) >= 2),
      |g AS (SELECT ws[i] || ' ' || ws[i + 1] AS gram FROM i)
      |SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt FROM g
      |GROUP BY gram ORDER BY cnt DESC, gram LIMIT 50""".stripMargin

  /** q182 window radius and the micro-quantized 1/d offset weights. */
  val CoocW = 4

  /** q182: distance-weighted word co-occurrence within a ±[[CoocW]]
    * window — the GloVe corpus statistic (Pennington et al., EMNLP
    * 2014 §3: co-occurring tokens contribute 1/d for separation d), of
    * which q76's bigrams are the d=1 slice. Ordered pairs (w1 precedes
    * w2), count plus the exact micro-integer weight sum (10⁶ div d —
    * integer division, so every engine reproduces the same longs);
    * top-100 under the total order (cnt DESC, w1, w2).
    *
    * Scale notes: the pair stream is built ARRAY-LOCALLY — per offset d
    * a zip of the word array with its d-shifted self (slice + zip_with),
    * flattened and exploded — so there is NO positional self-join; the
    * stream is ≤ W rows per word, linear in corpus size, feeding ONE
    * map-side-combined count/sum shuffle keyed by the pair, and the cut
    * is a bounded TakeOrderedAndProject heap, never a global sort. At
    * 100 TB you'd add the standard df-cap on w1/w2 (q119's move) to
    * keep stopword pairs from dominating the shuffle's hot keys —
    * semantics here keep the full stream because the oracle replays it
    * exactly. */
  def cooccurrence(s: SparkSession, dir: String): DataFrame =
    cooccurrence(Tables.documents(s, dir))

  def cooccurrence(docs: DataFrame): DataFrame = {
    val emptyPairs = array().cast("array<struct<w1:string,w2:string,wt:bigint>>")
    val arms = (1 to CoocW).map { d =>
      when(col("n") > d,
        zip_with(
          slice(col("ws"), lit(1), col("n") - lit(d)),
          slice(col("ws"), lit(d + 1), col("n") - lit(d)),
          (a, b) => struct(a.as("w1"), b.as("w2"), lit(1000000L / d).as("wt"))))
        .otherwise(emptyPairs)
    }
    docs.filter(col("text").isNotNull)
      .select(TextAnalysis.words(col("text")).as("ws"))
      .withColumn("n", size(col("ws")))
      .select(explode(flatten(array(arms: _*))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"), sum(col("p.wt")).as("wt_micro"))
      .orderBy(col("cnt").desc, col("w1"), col("w2"))
      .limit(100)
  }

  /** q182 oracle: positions via generate_series, offsets via VALUES,
    * the same integer 1/d micro weights and total-order cut. */
  def cooccurrenceOracleSql: String =
    s"""WITH w AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
       |  FROM documents WHERE text IS NOT NULL),
       |px AS (SELECT ws, unnest(generate_series(1, len(ws))) AS i
       |  FROM w WHERE len(ws) > 0),
       |offs AS (SELECT * FROM (VALUES ${(1 to CoocW).map(d => s"($d)").mkString(",")}) t(d)),
       |p AS (SELECT px.ws[px.i] AS w1, px.ws[px.i + offs.d] AS w2,
       |    CAST(1000000 // offs.d AS BIGINT) AS wt
       |  FROM px CROSS JOIN offs WHERE px.i + offs.d <= len(px.ws))
       |SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(wt) AS BIGINT) AS wt_micro
       |FROM p GROUP BY w1, w2 ORDER BY cnt DESC, w1, w2 LIMIT 100""".stripMargin

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

  /** Finite-domain bound for event measures: |value| below this keeps
    * every downstream exact-decimal fold (DECIMAL(20,4) sums, micro-unit
    * integer clamps) inside its range with headroom at any corpus size. */
  val ValueBound = 1e12

  /** q107: numeric quality gate on events — the boundary-validation step
    * a production pipeline places between ingest and analytics. Under
    * ANSI SQL (Spark 4's default) ONE corrupt measure — a NaN, an
    * infinity, a 1e308 outlier — kills an entire 100 TB aggregation job
    * with a cast overflow; the gate quarantines those rows instead, so
    * the downstream exact-decimal operators (q11/q18/q19/q77/q90/q91/
    * q95/q99…) run on a domain where their arithmetic is total. NULL
    * values pass (they flow through aggregates by the gated NULL
    * semantics); non-finite and out-of-range values drop.
    *
    * Scale notes: narrow codegen'd filter, pushes to the scan — free. */
  def eventsGate(s: SparkSession, dir: String): DataFrame =
    eventsGate(Tables.events(s, dir))

  def eventsGate(events: DataFrame): DataFrame =
    events
      .where(col("value").isNull ||
        (!isnan(col("value")) && abs(col("value")) < ValueBound))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .orderBy("event_id")

  /** q107 oracle: the identical predicate — DuckDB `isfinite` excludes
    * NaN and ±Inf exactly like the engine's isnan + abs bound. */
  val eventsGateOracleSql: String =
    """SELECT event_id, ts, user_id, event_type, value, props
      |FROM events
      |WHERE value IS NULL OR (isfinite(value) AND abs(value) < 1e12)
      |ORDER BY event_id""".stripMargin

  /** Component bound for embedding vectors: anything beyond it (or
    * non-finite) poisons norms, cosines, and k-means sums. */
  val EmbBound = 1e30

  /** q108: numeric quality gate on embeddings — drops vectors that are
    * NULL, wrongly-dimensioned, or carry a non-finite / out-of-range
    * component, and proves the survivors by emitting their dimension and
    * norm. A NaN component would otherwise flow into every cosine and
    * centroid sum downstream (NaN-poisoned cells), so the vector family
    * assumes gated input the same way the decimal family assumes q107. */
  def embeddingsGate(s: SparkSession, dir: String): DataFrame =
    embeddingsGate(Tables.embeddings(s, dir))

  def embeddingsGate(embeddings: DataFrame): DataFrame = {
    import graft.functions.VectorOps.{norm, toDouble}
    embeddings
      .where(col("embedding").isNotNull &&
        size(col("embedding")) === Similarity.Dim &&
        !exists(toDouble(col("embedding")),
          x => isnan(x) || abs(x) > EmbBound))
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("n_dims"),
        round(norm(toDouble(col("embedding"))), 9).as("nrm_r"))
      .orderBy("vec_id")
  }

  /** q108 oracle: same predicate and the shared exact norm fold. */
  val embeddingsGateOracleSql: String =
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) = ${Similarity.Dim}
       |    AND len(list_filter(list_transform(embedding, x -> CAST(x AS DOUBLE)),
       |          x -> NOT isfinite(x) OR abs(x) > 1e30)) = 0)
       |SELECT vec_id, CAST(len(e) AS BIGINT) AS n_dims,
       |  ROUND(sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform(range(1, len(e)+1), i -> e[i]*e[i])), (x,y) -> x+y)), 9) AS nrm_r
       |FROM v ORDER BY vec_id""".stripMargin

  /** q121: corpus-overlap report — the contamination audit run before
    * mixing corpora (or before trusting an eval set, the q44 concern
    * at corpus granularity): treating the even-doc_id half as the
    * EXISTING corpus A and the odd half as the INCOMING corpus B, how
    * much of B already exists in A? Reported per incoming language:
    * exact duplicates (content-hash membership) and near-duplicates
    * (a τ=0.8 Jaccard partner across the A/B boundary), with the
    * near-dup fraction.
    *
    * Scale notes: the exact test is a hash left-semi join (B never
    * carries text past the hash projection); the near-dup test is a
    * FILTER over the shared materialized pair table (Cluster
    * .pairsTable) — the expensive pair join is built once per source
    * and every consumer reads it, so the audit itself is two
    * output-sized aggregations. */
  def corpusOverlap(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    corpusOverlap(docs, Cluster.pairsTable(s, dir).select("a_id", "b_id"))
  }

  def corpusOverlap(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val isB = col("doc_id") % 2 === 1
    val aHash = docs.filter(!isB && col("text").isNotNull)
      .select(md5(col("text")).as("h")).distinct()
    val exactB = docs.filter(isB && col("text").isNotNull)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .join(aHash, Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()
    // odd ids with an even-side partner in the tau=0.8 pair table
    val nearB = pairs.filter(col("a_id") % 2 === 1 && col("b_id") % 2 === 0)
      .select(col("a_id").as("doc_id"))
      .unionByName(pairs.filter(col("b_id") % 2 === 1 && col("a_id") % 2 === 0)
        .select(col("b_id").as("doc_id")))
      .distinct()
    docs.filter(isB)
      .select(col("doc_id"), coalesce(col("lang"), lit("")).as("lang"))
      .join(exactB.withColumn("is_exact", lit(1L)), Seq("doc_id"), "left")
      .join(nearB.withColumn("is_near", lit(1L)), Seq("doc_id"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_incoming"),
        sum(coalesce(col("is_exact"), lit(0L))).as("exact_dups"),
        sum(coalesce(col("is_near"), lit(0L))).as("near_dups"))
      .withColumn("near_frac_r",
        round(col("near_dups").cast("double") / col("n_incoming").cast("double"), 9))
      .orderBy("lang")
  }

  /** q141: cross-split near-duplicate leakage audit — the check every
    * training-data pipeline must run BEFORE trusting its held-out
    * numbers: a near-dup pair straddling train and val/test leaks the
    * evaluation. The split assignment is deterministic and id-hash
    * based (md5 of the id's decimal string, first 4 hex chars mod 10 →
    * 0-7 train, 8 val, 9 test): hash-based so it's uncorrelated with
    * ingest order, id-based (not content-based) so near-dup VARIANTS of
    * a doc don't auto-land in one split — exactly the leak this audits.
    * Pairs come from the shared τ=0.8 table (5th consumer); each side's
    * split is computed directly from its doc id (no join back to
    * documents — the split function is id-local by design), so the
    * audit costs ONE pass over the |pairs|-sized table. Output = the
    * offending pairs with both split labels; empty output = clean
    * split. */
  def splitLeakage(s: SparkSession, dir: String): DataFrame =
    splitLeakage(Cluster.pairsTable(s, dir))

  /** The split label of a doc id — exposed so sampling/export operators
    * can reuse the identical assignment. */
  def splitName(c: String): Column = {
    val bucket = pmod(
      expr(s"cast(conv(substring(md5(cast($c as string)), 1, 4), 16, 10) as bigint)"),
      lit(10L))
    when(bucket <= 7, lit("train")).when(bucket === 8, lit("val")).otherwise(lit("test"))
  }

  def splitLeakage(pairs: DataFrame): DataFrame =
    pairs
      .select(col("a_id"), col("b_id"),
        splitName("a_id").as("split_a"),
        splitName("b_id").as("split_b"))
      .filter(col("split_a") =!= col("split_b"))
      .orderBy("a_id", "b_id")

  /** q141 oracle: same pairs, same id-hash split arithmetic. */
  def splitLeakageOracleSql(jaccardPairCtes: String): String =
    s"""WITH $jaccardPairCtes,
      |pr AS (SELECT a_id, b_id FROM p
      |  WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.8),
      |sp AS (SELECT a_id, b_id,
      |  CAST('0x' || substr(md5(CAST(a_id AS VARCHAR)), 1, 4) AS BIGINT) % 10 AS ba,
      |  CAST('0x' || substr(md5(CAST(b_id AS VARCHAR)), 1, 4) AS BIGINT) % 10 AS bb
      |  FROM pr)
      |SELECT a_id, b_id,
      |  CASE WHEN ba <= 7 THEN 'train' WHEN ba = 8 THEN 'val' ELSE 'test' END AS split_a,
      |  CASE WHEN bb <= 7 THEN 'train' WHEN bb = 8 THEN 'val' ELSE 'test' END AS split_b
      |FROM sp
      |WHERE (CASE WHEN ba <= 7 THEN 'train' WHEN ba = 8 THEN 'val' ELSE 'test' END)
      |   <> (CASE WHEN bb <= 7 THEN 'train' WHEN bb = 8 THEN 'val' ELSE 'test' END)
      |ORDER BY a_id, b_id""".stripMargin

  /** q149: right-to-be-forgotten cascade audit — given a deletion set of
    * customers (here the deterministic `c_custkey % 97 = 0` cohort; in
    * production the DSAR list), count what a compliant cascade removes
    * from each downstream table BEFORE rewriting anything: their orders,
    * and those orders' lineitems. Deleting the customer row alone leaves
    * the person reconstructible from the fact tables — the cascade
    * closure IS the compliance obligation, and this audit is the dry
    * run + evidence artifact every deletion job should emit.
    *
    * Scale notes: the victim set broadcasts into a semi-join on orders;
    * the affected-order keys then semi-join lineitem on l_orderkey —
    * the shuffle lineitem pays anyway for any order-keyed work. Three
    * 1-row aggregates union to the 3-row report; the actual rewrite
    * would reuse these exact anti-join plans (the inverse semi-join),
    * Merge.upsertSnapshot-style. */
  def forgetCascade(s: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(s, dir)
    val orders = Tables.orders(s, dir)
    val lineitem = Tables.lineitem(s, dir)
    val victims = customer.filter(col("c_custkey") % 97 === 0)
      .select(col("c_custkey"))
    val hitOrders = orders.join(broadcast(victims),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"))
    def report(name: String, table: DataFrame, hits: DataFrame): DataFrame =
      table.agg(count(lit(1)).as("n_rows"))
        .join(hits.agg(count(lit(1)).as("n_forgotten")))
        .select(lit(name).as("table_name"), col("n_rows"), col("n_forgotten"),
          (col("n_rows") - col("n_forgotten")).as("n_kept"))
    Seq(
      report("customer", customer,
        customer.join(broadcast(victims.select(col("c_custkey").as("vk"))),
          col("c_custkey") === col("vk"), "left_semi")),
      report("orders", orders,
        orders.join(broadcast(victims), col("o_custkey") === col("c_custkey"), "left_semi")),
      report("lineitem", lineitem,
        lineitem.join(hitOrders.select(col("o_orderkey").as("hk")),
          col("l_orderkey") === col("hk"), "left_semi")))
      .reduce(_ unionAll _)
      .orderBy("table_name")
  }

  def forgetCascadeOracleSql: String =
    """WITH v AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
      |ho AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM v))
      |SELECT 'customer' AS table_name,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_rows,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_forgotten,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer)
      |    - (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_kept
      |UNION ALL
      |SELECT 'lineitem',
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
      |     WHERE l_orderkey IN (SELECT o_orderkey FROM ho)),
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
      |    - (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
      |         WHERE l_orderkey IN (SELECT o_orderkey FROM ho))
      |UNION ALL
      |SELECT 'orders',
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
      |     WHERE o_custkey IN (SELECT c_custkey FROM v)),
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)
      |    - (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
      |         WHERE o_custkey IN (SELECT c_custkey FROM v))
      |ORDER BY table_name""".stripMargin

  /** q142: n-gram novelty — per document, how many of its 3-gram
    * shingles appear in NO earlier document (first_seen = corpus-min
    * doc_id). The marginal-contribution signal behind dedup-aware data
    * valuation: a doc whose shingles all first appeared elsewhere adds
    * nothing even if no single pair crosses the q23 threshold
    * (boilerplate assembled from many sources — invisible to pairwise
    * dedup, obvious here).
    *
    * Scale notes: one explode + ONE shuffle on the shingle for the
    * min-aggregate, one shuffle back on doc_id for the per-doc counts —
    * both |shingle-occurrence|-sized, the same cost class as q23's
    * blocking join. No pairwise anything. */
  def ngramNovelty(s: SparkSession, dir: String): DataFrame =
    ngramNovelty(Tables.documents(s, dir))

  def ngramNovelty(documents: DataFrame): DataFrame = {
    val sh = ApproxDedup.shingleSets(documents)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val firstSeen = sh.groupBy(col("shingle"))
      .agg(min(col("doc_id")).as("first_doc"))
    sh.join(firstSeen, Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .orderBy("doc_id")
  }

  /** q142 oracle: reuses the shared shingle CTE (`e` = exploded
    * distinct 3-grams per doc). */
  def ngramNoveltyOracleSql(jaccardPairCtes: String): String =
    s"""WITH $jaccardPairCtes,
      |fs AS (SELECT shingle, MIN(doc_id) AS first_doc
      |  FROM e GROUP BY 1)
      |SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
      |  CAST(SUM(CASE WHEN fs.first_doc = e.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
      |FROM e JOIN fs USING (shingle)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q155: domain-drift monitor — per-source TOTAL-VARIATION distance
    * between the domain's unigram distribution and the whole corpus's:
    * TV(P_d, P_c) = ½ Σ_w |P_d(w) − P_c(w)|, the drift panel a corpus
    * mixer watches before a domain's share of the training mix shifts
    * under it (data-mixture governance, the q49/q145 selection family's
    * monitoring twin). TV instead of KL deliberately: KL needs ln(),
    * whose libm rounding differs per engine (the q74 stance), while TV
    * over the common denominator n_d·N is the EXACT integer
    * Σ_w |ow·N − cw·n_d| — carried as DECIMAL(38,0) (the q146 exact
    * cross-product pattern; ow·N ≤ n_d·N ≈ 10²⁴ at 100 TB, far inside
    * 38 digits) with ONE identically-associated rounded division at
    * the end, so the whole statistic value-verifies bitwise.
    *
    * Scale notes: one corpus-sized shuffle to (source, w) counts;
    * everything after runs on vocab-sized tables — the corpus marginal
    * derives from the domain counts (no second corpus pass), the
    * |sources|-row marginals broadcast into a vocab × |sources| grid,
    * and the absent-word arm (ow = 0) comes from the grid's left join,
    * never from an outer join of raw rows. */
  def domainDrift(s: SparkSession, dir: String): DataFrame =
    domainDrift(Tables.documents(s, dir))

  def domainDrift(documents: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val str2dbl = (c: Column) => c.cast("string").cast("double")
    val words = documents
      .filter(col("text").isNotNull && col("source").isNotNull)
      .select(col("source"), explode(TextAnalysis.words(col("text"))).as("w"))
    val dom = words.groupBy(col("source"), col("w")).agg(count(lit(1)).as("ow"))
    val corpus = dom.groupBy(col("w")).agg(sum(col("ow")).as("cw"))
    val nd = dom.groupBy(col("source"))
      .agg(sum(col("ow")).as("nd"), count(lit(1)).as("n_dom_vocab"))
    val ntot = corpus.agg(sum(col("cw")).as("n_total"))
    val terms = corpus.crossJoin(broadcast(nd))
      .join(dom, Seq("source", "w"), "left")
      .crossJoin(broadcast(ntot))
      .select(col("source"), col("nd"), col("n_dom_vocab"), col("n_total"),
        abs(d38(coalesce(col("ow"), lit(0L))) * d38(col("n_total"))
          - d38(col("cw")) * d38(col("nd"))).as("t"))
    terms.groupBy(col("source"))
      .agg(max(col("nd")).as("ndm"), max(col("n_dom_vocab")).as("nv"),
        max(col("n_total")).as("nt"), sum(col("t")).as("tvsum"))
      .select(col("source"),
        col("ndm").cast("long").as("n_words"),
        col("nv").cast("long").as("n_dom_vocab"),
        round(str2dbl(col("tvsum"))
          / str2dbl(d38(col("ndm")) * d38(col("nt")) * lit(2)), 9).as("tv_r"))
      .orderBy(col("source").asc_nulls_last)
  }

  /** q155 oracle: identical count chain, DECIMAL(38,0) exact terms,
    * the same VARCHAR-mediated decimal→double casts and association. */
  val domainDriftOracleSql: String =
    """WITH wx AS (SELECT source,
      |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
      |dom AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS ow FROM wx GROUP BY 1, 2),
      |corpus AS (SELECT w, CAST(SUM(ow) AS BIGINT) AS cw FROM dom GROUP BY 1),
      |nd AS (SELECT source, CAST(SUM(ow) AS BIGINT) AS nd,
      |    CAST(COUNT(*) AS BIGINT) AS n_dom_vocab FROM dom GROUP BY 1),
      |nt AS (SELECT CAST(SUM(cw) AS BIGINT) AS n_total FROM corpus),
      |terms AS (SELECT s.source, s.nd, s.n_dom_vocab, nt.n_total,
      |    ABS(CAST(COALESCE(d.ow, 0) AS DECIMAL(38,0)) * CAST(nt.n_total AS DECIMAL(38,0))
      |      - CAST(c.cw AS DECIMAL(38,0)) * CAST(s.nd AS DECIMAL(38,0))) AS t
      |  FROM corpus c CROSS JOIN nd s CROSS JOIN nt
      |  LEFT JOIN dom d ON d.source = s.source AND d.w = c.w)
      |SELECT source, nd AS n_words, n_dom_vocab,
      |  ROUND(CAST(CAST(SUM(t) AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST((CAST(nd AS DECIMAL(38,0)) * CAST(MAX(n_total) AS DECIMAL(38,0)) * 2) AS VARCHAR) AS DOUBLE), 9) AS tv_r
      |FROM terms GROUP BY source, nd, n_dom_vocab ORDER BY source""".stripMargin

  /** q171: embedding-distribution drift per label — q155's monitoring
    * question asked of the VECTOR space: between the standing corpus
    * (even vec_id) and the incoming half (odd vec_id), how far did each
    * label's centroid move, and along which dimension? Embedding drift
    * is how a silent encoder change, a re-crawl with different
    * boilerplate, or upstream preprocessing skew first shows up — and it
    * invalidates every distance-calibrated artifact downstream (IVF
    * cells q72, PQ codebooks q111, SemDeDup τ q59), so production vector
    * stores monitor it per index rebuild. Reference anchor: the
    * embedding refresh cycle (`extracting_embeddings.py:154-183`
    * recomputes vectors; nothing in the reference checks the new batch
    * landed in the same space).
    *
    * Engine-exact: ‖μ_old − μ_new‖ over the ScaleQ-quantized integral
    * vectors (q63's convention) with the q146/q155 DECIMAL(38,0)
    * discipline — per-dim numerator so·nn − sn·no is exact decimal, the
    * squared sum stays decimal (≤ ~10³⁰ at sf1, bound documented at the
    * constant), and ONE sqrt + division closes it through the
    * VARCHAR-mediated decimal→double cast both engines share; the
    * max-shift dimension is a pure-decimal |·| argmax (dim asc ties).
    *
    * Scale notes: one posexplode shuffle to (label, dim) — 64·|labels|
    * rows out of the combiner regardless of corpus size; half counts are
    * a |labels|-row broadcast; the argmax window runs over 64-row
    * partitions. */
  def embeddingDrift(s: SparkSession, dir: String): DataFrame =
    embeddingDrift(Tables.embeddings(s, dir))

  def embeddingDrift(embeddings: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val str2dbl = (c: Column) => c.cast("string").cast("double")
    val d = (c: Column) => c.cast("double")
    val base = embeddings
      .filter(col("embedding").isNotNull && col("label").isNotNull &&
        col("vec_id").isNotNull && col("vec_id") >= 0L)
      .select(col("label"), pmod(col("vec_id"), lit(2L)).as("half"),
        transform(col("embedding"),
          x => round(x.cast("double") * KMeansOp.ScaleQ)).as("q"))
    val cnts = base.groupBy(col("label"))
      .agg(sum(when(col("half") === 0L, 1L).otherwise(0L)).as("n_old"),
        sum(when(col("half") === 1L, 1L).otherwise(0L)).as("n_new"))
      .filter(col("n_old") > 0L && col("n_new") > 0L)
    val perDim = base
      .select(col("label"), col("half"), posexplode(col("q")))
      .select(col("label"), col("half"), col("pos").as("dim"),
        col("col").cast("long").as("xq"))
      .groupBy(col("label"), col("dim"))
      .agg(sum(when(col("half") === 0L, col("xq")).otherwise(0L)).as("so"),
        sum(when(col("half") === 1L, col("xq")).otherwise(0L)).as("sn"))
      .join(broadcast(cnts), Seq("label"))
      .withColumn("num",
        d38(col("so")) * d38(col("n_new")) - d38(col("sn")) * d38(col("n_old")))
    val wDim = Window.partitionBy(col("label"))
      .orderBy(abs(col("num")).desc, col("dim"))
    val top = perDim.withColumn("rn", row_number().over(wDim))
      .filter(col("rn") === 1)
      .select(col("label"), col("dim").cast("long").as("max_shift_dim"))
    perDim.groupBy(col("label"))
      .agg(max(col("n_old")).as("n_old"), max(col("n_new")).as("n_new"),
        sum(col("num") * col("num")).as("s2"))
      .join(broadcast(top), Seq("label"))
      .select(col("label"), col("n_old"), col("n_new"),
        round(sqrt(str2dbl(col("s2")))
          / (d(col("n_old")) * d(col("n_new")) * lit(KMeansOp.ScaleQ)), 6)
          .as("drift_r"),
        col("max_shift_dim"))
      .orderBy("label")
  }

  /** q171 oracle: identical quantization, decimal numerators, argmax,
    * and the VARCHAR-mediated final cast; dims explode against a fixed
    * 0..63 range (the corpus dimension, gated by q108). */
  def embeddingDriftOracleSql: String =
    s"""WITH b AS (SELECT label, vec_id % 2 AS half,
      |    list_transform(embedding, x -> round(CAST(x AS DOUBLE) * ${KMeansOp.ScaleQ})) AS q
      |  FROM embeddings
      |  WHERE embedding IS NOT NULL AND label IS NOT NULL
      |    AND vec_id IS NOT NULL AND vec_id >= 0),
      |c AS (SELECT label,
      |    CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
      |    CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
      |  FROM b GROUP BY 1
      |  HAVING SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) > 0
      |     AND SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) > 0),
      |pd AS (SELECT b.label, dims.dim,
      |    CAST(SUM(CASE WHEN half = 0 THEN q[dims.dim + 1] ELSE 0 END) AS BIGINT) AS so,
      |    CAST(SUM(CASE WHEN half = 1 THEN q[dims.dim + 1] ELSE 0 END) AS BIGINT) AS sn
      |  FROM b CROSS JOIN (SELECT unnest(range(0, ${graft.operators.Similarity.Dim})) AS dim) dims
      |  GROUP BY 1, 2),
      |n AS (SELECT pd.label, pd.dim, c.n_old, c.n_new,
      |    CAST(so AS DECIMAL(38,0)) * CAST(n_new AS DECIMAL(38,0))
      |      - CAST(sn AS DECIMAL(38,0)) * CAST(n_old AS DECIMAL(38,0)) AS num
      |  FROM pd JOIN c USING (label)),
      |t AS (SELECT label, CAST(dim AS BIGINT) AS max_shift_dim FROM (
      |  SELECT label, dim,
      |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY abs(num) DESC, dim) AS rn
      |  FROM n) WHERE rn = 1),
      |s AS (SELECT label, MAX(n_old) AS n_old, MAX(n_new) AS n_new,
      |    SUM(num * num) AS s2
      |  FROM n GROUP BY 1)
      |SELECT s.label, s.n_old, s.n_new,
      |  ROUND(sqrt(CAST(CAST(s.s2 AS VARCHAR) AS DOUBLE))
      |    / (CAST(s.n_old AS DOUBLE) * CAST(s.n_new AS DOUBLE) * ${KMeansOp.ScaleQ}), 6) AS drift_r,
      |  t.max_shift_dim
      |FROM s JOIN t USING (label) ORDER BY s.label""".stripMargin

  // ---- q173: source-local boilerplate n-gram detection ----

  /** Boilerplate shingle width and the detection threshold: a 5-gram is
    * boilerplate FOR ITS SOURCE when it appears in ≥ 30 % of that
    * source's documents (df · 10 ≥ n_src_docs · 3 — integer-exact). */
  val BoilerK = 5
  val BoilerNum = 3L
  val BoilerDen = 10L

  /** q173: CCNet-style boilerplate detection, keyed by source. q62 asks
    * the corpus-GLOBAL question (is this passage duplicated anywhere?);
    * web curation also needs the source-LOCAL one — navigation chrome,
    * cookie banners, and footer text repeat across most pages of one
    * domain while being rare globally, and the fix is per-domain: count
    * each 5-gram's distinct-document frequency WITHIN its source and
    * flag grams above [[BoilerNum]]/[[BoilerDen]] of the source's docs.
    * Output per doc: total 5-gram occurrences, boilerplate occurrences,
    * and a drop flag when ≥ half the doc is boilerplate (2·n_boiler ≥
    * n_grams). (Reference anchor: `eu_raw_to_cleansed_merge.py:30-45`
    * strips per-provider wrapper fields — the metadata-shaped version of
    * per-source boilerplate removal.)
    *
    * Scale notes: gram→df is one map-side-combined aggregate keyed by
    * (source, gram); the boiler set join is an equi-join on the same key
    * the occurrence table is already hash-partitioned by, so Catalyst
    * reuses the exchange; the per-source doc counts are a |sources|-row
    * broadcast. Nothing pairwise, nothing driver-side; the boiler table
    * is a tiny fraction of the gram table by construction (≥30 % df). */
  def boilerplateNgrams(s: SparkSession, dir: String): DataFrame =
    boilerplateNgrams(Tables.documents(s, dir))

  def boilerplateNgrams(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, WordShingles}
    val base = docs.filter(col("text").isNotNull && col("source").isNotNull)
    val occ = base.select(col("doc_id"), col("source"),
      explode(ColumnBridge.column(WordShingles(
        ColumnBridge.expression(col("text")), BoilerK, distinct = false))).as("gram"))
    val srcDocs = base.groupBy(col("source")).agg(count(lit(1)).as("n_src_docs"))
    val df = occ.select(col("source"), col("gram"), col("doc_id")).distinct()
      .groupBy(col("source"), col("gram")).agg(count(lit(1)).as("df"))
    val boiler = df.join(broadcast(srcDocs), Seq("source"))
      .filter(col("df") * BoilerDen >= col("n_src_docs") * BoilerNum)
      .select(col("source"), col("gram"), lit(1L).as("is_boiler"))
    occ.join(boiler, Seq("source", "gram"), "left")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("is_boiler"), lit(0L))).as("n_boiler"))
      .select(col("doc_id"), col("source"), col("n_grams"), col("n_boiler"),
        when(col("n_boiler") * 2 >= col("n_grams"), 1L).otherwise(0L).as("dropped"))
      .orderBy("doc_id")
  }

  /** q173 oracle: positional 5-grams, the same integer thresholds. */
  val boilerplateNgramsOracleSql: String =
    s"""WITH d AS (SELECT doc_id, source,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
      |o AS (SELECT doc_id, source,
      |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS gram
      |  FROM (SELECT doc_id, source, ws, unnest(generate_series(1, len(ws) - ${BoilerK - 1})) AS i
      |        FROM d WHERE len(ws) >= $BoilerK)),
      |sd AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src_docs FROM d GROUP BY 1),
      |f AS (SELECT source, gram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      |  FROM o GROUP BY 1, 2),
      |b AS (SELECT f.source, f.gram FROM f JOIN sd ON sd.source = f.source
      |  WHERE f.df * $BoilerDen >= sd.n_src_docs * $BoilerNum),
      |p AS (SELECT o.doc_id, o.source, CAST(COUNT(*) AS BIGINT) AS n_grams,
      |    CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
      |  FROM o LEFT JOIN b ON b.source = o.source AND b.gram = o.gram
      |  GROUP BY 1, 2)
      |SELECT doc_id, source, n_grams, n_boiler,
      |  CAST(CASE WHEN n_boiler * 2 >= n_grams THEN 1 ELSE 0 END AS BIGINT) AS dropped
      |FROM p ORDER BY doc_id""".stripMargin

  // ---- q174: DSIR-style hashed-n-gram importance weights ----

  /** DSIR feature space: hashed positional bigrams into [[DsirBuckets]]
    * buckets; the target distribution is the [[DsirTargetLang]] slice. */
  val DsirBuckets = 128L
  val DsirTargetLang = "en"

  /** q174: data selection with importance resampling (Xie et al. 2023,
    * arXiv:2302.03169) — score every raw document by how much its hashed
    * bigram features look like a TARGET distribution (here the corpus's
    * `en` slice standing in for "high-quality reference text"). DSIR's
    * weight is Σ_f log(p_target(f)/p_raw(f)); we compute the LINEARIZED
    * form Σ_f (p_t(f) − p_r(f)) — the first-order Taylor expansion of
    * the log-ratio around 1 — because it stays EXACT in DECIMAL(38,0)
    * integer arithmetic (ln is libm-dependent, SURVEY §5): with add-one
    * smoothing over B buckets, each occurrence of a feature in bucket b
    * contributes (t_b+1)·(R+B) − (r_b+1)·(T+B), a pure integer. The
    * published estimator's SELECTION behavior (rank docs, keep the top)
    * is monotone-equivalent near p_t≈p_r, which is where web-scale
    * corpora live. Output: per-doc feature count, the per-million
    * normalized weight, and keep = (weight > 0), decided on the exact
    * decimal numerator.
    *
    * Scale notes: the bucket tables are B=128 rows — broadcast; the
    * per-occurrence score is a narrow projection after two broadcast
    * joins (the corpus never shuffles except the final doc_id rollup);
    * totals are 1-row broadcasts. This is the shape that makes DSIR
    * practical at 100 TB: the "model" is 2·B integers. */
  def dsirWeights(s: SparkSession, dir: String): DataFrame =
    dsirWeights(Tables.documents(s, dir))

  def dsirWeights(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, WordShingles}
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val str2dbl = (c: Column) => c.cast("string").cast("double")
    val occ = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        explode(ColumnBridge.column(WordShingles(
          ColumnBridge.expression(col("text")), 2, distinct = false))).as("gram"))
      .select(col("doc_id"), col("lang"),
        (TextAnalysis.md5Long(concat(lit("ds:"), col("gram"))) % DsirBuckets).as("b"))
    // ONE bucket aggregate carries both sides (raw count + target-lang
    // count as a conditional sum) — previously rb and tb were separate
    // aggregates and the totals re-aggregated each of them, so the
    // occurrence explode + per-gram md5 ran FIVE times over the corpus
    // (rb broadcast, tb broadcast, two total aggs, scoring scan); now it
    // runs twice (model build + scoring), the DSIR floor. The ≤B-row
    // table is materialized once for the totals and the broadcast.
    val byB = occ.groupBy(col("b")).agg(count(lit(1)).as("rb"),
        sum(when(col("lang") === DsirTargetLang, 1L).otherwise(0L)).as("tb"))
      .localCheckpoint()
    // ttot: the separate tb table summed to NULL on a target-free corpus
    // (empty aggregate); the fused conditional sum yields 0 there — map
    // it back to NULL so the smoothing terms stay value-identical
    val totals = byB.agg(sum(col("rb")).as("rtot"),
      when(sum(col("tb")) === 0L, lit(null).cast("long"))
        .otherwise(sum(col("tb"))).as("ttot"))
    val scored = occ
      .join(broadcast(byB), Seq("b"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("rtot"), col("ttot"),
        (d38(coalesce(col("tb"), lit(0L)) + 1L) * d38(col("rtot") + DsirBuckets)
          - d38(col("rb") + 1L) * d38(col("ttot") + DsirBuckets)).as("term"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("term")).as("wnum"),
        max(col("rtot")).as("rtot"), max(col("ttot")).as("ttot"))
      .select(col("doc_id"), col("n_feats"),
        round(str2dbl(col("wnum") * 1000000L)
          / str2dbl(d38(col("ttot") + DsirBuckets) * d38(col("rtot") + DsirBuckets)), 6)
          .as("weight_ppm_r"),
        when(col("wnum") > 0, 1L).otherwise(0L).as("keep"))
      .orderBy("doc_id")
  }

  /** q174 oracle: identical hash buckets, smoothing, decimal terms, and
    * the VARCHAR-mediated decimal→double division. */
  val dsirWeightsOracleSql: String =
    s"""WITH d AS (SELECT doc_id, lang,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents WHERE text IS NOT NULL),
      |o AS (SELECT doc_id, lang,
      |    CAST(('0x' || substring(md5('ds:' || ws[i] || ' ' || ws[i+1]), 1, 15)) AS BIGINT)
      |      % $DsirBuckets AS b
      |  FROM (SELECT doc_id, lang, ws, unnest(generate_series(1, len(ws) - 1)) AS i
      |        FROM d WHERE len(ws) >= 2)),
      |rb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS rb FROM o GROUP BY 1),
      |tbl AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS tb FROM o
      |  WHERE lang = '$DsirTargetLang' GROUP BY 1),
      |tot AS (SELECT (SELECT CAST(SUM(rb) AS BIGINT) FROM rb) AS rtot,
      |               (SELECT CAST(SUM(tb) AS BIGINT) FROM tbl) AS ttot),
      |sc AS (SELECT o.doc_id, tot.rtot, tot.ttot,
      |    CAST(COALESCE(tbl.tb, 0) + 1 AS DECIMAL(38,0)) * CAST(tot.rtot + $DsirBuckets AS DECIMAL(38,0))
      |      - CAST(rb.rb + 1 AS DECIMAL(38,0)) * CAST(tot.ttot + $DsirBuckets AS DECIMAL(38,0)) AS term
      |  FROM o JOIN rb USING (b) LEFT JOIN tbl USING (b) CROSS JOIN tot),
      |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats, SUM(term) AS wnum,
      |    MAX(rtot) AS rtot, MAX(ttot) AS ttot
      |  FROM sc GROUP BY 1)
      |SELECT doc_id, n_feats,
      |  ROUND(CAST(CAST(wnum * 1000000 AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(CAST(ttot + $DsirBuckets AS DECIMAL(38,0)) * CAST(rtot + $DsirBuckets AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE), 6) AS weight_ppm_r,
      |  CAST(CASE WHEN wnum > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM agg ORDER BY doc_id""".stripMargin

  /** q204: per-term burstiness (Church & Gale 1995's "Poisson mixtures"
    * observation; Katz 1996) — for the corpus's heaviest terms, the
    * index of dispersion of the within-document term frequency among
    * the documents that CONTAIN the term: a Poisson-like content word
    * spreads (VMR ≈ its mean), a bursty boilerplate/template token
    * piles its occurrences into few documents (VMR ≫ 1). The
    * term-level cousin of q173's doc-level boilerplate n-grams and the
    * curation signal q45's stopword-ratio heuristic cannot give: it
    * separates "frequent because the language needs it" from "frequent
    * because a template repeats it".
    *
    * Engine-exact: tf/df are exact BIGINTs; Σtf and Σtf² accumulate in
    * DECIMAL(38,0) (tf² is doc-length², corpus-summed — past int64 at
    * trillion-row scale; the q192 u2 stance) and ship as VARCHAR; the
    * dispersion VMR = (df·Σtf² − (Σtf)²) / (df·Σtf) reaches its ONE
    * float division through the shared VARCHAR-mediated cast.
    *
    * Scale notes: one explode to (doc, term) counts (map-combined),
    * one term-keyed rollup — the Zipf-skewed shuffle AQE splits (the
    * q67 stance) — then a bounded global top-[[BurstTopK]] by total
    * frequency (TakeOrdered, never a corpus sort). df ≥ [[BurstMinDf]]
    * guards the VMR against tiny-sample noise. */
  val BurstTopK = 50
  val BurstMinDf = 5L

  def termBurstiness(s: SparkSession, dir: String): DataFrame =
    termBurstiness(Tables.documents(s, dir))

  def termBurstiness(docs: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val tf = docs
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        explode(filter(split(col("text"), " "), w => w =!= "")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(d38(col("tf"))).cast("decimal(38,0)").as("sum_tf"),
        sum(d38(col("tf")) * d38(col("tf"))).cast("decimal(38,0)").as("sum_tf2"))
      .filter(col("df") >= BurstMinDf)
      .orderBy(col("sum_tf").desc, col("term"))
      .limit(BurstTopK)
      .select(col("term"), col("df"),
        col("sum_tf").cast("string").as("sum_tf_s"),
        col("sum_tf2").cast("string").as("sum_tf2_s"),
        round(col("sum_tf").cast("string").cast("double") /
          col("df").cast("double"), 9).as("mean_tf_r"),
        round(
          (d38(col("df")) * col("sum_tf2") - col("sum_tf") * col("sum_tf"))
            .cast("decimal(38,0)").cast("string").cast("double") /
          (d38(col("df")) * col("sum_tf"))
            .cast("decimal(38,0)").cast("string").cast("double"), 9)
          .as("vmr_r"))
      // the projection sits above a TakeOrdered; re-assert the output
      // order on the stringified decimal (numeric, not lexicographic)
      .orderBy(col("sum_tf_s").cast("decimal(38,0)").desc, col("term"))
  }

  /** q204 oracle: identical tf rollup, decimal accumulators, top-k
    * order, and float associations. */
  def termBurstinessOracleSql: String =
    s"""WITH tok AS (SELECT doc_id,
       |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
       |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
       |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM tok GROUP BY 1, 2),
       |g AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       |    CAST(SUM(CAST(tf AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sum_tf,
       |    CAST(SUM(CAST(tf AS DECIMAL(38,0)) * CAST(tf AS DECIMAL(38,0)))
       |      AS DECIMAL(38,0)) AS sum_tf2
       |  FROM tf GROUP BY 1),
       |t AS (SELECT * FROM g WHERE df >= $BurstMinDf
       |  ORDER BY sum_tf DESC, term LIMIT $BurstTopK)
       |SELECT term, df,
       |  CAST(sum_tf AS VARCHAR) AS sum_tf_s,
       |  CAST(sum_tf2 AS VARCHAR) AS sum_tf2_s,
       |  ROUND(CAST(CAST(sum_tf AS VARCHAR) AS DOUBLE) / CAST(df AS DOUBLE), 9)
       |    AS mean_tf_r,
       |  ROUND(
       |    CAST(CAST(CAST(CAST(df AS DECIMAL(38,0)) * sum_tf2 - sum_tf * sum_tf
       |      AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) /
       |    CAST(CAST(CAST(CAST(df AS DECIMAL(38,0)) * sum_tf
       |      AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE), 9) AS vmr_r
       |FROM t ORDER BY sum_tf DESC, term""".stripMargin

  /** k-anonymity threshold for [[kAnonymity]] — groups smaller than
    * this are re-identification risks (Sweeney 2002's canonical k=5). */
  val KAnonK = 5L

  /** q211: k-anonymity audit over the quasi-identifier combination
    * (nation, market segment, account-balance band) — the privacy
    * gate that complements q43's PII scrub: redaction removes DIRECT
    * identifiers, but a record is still re-identifiable when its
    * quasi-identifier combination is shared by fewer than k people
    * (Sweeney 2002). Output is the bounded equivalence-class-size
    * histogram: for each observed group size, how many QI groups and
    * records sit at that size and whether that size is below
    * [[KAnonK]] — the one-screen readout a release reviewer reads
    * before an export ("640 records live in QI groups of size <5:
    * suppress or widen the bands").
    *
    * The balance band is `floor(c_acctbal / 1000.0)` — one double
    * division + floor, the identically-associated single-op shape both
    * engines compute bit-identically; counts are exact BIGINTs and
    * n_records is the product group_size·n_groups, so no SUM crosses
    * the engines' integer-overflow-promotion divide. NULL QI values
    * form their own group in both engines (a NULL segment is itself a
    * rare, risky combination — collapsing it would hide exactly the
    * records most worth flagging).
    *
    * Scale notes: two map-combined aggregations — the first shuffles
    * distinct QI combos (bounded by the QI domain, ≪ corpus), the
    * second shuffles distinct group SIZES (≈ O(√n) values); nothing
    * corpus-sized moves, no sort, no join. At 100 TB this is the
    * cheapest query in the governance family. */
  def kAnonymity(s: SparkSession, dir: String): DataFrame =
    kAnonymity(Tables.customer(s, dir))

  def kAnonymity(customer: DataFrame): DataFrame =
    customer
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_band"))
      .groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(count(lit(1)).as("group_size"))
      .groupBy("group_size")
      .agg(count(lit(1)).as("n_groups"))
      .select(col("group_size"), col("n_groups"),
        (col("group_size") * col("n_groups")).as("n_records"),
        (col("group_size") < lit(KAnonK)).as("at_risk"))
      .orderBy("group_size")

  /** q211 oracle: the same two-level rollup; n_records stays a product
    * of two BIGINTs (DuckDB's SUM would promote to HUGEINT). */
  val kAnonymityOracleSql: String =
    s"""WITH qi AS (SELECT c_nationkey, c_mktsegment,
      |    CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band
      |  FROM customer),
      |g AS (SELECT c_nationkey, c_mktsegment, bal_band,
      |    CAST(COUNT(*) AS BIGINT) AS group_size
      |  FROM qi GROUP BY 1, 2, 3)
      |SELECT group_size, CAST(COUNT(*) AS BIGINT) AS n_groups,
      |  group_size * CAST(COUNT(*) AS BIGINT) AS n_records,
      |  group_size < $KAnonK AS at_risk
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin
}
