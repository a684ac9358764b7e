package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table (reference analog: the CLIP text-preprocess step,
  * extracting_embeddings.py:135-152, plus the quality/selection logic a
  * curation pipeline needs at 100 TB).
  *
  * Scale notes: every operator here is a narrow, single-pass projection
  * built from codegen'd `functions._` / higher-order array functions — no
  * UDFs, no shuffles (except the caller's own aggregations). Hashes are
  * md5-based (first 15 hex chars → 60-bit long) so results are identical
  * across engines and across cluster topologies.
  */
object TextAnalysis {

  /** 60-bit deterministic hash of a string: long value of the first 15
    * hex chars of md5. Stable across Spark/DuckDB/any md5 impl. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Non-empty whitespace tokens. */
  def words(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Cross-engine lowercase. Java (Spark's non-ASCII path) applies the
    * Unicode FULL + contextual case mapping: U+0130 'İ' → "i" + combining
    * U+0307, and capital sigma takes the final form ς at word end — while
    * DuckDB/utf8proc applies the simple mapping ('İ' → plain 'i', Σ → σ
    * everywhere). Pre-folding İ and post-folding ς→σ (standard sigma
    * folding, as search engines canonicalize) makes the result identical
    * in both engines on ANY input; mirror the ς fold in the oracle
    * (`translate(lower(x), 'ς', 'σ')`) — DuckDB needs no İ pre-fold since
    * its simple mapping already lands on 'i'. Found by the UnicodeInject
    * gate, invisible on ASCII fixtures. */
  def lowerX(c: Column): Column =
    translate(lower(translate(c, "İ", "i")), "ς", "σ")

  // Tiny function-word profiles for the language-ID heuristic.
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un"))

  private def profileScore(ws: Column, profile: Seq[String]): Column =
    size(filter(ws, w => array_contains(array(profile.map(lit): _*), w))).cast("long")

  /** q30's pred_lang as ONE inline column expression (profile scores +
    * argmax cascade) — shared with the q218 label chain so producer and
    * distilled trainee can never drift, and so q218 labels in the same
    * scan that feeds its features instead of joining q30's output back
    * on doc_id. Value-identical to [[langId]]'s pred_lang column. */
  private[operators] def predLangCol(text: Column): Column = {
    val ws = words(lower(text))
    val Seq(en, es, de, fr) = profiles.map { case (_, p) => profileScore(ws, p) }
    when(en === 0 && es === 0 && de === 0 && fr === 0, "unknown")
      .when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  /** q30: n-gram/function-word language ID — per-language stopword hit
    * counts + deterministic argmax (profile order breaks ties). */
  def langId(s: SparkSession, dir: String): DataFrame = langId(Tables.documents(s, dir))

  def langId(docs: DataFrame): DataFrame = {
    val ws = words(lower(col("text")))
    val scored = docs.select(
      col("doc_id") +: profiles.map { case (l, p) => profileScore(ws, p).as(s"score_$l") }: _*)
    val Seq(en, es, de, fr) = profiles.map { case (l, _) => col(s"score_$l") }
    scored.withColumn("pred_lang",
        when(en === 0 && es === 0 && de === 0 && fr === 0, "unknown")
          .when(en >= es && en >= de && en >= fr, "en")
          .when(es >= de && es >= fr, "es")
          .when(de >= fr, "de")
          .otherwise("fr"))
      .orderBy("doc_id")
  }

  /** q186: language-ID confusion matrix — the q30 classifier audited
    * against the corpus's `lang` labels: per (label, prediction) the
    * count and within-label share. The accuracy readout any heuristic
    * (or model) language filter needs before it gates a corpus: the
    * diagonal is per-language recall, off-diagonal cells say WHICH
    * languages leak into which (the es/fr 'de la' class of confusion),
    * and the 'unknown' column is the classifier's abstention rate.
    * Reuses [[langId]] itself, so classifier and audit can never drift
    * (the q156 producer/auditor argument).
    *
    * Scale notes: one doc_id-keyed equi-join of two corpus projections
    * (same partitioning, AQE-planned), one map-side-combined count to
    * |langs|² rows, and the share window runs over that tiny matrix.
    * NULL labels coalesce to '' (q48's convention) so the join stays
    * null-safe-free and ordering engine-identical. */
  def langidConfusion(s: SparkSession, dir: String): DataFrame =
    langidConfusion(Tables.documents(s, dir))

  def langidConfusion(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pred = langId(docs).select(col("doc_id"), col("pred_lang"))
    docs.select(col("doc_id"), coalesce(col("lang"), lit("")).as("lang"))
      .join(pred, Seq("doc_id"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("label_total",
        sum(col("cnt")).over(Window.partitionBy(col("lang"))))
      .select(col("lang"), col("pred_lang"), col("cnt"), col("label_total"),
        round(col("cnt").cast("double") / col("label_total").cast("double"), 6)
          .as("share_r"))
      .orderBy("lang", "pred_lang")
  }

  /** q186 oracle: the q30 scoring chain + label join + share window. */
  val langidConfusionOracleSql: String =
    """WITH t AS (SELECT doc_id,
      |  len(list_filter(string_split(lower(text),' '), w -> list_contains(['the','a','of','and','to','in','is'], w))) AS score_en,
      |  len(list_filter(string_split(lower(text),' '), w -> list_contains(['el','la','de','y','que','en','un'], w))) AS score_es,
      |  len(list_filter(string_split(lower(text),' '), w -> list_contains(['der','die','das','und','ist','ein','nicht'], w))) AS score_de,
      |  len(list_filter(string_split(lower(text),' '), w -> list_contains(['le','la','de','et','les','des','un'], w))) AS score_fr
      | FROM documents),
      |pr AS (SELECT doc_id,
      | CASE WHEN score_en=0 AND score_es=0 AND score_de=0 AND score_fr=0 THEN 'unknown'
      |      WHEN score_en>=score_es AND score_en>=score_de AND score_en>=score_fr THEN 'en'
      |      WHEN score_es>=score_de AND score_es>=score_fr THEN 'es'
      |      WHEN score_de>=score_fr THEN 'de'
      |      ELSE 'fr' END AS pred_lang
      | FROM t),
      |j AS (SELECT COALESCE(d.lang, '') AS lang, pr.pred_lang
      |  FROM documents d JOIN pr USING (doc_id)),
      |c AS (SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM j GROUP BY lang, pred_lang)
      |SELECT lang, pred_lang, cnt,
      |  CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS label_total,
      |  ROUND(CAST(cnt AS DOUBLE) /
      |    CAST(CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS DOUBLE), 6) AS share_r
      |FROM c ORDER BY lang, pred_lang""".stripMargin

  /** q31: quality features + weighted score (length, vocabulary
    * diversity, punctuation load, function-word rate — the classic
    * heuristic filter stack for web-scale corpora). */
  def qualityScore(s: SparkSession, dir: String): DataFrame = qualityScore(Tables.documents(s, dir))

  def qualityScore(docs: DataFrame): DataFrame = {
    val ws = words(col("text"))
    val enStop = array(profiles.head._2.map(lit): _*)
    docs.select(
        col("doc_id"),
        length(col("text")).cast("double").as("n_chars_f"),
        size(ws).cast("double").as("n_words"),
        size(array_distinct(ws)).cast("double").as("n_uniq"),
        size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9 ]"), lit(0))).cast("double").as("n_punct"),
        size(filter(words(lower(col("text"))), w => array_contains(enStop, w))).cast("double").as("n_stop"))
      // empty/whitespace-only docs: ratios are DEFINED as 0.0 — an
      // unguarded 0/0 is NaN here but NULL in DuckDB, so the guard is
      // both a sane default and what keeps the oracle engine-exact
      .select(
        col("doc_id"), col("n_words"),
        when(col("n_words") > 0.0, col("n_uniq") / col("n_words"))
          .otherwise(0.0).as("uniq_ratio"),
        when(col("n_chars_f") > 0.0, col("n_punct") / col("n_chars_f"))
          .otherwise(0.0).as("punct_ratio"),
        when(col("n_words") > 0.0, col("n_stop") / col("n_words"))
          .otherwise(0.0).as("stop_ratio"))
      .withColumn("quality",
        lit(0.3) * least(col("n_words") / 200.0, lit(1.0)) +
        lit(0.3) * col("uniq_ratio") +
        lit(0.2) * (lit(1.0) - col("punct_ratio")) +
        lit(0.2) * least(col("stop_ratio") * 5.0, lit(1.0)))
      .orderBy("doc_id")
  }

  /** q32: token counting — whitespace tokens vs a BPE-ish regex
    * tokenizer (alnum runs or single punctuation marks).
    *
    * The "not whitespace" half of the token class is the EXPLICIT ASCII
    * set, not `\s` — Java's `\s` contains U+000B, RE2's does not, so on
    * a document carrying a vertical tab the two engines would disagree
    * on whether VT is a punctuation token (the same divergence class
    * [[Dedup.canonicalWsClass]] documents; caught by the unicode_ws
    * injection fixture). */
  def tokenCount(s: SparkSession, dir: String): DataFrame = tokenCount(Tables.documents(s, dir))

  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        size(words(col("text"))).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[A-Za-z0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"), lit(0))).cast("long").as("n_re_tokens"),
        length(col("text")).cast("long").as("n_chars_text"))
      .orderBy("doc_id")

  /** q33: order-sensitive document fingerprint — polynomial rolling hash
    * over per-word 60-bit hashes, mod 1e9+7 (so acc*31+x never overflows
    * a long). Equal fingerprints ⇒ equal word sequences (mod collisions);
    * unlike a set hash, reordering words changes it. */
  def fingerprint(s: SparkSession, dir: String): DataFrame = fingerprint(Tables.documents(s, dir))

  val FingerprintMod = 1000000007L

  private def modWordHashes = transform(words(col("text")), w => md5Long(w) % FingerprintMod)

  def fingerprint(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, PolyFingerprint}
    docs.select(
        col("doc_id"),
        ColumnBridge.column(PolyFingerprint(
          ColumnBridge.expression(modWordHashes), 31L, FingerprintMod)).as("fingerprint"))
      .orderBy("doc_id")
  }

  /** Interpreted HOF formulation of [[fingerprint]] — the reference
    * semantics the native kernel is spec-checked bit-identical against. */
  def fingerprintHof(docs: DataFrame): DataFrame = {
    val M = lit(FingerprintMod)
    docs.select(
        col("doc_id"),
        aggregate(modWordHashes, lit(0L), (acc, x) => (acc * 31L + x) % M).as("fingerprint"))
      .orderBy("doc_id")
  }

  /** Content-defined chunk fingerprints: words stream into chunks whose
    * boundaries are where the word hash ≡ 0 (mod `mask`), each chunk
    * identified by its rolling hash. Unlike fixed-size chunking, an
    * insertion only perturbs the chunks around the edit — the unit of
    * shift-resistant dedup between near-identical long documents.
    * Native kernel ([[org.apache.spark.sql.graftbridge.CdcChunkHashes]]);
    * [[cdcChunkFingerprintsHof]] keeps the interpreted reference fold. */
  def cdcChunkFingerprints(docs: DataFrame, mask: Int = 16): DataFrame = {
    import org.apache.spark.sql.graftbridge.{CdcChunkHashes, ColumnBridge}
    docs.select(col("doc_id"),
      ColumnBridge.column(CdcChunkHashes(
        ColumnBridge.expression(modWordHashes), mask.toLong, 31L, FingerprintMod))
        .as("chunk_hashes"))
  }

  /** q52: [[cdcChunkFingerprints]] exploded to one row per chunk —
    * (doc_id, chunk_idx, chunk_hash), the shape a shift-resistant
    * chunk-level dedup joins on (and a driver-hashable one: scalar
    * columns only). */
  def cdcChunksExploded(s: SparkSession, dir: String): DataFrame =
    cdcChunksExploded(Tables.documents(s, dir))

  def cdcChunksExploded(docs: DataFrame, mask: Int = 16): DataFrame =
    cdcChunkFingerprints(docs, mask)
      .select(col("doc_id"), posexplode(col("chunk_hashes")))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col").as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")

  /** Generated DuckDB oracle for q52: the chunking fold replayed
    * relationally — boundary words (hash ≡ 0 mod mask) close their
    * chunk, chunk membership via an exclusive running boundary count,
    * each chunk's id = the same polynomial fold over its words in order.
    * A trailing boundary-less chunk is kept only when its fold ≠ 0,
    * exactly as the kernel emits it. */
  def cdcChunksOracleSql(mask: Int = 16): String =
    s"""WITH hw AS (
       |  SELECT doc_id, unnest(hs) AS h, unnest(range(1, len(hs) + 1)) AS pos
       |  FROM (SELECT doc_id,
       |          list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
       |            w2 -> CAST(('0x' || substring(md5(w2), 1, 15)) AS BIGINT) % $FingerprintMod) AS hs
       |        FROM documents) d),
       |b AS (SELECT doc_id, h, pos,
       |  CASE WHEN h % $mask = 0 THEN 1 ELSE 0 END AS is_b,
       |  COALESCE(SUM(CASE WHEN h % $mask = 0 THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY doc_id ORDER BY pos
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_no
       | FROM hw),
       |c AS (SELECT doc_id, chunk_no,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT), list(h ORDER BY pos)),
       |    (acc, x) -> (acc * 31 + x) % $FingerprintMod) AS chunk_hash,
       |  MAX(is_b) AS has_boundary
       | FROM b GROUP BY doc_id, chunk_no)
       |SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_idx, chunk_hash
       |FROM c WHERE has_boundary = 1 OR chunk_hash <> 0
       |ORDER BY doc_id, chunk_idx""".stripMargin

  /** Interpreted HOF formulation of [[cdcChunkFingerprints]] (struct-fold
    * reference semantics, spec cross-checked). */
  def cdcChunkFingerprintsHof(docs: DataFrame, mask: Int = 16): DataFrame =
    docs.selectExpr("doc_id",
      s"""aggregate(
         |  transform(filter(split(text, ' '), w -> w != ''),
         |    w -> cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint) % 1000000007),
         |  named_struct('acc', cast(0 as bigint), 'chunks', cast(array() as array<bigint>)),
         |  (st, h) -> CASE WHEN h % $mask = 0
         |    THEN named_struct('acc', cast(0 as bigint),
         |           'chunks', array_append(st.chunks, (st.acc * 31 + h) % 1000000007))
         |    ELSE named_struct('acc', (st.acc * 31 + h) % 1000000007, 'chunks', st.chunks) END,
         |  st -> CASE WHEN st.acc <> 0 THEN array_append(st.chunks, st.acc)
         |        ELSE st.chunks END) as chunk_hashes""".stripMargin)

  /** q34: CLIP-style text assembly — concat metadata fields + body,
    * truncate, casefold (extracting_embeddings.py:135-152 builds
    * title+subject+creator+type+description[:150]). */
  /** Buckets for [[featureHash]] — small on purpose so the gated output
    * stays a fixed wide row per doc (the driver's comparator needs
    * scalar columns; at 2^18+ buckets you'd emit the sparse (bucket,
    * cnt) pairs instead, same plan shape). */
  val FhBuckets = 16

  /** q89: feature hashing (the hashing trick, Weinberger et al. 2009) —
    * per-document bag-of-words folded into a fixed 16-bucket count
    * vector via the md5 bucket of each word, flattened to f0..f15
    * columns. The fixed-width featurization step before any linear
    * model / clustering over text; vocabulary-free, so new corpus
    * batches never change the schema.
    *
    * Scale notes: narrow per-row work (split + hash + 16 conditional
    * sums after one explode), one map-combined agg keyed by doc_id —
    * no vocabulary table, no join, schema fixed regardless of corpus. */
  def featureHash(s: SparkSession, dir: String): DataFrame =
    featureHash(Tables.documents(s, dir))

  def featureHash(docs: DataFrame): DataFrame = {
    val words = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(TextAnalysis.words(col("text"))).as("w"))
      .select(col("doc_id"),
        (md5Long(concat_ws(":", lit("fh"), col("w"))) % FhBuckets).as("b"))
    val aggs = (0 until FhBuckets).map(i =>
      sum(when(col("b") === i, 1L).otherwise(0L)).as(s"f$i"))
    words.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .orderBy("doc_id")
  }

  /** q89 oracle: identical hash buckets and conditional sums. */
  def featureHashOracleSql: String = {
    val cols = (0 until FhBuckets).map(i =>
      s"CAST(SUM(CASE WHEN b = $i THEN 1 ELSE 0 END) AS BIGINT) AS f$i").mkString(",\n  ")
    s"""WITH w AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
       |  FROM documents WHERE text IS NOT NULL),
       |b AS (SELECT doc_id,
       |  CAST(('0x' || substring(md5('fh:' || w), 1, 15)) AS BIGINT) % $FhBuckets AS b FROM w)
       |SELECT doc_id,
       |  $cols
       |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  def preprocess(s: SparkSession, dir: String): DataFrame = preprocess(Tables.documents(s, dir))

  def preprocess(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        lowerX(trim(substring(
          concat_ws(" ", coalesce(col("source"), lit("")), coalesce(col("lang"), lit("")), col("text")),
          1, 150))).as("clip_text"))
      .orderBy("doc_id")
}

/** Character-distribution quality signals over `documents` — the
  * information-theoretic complement to [[TextAnalysis]]'s ratio scores
  * (q31): machine-generated filler, binary-in-text mojibake, and
  * keyboard-mash spam all sit at entropy extremes that length/punct
  * ratios miss, so corpus-quality filters (Gopher/C4-style heuristics)
  * gate on character entropy alongside them. Reference anchor: the
  * cleansing layer's text-quality gates (eu_raw_to_cleansed_merge.py:
  * 33-60 trims and validates description text; entropy is that gate
  * armed against adversarial filler).
  *
  * Split in its own object: the per-character explode is a deliberately
  * different cost shape (rows × avg_len intermediate) than the cheap
  * per-row scorers in [[TextAnalysis]]. */
object CharEntropy {

  /** q165: per-doc Shannon entropy (nats) over Unicode code points.
    *
    * Engine-exact: H = ln(n) − (Σ cᵢ·ln cᵢ)/n is computed with q67's
    * integral-micro quantization — each ln is rounded to an integral
    * double of micro-nats, so every product/sum below 2⁵³ is exact
    * integer arithmetic and the one final division is IEEE-identical;
    * both engines split on code points (Java regex and RE2 both advance
    * zero-width matches by code point, never through a surrogate pair).
    *
    * Scale notes: explode → two map-combined aggregations keyed
    * (doc_id, ch) then (doc_id); the first combiner collapses the
    * character stream back to ≤ |alphabet| rows per doc per partition,
    * so the shuffle carries ~distinct-chars × docs rows, not corpus
    * characters. No window, no driver state. */
  def charEntropy(s: SparkSession, dir: String): DataFrame =
    charEntropy(graft.Tables.documents(s, dir))

  def charEntropy(docs: DataFrame): DataFrame = {
    def d(c: Column) = c.cast("double")
    val ch = docs
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        explode(filter(split(col("text"), ""), c => c =!= "")).as("ch"))
    val per = ch.groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_cp"),
        count(lit(1)).as("n_distinct"),
        sum(d(col("c")) * round(log(d(col("c"))) * 1e6)).as("s"))
    per.select(col("doc_id"), col("n_cp"), col("n_distinct"),
        round((round(log(d(col("n_cp"))) * 1e6) * d(col("n_cp")) - col("s"))
          / (d(col("n_cp")) * 1e6), 6).as("entropy_r"))
      .orderBy("doc_id")
  }

  /** q165 oracle: identical quantized-ln chain over the same code-point
    * split. */
  def charEntropyOracleSql: String =
    """WITH ch AS (SELECT doc_id,
      |    unnest(list_filter(regexp_split_to_array(text, ''), c -> c <> '')) AS ch
      |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
      |c AS (SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c FROM ch GROUP BY 1, 2),
      |p AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_cp,
      |    CAST(COUNT(*) AS BIGINT) AS n_distinct,
      |    SUM(CAST(c AS DOUBLE) * round(ln(CAST(c AS DOUBLE)) * 1000000.0)) AS s
      |  FROM c GROUP BY 1)
      |SELECT doc_id, n_cp, n_distinct,
      |  ROUND((round(ln(CAST(n_cp AS DOUBLE)) * 1000000.0) * CAST(n_cp AS DOUBLE) - s)
      |    / (CAST(n_cp AS DOUBLE) * 1000000.0), 6) AS entropy_r
      |FROM p ORDER BY doc_id""".stripMargin
}
