package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextAnalysis.{md5Long, words, FingerprintMod}

/** Span-level EXACT substring dedup — the published-standard third rung
  * of the exact-dedup ladder (document q22, line q178, passage q62,
  * SPAN this): Lee et al. 2022 ("Deduplicating Training Data Makes
  * Language Models Better") remove every ≥ 50-token substring that
  * occurs twice anywhere in the corpus, found there with a suffix
  * array. A distributed engine replaces the suffix array with
  * CONTENT-DEFINED anchor grams (the q52 CDC trick, word-level): an
  * anchor sits wherever the word hash ≡ 0 mod [[AnchorMask]] — a pure
  * function of the text, so the SAME substring anchors at the SAME
  * interior words in every copy regardless of its alignment within the
  * doc — and each anchor contributes the polynomial fingerprint of the
  * [[AnchorWidth]]-word gram starting there. A gram whose fingerprint
  * occurs ≥ 2× corpus-wide is a duplicated window; a run of
  * CONSECUTIVE duplicated anchors is the union of overlapping
  * duplicated windows — a duplicated REGION, reported per occurrence
  * (doc, start, end) exactly like the suffix-array recipe's output,
  * and runs of ≥ [[MinAnchors]] anchors approximate the ≥ 50-token
  * floor (expected anchor spacing is AnchorMask words).
  *
  * Deliberately PER-OCCURRENCE, not per-pair: a boilerplate span
  * stamped into d docs would emit d² pair rows (the q79 lesson) but
  * only d region rows here — the report is "cut this span", which
  * needs the occurrence, not the partner. Partners are one gram-join
  * away when wanted.
  *
  * Scale notes: everything is corpus-LINEAR — one narrow projection
  * computes per-doc word hashes and per-anchor gram folds (the hash
  * array never shuffles; anchors are ~1/AnchorMask of words), one
  * map-combined count keyed by gram fingerprint, one hash join of
  * anchors against their gram counts, and one per-doc window pass for
  * the island grouping (partitioned by doc_id — the same two-pass rank
  * machinery as q97-q99). No pair join anywhere. Fingerprint collisions
  * (mod 1e9+7) can merge unrelated grams — the standard rolling-hash
  * trade, same as q33/q52.
  *
  * Engine-exact: word hashes, gram folds, counts, and window ranks are
  * all integer arithmetic; the oracle replays the identical chain.
  */
object SubstringDedup {

  /** Anchor density: a word anchors when hash % AnchorMask == 0 —
    * expected one anchor per 8 words. */
  val AnchorMask = 8L

  /** Words per anchor gram: wide enough that a fingerprint match is a
    * real 8-word window match, narrow enough that a 20-word shared span
    * still fits whole grams. */
  val AnchorWidth = 8

  /** Minimum duplicated-anchor run per reported region: 2 anchors span
    * ≥ AnchorWidth + ~AnchorMask ≈ 16-24 words — the gate-scale stand-in
    * for Lee et al.'s 50-token production floor (one constant). */
  val MinAnchors = 2

  /** (doc_id, pos, gram) — every complete anchor gram. `pos` is the
    * 0-based word index of the anchor; grams needing words past the end
    * of the doc are skipped (both engines identically). */
  private[graft] def anchorGrams(docs: DataFrame): DataFrame = {
    val hs = transform(words(col("text")), w => md5Long(w) % FingerprintMod)
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), hs.as("hs"))
      .select(col("doc_id"), col("hs"),
        posexplode(col("hs")).as(Seq("pos", "h")))
      .filter(col("h") % AnchorMask === 0L
        && col("pos") + AnchorWidth <= size(col("hs")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        aggregate(slice(col("hs"), col("pos") + 1, lit(AnchorWidth)),
          lit(0L), (acc, x) => (acc * 31L + x) % FingerprintMod).as("gram"))
  }

  /** q216: duplicated regions — for every run of ≥ [[MinAnchors]]
    * consecutive anchors whose grams occur ≥ 2× corpus-wide (same-doc
    * repeats count: a doc pasting its own paragraph twice is
    * duplication too), one row (doc_id, span_start, span_end,
    * n_anchors, max_occ): 0-based word span [start, end), and the
    * occurrence count of the region's hottest gram — the "how stamped
    * is this boilerplate" readout. */
  def duplicatedRegions(s: SparkSession, dir: String): DataFrame =
    duplicatedRegions(Tables.documents(s, dir))

  def duplicatedRegions(docs: DataFrame): DataFrame = {
    val an = anchorGrams(docs)
    val occ = an.groupBy(col("gram")).agg(count(lit(1)).as("n_occ"))
    // ordinal over ALL of the doc's anchors, so "consecutive" means no
    // non-duplicated anchor in between
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val ord = an.withColumn("ord", row_number().over(byPos))
    val shared = ord.join(occ.filter(col("n_occ") >= 2L), Seq("gram"))
    val island = shared
      .withColumn("srn", row_number().over(byPos))
      .withColumn("island", col("ord") - col("srn"))
    island.groupBy(col("doc_id"), col("island"))
      .agg(count(lit(1)).as("n_anchors"),
        min(col("pos")).as("span_start"),
        (max(col("pos")) + AnchorWidth).as("span_end"),
        max(col("n_occ")).as("max_occ"))
      .filter(col("n_anchors") >= MinAnchors.toLong)
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("n_anchors"), col("max_occ"))
      .orderBy("doc_id", "span_start")
  }

  /** q216 oracle: the identical chain in SQL — word hashes, anchor
    * predicate, gram folds over the doc's hash list, occurrence counts,
    * the two ROW_NUMBER island ranks, and the run rollup. Oracle `pos`
    * is 1-based (range(1, len+1)) and shifts to the engine's 0-based
    * span at the edge. */
  def duplicatedRegionsOracleSql: String =
    s"""WITH d AS (SELECT doc_id,
       |    list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
       |      w -> CAST(('0x' || substring(md5(w), 1, 15)) AS BIGINT) % $FingerprintMod) AS hs
       |  FROM documents WHERE text IS NOT NULL),
       |hw AS (SELECT doc_id, hs, unnest(hs) AS h,
       |    unnest(range(1, len(hs) + 1)) AS pos1 FROM d),
       |an AS (SELECT doc_id, pos1,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), hs[pos1 : pos1 + $AnchorWidth - 1]),
       |      (acc, x) -> (acc * 31 + x) % $FingerprintMod) AS gram
       |  FROM hw WHERE h % $AnchorMask = 0 AND pos1 + $AnchorWidth - 1 <= len(hs)),
       |occ AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_occ FROM an GROUP BY 1),
       |o AS (SELECT doc_id, pos1, gram,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos1) AS ord
       |  FROM an),
       |sh2 AS (SELECT o.doc_id, o.pos1, occ.n_occ, o.ord,
       |    ROW_NUMBER() OVER (PARTITION BY o.doc_id ORDER BY o.pos1) AS srn
       |  FROM o JOIN occ USING (gram) WHERE occ.n_occ >= 2)
       |SELECT doc_id,
       |  CAST(MIN(pos1) - 1 AS BIGINT) AS span_start,
       |  CAST(MAX(pos1) - 1 + $AnchorWidth AS BIGINT) AS span_end,
       |  CAST(COUNT(*) AS BIGINT) AS n_anchors,
       |  MAX(n_occ) AS max_occ
       |FROM sh2 GROUP BY doc_id, ord - srn
       |HAVING COUNT(*) >= $MinAnchors
       |ORDER BY doc_id, span_start""".stripMargin
}
