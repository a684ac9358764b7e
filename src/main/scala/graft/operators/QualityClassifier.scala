package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q217: TRAINED discriminative quality classifier — the
  * fastText/DCLM/FineWeb-Edu-class corpus filter (Li et al. 2024,
  * "DataComp-LM"; Penedo et al. 2024, "FineWeb"): a linear classifier
  * over hashed bag-of-words features, trained against a labeled split
  * and applied to every document. Completes the repo's quality ladder —
  * heuristic ratios (q31), LM perplexity (q67/q118), importance
  * weighting (q174) — with the published standard's TRAINED member.
  *
  * Spark-first, deterministic, oracle-replayable (the q63 Lloyd
  * discipline applied to gradient descent):
  *
  *  - FEATURES: the q89 hashed bag-of-words — md5("fh:"+word) mod
  *    [[TextAnalysis.FhBuckets]] counts, per-doc normalized to micro
  *    frequencies by INTEGER division (c·10⁶ div n_words), plus a 10⁶
  *    bias. Bounded width (17 longs/doc), one explode + one map-side-
  *    combined aggregate — corpus-linear at any scale.
  *  - LABELS: a deterministic source-quality rule (even numeric source
  *    suffix = curated, the stand-in for "reference corpus vs crawl" —
  *    DCLM's positive/negative construction). Both engines gate the
  *    suffix behind the SAME anchored digits-only regex (1–18 digits,
  *    so the cast can never overflow or parse '1.5'/'1e3'/19-digit
  *    strings differently) before casting — malformed suffixes land in
  *    the negative class identically in Spark and DuckDB.
  *  - TRAINING: [[Rounds]] full-batch gradient rounds on an md5-strided
  *    doc sample (≤ ~[[TrainTarget]] rows via the power-of-two ladder
  *    [[trainMod]] — the q65 FAISS-style sampled-training stance, which
  *    is ALSO what bounds the gradient sums: |err·x| ≤ 10¹² per row,
  *    ≤ 2¹⁶ rows ⇒ ≤ 6.6·10¹⁶ ≪ 2⁶³). The sigmoid is the EXACT
  *    RATIONAL surrogate σ̃(z) = ½ + z/(2(1+|z|)) in micro fixed-point
  *    (500000 + z·500000 div (10⁶+|z|)) — no exp(), so there is no
  *    cross-engine transcendental to disagree on; Spark `div`, DuckDB
  *    `//`, and Scala `/` all truncate toward zero (verified), and the
  *    weight state after every round is an exact integer vector, so
  *    both engines replay the identical round chain bit-for-bit.
  *  - Each round is ONE 17-column map-side-combined aggregate over the
  *    checkpointed training frame; weights live on the driver as 17
  *    longs (the q63 centroid pattern). Scoring applies the final
  *    integer weights to EVERY feature row — embarrassingly parallel,
  *    no shuffle beyond the feature build.
  *
  * Output: (doc_id, label, score_micro, pred) — pred = score ≥ ½.
  * Docs with no words (or NULL text/source) carry no features and are
  * excluded, exactly as q89 excludes them. */
object QualityClassifier {

  /** Gradient rounds and integer learning rate (features are ~1/16-scale
    * frequencies, so lr 4 converges the planted fixture in 4 rounds —
    * spec-measured at accuracy 1.0). */
  val Rounds = 4
  val Lr = 4L

  /** Training-sample row target; the power-of-two stride ladder keeps
    * per-round gradient sums overflow-safe and training cost flat at
    * any corpus size. Gate fixtures (≤ 65536 docs) train on everything,
    * so gate values are stride-invariant there. */
  val TrainTarget = 65536L

  def trainMod(n: Long): Long = {
    var m = 1L
    while (n > TrainTarget * m) m *= 2
    m
  }

  /** SQL twin of [[trainMod]] (arms cover corpora to 2⁴⁰ docs). */
  def trainModSql(nExpr: String): String = {
    val arms = Iterator.iterate(1L)(_ * 2).takeWhile(_ <= (1L << 40))
      .map(m => s"WHEN $nExpr <= ${TrainTarget * m} THEN $m")
      .mkString(" ")
    s"(CASE $arms ELSE ${1L << 41} END)"
  }

  private[operators] val B = TextAnalysis.FhBuckets // 16 hashed buckets + bias

  /** Per-doc micro feature row for any label column: input must carry
    * (doc_id, <labels...>, text); output is (doc_id, <labels...>,
    * x0 (bias), x1..x16) — the q89 hashed bag-of-words as micro
    * frequencies, label columns riding the one map-side-combined
    * aggregate for free. Shared by q217 and the q218 one-vs-rest
    * langid classifier. */
  private[operators] def featureFrameWith(base: DataFrame,
      labelCols: Seq[String]): DataFrame = {
    val labels = labelCols.map(col)
    val wb = base
      .select(col("doc_id") +: labels :+
        explode(TextAnalysis.words(col("text"))).as("w"): _*)
      .select(col("doc_id") +: labels :+
        (TextAnalysis.md5Long(concat_ws(":", lit("fh"), col("w"))) % B).as("b"): _*)
    val aggs = (0 until B).map(i =>
      sum(when(col("b") === i, 1L).otherwise(0L)).as(s"c$i")) :+
      count(lit(1)).as("nw")
    val counts = wb.groupBy(col("doc_id") +: labels: _*).agg(aggs.head, aggs.tail: _*)
    val xs = (0 until B).map(i => expr(s"c$i * 1000000 div nw").as(s"x${i + 1}"))
    counts.select(col("doc_id") +: labels ++:
      lit(1000000L).as("x0") +: xs: _*)
  }

  /** Per-doc micro feature row: doc_id, y (micro label), x0 (bias) ..
    * x16. Same bucket hash as q89's featureHash. */
  private[operators] def featureFrame(docs: DataFrame): DataFrame =
    featureFrameWith(docs
      .filter(col("text").isNotNull && col("source").isNotNull)
      .select(col("doc_id"),
        when(expr("substring(source, 4)").rlike("^[0-9]{1,18}$") &&
            expr("try_cast(substring(source, 4) AS LONG)") % 2 === 0,
          1000000L).otherwise(0L).as("y"),
        col("text")), Seq("y"))

  private[operators] def zSql(w: Array[Long], prefix: String = ""): String =
    "(" + (0 to B).map(i => s"${w(i)}L * ${prefix}x$i").mkString(" + ") +
      ") div 1000000"

  def trainScore(s: SparkSession, dir: String): DataFrame =
    trainScore(Tables.documents(s, dir))

  /** q217's gated surface: the raw chain plus its presentation sort. */
  def trainScore(docs: DataFrame): DataFrame =
    trainScoreRaw(docs).orderBy("doc_id")

  /** The train+score chain WITHOUT the final global sort — q219 consumes
    * the scores into joins/aggregates where the sort is pure waste (it
    * sits behind a localCheckpoint barrier there, so Catalyst's
    * EliminateSorts cannot remove it). Values identical to
    * [[trainScore]] modulo row order. */
  private[operators] def trainScoreRaw(docs: DataFrame): DataFrame = {
    val x = featureFrame(docs).localCheckpoint() // scored once, trained R×
    val mod = trainMod(x.count())
    // mod == 1 keeps EVERY row (md5 % 1 = 0 identically), so the stride
    // frame IS x — reuse the existing checkpoint instead of paying a
    // second materialization of the same rows (round-13; the filter
    // only exists past TrainTarget docs)
    val tr = if (mod == 1L) x
      else x.filter(TextAnalysis.md5Long(
        concat_ws(":", lit("qc"), col("doc_id"))) % mod === 0L)
        .localCheckpoint() // R gradient passes read it
    val w = Array.fill(B + 1)(0L)
    // the stride row count rides the first gradient aggregate (one job
    // instead of a separate count + R aggs). nTr == 0 (zero-row corpus,
    // or a stride that selects no rows on a >TrainTarget corpus): no
    // gradients exist — the sums come back NULL, weights stay 0 and
    // every scored row gets z = 0 → score 500000. The oracle's round
    // chain agrees: its weight update is CASE-guarded on g.n = 0.
    var nTr = -1L
    for (_ <- 0 until Rounds if nTr != 0L) {
      val g = tr
        .withColumn("z", expr(zSql(w)))
        .withColumn("err",
          expr("(500000 + (z * 500000) div (1000000 + abs(z))) - y"))
        .agg(count(lit(1)).as("n"),
          (0 to B).map(i => sum(expr(s"err * x$i")).as(s"g$i")): _*)
        .first()
      nTr = g.getLong(0)
      var i = 0
      while (i <= B && nTr != 0L) {
        // Scala / truncates toward zero, same as Spark div / DuckDB //
        w(i) -= Lr * (g.getLong(i + 1) / (nTr * 1000000L))
        i += 1
      }
    }
    x.withColumn("z", expr(zSql(w)))
      .withColumn("score_micro",
        expr("500000 + (z * 500000) div (1000000 + abs(z))"))
      .select(col("doc_id"),
        expr("y div 1000000").as("label"),
        col("score_micro"),
        when(col("score_micro") >= 500000L, 1L).otherwise(0L).as("pred"))
  }

  /** q217 oracle: the identical feature build, stride, and
    * [[Rounds]]-round weight chain unrolled in SQL — each round's
    * weights are 1-row CTEs derived from the previous round's gradient
    * aggregate, exactly the q63 Lloyd-oracle pattern. */
  def trainScoreOracleSql: String = {
    val xcols = (0 until B).map(i =>
      s"CAST(SUM(CASE WHEN b = $i THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS x${i + 1}")
      .mkString(",\n  ")
    def zOf(wAlias: String, xAlias: String) =
      "(" + (0 to B).map(i => s"$wAlias.w$i * $xAlias.x$i").mkString(" + ") +
        ") // 1000000"
    val w0 = (0 to B).map(i => s"CAST(0 AS BIGINT) AS w$i").mkString(", ")
    val rounds = (1 to Rounds).map { r =>
      val gcols = (0 to B).map(i =>
        s"CAST(SUM(err * x$i) AS BIGINT) AS g$i").mkString(", ")
      // g.n = 0 guard: an empty training stride leaves the weights
      // unchanged (NULL-safe), mirroring the Spark-side nTr == 0 skip
      val wcols = (0 to B).map(i =>
        s"CASE WHEN g.n = 0 THEN w.w$i ELSE w.w$i - $Lr * (g.g$i // (g.n * 1000000)) END AS w$i")
        .mkString(",\n    ")
      s"""g$r AS (SELECT COUNT(*) AS n, $gcols FROM (
         |  SELECT t.*, (500000 + (z * 500000) // (1000000 + abs(z))) - t.y AS err
         |  FROM (SELECT t.*, ${zOf("w", "t")} AS z
         |        FROM tr t CROSS JOIN w${r - 1} w) t)),
         |w$r AS (SELECT
         |    $wcols
         |  FROM w${r - 1} w CROSS JOIN g$r g)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (SELECT doc_id,
       |    CAST(CASE WHEN regexp_full_match(substr(source, 4), '[0-9]{1,18}')
       |      AND TRY_CAST(substr(source, 4) AS BIGINT) % 2 = 0
       |      THEN 1000000 ELSE 0 END AS BIGINT) AS y, text
       |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
       |wb AS (SELECT doc_id, y,
       |    CAST(('0x' || substring(md5('fh:' || w), 1, 15)) AS BIGINT) % $B AS b
       |  FROM (SELECT doc_id, y,
       |      unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
       |    FROM d)),
       |x AS MATERIALIZED (SELECT doc_id, y, CAST(1000000 AS BIGINT) AS x0,
       |  $xcols
       |  FROM wb GROUP BY doc_id, y),
       |nx AS MATERIALIZED (SELECT COUNT(*) AS c FROM x),
       |tm AS MATERIALIZED (SELECT ${trainModSql("(SELECT c FROM nx)")} AS v),
       |tr AS MATERIALIZED (SELECT * FROM x
       |  WHERE CAST(('0x' || substring(md5('qc:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
       |    % (SELECT v FROM tm) = 0),
       |w0 AS (SELECT $w0),
       |$rounds
       |SELECT doc_id, CAST(y // 1000000 AS BIGINT) AS label,
       |  CAST(500000 + (z * 500000) // (1000000 + abs(z)) AS BIGINT) AS score_micro,
       |  CAST(CASE WHEN 500000 + (z * 500000) // (1000000 + abs(z)) >= 500000
       |    THEN 1 ELSE 0 END AS BIGINT) AS pred
       |FROM (SELECT x.*, ${zOf("w", "x")} AS z
       |      FROM x CROSS JOIN w$Rounds w)
       |ORDER BY doc_id""".stripMargin
  }
}
