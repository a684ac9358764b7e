package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q218: TRAINED one-vs-rest multiclass language classifier — q217's
  * integer-gradient discipline applied to langid (the fastText
  * `lid.176` shape: linear one-vs-rest over hashed bag-of-words,
  * Joulin et al. 2016). Labels come from q30's function-word heuristic
  * (model distillation: the trained member generalizes the heuristic's
  * judgment to documents whose function words are sparse), and the
  * confusion readout against the corpus labels is q186's — producer
  * and auditor stay separate.
  *
  * Mechanics, all replayed bit-for-bit by the oracle:
  *  - FEATURES: q89's hashed bag-of-words micro frequencies + bias
  *    (the q217 feature frame, label column riding the one aggregate).
  *  - LABELS: q30's pred_lang over the same docs (en/es/de/fr/
  *    unknown); class c's binary target is 10⁶·[pred_lang = c] for the
  *    four real languages ("unknown" docs are negatives everywhere).
  *  - TRAINING: per class, [[QualityClassifier.Rounds]] full-batch
  *    integer gradient rounds on ONE shared md5-strided sample
  *    (≤ ~[[QualityClassifier.TrainTarget]] rows), exact rational
  *    sigmoid, integer weights — the q217 chain, four times. All four
  *    classes train from the SAME checkpointed stride, so the corpus
  *    is read once.
  *  - PREDICTION: argmax of the four micro scores with q30's own
  *    cascade order breaking ties (en ≥ es ≥ de ≥ fr), abstaining to
  *    'unknown' when every score < ½ — the multiclass analog of q217's
  *    pred = score ≥ ½.
  *
  * Output: (doc_id, heur_lang, pred_lang, score_micro) — score_micro =
  * the winning class's score (max score when abstaining). Docs with no
  * words / NULL text carry no features and are excluded, as in q89/
  * q217. Scale shape: one feature aggregate + 4·Rounds bounded
  * 17-column aggregates on the stride + one embarrassingly-parallel
  * scoring projection. */
object LangClassifier {

  import QualityClassifier.{B, trainMod, trainModSql, zSql}

  /** The four trained classes, in q30's tie-break order. */
  val Classes: Seq[String] = TextAnalysis.profiles.map(_._1)

  /** One-vs-rest training is 1:3-imbalanced (each class's positives are
    * ~a third of the stride), so q217's (lr 4, 4 rounds) leaves the
    * correct class's score under the abstention threshold: the ~1400-
    * per-round integer steps need ~2 orders more magnitude for
    * σ̃(z) > ½ to fire on in-class docs. 8 rounds at lr 64 clears it
    * (spec-measured: planted 3-language agreement 1.0 with every
    * winning score ≥ ½) and stays overflow-safe: |err·x| ≤ 10¹² per
    * row, weights ≤ ~10⁶, z ≤ ~17·10⁶ ≪ 2⁶³. */
  val Rounds = 8
  val Lr = 64L

  /** One scan: q30's inline argmax cascade labels the same projection
    * that feeds the feature build — no doc_id self-join, no q30 global
    * sort (values identical: [[TextAnalysis.predLangCol]] IS q30's
    * pred_lang expression). */
  private def labeled(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        TextAnalysis.predLangCol(col("text")).as("heur_lang"), col("text"))

  def trainScore(s: SparkSession, dir: String): DataFrame =
    trainScore(Tables.documents(s, dir))

  def trainScore(docs: DataFrame): DataFrame = {
    val x = QualityClassifier.featureFrameWith(labeled(docs), Seq("heur_lang"))
      .localCheckpoint()
    val mod = trainMod(x.count())
    // mod == 1 keeps EVERY row, so the stride frame IS x — reuse its
    // checkpoint instead of re-materializing the same rows (round-13)
    val tr = if (mod == 1L) x
      else x.filter(TextAnalysis.md5Long(
        concat_ws(":", lit("lc"), col("doc_id"))) % mod === 0L)
        .localCheckpoint()
    // per-class integer weight chains (q217's loop), with each round's
    // FOUR independent per-class gradients fused into ONE aggregate over
    // the stride: the classes share the training rows and only differ in
    // weights/targets, so one 4·17-column map-combined agg replaces four
    // 17-column aggs — Rounds jobs instead of Classes·Rounds (32 -> 8),
    // same integer arithmetic per class, bit-identical weights. The
    // stride row count rides that aggregate (no separate count job);
    // nTr == 0 -> sums are NULL, all weights stay 0, every score is
    // 500000, argmax abstains to 'unknown' (the oracle's CASE-guarded
    // update agrees)
    val ws: Map[String, Array[Long]] =
      Classes.map(c => c -> Array.fill(B + 1)(0L)).toMap
    var nTr = -1L
    for (_ <- 0 until Rounds if nTr != 0L) {
      val withErr = Classes.foldLeft(tr) { (df, c) =>
        df.withColumn(s"z_$c", expr(zSql(ws(c))))
          .withColumn(s"err_$c",
            expr(s"(500000 + (z_$c * 500000) div (1000000 + abs(z_$c)))") -
              when(col("heur_lang") === c, 1000000L).otherwise(0L))
      }
      val aggs = count(lit(1)).as("n") +: Classes.flatMap(c =>
        (0 to B).map(i => sum(expr(s"err_$c * x$i")).as(s"g_${c}_$i")))
      val g = withErr.agg(aggs.head, aggs.tail: _*).first()
      nTr = g.getLong(0)
      var idx = 1
      Classes.foreach { c =>
        val w = ws(c)
        var i = 0
        while (i <= B && nTr != 0L) {
          w(i) -= Lr * (g.getLong(idx) / (nTr * 1000000L))
          i += 1; idx += 1
        }
      }
    }
    val scored = Classes.foldLeft(x) { (df, c) =>
      df.withColumn(s"z_$c", expr(zSql(ws(c))))
        .withColumn(s"s_$c",
          expr(s"500000 + (z_$c * 500000) div (1000000 + abs(z_$c))"))
    }
    val Seq(en, es, de, fr) = Classes.map(c => col(s"s_$c"))
    scored.select(col("doc_id"), col("heur_lang"),
        when(en < 500000L && es < 500000L && de < 500000L && fr < 500000L,
          "unknown")
          .when(en >= es && en >= de && en >= fr, "en")
          .when(es >= de && es >= fr, "es")
          .when(de >= fr, "de")
          .otherwise("fr").as("pred_lang"),
        greatest(en, es, de, fr).as("score_micro"))
      .orderBy("doc_id")
  }

  /** q218 oracle: q30's label chain + the q217 feature/stride CTEs +
    * four unrolled per-class round chains (prefixed CTEs), then the
    * identical argmax cascade. */
  def trainScoreOracleSql: String = {
    val xcols = (0 until B).map(i =>
      s"CAST(SUM(CASE WHEN b = $i THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS x${i + 1}")
      .mkString(",\n  ")
    def zOf(wAlias: String, xAlias: String) =
      "(" + (0 to B).map(i => s"$wAlias.w$i * $xAlias.x$i").mkString(" + ") +
        ") // 1000000"
    def classChain(c: String): String = {
      val w0 = (0 to B).map(i => s"CAST(0 AS BIGINT) AS w$i").mkString(", ")
      val rounds = (1 to Rounds).map { r =>
        val gcols = (0 to B).map(i =>
          s"CAST(SUM(err * x$i) AS BIGINT) AS g$i").mkString(", ")
        val wcols = (0 to B).map(i =>
          s"CASE WHEN g.n = 0 THEN w.w$i ELSE w.w$i - $Lr * (g.g$i // (g.n * 1000000)) END AS w$i")
          .mkString(",\n    ")
        s"""${c}_g$r AS (SELECT COUNT(*) AS n, $gcols FROM (
           |  SELECT t.*, (500000 + (z * 500000) // (1000000 + abs(z)))
           |    - (CASE WHEN t.heur_lang = '$c' THEN 1000000 ELSE 0 END) AS err
           |  FROM (SELECT t.*, ${zOf("w", "t")} AS z
           |        FROM tr t CROSS JOIN ${c}_w${r - 1} w) t)),
           |${c}_w$r AS (SELECT
           |    $wcols
           |  FROM ${c}_w${r - 1} w CROSS JOIN ${c}_g$r g)""".stripMargin
      }.mkString(",\n")
      s"${c}_w0 AS (SELECT $w0),\n$rounds"
    }
    val scoreCols = Classes.map { c =>
      s"(500000 + ((${zOf(s"${c}_w$Rounds", "x")}) * 500000) // (1000000 + abs(${zOf(s"${c}_w$Rounds", "x")}))) AS s_$c"
    }.mkString(",\n  ")
    val fromTables = s"x CROSS JOIN " +
      Classes.map(c => s"${c}_w$Rounds").mkString(" CROSS JOIN ")
    s"""WITH lt AS (SELECT doc_id, text,
       |  len(list_filter(string_split(lower(text),' '), w -> list_contains(['the','a','of','and','to','in','is'], w))) AS score_en,
       |  len(list_filter(string_split(lower(text),' '), w -> list_contains(['el','la','de','y','que','en','un'], w))) AS score_es,
       |  len(list_filter(string_split(lower(text),' '), w -> list_contains(['der','die','das','und','ist','ein','nicht'], w))) AS score_de,
       |  len(list_filter(string_split(lower(text),' '), w -> list_contains(['le','la','de','et','les','des','un'], w))) AS score_fr
       | FROM documents WHERE text IS NOT NULL),
       |d AS (SELECT doc_id,
       |  CASE WHEN score_en=0 AND score_es=0 AND score_de=0 AND score_fr=0 THEN 'unknown'
       |       WHEN score_en>=score_es AND score_en>=score_de AND score_en>=score_fr THEN 'en'
       |       WHEN score_es>=score_de AND score_es>=score_fr THEN 'es'
       |       WHEN score_de>=score_fr THEN 'de'
       |       ELSE 'fr' END AS heur_lang, text
       | FROM lt),
       |wb AS (SELECT doc_id, heur_lang,
       |    CAST(('0x' || substring(md5('fh:' || w), 1, 15)) AS BIGINT) % $B AS b
       |  FROM (SELECT doc_id, heur_lang,
       |      unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
       |    FROM d)),
       |x AS MATERIALIZED (SELECT doc_id, heur_lang, CAST(1000000 AS BIGINT) AS x0,
       |  $xcols
       |  FROM wb GROUP BY doc_id, heur_lang),
       |nx AS MATERIALIZED (SELECT COUNT(*) AS c FROM x),
       |tm AS MATERIALIZED (SELECT ${trainModSql("(SELECT c FROM nx)")} AS v),
       |tr AS MATERIALIZED (SELECT * FROM x
       |  WHERE CAST(('0x' || substring(md5('lc:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
       |    % (SELECT v FROM tm) = 0),
       |${Classes.map(classChain).mkString(",\n")}
       |SELECT doc_id, heur_lang,
       |  CASE WHEN s_en < 500000 AND s_es < 500000 AND s_de < 500000 AND s_fr < 500000 THEN 'unknown'
       |       WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
       |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
       |       WHEN s_de >= s_fr THEN 'de'
       |       ELSE 'fr' END AS pred_lang,
       |  CAST(GREATEST(s_en, s_es, s_de, s_fr) AS BIGINT) AS score_micro
       |FROM (SELECT x.doc_id, x.heur_lang, $scoreCols
       |      FROM $fromTables)
       |ORDER BY doc_id""".stripMargin
  }
}
