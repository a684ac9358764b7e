package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, length}

import graft.{GraftSession, Tables}

/** Multibyte-UTF-8-injected copy of a fixture dir: the `documents`
  * table gains rows of accented Latin, CJK, emoji (incl. ZWJ
  * sequences), decomposed combining marks, RTL scripts, and the
  * classic locale traps (Turkish dotted/dotless I, German ß).
  *
  * The driver fixtures are pure ASCII, so every byte-vs-character
  * divergence between the engine and the DuckDB oracle — length vs
  * strlen, substring units, lower/upper locale rules, regex character
  * classes, NFC normalization, byte-frame splitting mid-codepoint —
  * is INVISIBLE to the clean gate. Running the full oracle compare on
  * this fixture makes those semantics value-gated, the same way
  * [[NullInject]] gates null semantics.
  */
object UnicodeInject {

  /** Fresh ids far above any fixture doc_id and [[NullInject.KeyBase]]. */
  val DocBase = 910000001L

  /** (text, lang, source) rows covering the divergence-prone planes. */
  val Samples: Seq[(String, String, String)] = Seq(
    ("Caffè latté — naïve façade, coöperate café au lait",
      "fr", "unicode_latin"),
    ("日本語のテキスト 機械学習 データ処理 大規模",
      "ja", "unicode_cjk"),
    ("rocket 🚀🔥 pair 👩‍💻 coder emoji",
      "und", "unicode_emoji"),
    ("décomposé élément résumé combining marks",
      "fr", "unicode_nfd"),
    ("العربية نص עברית טקסט mixed rtl text",
      "ar", "unicode_rtl"),
    ("Türkçe İstanbul ı I straße ß GROSS weiß",
      "tr", "unicode_locale"),
    // final-sigma trap: Java lowercases ΛΟΓΟΣ with the contextual final
    // form (…ς), utf8proc with the simple mapping (…σ)
    ("ΛΟΓΟΣ ΤΕΛΟΣ Ελληνικά κείμενο τέλος",
      "el", "unicode_greek"),
    // whitespace-class trap: Java's \s includes U+000B (vertical tab),
    // RE2's does not — the canonical-dedup whitespace collapse must use
    // an explicit char class to canonicalize this row identically in
    // engine and oracle; two rows that differ only in ws runs must land
    // in one cluster
    ("mixed\u000Bwhitespace\t run \u000B\u000B collapse test",
      "en", "unicode_ws"),
    ("mixed whitespace\trun  collapse\ntest",
      "en", "unicode_ws"))

  /** Write the injected copy of `srcDir` into `outDir` (documents get
    * the multibyte rows; every other table copies through unchanged). */
  def inject(spark: SparkSession, srcDir: String, outDir: String): Unit =
    Tables.names.foreach { n =>
      val base =
        if (n == "events") Tables.events(spark, srcDir) // ns→µs, see NullInject
        else spark.read.parquet(s"$srcDir/$n.parquet")
      val out =
        if (n == "documents") {
          import spark.implicits._
          val extra = Samples.zipWithIndex
            .map { case ((t, l, s), i) => (DocBase + i, t, l, s) }
            .toDF("doc_id", "text", "lang", "source")
            // n_chars = Spark character count; stored, never recomputed,
            // so both engines read the same value back
            .withColumn("n_chars", length(col("text")).cast("long"))
            .select(base.columns.map(col): _*)
          base.unionByName(extra)
        } else base
      out.write.mode("overwrite").parquet(s"$outDir/$n.parquet")
    }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir) = args.take(2)
    val spark = GraftSession.builder().getOrCreate()
    try inject(spark, srcDir, outDir)
    finally spark.stop()
  }
}
