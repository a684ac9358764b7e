package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Keyword relevance search — Okapi BM25 over the documents table, the
  * lexical complement of the dashboard's vector similarity search
  * (app.py:239 ranks by cosine; a curation pipeline ranks candidate
  * documents for a topic by BM25 before expensive embedding passes).
  *
  * Scale notes: per-term tf and dl are narrow per-row expressions on the
  * scan (native word counting, no explode). The corpus statistics
  * (N, Σdl, per-term df) are ONE map-side-combined aggregate producing a
  * single row, which broadcasts back onto the scan — so the whole query
  * is two passes over the corpus and shuffles only that one stats row
  * plus the global top-k (bounded TakeOrdered). No per-term shuffle, no
  * join keyed by term — the inverted-index shape is deliberately avoided
  * because with a fixed query set the document axis is the only one that
  * scales.
  */
object Search {

  val K1 = 1.2
  val B = 0.75
  val Terms: Seq[String] = Seq("spark", "join", "window")
  val TopN = 20

  /** dl + every term's tf in ONE native pass over the tokens (see
    * [[org.apache.spark.sql.graftbridge.TokenTermStats]]) — the lambda
    * formulation re-traverses the token array once per term, and a
    * lookaround regexp benches slower still. */
  private def statsCol: Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, TokenTermStats}
    ColumnBridge.column(TokenTermStats(
      ColumnBridge.expression(col("text")), Terms))
  }

  /** q60: BM25 top-20 for the fixed query [[Terms]] — doc_id, per-term
    * tfs, dl, and the rounded score; scores strictly positive (a doc
    * matching no term never ranks). Ties broken by doc_id. */
  def bm25(s: SparkSession, dir: String): DataFrame = bm25(Tables.documents(s, dir))

  def bm25(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), statsCol.as("__ts"))
      .select(
        col("doc_id") +: element_at(col("__ts"), 1).as("dl") +:
          Terms.zipWithIndex.map { case (t, i) =>
            element_at(col("__ts"), i + 2).as(s"tf_$t")
          }: _*)
    val aggCols = count(lit(1)).as("n_docs") +: sum(col("dl")).as("sum_dl") +:
      Terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    // per-term BM25 partial — evaluation order mirrors the oracle SQL
    // token for token so the doubles agree bitwise
    def part(t: String): Column = {
      val tf = col(s"tf_$t").cast("double")
      val df = col(s"df_$t").cast("double")
      val n = col("n_docs").cast("double")
      val idf = log(lit(1.0) + (n - df + 0.5) / (df + 0.5))
      idf * (tf * (K1 + 1.0)) /
        (tf + lit(K1) * (lit(1.0) - B + lit(B) * col("dl").cast("double") / avgdl))
    }
    val score = Terms.map(part).reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .withColumn("score_r", round(score, 9))
      .filter(col("score_r") > 0.0)
      .select(col("doc_id") +: col("dl") +:
        Terms.map(t => col(s"tf_$t")) :+ col("score_r"): _*)
      .orderBy(col("score_r").desc, col("doc_id"))
      .limit(TopN)
  }

  /** q67: unigram language-model quality score (the CCNet/Wikipedia-LM
    * filtering signal, here with the corpus as its own LM): every token
    * scores ln p(token) under the corpus unigram distribution; a doc's
    * score is the token-average. Low average log-prob = rare/garbled
    * vocabulary = drop candidate.
    *
    * Engine-exact: per-token ln(count/N) is quantized to an integral
    * double (round(·10⁶)) so the per-doc SUM is exact integer arithmetic
    * — order-independent across executors and equal to DuckDB's, the
    * q63 trick applied to log-probs.
    *
    * Scale notes: one explode + two shuffles (vocab count keyed by
    * token, doc re-aggregation keyed by doc_id). The token join is
    * Zipf-skewed — AQE skew-join splits the hot stopword keys (or
    * [[Skew.saltedJoin]] pre-salts them); the vocab side stays a table,
    * never a driver collect. */
  def lmScore(s: SparkSession, dir: String): DataFrame = lmScore(Tables.documents(s, dir))

  def lmScore(docs: DataFrame): DataFrame = {
    // tokenize ONCE: the (doc, term, tf) aggregate is materialized and
    // every downstream branch (vocab counts AND the per-doc score) reads
    // it — without the barrier Spark re-evaluates the exploded token
    // subtree per branch, tokenizing the corpus twice
    val tf = docs.select(col("doc_id"),
        explode(TextAnalysis.words(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val vocab = tf.groupBy(col("tok")).agg(sum(col("tf")).as("cnt"))
    val totals = vocab.agg(sum(col("cnt")).as("n_total"))
    val logp = vocab.crossJoin(broadcast(totals))
      .select(col("tok"),
        round(log(col("cnt").cast("double") / col("n_total").cast("double")) * 1e6)
          .as("logp_q"))
    val perDoc = tf.join(logp, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf").cast("double") * col("logp_q")).as("logp_sum"))
    // the average stays in integral micro-nats: ONE correctly-rounded
    // division of exact integers then round-0, where even a true x.5
    // boundary is an exactly-representable double both engines round
    // away identically. A second /1e6 division plus round(·, 9) put the
    // value on a 9th-decimal boundary where Spark's decimal-string
    // HALF_UP and DuckDB's binary rounding disagreed by 1 ulp at sf0.001.
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("logp_sum"), lit(0.0)).cast("long").as("logp_q_sum"),
        coalesce(round(col("logp_sum") / col("n_tokens").cast("double")), lit(0.0))
          .cast("long").as("avg_logp_micro"))
      .orderBy("doc_id")
  }

  /** q67 oracle: identical unigram stats, ln quantization, and exact
    * integer sums. */
  def lmScoreOracleSql: String =
    """WITH tok AS (SELECT doc_id,
      |  unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS tok
      | FROM documents),
      |vocab AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
      |tot AS (SELECT SUM(cnt) AS n_total FROM vocab),
      |logp AS (SELECT tok,
      |  round(ln(CAST(cnt AS DOUBLE) / CAST(n_total AS DOUBLE)) * 1000000.0) AS logp_q
      | FROM vocab CROSS JOIN tot),
      |pd AS (SELECT t.doc_id, COUNT(*) AS n_tokens, SUM(logp_q) AS s
      | FROM tok t JOIN logp USING (tok) GROUP BY t.doc_id)
      |SELECT d.doc_id,
      |  CAST(COALESCE(pd.n_tokens, 0) AS BIGINT) AS n_tokens,
      |  CAST(COALESCE(pd.s, 0) AS BIGINT) AS logp_q_sum,
      |  CAST(COALESCE(round(pd.s / CAST(pd.n_tokens AS DOUBLE)), 0) AS BIGINT) AS avg_logp_micro
      |FROM documents d LEFT JOIN pd USING (doc_id) ORDER BY doc_id""".stripMargin

  /** q184 fit depth: OLS over the top [[ZipfRanks]] ranks per lang. */
  val ZipfRanks = 256

  /** q184: Zipf-law fit audit per language — OLS slope/intercept of
    * (ln rank, ln freq) over each language's top-[[ZipfRanks]] words
    * (Zipf 1949; Piantadosi, Psychon Bull Rev 2014 reviews why natural
    * text sits near slope −1). Generated filler, template spam, and
    * tokenizer damage bend the rank-frequency line long before q31's
    * ratio heuristics fire — the corpus-level complement to q165's
    * per-doc entropy gate.
    *
    * Engine-exact: x = round(ln r·10⁶), y = round(ln f·10⁶) are
    * integral micro-nats (q67's quantization); all OLS moments are
    * exact integer/DECIMAL sums (order-independent, partials commute);
    * the slope num/den is scale-invariant (both axes carry the same
    * 10⁶), the intercept converts back through ONE /10⁶; the exact
    * DECIMAL numerators reach doubles through the shared
    * VARCHAR-mediated cast (q176's trap: int128→double casts are not
    * correctly rounded). n_ranks < 2 → zero denominator → NULL fit,
    * kept; NULL lang keeps its own bucket, NULLS-LAST both engines.
    *
    * Scale notes: ONE (lang, word) count shuffle over the corpus; the
    * rank window runs over the |vocab| aggregate, not the corpus, and
    * at a 100 TB vocab the q98 two-pass bucketed rank replaces it —
    * the moments and fit are unchanged. Output is |langs| rows. */
  def zipfFit(s: SparkSession, dir: String): DataFrame =
    zipfFit(Tables.documents(s, dir))

  def zipfFit(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(19,0)")
    val toD = (c: Column) => c.cast("string").cast("double")
    val freq = docs.filter(col("text").isNotNull)
      .select(col("lang"), explode(TextAnalysis.words(col("text"))).as("word"))
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("f"))
    val ranked = freq
      .withColumn("r", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("f").desc, col("word"))))
      .filter(col("r") <= ZipfRanks)
      .select(col("lang"),
        round(log(col("r").cast("double")) * 1e6).cast("long").as("x"),
        round(log(col("f").cast("double")) * 1e6).cast("long").as("y"))
    ranked.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_ranks"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"))
      .withColumn("num", dec(col("n_ranks")) * col("sxy") - dec(col("sx")) * dec(col("sy")))
      .withColumn("den", dec(col("n_ranks")) * col("sxx") - dec(col("sx")) * dec(col("sx")))
      .withColumn("inum", dec(col("sy")) * col("sxx") - dec(col("sx")) * col("sxy"))
      .select(col("lang"), col("n_ranks"), col("sx"), col("sy"),
        when(col("den") === 0, lit(null).cast("double"))
          .otherwise(round(toD(col("num")) / toD(col("den")), 6)).as("slope_r"),
        when(col("den") === 0, lit(null).cast("double"))
          .otherwise(round(toD(col("inum")) / toD(col("den")) / lit(1e6), 6))
          .as("intercept_r"))
      .orderBy(col("lang").asc_nulls_last)
  }

  /** q184 oracle: identical tokenize/rank/quantize, HUGEINT moments,
    * VARCHAR-routed doubles, NULLS LAST to match the engine. */
  def zipfFitOracleSql: String =
    s"""WITH w AS (SELECT lang,
       |  unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
       | FROM documents WHERE text IS NOT NULL),
       |f AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS f FROM w GROUP BY lang, word),
       |r AS (SELECT lang, f,
       |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY f DESC, word) AS r
       |  FROM f),
       |t AS (SELECT lang,
       |    CAST(round(ln(CAST(r AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
       |    CAST(round(ln(CAST(f AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
       |  FROM r WHERE r <= $ZipfRanks),
       |m AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_ranks,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |    SUM(CAST(x AS HUGEINT) * y) AS sxy, SUM(CAST(x AS HUGEINT) * x) AS sxx
       |  FROM t GROUP BY lang),
       |v AS (SELECT lang, n_ranks, sx, sy,
       |    CAST(n_ranks AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
       |    CAST(n_ranks AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den,
       |    CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy AS inum
       |  FROM m)
       |SELECT lang, n_ranks, sx, sy,
       |  CASE WHEN den = 0 THEN NULL
       |    ELSE ROUND(CAST(CAST(num AS VARCHAR) AS DOUBLE) / CAST(CAST(den AS VARCHAR) AS DOUBLE), 6)
       |  END AS slope_r,
       |  CASE WHEN den = 0 THEN NULL
       |    ELSE ROUND(CAST(CAST(inum AS VARCHAR) AS DOUBLE) / CAST(CAST(den AS VARCHAR) AS DOUBLE) / 1000000.0, 6)
       |  END AS intercept_r
       |FROM v ORDER BY lang NULLS LAST""".stripMargin

  /** q69: top-3 tf-idf terms per document — the classic sparse
    * featurization of a corpus (keyword extraction / topic labeling).
    *
    * Engine-exact: idf is quantized to an integral double
    * (round(ln((N+1)/(df+1))·10⁶)), so score = tf · idf_q is exact
    * integer arithmetic; ranking uses the bounded-heap TopKSimId
    * aggregate with the term's 2^50-folded md5 hash as the tiebreak id
    * (integral doubles order identically to the oracle's BIGINTs — the
    * q64 trick), so ≤3 rows per (partition, doc) enter the shuffle
    * instead of a full per-doc term sort.
    *
    * Scale notes: tf agg shuffles on (doc_id, term), df agg on term
    * (Zipf-skew → AQE), the N scalar broadcasts, and the term-string
    * recovery join is keyed by (doc_id, hash) — no window sort
    * anywhere. */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame =
    tfidfTopTerms(Tables.documents(s, dir))

  val TfidfK = 3
  private val HashFold = 1125899906842624L // 2^50

  def tfidfTopTerms(docs: DataFrame): DataFrame = {
    // same barriers as lmScore: tf is read by the df agg and the scoring
    // join, scored by the heap ranking and the term-recovery join — each
    // materialized once instead of re-deriving the tokenization per use
    val tf = docs.select(col("doc_id"),
        explode(TextAnalysis.words(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val idf = df.crossJoin(broadcast(nDocs))
      .select(col("tok"),
        round(log((col("n_docs").cast("double") + lit(1.0)) /
          (col("df").cast("double") + lit(1.0))) * 1e6).as("idf_q"))
    val scored = tf.join(idf, Seq("tok"))
      .select(col("doc_id"), col("tok"),
        (TextAnalysis.md5Long(col("tok")) % HashFold).as("tok_hash"),
        (col("tf").cast("double") * col("idf_q")).as("score"))
      .localCheckpoint()
    val top = scored.groupBy(col("doc_id"))
      .agg(Similarity.topKAgg(col("score"), col("tok_hash"), TfidfK).as("tk"))
      .select(col("doc_id"), posexplode(col("tk")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("tok_hash"), col("col.sim").cast("long").as("score"))
    top.join(scored.select(col("doc_id"), col("tok_hash"), col("tok").as("term")),
        Seq("doc_id", "tok_hash"))
      .select(col("doc_id"), col("rank"), col("term"), col("score"))
      .orderBy("doc_id", "rank")
  }

  /** q69 oracle: same quantized idf and integer scores; the ranking
    * replays as a window ordered score DESC, hash ASC. */
  def tfidfOracleSql: String =
    s"""WITH tok AS (SELECT doc_id,
       |  unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS tok
       | FROM documents),
       |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok),
       |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |idf AS (SELECT tok,
       |  round(ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)) * 1000000.0) AS idf_q
       | FROM df CROSS JOIN n),
       |sc AS (SELECT doc_id, tok,
       |  CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) % $HashFold AS tok_hash,
       |  CAST(tf AS DOUBLE) * idf_q AS score
       | FROM tf JOIN idf USING (tok)),
       |r AS (SELECT doc_id, tok, score,
       |  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, tok_hash) AS rank
       | FROM sc)
       |SELECT doc_id, CAST(rank AS BIGINT) AS rank, tok AS term, CAST(score AS BIGINT) AS score
       |FROM r WHERE rank <= $TfidfK ORDER BY doc_id, rank""".stripMargin

  /** q60 oracle: same statistics and the same expression shape (ln is
    * the one transcendental — both engines' libm are correctly rounded,
    * and the score is rounded to 9 dp on both sides). */
  def bm25OracleSql: String = {
    val tfSql = (t: String) =>
      s"CAST(len(list_filter(string_split(text,' '), w -> w = '$t')) AS BIGINT)"
    val partSql = (t: String) =>
      s"""(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_$t AS DOUBLE) + 0.5)
         |    / (CAST(df_$t AS DOUBLE) + 0.5))
         |  * (CAST(tf_$t AS DOUBLE) * ${K1 + 1.0})
         |  / (CAST(tf_$t AS DOUBLE) + $K1 * (1.0 - $B + $B * CAST(dl AS DOUBLE)
         |      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))""".stripMargin
    s"""WITH base AS (SELECT doc_id,
       |  CAST(len(list_filter(string_split(text,' '), w -> w <> '')) AS BIGINT) AS dl,
       |  ${Terms.map(t => s"${tfSql(t)} AS tf_$t").mkString(",\n  ")}
       | FROM documents),
       |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(dl) AS BIGINT) AS sum_dl,
       |  ${Terms.map(t => s"CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t").mkString(",\n  ")}
       | FROM base)
       |SELECT doc_id, dl, ${Terms.map(t => s"tf_$t").mkString(", ")},
       |  ROUND(${Terms.map(partSql).mkString("\n + ")}, 9) AS score_r
       |FROM base CROSS JOIN stats
       |WHERE ROUND(${Terms.map(partSql).mkString("\n + ")}, 9) > 0.0
       |ORDER BY score_r DESC, doc_id LIMIT $TopN""".stripMargin
  }

  /** q118: bigram LM scoring with STUPID BACKOFF (Brants et al. 2007) —
    * the LM that actually runs at web scale: no discount
    * normalization, just S(w2|w1) = c12/c1 when the bigram is attested
    * in the reference corpus, back off to 0.4·c2/N on an unseen
    * bigram, and to the 0.4·0.4/N floor on an OOV word. The reference
    * corpus is the even-doc_id half and ALL docs score against it —
    * the held-out shape CCNet-style filtering really runs (score the
    * new crawl against a trusted LM; a doc full of unseen bigrams
    * scores low). Extends q67's unigram signal with second-order
    * structure: scrambled word salad and fluent text have identical
    * unigram scores but very different bigram scores.
    *
    * Engine-exact per the q67 conventions: log-probs quantized to
    * integral micro-nats per DISTINCT bigram (a table-sized
    * projection), per-doc sums are exact integer arithmetic in
    * doubles, one correctly-rounded division for the average.
    *
    * Scale notes: grams build in the native WordShingles kernel; the
    * score table is distinct-bigram-sized and joins doc tfs by gram
    * key (Zipf-skewed → AQE skew splits); the corpus is tokenized
    * once into a checkpointed (doc, bigram, tf) frame shared by the
    * stats and scoring branches. */
  def bigramLmScore(s: SparkSession, dir: String): DataFrame =
    bigramLmScore(Tables.documents(s, dir))

  def bigramLmScore(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, WordShingles}
    def grams(d: DataFrame) = d.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(ColumnBridge.column(WordShingles(
        ColumnBridge.expression(col("text")), 2, distinct = false))).as("bg"))
    val tf = grams(docs).groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint() // tokenize once; stats + scoring both read it
    val isRef = col("doc_id") % 2 === 0
    val bi = grams(docs.filter(isRef)).groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val uni = docs.filter(isRef && col("text").isNotNull)
      .select(explode(TextAnalysis.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val totals = uni.agg(sum(col("c")).as("n_total"))
    val scored = tf.select(col("bg")).distinct()
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
      .withColumn("w2", element_at(split(col("bg"), " "), 2))
      .join(bi, Seq("bg"), "left")
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"), "left")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bg"), round(log(
        when(col("c12").isNotNull,
          col("c12").cast("double") / col("c1").cast("double"))
        .when(col("c2").isNotNull,
          lit(0.4) * col("c2").cast("double") / col("n_total").cast("double"))
        .otherwise(lit(0.4) * lit(0.4) / col("n_total").cast("double"))
      ) * 1e6).as("logp_q"))
    val perDoc = tf.join(scored, Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf").cast("double") * col("logp_q")).as("lsum"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lsum"), lit(0.0)).cast("long").as("logp_q_sum"),
        coalesce(round(col("lsum") / col("n_bigrams").cast("double")), lit(0.0))
          .cast("long").as("avg_logp_micro"))
      .orderBy("doc_id")
  }

  /** q118 oracle: identical stats halves, backoff CASE, quantization,
    * and exact integer folds. */
  def bigramLmOracleSql: String =
    """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents WHERE text IS NOT NULL),
      |g AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg FROM (
      |  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
      |  FROM w WHERE len(ws) >= 2)),
      |tfb AS (SELECT doc_id, bg, COUNT(*) AS tf FROM g GROUP BY doc_id, bg),
      |bi AS (SELECT bg, COUNT(*) AS c12 FROM g WHERE doc_id % 2 = 0 GROUP BY bg),
      |uni AS (SELECT wrd, COUNT(*) AS c FROM (
      |  SELECT doc_id, unnest(ws) AS wrd FROM w) WHERE doc_id % 2 = 0 GROUP BY wrd),
      |tot AS (SELECT SUM(c) AS n_total FROM uni),
      |sc AS (SELECT bgv.bg, round(ln(
      |    CASE WHEN bi.c12 IS NOT NULL THEN CAST(bi.c12 AS DOUBLE) / CAST(u1.c AS DOUBLE)
      |         WHEN u2.c IS NOT NULL THEN 0.4 * CAST(u2.c AS DOUBLE) / CAST(n_total AS DOUBLE)
      |         ELSE 0.4 * 0.4 / CAST(n_total AS DOUBLE) END) * 1000000.0) AS logp_q
      |  FROM (SELECT DISTINCT bg FROM tfb) bgv
      |  LEFT JOIN bi USING (bg)
      |  LEFT JOIN uni u1 ON u1.wrd = split_part(bgv.bg, ' ', 1)
      |  LEFT JOIN uni u2 ON u2.wrd = split_part(bgv.bg, ' ', 2)
      |  CROSS JOIN tot),
      |pd AS (SELECT tfb.doc_id, SUM(tfb.tf) AS nb, SUM(tfb.tf * sc.logp_q) AS s
      |  FROM tfb JOIN sc USING (bg) GROUP BY tfb.doc_id)
      |SELECT d.doc_id,
      |  CAST(COALESCE(pd.nb, 0) AS BIGINT) AS n_bigrams,
      |  CAST(COALESCE(pd.s, 0) AS BIGINT) AS logp_q_sum,
      |  CAST(COALESCE(round(pd.s / CAST(pd.nb AS DOUBLE)), 0) AS BIGINT) AS avg_logp_micro
      |FROM documents d LEFT JOIN pd USING (doc_id) ORDER BY doc_id""".stripMargin
}
