package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fixed-size frequency sketches for streaming/serving stats — the
  * count-min sketch (Cormode & Muthukrishnan 2005): d hash rows × w
  * counters; point estimate = min over rows of the hashed counter.
  * Always an overestimate, error ≤ N·e/w with probability 1−e^−d.
  *
  * The dashboard's per-facet counters (app.py:140) recomputed exactly
  * per query don't survive a 100 TB event stream; a CMS is the standard
  * fixed-memory stand-in. Scale notes: sketch construction is ONE
  * map-side-combined aggregate (the d×w counter table is the whole
  * shuffle — at most d·w rows regardless of input size, the definition
  * of a sketch); estimation broadcasts the tiny counter table. Hashes
  * are md5-derived, so any engine reproduces the same cells — which is
  * what lets the DuckDB oracle value-check est AND true counts. */
object Sketch {

  val D = 4    // hash rows
  val W = 512  // counters per row
  val ProbeMax = 25L

  /** All D cells from ONE salted md5: hash row r takes bits [15r, 15r+15)
    * of the 60-bit hash, reduced mod W — uniform because 2^15 is a
    * multiple of W, and the chunks are independent. One digest per input
    * row instead of D: digesting is the whole per-row cost of sketch
    * construction, so this is a D× cut on the corpus pass. */
  private def cells(key: Column): Column = {
    val h = TextAnalysis.md5Long(concat_ws(":", lit("cms"), key.cast("string")))
    array((0 until D).map(r =>
      struct(lit(r).as("r"),
        (shiftright(h, 15 * r).bitwiseAND(lit(32767L)) % W).as("c"))): _*)
  }

  /** q68: CMS over the events stream keyed by user_id, probed for
    * user_id < [[ProbeMax]] — est_cnt (sketch) alongside true_cnt, so
    * the overestimate property is visible in the gated output. */
  def cmsUserCounts(s: SparkSession, dir: String): DataFrame =
    cmsUserCounts(Tables.events(s, dir))

  /** The d×w counter table for a stream or batch of keys — works
    * unchanged as a streaming update-mode aggregate (the counter table
    * IS the state, fixed-size by construction), which is the whole point
    * of maintaining a sketch instead of exact per-key counts on an
    * unbounded stream. */
  def cmsSketch(events: DataFrame, key: String = "user_id"): DataFrame =
    events.filter(col(key).isNotNull)
      .select(explode(cells(col(key))).as("rc"))
      .select(col("rc.r").as("r"), col("rc.c").as("c"))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("cnt"))

  def cmsUserCounts(events: DataFrame): DataFrame = {
    // NULL keys are excluded on BOTH sides: Spark's concat_ws would drop
    // the null (hashing "r:" prefixes) while the oracle's || yields NULL
    // — filtering is the only semantics the two engines share
    val keyed = events.filter(col("user_id").isNotNull)
    val sketch = cmsSketch(events)
    val probes = keyed.filter(col("user_id") < ProbeMax)
      .groupBy(col("user_id")).agg(count(lit(1)).as("true_cnt"))
    val probeCells = probes
      .select(col("user_id"), col("true_cnt"), explode(cells(col("user_id"))).as("rc"))
      .select(col("user_id"), col("true_cnt"), col("rc.r").as("r"), col("rc.c").as("c"))
    probeCells.join(broadcast(sketch), Seq("r", "c"))
      .groupBy(col("user_id"), col("true_cnt"))
      .agg(min(col("cnt")).as("est_cnt"))
      .select(col("user_id"), col("est_cnt"), col("true_cnt"))
      .orderBy("user_id")
  }

  val BloomBits = 16384 // 2^14 bits packed into 512 32-bit words (shift stays < 32: DuckDB overflow-checks BIGINT << 63)
  val BloomK = 3

  /** All K bloom bit positions from ONE salted md5 — same 15-bit-chunk
    * scheme as [[cells]] (2^15 is a multiple of BloomBits). */
  private def bloomPosList(key: Column): Column = {
    val h = TextAnalysis.md5Long(concat_ws(":", lit("bloom"), key.cast("string")))
    array((0 until BloomK).map(r =>
      shiftright(h, 15 * r).bitwiseAND(lit(32767L)) % BloomBits): _*)
  }

  /** q70: bloom-filter membership — the runtime-filter pattern: build a
    * 2 KB bloom of the validated member ids (here: lang='en' docs) as a
    * ≤512-row (word, bits) table via ONE bit_or aggregate, broadcast it,
    * and probe every row with k hashed bit tests. A definite-miss
    * (maybe_member = false) row can skip the expensive dedup/validation
    * join entirely — at 100 TB you prune the fact-side shuffle with a
    * filter that fits in L2, which is exactly Spark's own bloom-join
    * rewrite made explicit. No false negatives by construction (spec +
    * oracle both prove is_member ⇒ maybe_member); false positives are
    * the tunable trade (k=3, 16384 bits). */
  def bloomMembership(s: SparkSession, dir: String): DataFrame =
    bloomMembership(Tables.documents(s, dir))

  def bloomMembership(docsIn: DataFrame): DataFrame = {
    // same NULL-key rule as the CMS: concat_ws vs || disagree on nulls
    val docs = docsIn.filter(col("doc_id").isNotNull)
    val members = docs.filter(col("lang") === "en").select(col("doc_id"))
    val words = members
      .select(explode(bloomPosList(col("doc_id"))).as("p"))
      .select(expr("p DIV 32").as("w"), (col("p") % 32).cast("int").as("b"))
      .groupBy(col("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))").as("bits"))
    val probe = docs
      .select(col("doc_id"), explode(bloomPosList(col("doc_id"))).as("p"))
      .select(col("doc_id"), expr("p DIV 32").as("w"), (col("p") % 32).cast("int").as("b"))
    val hits = probe.join(broadcast(words), Seq("w"), "left")
      .select(col("doc_id"),
        when(col("bits").isNotNull &&
          expr("bits & shiftleft(CAST(1 AS BIGINT), b)") =!= 0L, 1L)
          .otherwise(0L).as("hit"))
      .groupBy(col("doc_id")).agg(sum(col("hit")).as("nhits"))
    docs.select(col("doc_id"),
        coalesce(col("lang") === "en", lit(false)).as("is_member"))
      .join(hits, Seq("doc_id"))
      .select(col("doc_id"), (col("nhits") === BloomK).as("maybe_member"),
        col("is_member"))
      .orderBy("doc_id")
  }

  /** q70 oracle: identical hash positions and bit packing. */
  def bloomOracleSql: String = {
    val posList = (key: String) => (0 until BloomK)
      .map(r => s"((CAST(('0x' || substring(md5('bloom:' || CAST($key AS VARCHAR)), 1, 15)) AS BIGINT) >> ${15 * r}) & 32767) % $BloomBits")
      .mkString("[", ", ", "]")
    s"""WITH m AS (SELECT doc_id FROM documents
       |  WHERE doc_id IS NOT NULL AND lang = 'en'),
       |pos AS (SELECT unnest(${posList("doc_id")}) AS p FROM m),
       |words AS (SELECT p // 32 AS w,
       |  bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS bits
       |  FROM pos GROUP BY 1),
       |probe AS (SELECT doc_id, unnest(${posList("doc_id")}) AS p FROM documents
       |  WHERE doc_id IS NOT NULL),
       |hits AS (SELECT pb.doc_id,
       |  CASE WHEN w2.bits IS NOT NULL
       |    AND (w2.bits & (CAST(1 AS BIGINT) << CAST(pb.p % 32 AS INTEGER))) <> 0
       |  THEN 1 ELSE 0 END AS hit
       |  FROM (SELECT doc_id, p // 32 AS w, p FROM probe) pb
       |  LEFT JOIN words w2 USING (w)),
       |agg AS (SELECT doc_id, SUM(hit) AS nhits FROM hits GROUP BY doc_id)
       |SELECT d.doc_id, agg.nhits = $BloomK AS maybe_member,
       |  COALESCE(d.lang = 'en', FALSE) AS is_member
       |FROM documents d JOIN agg USING (doc_id) ORDER BY d.doc_id""".stripMargin
  }

  /** q68 oracle: same single salted md5, same 15-bit chunk cells. */
  def cmsOracleSql: String = {
    val rs = (0 until D).mkString("[", ",", "]")
    val cellSql = (rExpr: String, kExpr: String) =>
      s"((CAST(('0x' || substring(md5('cms:' || CAST($kExpr AS VARCHAR)), 1, 15)) AS BIGINT) >> (15 * $rExpr)) & 32767) % $W"
    s"""WITH entries AS (SELECT t.r, ${cellSql("t.r", "e.user_id")} AS c
       |  FROM events e CROSS JOIN (SELECT unnest($rs) AS r) t
       |  WHERE e.user_id IS NOT NULL),
       |sketch AS (SELECT r, c, COUNT(*) AS cnt FROM entries GROUP BY r, c),
       |probes AS (SELECT user_id, COUNT(*) AS true_cnt FROM events
       |  WHERE user_id IS NOT NULL AND user_id < $ProbeMax GROUP BY user_id),
       |pc AS (SELECT p.user_id, p.true_cnt, t.r, ${cellSql("t.r", "p.user_id")} AS c
       |  FROM probes p CROSS JOIN (SELECT unnest($rs) AS r) t)
       |SELECT pc.user_id, MIN(s.cnt) AS est_cnt, pc.true_cnt
       |FROM pc JOIN sketch s USING (r, c)
       |GROUP BY pc.user_id, pc.true_cnt ORDER BY pc.user_id""".stripMargin
  }

  /** q205: CMS join-cardinality estimate (the AMS/CMS inner-product
    * application, Cormode & Muthukrishnan 2005 §4.2; Alon-Matias-Szegedy
    * 1996 for the F2 idea) — estimate |orders ⋈ customer ON custkey|
    * WITHOUT running the join: per hash row r, the inner product
    * Σ_c A[r][c]·B[r][c] of the two sides' CMS counter rows; the
    * estimate is the MIN over the d rows (each row overestimates by
    * hash collisions, expected excess (N_A·N_B − true)/w). THE number a
    * cost-based optimizer wants before picking a join strategy, from
    * two d×w-row sketches instead of a shuffle of either table — and
    * the sketches are the same streaming-maintainable state as q68's.
    *
    * Exact truth rides along (q74's stance): Σ_v f_A(v)·f_B(v) from the
    * two frequency tables — the arm whose cost (a key-shuffled join)
    * the sketch exists to avoid at 100 TB. Products and sums accumulate
    * in DECIMAL(38,0) (corpus² at trillion rows) and ship as VARCHAR;
    * the per-row overestimate ratio is ONE VARCHAR-mediated division.
    *
    * Scale notes: each sketch is one map-combined aggregate whose whole
    * shuffle is ≤ d·w rows; the estimate joins two ≤ d·w-row tables.
    * Nothing in the sketch arm scales with either input. */
  def joinCardinality(s: SparkSession, dir: String): DataFrame =
    joinCardinality(Tables.orders(s, dir), Tables.customer(s, dir))

  def joinCardinality(orders: DataFrame, customer: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val sa = cmsSketch(orders.select(col("o_custkey").as("k")), "k")
    val sb = cmsSketch(customer.select(col("c_custkey").as("k")), "k")
      .withColumnRenamed("cnt", "cnt_b")
    val est = sa.join(sb, Seq("r", "c"))
      .groupBy(col("r"))
      .agg(sum(d38(col("cnt")) * d38(col("cnt_b"))).cast("decimal(38,0)").as("est"))
    val fa = orders.filter(col("o_custkey").isNotNull)
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("fa"))
    val fb = customer.filter(col("c_custkey").isNotNull)
      .groupBy(col("c_custkey").as("k")).agg(count(lit(1)).as("fb"))
    val exact = fa.join(fb, Seq("k"))
      .agg(coalesce(sum(d38(col("fa")) * d38(col("fb"))), lit(0).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("exact"))
    est.crossJoin(broadcast(exact))
      .select(col("r"),
        col("est").cast("string").as("est_s"),
        col("exact").cast("string").as("exact_s"),
        round(col("est").cast("string").cast("double") /
          when(col("exact") === lit(0).cast("decimal(38,0)"), lit(null))
            .otherwise(col("exact").cast("string").cast("double")), 9)
          .as("over_ratio_r"))
      .orderBy(col("r"))
  }

  /** q205 oracle: same salted md5 cells, same decimal inner products. */
  def joinCardinalityOracleSql: String = {
    val rs = (0 until D).mkString("[", ",", "]")
    val cellSql = (rExpr: String, kExpr: String) =>
      s"((CAST(('0x' || substring(md5('cms:' || CAST($kExpr AS VARCHAR)), 1, 15)) AS BIGINT) >> (15 * $rExpr)) & 32767) % $W"
    s"""WITH ea AS (SELECT t.r, ${cellSql("t.r", "o.o_custkey")} AS c
       |  FROM orders o CROSS JOIN (SELECT unnest($rs) AS r) t
       |  WHERE o.o_custkey IS NOT NULL),
       |sa AS (SELECT r, c, CAST(COUNT(*) AS BIGINT) AS cnt FROM ea GROUP BY r, c),
       |eb AS (SELECT t.r, ${cellSql("t.r", "cu.c_custkey")} AS c
       |  FROM customer cu CROSS JOIN (SELECT unnest($rs) AS r) t
       |  WHERE cu.c_custkey IS NOT NULL),
       |sb AS (SELECT r, c, CAST(COUNT(*) AS BIGINT) AS cnt_b FROM eb GROUP BY r, c),
       |est AS (SELECT sa.r,
       |    CAST(SUM(CAST(sa.cnt AS DECIMAL(38,0)) * CAST(sb.cnt_b AS DECIMAL(38,0)))
       |      AS DECIMAL(38,0)) AS est
       |  FROM sa JOIN sb USING (r, c) GROUP BY 1),
       |fa AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS fa FROM orders
       |  WHERE o_custkey IS NOT NULL GROUP BY 1),
       |fb AS (SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS fb FROM customer
       |  WHERE c_custkey IS NOT NULL GROUP BY 1),
       |ex AS (SELECT CAST(COALESCE(SUM(CAST(fa.fa AS DECIMAL(38,0))
       |      * CAST(fb.fb AS DECIMAL(38,0))), 0) AS DECIMAL(38,0)) AS exact
       |  FROM fa JOIN fb USING (k))
       |SELECT est.r, CAST(est.est AS VARCHAR) AS est_s,
       |  CAST(ex.exact AS VARCHAR) AS exact_s,
       |  ROUND(CAST(CAST(est.est AS VARCHAR) AS DOUBLE) /
       |    (CASE WHEN ex.exact = 0 THEN NULL
       |     ELSE CAST(CAST(ex.exact AS VARCHAR) AS DOUBLE) END), 9) AS over_ratio_r
       |FROM est CROSS JOIN ex ORDER BY est.r""".stripMargin
  }

  /** KMV sketch size for [[kmvOverlap]] — 256 minima give ~1/√254 ≈ 6 %
    * relative NDV error (Beyer et al. 2007 §3.2). */
  val KmvK = 256

  /** q209: K-minimum-values distinct-overlap estimate between sources
    * (Bar-Yossef et al. 2002; Beyer et al. SIGMOD 2007's unbiased
    * estimator) — the sketch-family member the set-OPERATION questions
    * need: q74's HLL counts one set and unions for free but cannot
    * intersect; q202's per-source MinHash estimates Jaccard SHAPE but
    * not set SIZE. A KMV sketch (the K smallest salted-md5 values of
    * each source's distinct texts) supports union natively (merge,
    * keep K smallest) and intersection by counting agreement inside
    * the merged sketch: with L = K smallest of A∪B, ρ = |L∩A∩B|,
    * ndv(A∪B) ≈ (K−1)·2⁶⁰/h_(K) and |A∩B| ≈ ρ·ndv(A∪B)/K — "these
    * two crawls share ~1.2M distinct documents", the absolute-size
    * companion to q202's relative overlap, from 256 longs per source.
    *
    * Integer spine, floats only at the edge (repo convention): h_(K),
    * ρ, k_used and both truth arms are exact BIGINTs; the two
    * estimates are ROUND(...,9) doubles built from identically-
    * associated ops both engines fold the same way (255·2⁶⁰ has 8
    * significant bits — exactly representable; saturation branch:
    * k_used < K means the merged sketch IS the exact union, so the
    * estimator returns k_used and ρ equals the exact intersection).
    * Selection via the bounded heap is EXACT even though scores are
    * doubles: long→double rounding is monotone, and the heap's id-asc
    * tiebreak re-orders any rounding tie by the exact hash.
    *
    * Scale notes: one distinct-shuffle of (source, h) feeds BOTH arms;
    * the sketch then folds through the bounded-heap TopKSimId (≤ K
    * rows per partition×source into the shuffle) and every pairwise
    * frame after that is ≤ sources²·2K rows — the per-pair ranking
    * window is over ≤ 2K rows BY CONSTRUCTION, not data-sized. The
    * truth arms (exact NDV + pairwise h-join) are the corpus-cost
    * reference the sketch replaces; at 100 TB you drop them and keep
    * the heap fold, whose only corpus-sized step is the map-combined
    * distinct. */
  def kmvOverlap(s: SparkSession, dir: String): DataFrame =
    kmvOverlap(Tables.documents(s, dir))

  def kmvOverlap(docs: DataFrame): DataFrame = {
    val K = KmvK
    // distinct (source, text-hash): the shared spine of both arms.
    // NULL text/source excluded on both sides (concat_ws-vs-|| rule).
    val v = docs.filter(col("source").isNotNull && col("text").isNotNull)
      .select(col("source"),
        TextAnalysis.md5Long(concat_ws(":", lit("kmv"), col("text"))).as("h"))
      .distinct()
      .localCheckpoint() // read 4× (sketch, NDV, pair join ×2)
    // per-source KMV: bottom-K hashes via the bounded heap on -h
    val kept = v.groupBy(col("source"))
      .agg(Similarity.topKAgg((-col("h")).cast("double"), col("h"), K).as("tk"))
      .select(col("source"), explode(col("tk.id")).as("h"))
    val srcs = v.select(col("source")).distinct()
    val pairs = srcs.select(col("source").as("source_a"))
      .crossJoin(srcs.select(col("source").as("source_b")))
      .filter(col("source_a") < col("source_b"))
    // merged sketch per pair: ≤ 2K rows/pair — the rank window is over
    // a fixed-size frame by construction, never data-sized
    val merged = pairs
      .join(broadcast(kept),
        col("source") === col("source_a") || col("source") === col("source_b"))
      .groupBy(col("source_a"), col("source_b"), col("h"))
      .agg(max(when(col("source") === col("source_a"), 1L).otherwise(0L)).as("in_a"),
        max(when(col("source") === col("source_b"), 1L).otherwise(0L)).as("in_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source_a"), col("source_b")).orderBy(col("h"))
    val sk = merged.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_hash"),
        sum(when(col("in_a") === 1L && col("in_b") === 1L, 1L).otherwise(0L))
          .as("rho"))
    // truth arms: exact per-source NDV + exact pairwise intersection
    val ndv = v.groupBy(col("source")).agg(count(lit(1)).as("ndv"))
    val inter = v.as("a").join(v.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("exact_intersect"))
    val estU = when(col("k_used") < K, col("k_used").cast("double"))
      .otherwise(lit((K - 1).toDouble * math.pow(2.0, 60)) /
        col("kth_hash").cast("double"))
    sk
      .join(inter, Seq("source_a", "source_b"), "left")
      .join(broadcast(ndv.select(col("source").as("source_a"), col("ndv").as("ndv_a"))),
        Seq("source_a"))
      .join(broadcast(ndv.select(col("source").as("source_b"), col("ndv").as("ndv_b"))),
        Seq("source_b"))
      .withColumn("exact_intersect", coalesce(col("exact_intersect"), lit(0L)))
      .withColumn("est_u", estU)
      .select(col("source_a"), col("source_b"), col("k_used"), col("kth_hash"),
        col("rho"),
        (col("ndv_a") + col("ndv_b") - col("exact_intersect")).as("exact_union"),
        col("exact_intersect"),
        round(col("est_u"), 9).as("est_union_r"),
        round(col("rho").cast("double") * col("est_u") /
          col("k_used").cast("double"), 9).as("est_intersect_r"))
      .orderBy("source_a", "source_b")
  }

  /** q209 oracle: same salted hash, exact bottom-K per source, same
    * merged-sketch counters and identically-associated estimators. */
  def kmvOverlapOracleSql: String = {
    val K = KmvK
    s"""WITH v AS (SELECT DISTINCT source,
       |    CAST(('0x' || substring(md5('kmv:' || text), 1, 15)) AS BIGINT) AS h
       |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
       |sk AS (SELECT source, h FROM (
       |    SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
       |    FROM v) WHERE rn <= $K),
       |srcs AS (SELECT DISTINCT source FROM v),
       |pr AS (SELECT a.source AS source_a, b.source AS source_b
       |  FROM srcs a JOIN srcs b ON a.source < b.source),
       |u AS (SELECT p.source_a, p.source_b, s.h,
       |    MAX(CASE WHEN s.source = p.source_a THEN 1 ELSE 0 END) AS in_a,
       |    MAX(CASE WHEN s.source = p.source_b THEN 1 ELSE 0 END) AS in_b
       |  FROM pr p JOIN sk s ON s.source IN (p.source_a, p.source_b)
       |  GROUP BY 1, 2, 3),
       |topu AS (SELECT * FROM (
       |    SELECT u.*, ROW_NUMBER() OVER (
       |      PARTITION BY source_a, source_b ORDER BY h) AS rn FROM u)
       |  WHERE rn <= $K),
       |agg AS (SELECT source_a, source_b,
       |    CAST(COUNT(*) AS BIGINT) AS k_used, MAX(h) AS kth_hash,
       |    CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS rho
       |  FROM topu GROUP BY 1, 2),
       |ndv AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ndv FROM v GROUP BY 1),
       |ix AS (SELECT a.source AS source_a, b.source AS source_b,
       |    CAST(COUNT(*) AS BIGINT) AS exact_intersect
       |  FROM v a JOIN v b ON a.h = b.h AND a.source < b.source GROUP BY 1, 2),
       |je AS (SELECT g.*, COALESCE(ix.exact_intersect, 0) AS exact_intersect,
       |    na.ndv AS ndv_a, nb.ndv AS ndv_b,
       |    CASE WHEN g.k_used < $K THEN CAST(g.k_used AS DOUBLE)
       |      ELSE (${(K - 1).toDouble} * POWER(2.0, 60)) / CAST(g.kth_hash AS DOUBLE)
       |    END AS est_u
       |  FROM agg g
       |  LEFT JOIN ix ON ix.source_a = g.source_a AND ix.source_b = g.source_b
       |  JOIN ndv na ON na.source = g.source_a
       |  JOIN ndv nb ON nb.source = g.source_b)
       |SELECT source_a, source_b, k_used, kth_hash, rho,
       |  ndv_a + ndv_b - exact_intersect AS exact_union, exact_intersect,
       |  ROUND(est_u, 9) AS est_union_r,
       |  ROUND(CAST(rho AS DOUBLE) * est_u / CAST(k_used AS DOUBLE), 9)
       |    AS est_intersect_r
       |FROM je ORDER BY 1, 2""".stripMargin
  }
}
