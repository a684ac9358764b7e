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
}
