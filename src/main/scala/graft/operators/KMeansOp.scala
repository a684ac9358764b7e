package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps.dot

/** Deterministic distributed k-means (Lloyd's algorithm, fixed rounds) —
  * the coarse quantizer that IVF ANN ([[Similarity.ivfTopK]]) and
  * SemDeDup cells are built on, here as an oracle-gated operator in its
  * own right: the full train loop (assign → recenter × [[Rounds]] →
  * final assign) is value-checked against DuckDB running the same
  * unrolled computation.
  *
  * Engine-exact by construction: vectors are quantized to INTEGRAL
  * doubles (round(x·10⁶) — float-origin values are exact in double, the
  * product is the same double in any engine, and both engines round
  * half away from zero), so per-dimension sums are exact integer
  * arithmetic — order-independent across 1000 executors and equal to
  * any other engine's sum. Centroid means divide two exactly-represented
  * numbers, and every distance is qq − 2·q·c + cc with a fixed
  * left-to-right fold, so the doubles agree bitwise all the way down.
  *
  * Scale notes: each round is ONE map-side-combined aggregate over the
  * corpus (65 partial cells per partition: 64 sums + count) producing K
  * rows collected to the driver; assignment is a narrow projection with
  * the K×64 centroid matrix baked in as literals — no join, no shuffle
  * of the corpus, the textbook Spark Lloyd layout. Empty cells keep
  * their previous centroid.
  */
object KMeansOp {

  val K = 8
  val Rounds = 2
  val Dim = 64
  val ScaleQ = 1000000.0

  /** vec_id + quantized integral-double vector. */
  private[graft] def quantized(embeddings: DataFrame): DataFrame =
    embeddings
      // NULL embeddings drop at the scan (same policy as Dedup.normalized)
      .where(col("embedding").isNotNull)
      .select(col("vec_id"),
        transform(col("embedding"), x => round(x.cast("double") * ScaleQ)).as("q"))

  /** Squared-distance column to one centroid: qq − 2·q·c + cc. */
  private[graft] def dist2(qq: Column, c: Seq[Double]): Column = {
    val cLit = array(c.map(lit): _*)
    val cc = c.foldLeft(0.0)((acc, x) => acc + x * x) // same fold as list_reduce
    qq - lit(2.0) * dot(col("q"), cLit) + lit(cc)
  }

  /** Adds the argmin `cell` column for the given (cellId, centroid)
    * pairs — the cell id is the seeding vector's ACTUAL vec_id (the
    * oracle keys cells the same way), not its position in the collected
    * array, so sparse/shifted vec_id spaces stay in sync. Ties → first
    * position = lowest cell id (cents is vec_id-sorted), matching the
    * oracle's ORDER BY dist2, cell. */
  private[graft] def assign(qv: DataFrame, cents: Seq[(Long, Seq[Double])]): DataFrame = {
    // zero centroids (empty corpus, or every vec_id ≥ k): there is no
    // cell to assign — a zero-element array(...) literal is NullType and
    // fails analysis, so emit the typed degenerate instead of a plan
    // that can't resolve
    if (cents.isEmpty)
      return qv.withColumn("cell", lit(null).cast("long"))
    val qq = dot(col("q"), col("q"))
    val dists = array(cents.map { case (_, c) => dist2(qq, c) }: _*)
    val ids = array(cents.map { case (id, _) => lit(id) }: _*)
    qv.withColumn("cell",
      element_at(ids, array_position(dists, array_min(dists)).cast("int")))
  }

  /** Above this K, [[assignAuto]] switches from the literal-matrix
    * assignment to the broadcast path: a K×64 literal matrix per
    * expression is ideal small-K codegen but blows up plan size and
    * generated code as K grows toward a real IVF's 2¹⁶. */
  val LiteralAssignMaxK = 64

  /** Large-K assignment twin of [[assign]] (bit-identical, spec-checked):
    * centroids ride in ONE broadcast row (packed array of
    * struct(cell, c, cc)) instead of plan literals, and the argmin runs
    * in the native [[org.apache.spark.sql.graftbridge.NearestCellDist2]]
    * kernel. Plan size is O(1) in K, assignment stays shuffle-free
    * (BroadcastNestedLoopJoin against a single row) — an
    * argmin-by-groupBy formulation would instead re-shuffle the whole
    * corpus by vec_id. */
  private[graft] def assignBroadcast(qv: DataFrame,
      cents: Seq[(Long, Seq[Double])]): DataFrame =
    assignBroadcastDf(qv, centsToDf(qv.sparkSession, cents))

  /** Centroids as a (cell, c) table — the form a PERSISTED coarse
    * quantizer (e.g. the q72 IVF index's cells artifact) serves. */
  private[graft] def centsToDf(spark: SparkSession,
      cents: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    cents.toDF("cell", "c")
  }

  /** [[assignBroadcast]] from a centroid TABLE: packs (cell, c) rows into
    * one sorted array row in-plan (sort_array orders by the leading
    * struct field = cell id, preserving the literal path's lowest-cell
    * tie-break), broadcasts it, and projects the native argmin. The cc
    * self-dot is folded once per centroid here, not per corpus row. */
  private[graft] def assignBroadcastDf(qv: DataFrame, cents: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, NearestCellDist2}
    val packed = cents
      .select(struct(col("cell").cast("long").as("cell"),
        col("c"), dot(col("c"), col("c")).as("cc")).as("entry"))
      .agg(sort_array(collect_list(col("entry"))).as("cells"))
    qv.crossJoin(broadcast(packed))
      .withColumn("cell", ColumnBridge.column(NearestCellDist2(
        ColumnBridge.expression(col("q")), ColumnBridge.expression(col("cells")))))
      .drop("cells")
  }

  /** Literal-matrix assignment for small K, broadcast kernel beyond
    * [[LiteralAssignMaxK]] — same results either way (spec-checked). */
  private[graft] def assignAuto(qv: DataFrame,
      cents: Seq[(Long, Seq[Double])]): DataFrame =
    if (cents.size <= LiteralAssignMaxK) assign(qv, cents)
    else assignBroadcast(qv, cents)

  /** One Lloyd recenter: per-cell per-dimension means (exact sums of
    * integral doubles), empty cells keep the old centroid. */
  private def recenter(assigned: DataFrame,
      old: Seq[(Long, Seq[Double])]): Seq[(Long, Seq[Double])] = {
    val aggs = count(lit(1)).cast("double").as("n") +:
      (1 to Dim).map(i => sum(element_at(col("q"), i)).as(s"s$i"))
    val rows = assigned.groupBy(col("cell")).agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), (1 to Dim).map(i => r.getDouble(1 + i))))
      .toMap
    old.map { case (id, c) =>
      rows.get(id) match {
        case Some((n, sums)) => id -> sums.map(_ / n)
        case None => id -> c
      }
    }
  }

  /** q63: k-means train + final assignment — vec_id, cell, cell_size. */
  def kmeans(s: SparkSession, dir: String): DataFrame = kmeans(Tables.embeddings(s, dir))

  /** The deterministic train loop: seed with the first `k` vec_ids,
    * [[Rounds]] Lloyd rounds. Returns (reusable quantized frame, final
    * (cellId, centroid) pairs) — shared by q63, the oracle-gated IVF
    * path, and trained-centroid SemDeDup (q104) so they can never drift
    * on seed/rounds/arithmetic. Assignment picks the literal or
    * broadcast kernel by `k` ([[assignAuto]]); the recenter collect is
    * k rows of 64 doubles — ~32 MB even at a 2¹⁶-cell IVF, bounded by
    * construction. */
  private[graft] def trainCents(embeddings: DataFrame,
      k: Int = K): (DataFrame, Seq[(Long, Seq[Double])]) = {
    val qv = quantized(embeddings).localCheckpoint() // reused every round
    var cents: Seq[(Long, Seq[Double])] = qv.filter(col("vec_id") < k)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
    // zero seeds (empty corpus, or every vec_id >= k): there is nothing
    // to train — running a round would feed recenter an all-NULL cell
    // grouping and its collect would NPE on getLong
    for (_ <- 1 to Rounds if cents.nonEmpty)
      cents = recenter(assignAuto(qv, cents), cents)
    (qv, cents)
  }

  def kmeans(embeddings: DataFrame): DataFrame = {
    val (qv, cents) = trainCents(embeddings)
    val fin = assignAuto(qv, cents).select(col("vec_id"), col("cell"))
    val sizes = fin.groupBy(col("cell")).agg(count(lit(1)).as("cell_size"))
    fin.join(sizes, Seq("cell"))
      .select(col("vec_id"), col("cell"), col("cell_size"))
      .orderBy("vec_id")
  }

  /** q63 oracle: the same [[Rounds]]-round Lloyd loop unrolled as a CTE
    * chain — quantize, assign (argmin via ROW_NUMBER), recenter
    * (exact integral sums, empty cells keep the previous centroid via
    * LEFT JOIN + COALESCE), final assign + sizes. */
  private def lr(expr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, $Dim+1), i -> $expr)), (x,y) -> x+y)"

  /** WITH-body prefix replaying the train loop: `qv` (quantized vectors),
    * `c0..c$Rounds` (centroids per round; `c$Rounds` is final), `af`
    * (final assignment: vec_id, q, cell). Shared by the q63 oracle, the
    * generated IVF oracle (q65), and the q104 trained-SemDeDup oracle. */
  def kmeansCtes: String = kmeansCtes(K)

  def kmeansCtes(k: Int): String = kmeansCtes(k, "", includeAllAssign = false)

  /** `basePred` restricts the TRAIN vectors (q157 trains on the base
    * split only); `includeAllAssign` appends `qva` (every quantized
    * vector, regardless of basePred) and `afa` (its assignment to the
    * FINAL centroids) — the assign-without-retrain arm an index upsert
    * replays. */
  def kmeansCtes(k: Int, basePred: String, includeAllAssign: Boolean): String = {
    def assignCte(cin: String, aout: String, src: String = "qv") =
      s"""$aout AS (SELECT vec_id, q, cell FROM (
         |  SELECT qv.vec_id, qv.q, $cin.cell,
         |    ROW_NUMBER() OVER (PARTITION BY qv.vec_id ORDER BY
         |      ${lr("qv.q[i]*qv.q[i]")} - 2.0 * ${lr("qv.q[i]*$cin.c[i]").replace("$cin", cin)} + ${lr("$cin.c[i]*$cin.c[i]").replace("$cin", cin)},
         |      $cin.cell) AS rn
         |  FROM $src qv CROSS JOIN $cin) WHERE rn = 1)""".stripMargin
    def recenterCte(ain: String, cin: String, cout: String) =
      s"""${cout}_m AS (SELECT cell, list(s ORDER BY dim) AS c FROM (
         |  SELECT cell, t.i AS dim, SUM(q[t.i]) / CAST(COUNT(*) AS DOUBLE) AS s
         |  FROM $ain CROSS JOIN range(1, $Dim+1) t(i) GROUP BY cell, t.i)
         | GROUP BY cell),
         |$cout AS (SELECT $cin.cell, COALESCE(${cout}_m.c, $cin.c) AS c
         |  FROM $cin LEFT JOIN ${cout}_m USING (cell))""".stripMargin
    val rounds = (1 to Rounds).map { r =>
      val cin = if (r == 1) "c0" else s"c${r - 1}"
      s"${assignCte(cin, s"a$r")},\n${recenterCte(s"a$r", cin, s"c$r")}"
    }.mkString(",\n")
    val basePredSql = if (basePred.isEmpty) "" else s" AND ($basePred)"
    val allAssign =
      if (!includeAllAssign) ""
      else s""",
        |qva AS (SELECT vec_id,
        |  list_transform(embedding, x -> round(CAST(x AS DOUBLE) * $ScaleQ)) AS q
        | FROM embeddings WHERE embedding IS NOT NULL),
        |${assignCte(s"c$Rounds", "afa", "qva")}""".stripMargin
    s"""qv AS (SELECT vec_id,
       |  list_transform(embedding, x -> round(CAST(x AS DOUBLE) * $ScaleQ)) AS q
       | FROM embeddings WHERE embedding IS NOT NULL$basePredSql),
       |c0 AS (SELECT CAST(vec_id AS BIGINT) AS cell, q AS c FROM qv WHERE vec_id < $k),
       |$rounds,
       |${assignCte(s"c$Rounds", "af")}$allAssign""".stripMargin
  }

  /** DuckDB expression for the squared distance between `qv.q` and a
    * centroid column `$cin.c` — same fixed fold as the Spark side. */
  def dist2Sql(cin: String): String =
    s"${lr("qv.q[i]*qv.q[i]")} - 2.0 * ${lr("qv.q[i]*$cin.c[i]").replace("$cin", cin)} + ${lr("$cin.c[i]*$cin.c[i]").replace("$cin", cin)}"

  def kmeansOracleSql: String =
    s"""WITH $kmeansCtes,
       |sz AS (SELECT cell, COUNT(*) AS cell_size FROM af GROUP BY cell)
       |SELECT af.vec_id, CAST(af.cell AS BIGINT) AS cell, sz.cell_size
       |FROM af JOIN sz USING (cell) ORDER BY af.vec_id""".stripMargin
}
