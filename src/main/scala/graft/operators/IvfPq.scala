package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** IVF-PQ: the coarse-quantizer × product-quantizer composition that is
  * THE serving topology for billion-vector ANN (Jégou et al. 2011 §IV
  * "IVFADC"; FAISS `IVFx,PQy`). [[PqOp]] (q111/q112) compresses vectors
  * to M codes but still ADC-scans the WHOLE corpus per query batch;
  * [[IvfIndex]] (q72) prunes the scan to nprobe cells but stores raw
  * vectors. This operator does both: the corpus is partitioned by a
  * trained coarse cell AND stored as PQ codes, so a query batch
  * physically reads nprobe/nlist of the corpus at M longs per vector —
  * at 100 TB that is the difference between scanning terabytes of
  * floats and reading a few gigabytes of codes. The reference serves
  * raw CLIP vectors from Qdrant (extracting_embeddings.py:432-439);
  * IVF-PQ is the layout such engines switch to when the corpus outgrows
  * RAM.
  *
  * Variant: codebooks are trained GLOBALLY on the unit-quantized
  * vectors (FAISS `by_residual=false`), not on per-cell residuals —
  * that keeps the ADC arithmetic identical to q111's proven chain and
  * lets the oracle compose the two existing CTE families verbatim. The
  * coarse quantizer runs on the SAME unit-sphere quantized vectors as
  * PQ (cosine metric end-to-end, [[PqOp.unitQuantized]]).
  *
  * Index layout (build-once [[graft.ArtifactStore]] artifact, the
  * q72/q111 pattern):
  *   cells.parquet              (cell, c)          — [[NList]] rows, tiny
  *   codebooks.parquet          (m, cell, c)       — M·Ks rows, tiny
  *   codes/cell=<g>/...         (vec_id, code0..M−1) — hive-partitioned
  * Serving: rank the [[NList]] cells per query driver-side (bounded —
  * NList·Dim work), read ONLY the probed partitions (static partition
  * pruning on the `cell IN (...)` filter — IvfPqSpec pins the file
  * pruning), ADC-score with per-query probe masks, bounded-heap top-k.
  *
  * Determinism: coarse train replays [[KMeansOp]]'s proven Lloyd
  * conventions at Dim=64 over the unit-quantized frame (integral-double
  * vectors, exact integer recenter sums, fixed left-to-right folds,
  * ties by lowest cell id); the PQ half is exactly q111's. With
  * NProbe = NList the search degenerates to q111's full ADC ranking —
  * IvfPqSpec asserts that equality bit-for-bit.
  */
object IvfPq {

  /** 16 cells at gate scale; production uses √N cells — the layout and
    * plan shape are what scale, not this constant. */
  val NList = 16
  val NProbe = 4
  val CoarseRounds = 2
  private val Dim = KMeansOp.Dim

  /** Bump when the stored schema, quantizer, or encoding changes. */
  private val LayoutVersion = "v1"

  import org.apache.spark.sql.types._

  private val cellsSchema = StructType(Seq(
    StructField("cell", LongType),
    StructField("c", ArrayType(DoubleType))))

  private val codesCellSchema = StructType(
    StructField("vec_id", LongType) +:
    (0 until PqOp.M).map(m => StructField(s"code$m", LongType)) :+
    StructField("cell", LongType))

  // ------------------------------------------------------------------
  // Coarse quantizer: Lloyd at full Dim over the unit-quantized frame.

  /** [[KMeansOp]] recenter at Dim — exact integer sums over the
    * integral-double vectors, one bounded collect of ≤ NList rows. */
  private def recenterCoarse(assigned: DataFrame,
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

  /** Seed = first [[NList]] vec_ids' unit-quantized vectors,
    * [[CoarseRounds]] Lloyd rounds. */
  private[graft] def trainCoarse(qv: DataFrame): Seq[(Long, Seq[Double])] = {
    var cents: Seq[(Long, Seq[Double])] = qv.filter(col("vec_id") < NList)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
    for (_ <- 1 to CoarseRounds if cents.nonEmpty)
      cents = recenterCoarse(KMeansOp.assign(qv, cents), cents)
    cents
  }

  // ------------------------------------------------------------------
  // Build.

  /** Build the IVF-PQ index under `staging`. An untrainable corpus
    * (empty / no seeds) publishes empty cells/codebooks and a flat
    * empty codes file (a partitioned write of zero rows emits only
    * _SUCCESS — the IvfIndex precedent), so the read path degenerates
    * typed-empty instead of rebuilding forever. */
  private[graft] def buildIvfPq(embeddings: DataFrame, staging: String): Unit = {
    val spark = embeddings.sparkSession
    val qv = PqOp.unitQuantized(embeddings).localCheckpoint()
    val cents = trainCoarse(qv)
    val books = (0 until PqOp.M).map(m => PqOp.trainSub(qv, m))
    spark.createDataFrame(cents.map { case (id, c) => (id, c) })
      .toDF("cell", "c")
      .coalesce(1).write.parquet(s"$staging/cells.parquet")
    val bookRows = books.zipWithIndex.flatMap { case (b, m) =>
      b.map { case (cell, c) => (m, cell, c) } }
    spark.createDataFrame(bookRows).toDF("m", "cell", "c")
      .coalesce(1).write.parquet(s"$staging/codebooks.parquet")
    if (cents.isEmpty || books.exists(_.isEmpty))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], codesCellSchema)
        .write.parquet(s"$staging/codes")
    else {
      // coarse-assign FIRST (renamed so the M per-subspace assigns
      // inside encode can't collide on "cell"), then PQ-encode — one
      // corpus pass, no self-join
      val withCell = KMeansOp.assign(qv, cents)
        .withColumnRenamed("cell", "gcell")
      PqOp.encode(withCell, books)
        .select(col("vec_id") +:
          (0 until PqOp.M).map(m => col(s"code$m")) :+
          col("gcell").as("cell"): _*)
        .write.partitionBy("cell").parquet(s"$staging/codes")
    }
  }

  // ------------------------------------------------------------------
  // Serve.

  /** Per-query probe list: exact dist2 to each coarse centroid
    * (driver-side — NList·Dim work, the same fold as the oracle's
    * ORDER BY), ties by lowest cell, take [[NProbe]]. */
  private def probeCells(queries: Seq[(Long, Seq[Double])],
      cents: Seq[(Long, Seq[Double])], nprobe: Int): Seq[(Long, Seq[Long])] =
    queries.map { case (qid, qvec) =>
      qid -> cents.map { case (cell, c) => (PqOp.lutDist(qvec, c), cell) }
        .sortBy { case (d, cell) => (d, cell) }.take(nprobe).map(_._2)
    }

  /** ADC-score the probed slice of a codes frame: scan only rows whose
    * cell is probed by ANY query (at the gated read this filter is the
    * partition-pruning predicate), then mask (query, cand) pairs to the
    * query's OWN probe list via a literal map — no join, no shuffle
    * before the bounded top-k heap. */
  private def scoreProbed(codes: DataFrame, queries: Seq[(Long, Seq[Double])],
      books: Seq[Seq[(Long, Seq[Double])]],
      probes: Seq[(Long, Seq[Long])]): DataFrame = {
    val union = probes.flatMap(_._2).distinct.sorted
    val probeMap = map(probes.flatMap { case (qid, cells) =>
      Seq(lit(qid), array(cells.map(lit): _*)) }: _*)
    codes
      .where(col("cell").isin(union: _*))
      .select(col("vec_id").as("__cand_id"), col("cell"),
        explode(array(PqOp.adcDistCols(queries, books): _*)).as("qd"))
      .where(array_contains(element_at(probeMap, col("qd.query_id")), col("cell")))
      .select(col("qd.query_id").as("query_id"), col("__cand_id"),
        col("qd.dist").as("dist"))
      .where(col("query_id") =!= col("__cand_id"))
  }

  /** Ensure + serve the persisted index for `dir`: the returned scored
    * frame's scan is the cell-partitioned CODES artifact restricted to
    * the probed cells — training ran at most once, at build time. */
  private def servedScored(s: SparkSession, dir: String,
      nprobe: Int): Option[DataFrame] = {
    val em = Tables.embeddings(s, dir)
    val path = graft.ArtifactStore.ensureCurrent(s, s"ivfpq_$LayoutVersion",
      Tables.dirFingerprint(s, dir,
        s"ivfpq;nlist=$NList;cr=$CoarseRounds;m=${PqOp.M};ks=${PqOp.Ks};" +
        s"r=${PqOp.Rounds};scale=${KMeansOp.ScaleQ};${em.schema.catalogString}")) {
      staging => buildIvfPq(em, staging)
    }
    val cents = s.read.schema(cellsSchema).parquet(s"$path/cells.parquet")
      .orderBy("cell").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
    val books = PqOp.loadBooks(s, path)
    val queries: Seq[(Long, Seq[Double])] =
      PqOp.unitQuantized(em).filter(col("vec_id") < PqOp.NQ)
        .orderBy("vec_id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
    if (cents.isEmpty || books.exists(_.isEmpty) || queries.isEmpty) None
    else {
      val codes = s.read.schema(codesCellSchema).parquet(s"$path/codes")
      Some(scoreProbed(codes, queries, books, probeCells(queries, cents, nprobe)))
    }
  }

  /** q188: IVF-PQ top-[[PqOp.TopK]] per query off the persisted index —
    * build once, then every call is the pruned serving read. */
  def ivfpqTopK(s: SparkSession, dir: String): DataFrame =
    servedScored(s, dir, NProbe) match {
      case None => PqOp.emptyResult(s, "dist_r")
      case Some(scored) => PqOp.adcRank(scored)
    }

  /** Inline (train-in-place) twin for ad-hoc corpora — same chain, no
    * artifact; IvfPqSpec proves it equals the indexed path, and that at
    * nprobe = NList it equals q111's full ADC ranking exactly. */
  def ivfpqTopK(embeddings: DataFrame): DataFrame =
    ivfpqTopK(embeddings, NProbe)

  private[graft] def ivfpqTopK(embeddings: DataFrame, nprobe: Int): DataFrame = {
    val qv = PqOp.unitQuantized(embeddings).localCheckpoint()
    val cents = trainCoarse(qv)
    val books = (0 until PqOp.M).map(m => PqOp.trainSub(qv, m))
    val queries: Seq[(Long, Seq[Double])] =
      qv.filter(col("vec_id") < PqOp.NQ).orderBy("vec_id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
    if (cents.isEmpty || books.exists(_.isEmpty) || queries.isEmpty)
      PqOp.emptyResult(embeddings.sparkSession, "dist_r")
    else {
      val withCell = KMeansOp.assign(qv, cents)
        .withColumnRenamed("cell", "gcell")
      val codes = PqOp.encode(withCell, books)
        .select(col("vec_id") +:
          (0 until PqOp.M).map(m => col(s"code$m")) :+
          col("gcell").as("cell"): _*)
      PqOp.adcRank(scoreProbed(codes, queries, books,
        probeCells(queries, cents, nprobe)))
    }
  }

  // ------------------------------------------------------------------
  // Oracle: q111's adc chain + the coarse chain, composed.

  /** Coarse-quantizer CTEs over the shared `qv` (unit-quantized): seed
    * `cg0`, [[CoarseRounds]] assign/recenter rounds, final assignment
    * `gaf` (vec_id → cell) and per-query probe set `gprobed`. Same
    * shapes as [[KMeansOp.kmeansCtes]], renamed to compose with
    * [[PqOp.adcCtes]] under one WITH. */
  private def coarseCtes: String = {
    def lr64(expr: String) = PqOp.lr(Dim, expr)
    def d2(cin: String) =
      s"${lr64("qv.q[i]*qv.q[i]")} - 2.0 * ${lr64(s"qv.q[i]*$cin.c[i]")} + ${lr64(s"$cin.c[i]*$cin.c[i]")}"
    def assignCte(cin: String, aout: String) =
      s"""$aout AS (SELECT vec_id, q, cell FROM (
         |  SELECT qv.vec_id, qv.q, $cin.cell,
         |    ROW_NUMBER() OVER (PARTITION BY qv.vec_id ORDER BY
         |      ${d2(cin)}, $cin.cell) AS rn
         |  FROM qv CROSS JOIN $cin) WHERE rn = 1)""".stripMargin
    def recenterCte(ain: String, cin: String, cout: String) =
      s"""${cout}_s AS (SELECT cell, list(s ORDER BY dim) AS c FROM (
         |  SELECT cell, t.i AS dim, SUM(q[t.i]) / CAST(COUNT(*) AS DOUBLE) AS s
         |  FROM $ain CROSS JOIN range(1, $Dim+1) t(i) GROUP BY cell, t.i)
         | GROUP BY cell),
         |$cout AS (SELECT $cin.cell, COALESCE(${cout}_s.c, $cin.c) AS c
         |  FROM $cin LEFT JOIN ${cout}_s USING (cell))""".stripMargin
    val rounds = (1 to CoarseRounds).map { r =>
      val cin = if (r == 1) "cg0" else s"cg${r - 1}"
      s"${assignCte(cin, s"ga$r")},\n${recenterCte(s"ga$r", cin, s"cg$r")}"
    }.mkString(",\n")
    val cR = s"cg$CoarseRounds"
    s"""cg0 AS (SELECT CAST(vec_id AS BIGINT) AS cell, q AS c FROM qv WHERE vec_id < $NList),
       |$rounds,
       |${assignCte(cR, "gaf")},
       |gpr AS (SELECT qv.vec_id AS query_id, $cR.cell,
       |    ROW_NUMBER() OVER (PARTITION BY qv.vec_id ORDER BY
       |      ${d2(cR)}, $cR.cell) AS cr
       |  FROM qv CROSS JOIN $cR WHERE qv.vec_id < ${PqOp.NQ}),
       |gprobed AS (SELECT query_id, cell FROM gpr WHERE cr <= $NProbe)""".stripMargin
  }

  /** q188 oracle: q111's ADC pair distances restricted to (query,
    * candidate) pairs where the candidate's coarse cell is probed by
    * the query, then the same top-k ranking. */
  def ivfpqOracleSql: String =
    s"""WITH ${PqOp.adcCtes},
       |$coarseCtes,
       |adcf AS (SELECT adc.query_id, adc.neighbor_id, adc.dist
       |  FROM adc JOIN gaf ON gaf.vec_id = adc.neighbor_id
       |  JOIN gprobed ON gprobed.query_id = adc.query_id AND gprobed.cell = gaf.cell)
       |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank,
       |  ROUND(dist / ${KMeansOp.ScaleQ * KMeansOp.ScaleQ}, 9) AS dist_r
       |FROM (SELECT query_id, neighbor_id, dist,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rn
       |  FROM adcf)
       |WHERE rn <= ${PqOp.TopK} ORDER BY query_id, rank""".stripMargin
}
