package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** Streaming operators (reference analog: the Kafka→raw/cleansed
  * Structured Streaming jobs, metadata_eu_to_raw.py:53-112 and
  * ugc_raw_to_cleansed.py:51-84).
  *
  * Each operator has ONE transform that works on both a batch DataFrame
  * (used by the oracle-checked qNN queries) and a readStream DataFrame
  * (watermark applied only when streaming), so the tested logic is the
  * logic a production stream runs.
  *
  * Scale notes: windowed aggs and dropDuplicates shuffle on
  * (window/key) — state store size is bounded by the watermark horizon;
  * sessionization uses flatMapGroupsWithState, whose state is one open
  * session per key, with event-time timeout eviction.
  */
object Streams {

  /** Tumbling event-time window aggregate (q19). Watermark only applies
    * to streaming inputs — on batch it would be a plan-invalid no-op. */
  def tumblingAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val in = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    // explicit null-ts filter: window() drops null-timestamp rows anyway
    // (the analyzer inserts the filter), but making it visible keeps the
    // operator and its oracle in lockstep (q78/q80/q85/q96 rule)
    in.filter(col("ts").isNotNull)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,4)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
  }

  /** q95: HOPPING (sliding) window aggregation — 10-minute windows
    * every 5 minutes, so each event lands in exactly 2 overlapping
    * windows: the smoothing the dashboard's activity panels need where
    * q19's tumbling windows jump at boundaries. Identical code for
    * batch and stream (watermark added when streaming), like
    * [[tumblingAgg]]. Value sums fold in DECIMAL so overlapping windows
    * stay engine-exact.
    *
    * Scale notes: one shuffle on (window, event_type); the ×2 row
    * expansion happens map-side inside Spark's window() Expand, before
    * partial aggregation — state per window is one row, and a stream
    * drops windows as the watermark passes, exactly like tumbling. */
  def hoppingAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val in = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    in.filter(col("ts").isNotNull) // same null-ts parity rule as tumblingAgg
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,4)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("n_events"), col("total_value"))
  }

  /** Replay-safe dedup (q21): drop duplicate event_ids (within the
    * watermark horizon when streaming — Kafka redelivery shape). The
    * streaming path uses dropDuplicatesWithinWatermark: a bare
    * dropDuplicates(event_id) would never evict state (the watermark
    * only purges dedup state when the event-time column is part of the
    * key), growing the state store without bound on a long-lived
    * stream. */
  def dedupReplays(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Gap-based sessionization, batch analog (q20): lag + cumulative
    * new-session flags, then one aggregate per (user, session). Integer
    * microsecond arithmetic, so the gap compare is engine-exact. */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val order = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapSeconds * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(order))
      .withColumn("new_session",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,4)")).cast("double").as("total_value"))
      .orderBy("user_id", "session_id")
  }

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, total: Double)
  case class SessionsState(sessions: List[SessionState])
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Gap-based sessionization for streams — EXACT replay of the batch
    * analog under any micro-batch split of the same events.
    *
    * State per user is the list of sessions the watermark has not yet
    * passed (not just the single open one): a session is only emitted —
    * and only dropped from state — once `end + gap ≤ watermark`, at
    * which point no admissible event (ts > watermark) can extend or
    * bridge it, so the emitted session is final and identical to the
    * batch result. Until then every arriving event folds into the
    * session set: it extends the session(s) within `gap` of it, merging
    * the two neighbors it bridges, or starts its own. Out-of-order
    * events within the watermark therefore land exactly where the batch
    * sort would put them — including several late events spanning an
    * old session across different micro-batches, the case the previous
    * single-open-session state emitted as fragments.
    *
    * Scale notes: state per user is bounded by the watermark horizon
    * (sessions older than it are evicted on the event-time timeout), and
    * the per-batch fold touches only that user's surviving sessions. */
  def sessionizeStream(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L
    events.withWatermark("ts", "1 hour")
      .selectExpr("event_id", "ts", "user_id", "value").as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionsState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionsState]) =>
          def toSession(st: SessionState): Session = Session(userId,
            new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.end),
            st.n, st.total)
          // fold one event into the disjoint session list: merge with
          // every session within `gap` (≤ 2: the one it bridges on each
          // side), else start a new one
          def insert(ss: List[SessionState], e: Ev): List[SessionState] = {
            val t = e.ts.getTime
            val (near, far) = ss.partition(st =>
              t >= st.start - gapMs && t <= st.end + gapMs)
            SessionState(
              (t :: near.map(_.start)).min, (t :: near.map(_.end)).max,
              near.map(_.n).sum + 1L, near.map(_.total).sum + e.value) :: far
          }
          val existing = state.getOption.map(_.sessions).getOrElse(Nil)
          val merged =
            if (state.hasTimedOut) existing
            else evs.foldLeft(existing)(insert)
          val wm = state.getCurrentWatermarkMs()
          val (closed, open) = merged.partition(st => st.end + gapMs <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionsState(open))
            // wake when the earliest open session becomes final; the
            // timestamp must sit strictly past the current watermark
            state.setTimeoutTimestamp(math.max(open.map(_.end + gapMs).min, wm + 1))
          }
          closed.sortBy(st => (st.start, st.end)).map(toSession).iterator
      }.toDF()
  }

  /** Stream-static enrichment: annotate a live stream with a broadcast
    * dimension snapshot (the reference's ugc-stream × metadata join
    * shape). Works identically on batch frames. */
  def enrichStream(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join (q58's streaming form): views × purchases
    * of the same user with purchase in (view_ts, view_ts + window]. On
    * streams both sides carry watermarks and the time-bound join
    * condition bounds each side's state retention to the join window +
    * watermark — the condition Structured Streaming needs to ever purge
    * state. On batch frames the same plan is a plain range join; the
    * oracle-gated bucketed rewrite is [[graft.operators.Temporal.intervalJoin]]. */
  def intervalJoinStream(views: DataFrame, purchases: DataFrame,
      windowSeconds: Long = graft.operators.Temporal.IntervalSeconds,
      watermark: String = "1 hour"): DataFrame = {
    val mark = (df: DataFrame) =>
      if (df.isStreaming) df.withWatermark("ts", watermark) else df
    val v = mark(views).select(col("user_id"),
      col("event_id").as("view_event_id"), col("ts").as("view_ts"))
    val p = mark(purchases).select(col("user_id").as("p_user_id"),
      col("event_id").as("purchase_event_id"), col("ts").as("purchase_ts"),
      col("value").as("purchase_value"))
    v.join(p, col("user_id") === col("p_user_id") &&
        col("purchase_ts") > col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col("user_id"), col("view_event_id"), col("purchase_event_id"),
        col("view_ts"), col("purchase_ts"), col("purchase_value"))
  }

  /** Streaming MERGE sink (the reference's Delta `MERGE` from a stream,
    * ugc_raw_to_cleansed.py + eu_raw_to_cleansed_merge.py): each
    * micro-batch upserts into a versioned parquet snapshot —
    * `path/v<batchId>` is the post-merge table, `path/_LATEST` names the
    * current version. Returns the DataStreamWriter so the caller picks
    * trigger/checkpoint options.
    *
    * Write protocol (stage → publish → claim):
    *  1. the merge result lands in a UNIQUE staging dir — committed data
    *     is never an overwrite target, so a racing or replayed writer
    *     cannot clobber already-published files;
    *  2. the staging dir is renamed to `v<v>` (atomic dir move; the
    *     rename FAILS if the target exists, so the first publisher
    *     wins and a loser just drops its staging copy);
    *  3. `_commits/<v>` is claimed via atomic create-if-absent — the
    *     log never references a version before its data is fully
    *     published, so readers resolving the log never see a partial
    *     or missing snapshot.
    * A crash between publish and claim leaves an unreferenced `v<v>`
    * dir; the stream's foreachBatch replay of that batch recomputes the
    * identical merge (same base — see below), finds the target present,
    * and completes the claim.
    *
    * The merge base is the latest version committed STRICTLY BELOW this
    * batchId: on a foreachBatch replay the crashed attempt's own version
    * must not be an input (reading and rewriting the same files wedges
    * the stream), and versions ≥ batchId can only be earlier
    * incarnations of this same batch. */
  def upsertSink(stream: DataFrame, path: String, keys: Seq[String]):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val merged = latestCommittedVersionBelow(spark, path, batchId) match {
        case Some(v) =>
          graft.operators.Merge.upsertSnapshot(
            spark.read.parquet(s"$path/v$v"), batch, keys)
        case None => batch
      }
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val staging = new org.apache.hadoop.fs.Path(dir,
        s"_staging-v$batchId-${java.util.UUID.randomUUID().toString.take(8)}")
      merged.write.mode("overwrite").parquet(staging.toString)
      val target = new org.apache.hadoop.fs.Path(dir, s"v$batchId")
      // exists-check first: some FileSystems rename INTO an existing dir
      // rather than failing; a racing loser must drop its copy either way
      val published = !fs.exists(target) && fs.rename(staging, target)
      if (!published) fs.delete(staging, true)
      tryCommitVersion(spark, path, batchId) // false = already committed: done
      ()
    }

  /** Hash bucket of the merge key(s): pmod(hash(keys), n). The bucket of
    * a key never changes, so a batch row and its base row always land in
    * the same bucket. */
  private[graft] def bucketExpr(keys: Seq[String], numBuckets: Int) =
    pmod(hash(keys.map(col): _*), lit(numBuckets))

  /** Bucketed incremental MERGE sink — [[upsertSink]]'s scale path. The
    * plain sink rewrites the FULL snapshot every micro-batch (a 100 TB
    * table rewritten per trigger); this one hash-buckets the snapshot by
    * the merge key and each batch rewrites ONLY the buckets containing
    * batch keys — per-trigger write cost is O(table/numBuckets ×
    * touched buckets), not O(table).
    *
    * Layout: `path/v<id>/__bucket=<b>/…` holds the rewritten buckets of
    * version `id`; `path/v<id>/_manifest` maps EVERY bucket to the
    * version whose files currently hold it (untouched buckets keep
    * pointing at older versions — their files are never rewritten, or
    * even read). Publish order is the same stage → rename → claim
    * protocol as [[upsertSink]], so readers resolving through
    * `_commits` never see a partial version, and a foreachBatch replay
    * recomputes the identical merge (the base resolves strictly below
    * the replayed batchId). Old versions are swept by
    * [[vacuumBucketed]] once no current manifest references them. */
  def upsertSinkBucketed(stream: DataFrame, path: String, keys: Seq[String],
      numBuckets: Int = 16, retainVersions: Int = 1):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      mergeBucketedBatch(batch, path, keys, numBuckets, batchId)
      vacuumBucketed(batch.sparkSession, path, retainVersions)
      ()
    }

  /** One bucketed merge (the foreachBatch body, callable directly for
    * batch backfills): merge `batch` into the buckets it touches and
    * publish version `batchId` with an updated manifest. */
  def mergeBucketedBatch(batch: DataFrame, path: String, keys: Seq[String],
      numBuckets: Int, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prevManifest: Map[Int, Long] =
      latestCommittedVersionBelow(spark, path, batchId)
        .map(v => readManifest(spark, path, v)).getOrElse(Map.empty)
    val bb = batch.withColumn("__bucket", bucketExpr(keys, numBuckets))
    // ≤ numBuckets values — a bounded driver collect, not a data collect
    val touched = bb.select("__bucket").distinct().collect()
      .map(_.getInt(0)).sorted
    val baseTouched = touched.toSeq.flatMap { b =>
      prevManifest.get(b).map(v =>
        spark.read.parquet(s"$path/v$v/__bucket=$b").withColumn("__bucket", lit(b)))
    }.reduceOption(_ unionByName _)
    val merged = baseTouched match {
      case Some(base) => graft.operators.Merge.upsertSnapshot(base, bb, keys)
      case None => bb
    }
    val staging = new org.apache.hadoop.fs.Path(dir,
      s"_staging-v$batchId-${java.util.UUID.randomUUID().toString.take(8)}")
    merged.write.mode("overwrite").partitionBy("__bucket").parquet(staging.toString)
    // manifest rides INSIDE the staged version dir, so the rename
    // publishes data + manifest atomically together
    writeManifest(fs, staging, prevManifest ++ touched.map(_ -> batchId))
    val target = new org.apache.hadoop.fs.Path(dir, s"v$batchId")
    val published = !fs.exists(target) && fs.rename(staging, target)
    if (!published) fs.delete(staging, true)
    tryCommitVersion(spark, path, batchId)
    ()
  }

  /** The latest bucketed snapshot: each bucket read from the version the
    * manifest references, unioned. Returns None before the first commit
    * or when the manifest is empty (only empty batches ever committed). */
  def currentSnapshotBucketed(spark: SparkSession, path: String): Option[DataFrame] =
    latestCommittedVersion(spark, path).flatMap { v =>
      readManifest(spark, path, v).toSeq.sortBy(_._1)
        .map { case (b, ver) => spark.read.parquet(s"$path/v$ver/__bucket=$b") }
        .reduceOption(_ unionByName _)
    }

  /** q42's daily-ingest loop under Structured Streaming — the
    * reference's qdrant-deduplicator batch loop
    * (deduplicate_from_qdrant.py:224-310) as a stream. Each micro-batch
    * of embedding rows (vec_id, embedding) is scored against the FIXED
    * validated-corpus side (the persisted frame q42 serves from —
    * [[graft.operators.Dedup.corpusSideEmb]], artifact-stored by
    * `dedupIncrementalQ`) via `dedupIncrementalPre`, and the per-vector
    * verdicts (vec_id, canonical_id, matched, best_sim_r) MERGE into
    * the bucketed versioned snapshot at `path` keyed by vec_id — the
    * canonical-mapping registry the reference's loop maintains, with
    * [[mergeBucketedBatch]]'s replay-idempotent publish protocol.
    *
    * Batch ≡ stream under ANY micro-batch split by construction: the
    * corpus side is constant for the run and batch vectors never
    * canonicalize each other (the reference's pending-vs-validated
    * rule), so each vector's verdict depends only on (vector, corpus) —
    * StreamingSpec proves equality under 1/2/3-way splits. A
    * redelivered vec_id upserts its identical verdict (idempotent). At
    * scale the per-trigger cost is the batch-side bucket probe join
    * (O(batch · corpus / 2^bits) candidate rows) plus a rewrite of only
    * the snapshot buckets the batch touches. */
  def dedupIncrementalStream(stream: DataFrame, corpusPre: DataFrame,
      path: String, tau: Double, bits: Int,
      dim: Int = graft.operators.Similarity.Dim, numBuckets: Int = 16):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      mergeBucketedBatch(
        graft.operators.Dedup.dedupIncrementalPre(
          corpusPre, batch, tau, bits, dim),
        path, Seq("vec_id"), numBuckets, batchId)
      ()
    }

  /** `_commits`-driven retention for [[upsertSinkBucketed]] tables:
    * deletes version dirs that (a) are not referenced by the LATEST
    * committed manifest, (b) are MORE than `retainVersions` behind it —
    * strictly `v < latest - retainVersions`, so with the default
    * retainVersions=1 version latest-1 always survives one more commit
    * (the grace window for a reader that resolved the previous commit
    * just before this one; the sink vacuums after every trigger, so a
    * `<=` sweep would hit that reader on every batch) — and (c) are not
    * the latest version itself (an empty batch publishes a
    * manifest-only version whose dir must survive). Returns the swept
    * version ids. */
  def vacuumBucketed(spark: SparkSession, path: String,
      retainVersions: Int = 1): Seq[Long] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    latestCommittedVersion(spark, path) match {
      case None => Nil
      case Some(latest) =>
        val referenced = readManifest(spark, path, latest).values.toSet
        val versions = fs.listStatus(dir).toSeq.map(_.getPath.getName)
          .filter(n => n.length > 1 && n.head == 'v' && n.tail.forall(_.isDigit))
          .map(_.tail.toLong)
        val doomed = versions
          .filter(v => v != latest && v < latest - retainVersions && !referenced(v))
          .sorted
        doomed.foreach(v =>
          fs.delete(new org.apache.hadoop.fs.Path(dir, s"v$v"), true))
        doomed
    }
  }

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
      versionDir: org.apache.hadoop.fs.Path, m: Map[Int, Long]): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(versionDir, "_manifest"), true)
    try out.write(m.toSeq.sorted.map { case (b, v) => s"$b:$v" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  private[graft] def readManifest(spark: SparkSession, path: String,
      v: Long): Map[Int, Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/v$v/_manifest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty
    else readUtf8(fs, p).split("\n").iterator.filter(_.nonEmpty).map { line =>
      val Array(b, ver) = line.split(":")
      b.toInt -> ver.toLong
    }.toMap
  }

  private def readUtf8(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](4096)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Optimistic commit of snapshot version `v`: atomically claims
    * `_commits/<v>` via create-if-absent (atomic on HDFS and local FS; on
    * object stores use a conditional-put equivalent), then refreshes the
    * `_LATEST` cache. Returns false when the version was already
    * committed — a concurrent writer racing to the same version loses
    * here BEFORE any reader can observe its data, which is the
    * concurrent-writer story the versioned-parquet MERGE sink needs:
    * multiple writers each claim latestCommittedVersion+1 and retry on
    * false. The commit log, not `_LATEST`, is the source of truth, so a
    * writer crashing between claim and pointer refresh can't strand
    * readers on a stale pointer. */
  def tryCommitVersion(spark: SparkSession, path: String, v: Long): Boolean = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = new org.apache.hadoop.fs.Path(dir, "_commits")
    fs.mkdirs(commits)
    // createNewFile returns false (no throw) when the version is already
    // claimed; genuine IO failures propagate
    val claimed = fs.createNewFile(new org.apache.hadoop.fs.Path(commits, v.toString))
    if (claimed) writeLatestPointer(spark, path, v)
    claimed
  }

  /** Greatest committed version STRICTLY below `bound` — the merge-base
    * resolution for replays and checkpoint resets. Scans the whole
    * `_commits` log rather than filtering only the single latest commit:
    * when the latest commit is >= bound (a checkpoint reset restarting
    * batchIds at 0 against an existing table), older committed versions
    * below bound must still be found — `latestCommittedVersion(...)
    * .filter(_ < bound)` would yield None and silently merge against
    * empty, publishing a manifest that lost every base row. */
  def latestCommittedVersionBelow(spark: SparkSession, path: String,
      bound: Long): Option[Long] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = new org.apache.hadoop.fs.Path(dir, "_commits")
    val fromLog =
      if (fs.exists(commits))
        fs.listStatus(commits).toSeq
          .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
          .filter(_ < bound).maxOption
      else None
    // pre-log tables: the _LATEST pointer is all there is
    fromLog.orElse(latestCommittedVersion(spark, path).filter(_ < bound))
  }

  /** Highest committed version per the `_commits` log (source of truth);
    * falls back to the `_LATEST` pointer for tables written before the
    * log existed. */
  def latestCommittedVersion(spark: SparkSession, path: String): Option[Long] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = new org.apache.hadoop.fs.Path(dir, "_commits")
    val fromLog =
      if (fs.exists(commits))
        fs.listStatus(commits).toSeq
          .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
          .maxOption
      else None
    fromLog.orElse {
      val latest = new org.apache.hadoop.fs.Path(dir, "_LATEST")
      if (fs.exists(latest))
        scala.util.Try(readUtf8(fs, latest).trim.toLong).toOption
      else None
    }
  }

  /** Commit the `_LATEST` version pointer through the Hadoop FileSystem
    * API — resolves against the table's own filesystem (HDFS/S3A/file),
    * not the driver's local disk. Written to a temp file then renamed,
    * which is atomic on HDFS; on S3A rename is copy+delete but the
    * pointer is a single small object so readers see old-or-new, never
    * partial. */
  private[streaming] def writeLatestPointer(spark: SparkSession, path: String,
      batchId: Long): Unit = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir, s"_LATEST.tmp-$batchId")
    val dst = new org.apache.hadoop.fs.Path(dir, "_LATEST")
    val out = fs.create(tmp, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"failed to commit _LATEST pointer at $dst")
  }

  /** The latest committed snapshot written by [[upsertSink]], if any —
    * resolved through the `_commits` log (see [[latestCommittedVersion]]),
    * so readers never depend on the `_LATEST` cache being fresh. */
  def currentSnapshot(spark: SparkSession, path: String): Option[DataFrame] =
    latestCommittedVersion(spark, path)
      .map(v => spark.read.parquet(s"$path/v$v"))

  // ---- time travel ----
  // The versioned layouts already retain history (every committed v<id>
  // dir until vacuum); these readers expose it the way Delta's
  // `versionAsOf` does for the reference's Delta tables. A version
  // resolves ONLY through the `_commits` log — an uncommitted v<id> dir
  // (crash between publish and claim) is not a readable snapshot.

  /** Snapshot of [[upsertSink]]'s table AS OF committed version `v`;
    * None when `v` was never committed or its dir was vacuumed. */
  def readVersion(spark: SparkSession, path: String, v: Long): Option[DataFrame] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = fs.exists(new org.apache.hadoop.fs.Path(dir, s"_commits/$v"))
    val present = fs.exists(new org.apache.hadoop.fs.Path(dir, s"v$v"))
    if (committed && present) Some(spark.read.parquet(s"$path/v$v")) else None
  }

  /** [[currentSnapshot]] under the time-travel name, for API symmetry. */
  def readLatest(spark: SparkSession, path: String): Option[DataFrame] =
    currentSnapshot(spark, path)

  /** Snapshot of [[upsertSinkBucketed]]'s table AS OF committed version
    * `v`: resolves THAT version's manifest, so each bucket reads from
    * whichever older version last rewrote it — exactly what a reader at
    * the time of commit `v` saw. None when `v` was never committed, its
    * manifest is empty, or a referenced bucket version was vacuumed
    * (retention has outlived this snapshot; [[vacuumBucketed]] keeps
    * everything the LATEST manifest references, so the current snapshot
    * is never in that state). */
  def readVersionBucketed(spark: SparkSession, path: String,
      v: Long): Option[DataFrame] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir, s"_commits/$v"))) None
    else {
      val m = readManifest(spark, path, v).toSeq.sortBy(_._1)
      if (m.exists { case (b, ver) =>
        !fs.exists(new org.apache.hadoop.fs.Path(dir, s"v$ver/__bucket=$b")) }) None
      else m.map { case (b, ver) => spark.read.parquet(s"$path/v$ver/__bucket=$b") }
        .reduceOption(_ unionByName _)
    }
  }

  /** [[currentSnapshotBucketed]] under the time-travel name. */
  def readLatestBucketed(spark: SparkSession, path: String): Option[DataFrame] =
    currentSnapshotBucketed(spark, path)

  // ---- oracle-checked batch entries ----

  /** q19: tumbling hourly aggregate over the events table. */
  def q19(s: SparkSession, dir: String): DataFrame =
    tumblingAgg(Tables.events(s, dir))
      .orderBy("window_start", "event_type")

  /** q95: batch run of the hopping-window aggregate. */
  def q95(s: SparkSession, dir: String): DataFrame =
    hoppingAgg(Tables.events(s, dir))
      .orderBy("window_start", "event_type")

  /** q20: batch sessionization with a 30-minute gap. */
  def q20(s: SparkSession, dir: String): DataFrame =
    sessionizeBatch(Tables.events(s, dir))

  /** Sessionization via Spark's NATIVE `session_window` operator — the
    * same gap semantics q20 hand-rolls, expressed as the built-in
    * Catalyst session window so the whole session assignment happens
    * inside ONE aggregate (no lag window, no cumulative-flag pass), and
    * the identical code runs under Structured Streaming with a
    * watermark (merging session state is Spark's, not ours).
    *
    * BOUNDARY CONTRACT, spec-pinned: the built-in merges an event whose
    * ts is within the CLOSED interval [prev, prev+gap] — a gap of
    * exactly `gapSeconds` stays in-session, identical to q20's
    * `gap_us > gap → new` rule (verified empirically on a planted
    * 1799/1800/1801 s triple; StreamingSpec asserts the two
    * implementations agree INCLUDING at the boundary).
    *
    * `session_seq` (the per-user ordinal q20 exposes as session_id) is
    * recovered by a row_number over the AGGREGATED session-sized frame
    * — scale-safe where a raw-event window would not be. NULL ts rows
    * carry no event time and are excluded explicitly (the oracle
    * filters identically). */
  def sessionizeBuiltin(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val agg = events
      .where(col("ts").isNotNull)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSeconds seconds"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(20,4)")).cast("double").as("total_value"))
    val seq = Window.partitionBy(col("user_id")).orderBy(col("session_start"))
    agg.withColumn("session_seq", row_number().over(seq).cast("long"))
      .select("user_id", "session_seq", "session_start", "session_end",
        "n_events", "total_value")
      .orderBy("user_id", "session_seq")
  }

  /** q131: [[sessionizeBuiltin]] over the events table. */
  def q131(s: SparkSession, dir: String): DataFrame =
    sessionizeBuiltin(Tables.events(s, dir))

  val sessionizeBuiltinOracleSql: String =
    """WITH x AS (SELECT user_id, ts, event_id, value,
      |  epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
      | FROM events WHERE ts IS NOT NULL
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (SELECT user_id, ts, value,
      |  SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      | FROM x)
      |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      | MIN(ts) AS session_start, MAX(ts) AS session_end,
      | COUNT(*) AS n_events,
      | CAST(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS VARCHAR) AS DOUBLE) AS total_value
      |FROM y GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** q21: replay dedup — events unioned with themselves (simulated Kafka
    * redelivery), then deduped back to the original stream. */
  def q21(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    dedupReplays(e.unionByName(e))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  /** Last-click attribution on top of [[intervalJoinStream]] — the
    * production shape the raw interval join exists to feed: every
    * purchase is credited to the LATEST click by the same user within
    * the preceding [[graft.operators.Temporal.IntervalSeconds]] window
    * (ties on click ts broken by highest click event_id — a total
    * order, so the winner is deterministic), with the candidate-click
    * count alongside. Reference analog: the conversion panel joining
    * the ugc event stream to itself by guid + time window
    * (app.py:84-140's per-facet engagement readouts).
    *
    * One transform for batch and stream (the file's contract): on
    * batch frames the join is a user-keyed equi-join with a bounded
    * time predicate and the winner is a map-combinable MAX of the
    * packed (ts, id) struct; on streams both inputs carry watermarks —
    * the time-bound join purges its state past watermark + window, and
    * the downstream aggregate is grouped by a purchase-time tumbling
    * window (each purchase_event_id lives in exactly ONE window, so
    * the window column changes no group boundaries — it exists so the
    * chained stateful aggregate after the stream-stream join has the
    * event-time column Spark requires to emit and evict in append
    * mode; StreamingSpec proves batch ≡ stream across micro-batch
    * splits). Scale: no corpus-wide sort or window — per-purchase
    * state is click-count-bounded and the aggregate map-combines. */
  def attribution(events: DataFrame): DataFrame = {
    val base = events.filter(col("ts").isNotNull && col("user_id").isNotNull &&
      col("event_id").isNotNull)
    val clicks = base.filter(col("event_type") === "click")
    val purchases = base.filter(col("event_type") === "purchase")
    val j = intervalJoinStream(clicks, purchases)
    j.groupBy(
        window(col("purchase_ts"),
          s"${graft.operators.Temporal.IntervalSeconds} seconds"),
        col("purchase_event_id"))
      .agg(max(col("user_id")).as("user_id"),
        max(col("purchase_ts")).as("purchase_ts"),
        max(col("purchase_value")).as("purchase_value"),
        count(lit(1)).as("n_clicks"),
        max(struct(col("view_ts"), col("view_event_id"))).as("w"))
      .select(col("purchase_event_id"), col("user_id"), col("purchase_ts"),
        col("purchase_value"), col("n_clicks"),
        col("w.view_event_id").as("click_event_id"),
        col("w.view_ts").as("click_ts"))
  }

  /** q199: batch run of [[attribution]] over the events table. */
  def q199(s: SparkSession, dir: String): DataFrame =
    attribution(Tables.events(s, dir)).orderBy("purchase_event_id")

  /** q199 oracle: same join window, last-click total order via an
    * explicit (ts DESC, id DESC) rank instead of the struct MAX. */
  val attributionOracleSql: String =
    s"""WITH b AS (SELECT event_id, ts, user_id, event_type, value FROM events
       |  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL),
       |c AS (SELECT user_id, event_id AS view_event_id, ts AS view_ts
       |  FROM b WHERE event_type = 'click'),
       |p AS (SELECT user_id, event_id AS purchase_event_id, ts AS purchase_ts,
       |    value AS purchase_value FROM b WHERE event_type = 'purchase'),
       |j AS (SELECT p.purchase_event_id, p.user_id, p.purchase_ts,
       |    p.purchase_value, c.view_event_id, c.view_ts
       |  FROM p JOIN c ON p.user_id = c.user_id
       |    AND p.purchase_ts > c.view_ts
       |    AND p.purchase_ts <= c.view_ts + INTERVAL ${graft.operators.Temporal.IntervalSeconds} SECONDS),
       |r AS (SELECT *,
       |    ROW_NUMBER() OVER (PARTITION BY purchase_event_id
       |      ORDER BY view_ts DESC, view_event_id DESC) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY purchase_event_id) AS BIGINT) AS n_clicks
       |  FROM j)
       |SELECT purchase_event_id, user_id, purchase_ts, purchase_value, n_clicks,
       |  view_event_id AS click_event_id, view_ts AS click_ts
       |FROM r WHERE rn = 1 ORDER BY purchase_event_id""".stripMargin
}
