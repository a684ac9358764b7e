package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** One-off diagnostics for the multi-table sign-LSH blocked family:
  * per-table bucket-size profile, collision volume, and distinct
  * candidate pairs at a dir's corpus-scaled schedule. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder().getOrCreate()
    try {
      val emb = graft.Tables.embeddings(spark, dir)
      val v = Dedup.normalized(emb).localCheckpoint()
      val n = v.count()
      val bits = Similarity.multiTableBits(n, Dedup.BlockedBits)
      println(s"""{"probe":"schedule","n":$n,"bits":$bits,"tables":${Similarity.LshTables}}""")
      val slim = Similarity.multiBucketRows(v, bits)
        .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val prof = slim.groupBy(col("tbl"), col("bucket"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("tbl"))
        .agg(count(lit(1)).as("n_buckets"), max(col("c")).as("max_c"),
          sum(col("c") * (col("c") - 1) / 2).as("pairs"))
        .orderBy("tbl").collect()
      prof.foreach(r => println(s"""{"probe":"table","tbl":${r.get(0)},"n_buckets":${r.get(1)},"max_c":${r.get(2)},"pairs":${r.get(3)}}"""))
      def t[A](tag: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(s"""{"probe":"$tag","sec":${math.rint((System.nanoTime() - t0) / 1e7) / 1e2}}""")
        r
      }
      val a = slim.select(col("vec_id").as("a_id"), col("tbl"), col("bucket"))
      val b = slim.select(col("vec_id").as("b_id"), col("tbl"), col("bucket"))
      val coll = t("collisions") {
        a.join(b, Seq("tbl", "bucket")).filter(col("a_id") < col("b_id")).count()
      }
      println(s"""{"probe":"collision_rows","n":$coll}""")
      val dd = t("distinct_pairs") {
        a.join(b, Seq("tbl", "bucket")).filter(col("a_id") < col("b_id"))
          .select("a_id", "b_id").dropDuplicates("a_id", "b_id").count()
      }
      println(s"""{"probe":"distinct_pairs","n":$dd}""")
    } finally spark.stop()
  }
}

/** A/B timing: old single-table collision+score vs the multi-table path. */
object LshProbeAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/testdata/sf10")
    val spark = graft.GraftSession.builder().getOrCreate()
    try {
      val emb = graft.Tables.embeddings(spark, dir)
      val v = Dedup.normalized(emb).localCheckpoint()
      val n = v.count()
      def t[A](tag: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(s"""{"probe":"$tag","sec":${math.rint((System.nanoTime() - t0) / 1e7) / 1e2}}""")
        r
      }
      // OLD single-table shape at the old ladder
      val bitsOld = Similarity.scaledBits(n, Dedup.BlockedBits)
      val planes = Similarity.hyperplanesFor(bitsOld)
      val v1 = v.withColumn("bucket", Similarity.lshBucket(col("e"), planes))
      val a1 = v1.select(col("vec_id").as("a_id"), col("e").as("ea"), col("nrm").as("na"), col("bucket"))
      val b1 = v1.select(col("vec_id").as("b_id"), col("e").as("eb"), col("nrm").as("nb"), col("bucket"))
      val n1 = t("single_table") {
        a1.join(b1, Seq("bucket")).filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"),
            graft.functions.VectorOps.cosinePre(col("ea"), col("eb"), col("na"), col("nb")).as("sim"))
          .filter(col("sim") >= Dedup.BlockedTau).count()
      }
      println(s"""{"probe":"single_rows","bits":$bitsOld,"n":$n1}""")
      val bitsNew = Similarity.multiTableBits(n, Dedup.BlockedBits)
      val n2 = t("multi_table") {
        Dedup.nearDupPairsBlocked(emb, Dedup.BlockedTau, bitsNew).count()
      }
      println(s"""{"probe":"multi_rows","bits":$bitsNew,"n":$n2}""")
      // decompose: join volume without the cosine
      val w = v.select(col("vec_id"), col("e"), col("nrm"),
          org.apache.spark.sql.functions.posexplode(Similarity.multiBuckets(col("e"), bitsNew)))
        .select(col("vec_id"), col("e"), col("nrm"),
          col("pos").as("tbl"), col("col").as("bucket"))
        .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val aa = w.select(col("vec_id").as("a_id"), col("e").as("ea"), col("nrm").as("na"), col("tbl"), col("bucket"))
      val bb = w.select(col("vec_id").as("b_id"), col("e").as("eb"), col("nrm").as("nb"), col("tbl"), col("bucket"))
      val jc = t("mt_join_only") {
        aa.join(bb, Seq("tbl", "bucket")).filter(col("a_id") < col("b_id")).count()
      }
      println(s"""{"probe":"mt_join_only_rows","n":$jc}""")
      val js = t("mt_join_scored") {
        aa.join(bb, Seq("tbl", "bucket")).filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"),
            graft.functions.VectorOps.cosinePre(col("ea"), col("eb"), col("na"), col("nb")).as("sim"))
          .filter(col("sim") >= Dedup.BlockedTau).count()
      }
      println(s"""{"probe":"mt_join_scored_rows","n":$js}""")
      // slim join (no payloads riding)
      val sa = w.select(col("vec_id").as("a_id"), col("tbl"), col("bucket"))
      val sb = w.select(col("vec_id").as("b_id"), col("tbl"), col("bucket"))
      val sj = t("mt_join_slim") {
        sa.join(sb, Seq("tbl", "bucket")).filter(col("a_id") < col("b_id")).count()
      }
      println(s"""{"probe":"mt_join_slim_rows","n":$sj}""")
    } finally spark.stop()
  }
}
