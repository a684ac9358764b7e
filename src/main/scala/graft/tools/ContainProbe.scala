package graft.tools

import org.apache.spark.sql.functions._

/** One-off diagnostics for the q215 containment builder: times each
  * stage of the PRODUCTION (capped) pipeline and counts its rows, so a
  * build regression — or a growth ratio between SFs — is attributable
  * to the stage that actually grew. Round 10 used this to find the
  * vocabulary-hot buckets behind the 270 s uncapped build; round 11
  * runs it at sf1 AND sf10 to decompose the post-cap 8.4×-at-10× build
  * growth into named per-stage ratios.
  *
  * `sbt "runMain graft.tools.ContainProbe /tmp/testdata/sf1"` prints
  * one JSON line per stage:
  *  - band_build: shingle + 256-perm signature + 128-band explode,
  *    through a DISK_ONLY checkpoint (rows = docs × 128).
  *  - bucket_profile: pairable-bucket size classes with their pair
  *    volume c(c−1)/2 — ">cap" rows are the volume the CBucketCap rule
  *    deletes; "2-64" is what the capped join actually pays.
  *  - collisions_capped: the production collision count (buckets
  *    restricted to 2..cap members).
  *  - candidates / cand_by_dist: post-hit-floor candidate pairs.
  *  - verify: the exact-intersection verify join over the candidates.
  */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder().getOrCreate()
    try {
      import graft.operators.ApproxDedup._
      val docs = graft.Tables.documents(spark, dir)
      def t[A](tag: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(s"""{"probe":"$tag","sec":${math.rint((System.nanoTime() - t0) / 1e7) / 1e2}}""")
        r
      }
      val sized = shingleSets(docs).filter(size(col("shingles")) > 0)
        .select(col("doc_id"), col("shingles"),
          size(col("shingles")).cast("long").as("n"))
        .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val sig = sized.select(col("doc_id"),
          signature(col("shingles"), permAC, permBC).as("sig"),
          (length(bin(col("n"))) - 1).cast("long").as("k"))
        .repartition(col("doc_id"))
      val banded = t("band_build") {
        sig.select(col("doc_id"), col("k"),
            posexplode(transform(sequence(lit(0), lit(CBands - 1)),
              b => concat_ws(",", slice(col("sig"), b * CRows + 1, lit(CRows))
                .cast("array<string>")))))
          .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
          .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
      }
      println(s"""{"probe":"band_rows","n":${banded.count()}}""")
      // bucket-size profile: where the collision volume lives, and how
      // much the cap deletes (c docs -> c(c-1)/2 pairs each)
      val prof = banded.groupBy(col("band"), col("band_key"))
        .agg(count(lit(1)).as("c")).filter(col("c") > 1)
        .select(col("c"), (col("c") * (col("c") - 1) / 2).as("pairs"))
        .groupBy(when(col("c") <= 4, "2-4").when(col("c") <= 16, "5-16")
          .when(col("c") <= CBucketCap, s"17-$CBucketCap")
          .otherwise(s">$CBucketCap (capped away)").as("bucket_size"))
        .agg(count(lit(1)).as("n_buckets"), sum(col("pairs")).as("pair_volume"))
        .collect()
      prof.foreach(r => println(s"""{"probe":"bucket_profile","size":"${r.getString(0)}","n":${r.getLong(1)},"pairs":${r.get(2)}}"""))
      // the PRODUCTION path: pairable buckets 2..cap only
      val pairable = banded.groupBy(col("band"), col("band_key"))
        .agg(count(lit(1)).as("__bc"))
        .filter(col("__bc") >= 2L && col("__bc") <= CBucketCap.toLong)
        .select(col("band"), col("band_key"))
      val kept = banded.join(pairable, Seq("band", "band_key"))
      val a = kept.select(col("doc_id").as("a_id"), col("k").as("ka"),
        col("band"), col("band_key"))
      val b = kept.select(col("doc_id").as("b_id"), col("k").as("kb"),
        col("band"), col("band_key"))
      val coll = t("collisions_capped") {
        a.join(b, Seq("band", "band_key"))
          .filter(col("a_id") < col("b_id")).count()
      }
      println(s"""{"probe":"collision_rows","n":$coll}""")
      val cand = a.join(b, Seq("band", "band_key"))
        .filter(col("a_id") < col("b_id") &&
          abs(col("ka") - col("kb")) <= CMaxBucketDist.toLong)
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("__hits"),
          max(abs(col("ka") - col("kb"))).as("__d"))
        .filter(col("__hits") >= when(col("__d") <= 1L, CNearHits.toLong)
          .otherwise(CFarHits.toLong))
        .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val byD = t("candidates") {
        cand.groupBy(col("__d")).agg(count(lit(1)).as("n")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      println(s"""{"probe":"cand_by_dist","d":${byD.toSeq.sorted.map { case (d, n) => s""""$d":$n""" }.mkString("{", ",", "}")}}""")
      val ver = t("verify") {
        cand.select("a_id", "b_id")
          .join(sized.hint("shuffle_hash")
            .select(col("doc_id").as("a_id"), col("shingles").as("sa"),
              col("n").as("na")), Seq("a_id"))
          .join(sized.hint("shuffle_hash")
            .select(col("doc_id").as("b_id"), col("shingles").as("sb"),
              col("n").as("nb")), Seq("b_id"))
          .withColumn("common", size(array_intersect(col("sa"), col("sb"))).cast("long"))
          .filter(col("common").cast("double") >= col("na") * lit(TauC) ||
            col("common").cast("double") >= col("nb") * lit(TauC))
          .count()
      }
      println(s"""{"probe":"verified_pairs","n":$ver}""")
    } finally spark.stop()
  }
}
