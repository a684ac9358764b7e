package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Input-boundary lock (round-6 task #3): the fixture generator is not
  * under this repo's control and has regenerated the same logical column
  * in different physical shapes between rounds — round 5 lost four
  * queries when events.ts silently flipped from TIMESTAMP(NANOS) to
  * µs TIMESTAMP_NTZ. These specs pin (a) the canonical dtypes every
  * operator may assume after Tables.load, (b) that each plausible
  * physical shape normalizes to the same canonical values, and (c) that
  * an unrecognized shape fails loudly at the boundary instead of
  * surfacing as an analysis error deep inside an operator. A future
  * fixture regen that changes any read dtype fails (a) immediately. */
class TablesSpec extends SparkTestBase {

  /** The canonical post-load schema of every table. Catalog strings, so
    * a dtype drift diff reads directly in the failure message. */
  private val canonical = Map(
    "region"   -> "r_regionkey int,r_name string",
    "nation"   -> "n_nationkey int,n_name string,n_regionkey int",
    "customer" -> "c_custkey bigint,c_name string,c_nationkey int,c_acctbal double,c_mktsegment string",
    "supplier" -> "s_suppkey bigint,s_name string,s_nationkey int,s_acctbal double",
    "part"     -> "p_partkey bigint,p_name string,p_brand string,p_type string,p_size int,p_retailprice double",
    "orders"   -> "o_orderkey bigint,o_custkey bigint,o_orderstatus string,o_totalprice double,o_orderdate timestamp,o_orderpriority string",
    "lineitem" -> ("l_orderkey bigint,l_partkey bigint,l_suppkey bigint,l_linenumber int," +
      "l_quantity double,l_extendedprice double,l_discount double,l_tax double," +
      "l_returnflag string,l_linestatus string,l_shipdate timestamp"),
    "events"   -> "event_id bigint,ts timestamp,user_id bigint,event_type string,value double,props string",
    "documents" -> "doc_id bigint,text string,lang string,source string,n_chars bigint",
    "embeddings" -> "vec_id bigint,embedding array<float>,label int")

  test("every table reads back its canonical dtypes (fixture-drift tripwire)") {
    Tables.names.foreach { t =>
      val got = Tables.load(spark, sfDir, t).schema.fields
        .map(f => s"${f.name} ${f.dataType.simpleString}").mkString(",")
      assert(got == canonical(t),
        s"table $t read dtypes drifted from canonical:\n  got:  $got\n  want: ${canonical(t)}")
    }
  }

  test("events.ts normalizes identically from all three fixture shapes " +
      "(nanos-as-long, µs-NTZ, µs-UTC)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shapes").toString
    val base = Tables.events(spark, sfDir).limit(200).cache()
    // µs-UTC: what rounds 1-4 produced after nanos conversion
    base.write.parquet(s"$dir/utc/events.parquet")
    // µs-NTZ: the round-5 regen shape (isAdjustedToUTC=false)
    base.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.parquet(s"$dir/ntz/events.parquet")
    // nanos-as-long: parquet TIMESTAMP(NANOS) reaches Tables as LongType
    // under the nanosAsLong session flag — a genuine int64 column is
    // byte-identical at read time, and Spark cannot write NANOS itself
    base.withColumn("ts", (unix_micros(col("ts")) * 1000).cast("long"))
      .write.parquet(s"$dir/nanos/events.parquet")

    val expected = base.orderBy("event_id").select("event_id", "ts").collect()
    Seq("utc", "ntz", "nanos").foreach { shape =>
      val got = Tables.events(spark, s"$dir/$shape")
      assert(got.schema("ts").dataType == TimestampType,
        s"shape $shape did not normalize to TimestampType")
      assert(got.orderBy("event_id").select("event_id", "ts").collect()
        .sameElements(expected), s"shape $shape changed values")
    }
    base.unpersist()
  }

  test("orders/lineitem date columns normalize NTZ and long shapes too") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shapes2").toString
    val o = Tables.orders(spark, sfDir).limit(100).cache()
    o.withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
      .write.parquet(s"$dir/events_like/orders.parquet")
    val got = Tables.orders(spark, s"$dir/events_like")
    assert(got.schema("o_orderdate").dataType == TimestampType)
    assert(got.orderBy("o_orderkey").select("o_orderkey", "o_orderdate").collect()
      .sameElements(o.orderBy("o_orderkey").select("o_orderkey", "o_orderdate").collect()))
    o.unpersist()
  }

  test("an unrecognized timestamp shape fails loudly at the boundary") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shapes3").toString
    Tables.events(spark, sfDir).limit(10)
      .withColumn("ts", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("unsupported timestamp shape"))
  }

  test("dirFingerprint: writer-semantics token mints a distinct, stable key") {
    val plain = Tables.dirFingerprint(spark, sfDir)
    val tok   = Tables.dirFingerprint(spark, sfDir, "json;tsfmt=X")
    assert(plain != tok, "semantics token must change the artifact key")
    assert(tok == Tables.dirFingerprint(spark, sfDir, "json;tsfmt=X"),
      "same dir + same token must be stable")
    assert(tok != Tables.dirFingerprint(spark, sfDir, "json;tsfmt=Y"),
      "different writer semantics must not share an artifact")
  }
}
