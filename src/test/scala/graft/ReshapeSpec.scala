package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Reshape, Temporal}

/** Reshaping operators (q132-q134) and the SCD2 history build (q135):
  * value invariants the oracle compare can't see — pivot/long-form mass
  * conservation, unpivot null retention, grouping-set disjointness, and
  * the SCD2 interval chain contract. */
class ReshapeSpec extends SparkTestBase {
  import spark.implicits._

  test("q132 pivot conserves mass: wide row sums equal the unpivoted total") {
    val wide = Reshape.statusPivot(spark, sfDir)
    val wideTotal = wide
      .select((coalesce($"rev_f", lit(0.0)) + coalesce($"rev_o", lit(0.0)) +
        coalesce($"rev_p", lit(0.0))).as("t"))
      .agg(sum($"t")).head.getDouble(0)
    val longTotal = Tables.orders(spark, sfDir)
      .filter($"o_orderdate".isNotNull)
      .agg(sum($"o_totalprice".cast("decimal(12,4)")).cast("double"))
      .head.getDouble(0)
    assert(math.abs(wideTotal - longTotal) < 1e-6,
      s"pivot total $wideTotal != source total $longTotal")
  }

  test("q132 pivot: declared values — building the plan runs ZERO Spark jobs") {
    // the values-less pivot overload eagerly runs a distinct job on the
    // pivot column before planning (a full extra scan at 100 TB); the
    // declared-values form must plan without touching the cluster
    val orders = Tables.orders(spark, sfDir) // parquet schema-listing job happens HERE, outside the group
    spark.sparkContext.setJobGroup("q132_build", "pivot plan construction")
    try {
      Reshape.statusPivot(orders).queryExecution.optimizedPlan
    } finally spark.sparkContext.clearJobGroup()
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup("q132_build")
    assert(jobs.isEmpty, s"pivot construction ran jobs ${jobs.mkString(",")}")
  }

  test("q133 unpivot KEEPS null metric values and emits 4 rows per nation") {
    val suppliers = Seq((1L, "s1", 7, null.asInstanceOf[java.lang.Double]))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val nations = Seq((7, "NULLLAND", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
    val out = Reshape.nationMetricsUnpivot(suppliers, nations).collect()
    assert(out.length == 4, s"expected 4 metric rows, got ${out.length}")
    val byMetric = out.map(r => r.getString(1) -> r).toMap
    assert(byMetric("n_supp").getDouble(2) == 1.0)
    assert(byMetric("bal_max").isNullAt(2), "all-null metric must surface as a NULL row, not vanish")
  }

  test("q134 grouping sets: exactly the requested sets, margins consistent") {
    val out = Reshape.facetGroupingSets(spark, sfDir).collect()
    val gids = out.map(_.getInt(2)).toSet
    assert(gids == Set(0, 2, 3), s"sets present: $gids — (source) margin (gid=1) must NOT be computed")
    val total = out.filter(_.getInt(2) == 3).map(_.getLong(3)).sum
    val fromDetail = out.filter(_.getInt(2) == 0).map(_.getLong(3)).sum
    val fromLang = out.filter(_.getInt(2) == 2).map(_.getLong(3)).sum
    assert(total == fromDetail && total == fromLang,
      s"margins disagree: total=$total detail=$fromDetail lang=$fromLang")
  }

  test("q135 scd2: runs collapse, intervals chain, exactly one open version per user") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val events = Seq(
      (1L, ts(0), 10L, "view", 1.0, "{}"),
      (1L, ts(1), 11L, "view", 1.0, "{}"),   // same state: no new version
      (1L, ts(2), 12L, "click", 1.0, "{}"),  // state change
      (1L, ts(3), 13L, "view", 1.0, "{}"),   // change back: a THIRD version
      (2L, ts(5), 20L, "signup", 1.0, "{}"))
      .toDF("user_id", "ts", "event_id", "event_type", "value", "props")
    val out = Temporal.scd2(events).collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(r => (r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, "view"), (2L, "click"), (3L, "view")),
      "consecutive duplicates must collapse; A->B->A must yield 3 versions")
    // interval chain: each valid_to equals the next version's valid_from
    u1.sortBy(_.getLong(1)).sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getTimestamp(4) == b.getTimestamp(3),
          s"valid_to of v${a.getLong(1)} must meet valid_from of v${b.getLong(1)}")
      case _ =>
    }
    out.groupBy(_.getLong(0)).foreach { case (u, rows) =>
      assert(rows.count(_.getBoolean(5)) == 1, s"user $u must have exactly one is_current row")
      assert(rows.filter(_.getBoolean(5)).forall(_.isNullAt(4)), "open interval has NULL valid_to")
    }
  }

  test("q135 scd2 plans ONE exchange: lag, row_number and lead share the sort") {
    val ex = Temporal.scd2(spark, sfDir).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(ex).size
    assert(exchanges == 1, s"expected a single user_id exchange, got $exchanges:\n$ex")
  }
}
