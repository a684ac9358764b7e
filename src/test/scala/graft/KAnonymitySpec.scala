package graft

import graft.operators.Curation

/** k-anonymity audit (q211): histogram arithmetic, risk flag threshold,
  * floor-band boundaries, NULL quasi-identifiers as their own group. */
class KAnonymitySpec extends SparkTestBase {
  import spark.implicits._

  private def customers(rows: (Long, Int, Double, String)*) =
    rows.toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")

  private def rows(out: Array[org.apache.spark.sql.Row]) =
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq

  test("histogram counts groups and records per size with the k=5 flag") {
    // QI group (1, A, band 0): 5 members; (2, B, band 0): 2 members;
    // (3, C, band 1): 1 member
    val d = customers(
      (1L, 1, 10.0, "A"), (2L, 1, 20.0, "A"), (3L, 1, 30.0, "A"),
      (4L, 1, 40.0, "A"), (5L, 1, 50.0, "A"),
      (6L, 2, 10.0, "B"), (7L, 2, 20.0, "B"),
      (8L, 3, 1500.0, "C"))
    assert(rows(Curation.kAnonymity(d).collect()) == Seq(
      (1L, 1L, 1L, true), (2L, 1L, 2L, true), (5L, 1L, 5L, false)))
  }

  test("band boundaries are floor(acctbal/1000): 999.99 bands with 0, 1000 does not") {
    val same = customers((1L, 1, 0.0, "A"), (2L, 1, 999.99, "A"))
    assert(rows(Curation.kAnonymity(same).collect()) == Seq((2L, 1L, 2L, true)))
    val split = customers((1L, 1, 999.99, "A"), (2L, 1, 1000.0, "A"))
    assert(rows(Curation.kAnonymity(split).collect()) == Seq((1L, 2L, 2L, true)))
    // negatives floor DOWN: -0.01 is band -1, not band 0
    val neg = customers((1L, 1, -0.01, "A"), (2L, 1, 0.0, "A"))
    assert(rows(Curation.kAnonymity(neg).collect()) == Seq((1L, 2L, 2L, true)))
  }

  test("NULL segment is its own (risky) group, not merged or dropped") {
    val d = Seq(
      (1L, 1, 10.0, null.asInstanceOf[String]),
      (2L, 1, 20.0, null.asInstanceOf[String]),
      (3L, 1, 30.0, "A"))
      .toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
    assert(rows(Curation.kAnonymity(d).collect()) ==
      Seq((1L, 1L, 1L, true), (2L, 1L, 2L, true)))
  }
}
