package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer guardrail: reject condition-less (cartesian) joins where
  * BOTH sides are estimated large — at plan time, before a single task
  * launches. On a 1000-executor cluster a stray `crossJoin` between two
  * fact tables is not a slow query, it is a cluster-killer measured in
  * days; the guard turns it into an immediate, explainable failure.
  *
  * Deliberately permissive where cartesians are legitimate:
  *  - 1-row broadcast stat rows (the q60/q67 BM25/LM pattern) — one
  *    side's estimate is tiny, allowed;
  *  - deliberate small-corpus exact twins (q26/q29's O(n²) oracle
  *    baselines) — embeddings tables estimate far below the threshold;
  * both ride on the size test, not an allowlist, so the guard needs no
  * knowledge of graft's own operators.
  *
  * Config: `spark.graft.guard.cartesianMinBytes` (default 256 MiB) —
  * the per-side estimated size above which a condition-less join is
  * rejected; set to -1 to disable. Uses the logical `stats` estimate
  * (file sizes / range cardinality), so the check costs nothing.
  *
  * Registered via [[GraftExtensions]] `injectOptimizerRule` — the rule
  * only inspects and returns the plan unchanged, so it is trivially
  * idempotent across optimizer fixed-point batches. */
case class GuardCartesianProduct(session: SparkSession) extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.guard.cartesianMinBytes"
  private val DefaultMinBytes: Long = 256L << 20

  /** A malformed config value must fail with the guard's own prefixed
    * message, not a bare NumberFormatException surfacing from inside
    * the optimizer with no hint of where it came from. */
  private def configuredLimit: Long =
    session.conf.getOption(ConfKey) match {
      case None => DefaultMinBytes
      case Some(v) => try v.trim.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"[GRAFT_GUARD_CARTESIAN] $ConfKey must be a byte count or -1 to disable; got '$v'")
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val limit = configuredLimit
    if (limit >= 0) {
      plan.foreach {
        case j @ Join(left, right, Cross | Inner, None, _) =>
          val (ls, rs) = (left.stats.sizeInBytes, right.stats.sizeInBytes)
          if (ls > limit && rs > limit) {
            throw new IllegalStateException(
              s"[GRAFT_GUARD_CARTESIAN] condition-less join between two large inputs " +
                s"(estimated $ls × $rs bytes, per-side limit $limit). A cartesian at this " +
                s"size is a cluster-killer; add a join condition, pre-aggregate one side, " +
                s"or raise/disable $ConfKey if this is intentional. Plan:\n$j")
          }
        case _ => ()
      }
    }
    plan
  }
}
