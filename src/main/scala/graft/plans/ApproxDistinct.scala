package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Session-togglable approximate mode — a Catalyst optimizer rule that
  * rewrites exact `COUNT(DISTINCT x)` into HyperLogLog++ when
  * `spark.graft.approxDistinct=true`.
  *
  * Why as an optimizer rule: exact distinct is the classic 100 TB cost
  * cliff — Catalyst plans it as an Expand (one extra row per aggregate
  * per input row) plus a second wide shuffle keyed on the distinct
  * values, while HLL++ is a fixed-size mergeable sketch folded into the
  * ordinary partial aggregation. Making the swap a PLAN rewrite means a
  * user (or an ops runbook) flips one session conf to trade ≤1-2% count
  * error for the removal of the most expensive shuffle in a dashboard
  * query — no query rewrites, no library calls, exactly the dial
  * engines like Presto/BlinkDB expose. The rule runs in the operator-
  * optimization batch, before RewriteDistinctAggregates introduces the
  * Expand, and preserves each aggregate's resultId so downstream
  * references stay valid. Multi-column distincts (COUNT(DISTINCT a, b))
  * have no sketch equivalent and pass through untouched.
  */
object ApproxDistinctRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.approxDistinct"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(ConfKey, "false") != "true") plan
    else plan.transform {
      case a: Aggregate => a.transformExpressions {
        case ae @ AggregateExpression(c: Count, _, true, _, _) if c.children.size == 1 =>
          ae.copy(
            aggregateFunction = HyperLogLogPlusPlus(c.children.head),
            isDistinct = false)
      }
    }
}
