package graft.functions

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule: rewrite exact `count(DISTINCT x)` into the
  * HyperLogLog++ approximate aggregate when the session sets
  *
  *   spark.graft.approxDistinct.enabled = true
  *
  * The exact form costs a second shuffle (or an Expand) at scale; the
  * sketch is one map-side-combinable pass — on a 100 TB fact table
  * that is routinely a 2–5× stage saving for dashboards that tolerate
  * ±2%. Default OFF because it changes results: this is a
  * *capability* the session owner switches on per workload, exactly
  * like engines' native "approximate distinct" modes. Multi-argument
  * and filtered distincts are left untouched.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {
  private val FlagKey = "spark.graft.approxDistinct.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(FlagKey, "false").toBoolean) plan
    else plan.transform {
      case a: Aggregate =>
        a.transformExpressions {
          case AggregateExpression(c: Count, mode, true, None, id)
              if c.children.size == 1 =>
            AggregateExpression(
              HyperLogLogPlusPlus(c.children.head, relativeSD = 0.02),
              mode, isDistinct = false, filter = None, resultId = id)
        }
    }
}
