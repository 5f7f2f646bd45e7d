package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: recognize the engine-portable 60-bit-hash SQL spec
  *
  *   CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)
  *
  * and swap in the native codegen'd kernel [[H60]]. Users (and the
  * DuckDB oracle) keep writing the portable spelling; the engine runs
  * the tight-loop version — the same contract as Catalyst's own
  * expression canonicalizations.
  */
object NativeHashRewrite extends Rule[LogicalPlan] {
  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _) => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Cast(Conv(Substring(Md5(e), IntLit(1), IntLit(15)), IntLit(16), IntLit(10), _),
        LongType, _, _) =>
      H60(e)
  }
}
