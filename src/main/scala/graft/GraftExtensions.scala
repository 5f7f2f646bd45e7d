package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.functions.{ApproxDistinctRewrite, GraftFunctions, NativeHashRewrite, TopKRewrite}
import graft.plans.AsOfJoinStrategy

/** Session extensions: custom planner strategy (as-of join) + optimizer
  * rule (portable-hash → native kernel). Install at session build:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *
  * or retrofit onto a live session with [[GraftExtensions.install]]
  * (uses the experimental hooks — same effect, no session rebuild).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => NativeHashRewrite)
    e.injectOptimizerRule(_ => ApproxDistinctRewrite)
    e.injectOptimizerRule(_ => TopKRewrite)
  }
}

object GraftExtensions {
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(NativeHashRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ NativeHashRewrite
    }
    if (!spark.experimental.extraOptimizations.contains(ApproxDistinctRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ApproxDistinctRewrite
    }
    if (!spark.experimental.extraOptimizations.contains(TopKRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewrite
    }
    GraftFunctions.register(spark)
  }
}
