package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` installer for the engine's native
  * functions — enable with
  * `spark.sql.extensions=graft.functions.GraftExtensions` so every
  * session (including pure-SQL users) gets `vec_dot` without calling
  * the programmatic registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator tier: the native as-of join's planner strategy
    // plus the pushdown rule that lets Catalyst optimize across the
    // custom node (injected into the operator-optimization fixed
    // point, so moved filters keep sinking toward the scan)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
    // optimizer-rule tier: marked interval joins rewrite to binned
    // equi-joins (see graft.plans.BinRangeJoinRule)
    ext.injectOptimizerRule(_ => graft.plans.BinRangeJoinRule)
    VectorFunctions.injectAll(ext)
    ext.injectFunction((
      FunctionIdentifier(HashFunctions.fnName),
      new ExpressionInfo(classOf[Md5Prefix60].getName, HashFunctions.fnName),
      (children: Seq[Expression]) => Md5Prefix60(children.head)))
    ext.injectFunction(TextFunctions.injection)
    ext.injectFunction(TextFunctions.charInjection)
    ext.injectFunction(TextFunctions.gramStatsInjection)
    ext.injectFunction(SetFunctions.injection)
    ext.injectFunction(TopKFunctions.injection)
    ext.injectFunction(BloomFunctions.injection)
    ext.injectFunction(BarrierFunctions.injection)
  }
}
