package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.FeatureIdExpression

/** SparkSessionExtensions entry point (SURVEY §4B: the documented injection
  * point for custom Catalyst pieces). Registers the engine's native
  * expressions so ANY session built with
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)   // code
  *   --conf spark.sql.extensions=graft.GraftExtensions            // config
  *
  * gets `feature_id(...)` in SQL with full whole-stage codegen. Optimizer
  * rules / planner strategies would be injected here too
  * (injectOptimizerRule / injectPlannerStrategy) — none are required for
  * correctness (SURVEY §2C), so none are installed.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("feature_id"),
      new ExpressionInfo(classOf[FeatureIdExpression].getName, "feature_id"),
      (children: Seq[Expression]) => FeatureIdExpression(children.head)))
  }
}
