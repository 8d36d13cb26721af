package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's custom
  * expressions for SQL use, so
  *
  *   spark.sql("SELECT dot_product(a.embedding, b.embedding) ...")
  *
  * resolves to the codegen'd [[DotProduct]]. Activate with
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * or `.withExtensions(new GraftExtensions)` — the standard plug-in seam
  * for engine extensions (no fork, survives Spark upgrades).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    // whole-operator seam: plans graft.plans.AsOfJoinPlan nodes
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
