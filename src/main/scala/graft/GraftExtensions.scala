package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProductFloat, SimHash64Expr}

/** Session extension that registers graft's native expressions with the
  * SQL function registry, so `SELECT graft_dot(a.embedding, b.embedding)`
  * works from plain `spark.sql` — the standard injection path for a
  * library shipping custom Catalyst expressions:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions       // at session build
  *   // or on a live session:
  *   GraftExtensions.register(spark)
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRule)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[DotProductFloat].getName, null, name, usage, "")

  /** (identifier, info, builder) triples for every graft SQL function. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two float vectors (fused codegen loop)"),
      (children: Seq[Expression]) => DotProductFloat(children.head, children(1))),
    (FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64",
        "graft_simhash64(text) - 64-bit SimHash as array(sim_hi, sim_lo), fused tokenize/md5/vote"),
      (children: Seq[Expression]) => SimHash64Expr(children.head)))

  /** Post-hoc registration on an already-built session (idempotent).
    * The optimizer rule lands in `experimental.extraOptimizations`
    * (late batch) here; the extensions path injects it into the
    * operator-optimization batch — both run before the single-distinct
    * aggregate reaches the physical planner, which is what the rewrite
    * needs.
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKPerGroupStrategy
    if (!spark.experimental.extraOptimizations.contains(graft.plans.ApproxDistinctRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.ApproxDistinctRule
  }
}
