package graft

import graft.functions.CosineSimExpr
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extensions (SURVEY.md §4 registration path): custom Catalyst
  * expressions exposed to SQL. Install via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` (done by
  * GraftSession) or `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(
        classOf[CosineSimExpr].getName, null, "cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two float arrays (codegen'd fused loop)",
        "", "", "", "", "", "", "scala_udf"),
      (exprs: Seq[Expression]) => CosineSimExpr(exprs(0), exprs(1))))
  }
}
