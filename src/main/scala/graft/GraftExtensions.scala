package graft

import graft.functions.{BBoxIntersectsExpr, CosineSimExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extensions (SURVEY.md §4 registration path): custom Catalyst
  * expressions exposed to SQL, the TopKPerKey physical strategy, and the
  * spatial-join rewrite rule. Install via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` (done by
  * GraftSession) or `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectOptimizerRule(s => graft.plans.SpatialJoinRewrite(s))
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(
        classOf[CosineSimExpr].getName, null, "cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two float arrays (codegen'd fused loop)",
        "", "", "", "", "", "", "scala_udf"),
      (exprs: Seq[Expression]) => CosineSimExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("st_bbox_intersects"),
      new ExpressionInfo(
        classOf[BBoxIntersectsExpr].getName, null, "st_bbox_intersects",
        "st_bbox_intersects(a, b) - closed-interval intersection of two (xmin,ymin,xmax,ymax) structs; " +
          "inner joins on it are rewritten to a binned equi-join (SpatialJoinRewrite)",
        "", "", "", "", "", "", "scala_udf"),
      (exprs: Seq[Expression]) => BBoxIntersectsExpr(exprs(0), exprs(1))))
  }
}
