package graft.plans

import graft.functions.BBoxIntersectsExpr
import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._

/** Optimizer rule: inner joins conditioned on
  * [[graft.functions.BBoxIntersectsExpr st_bbox_intersects]] are rewritten
  * from their naive cartesian shape into the binned PBSM plan of
  * [[graft.operators.SpatialJoin.bboxJoin]] — grid-cell explode on both
  * sides, integer equi-join on the cell key, exact envelope predicate,
  * reference-point dedup. The predicate itself stays a real evaluable
  * expression, so plans the rule does not match (outer joins, OR-nested
  * uses, filters) remain correct through the nested-loop fallback; the
  * rule only changes JOIN SHAPE, never semantics.
  *
  * Grid pitch comes from `spark.graft.spatialJoin.cellSize` (default 8.0
  * world units) — set it near the typical envelope extent.
  *
  * This is the one genuinely useful optimizer extension called out in
  * SURVEY.md §4: everything else Catalyst already plans well, but a theta
  * join it can only execute as O(|L|·|R|); recognizing the spatial
  * predicate's decomposability is domain knowledge the optimizer cannot
  * infer. Registered via GraftExtensions (injectOptimizerRule).
  */
case class SpatialJoinRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private def cellSize: Double =
    spark.conf.get("spark.graft.spatialJoin.cellSize", "8.0").toDouble

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      conjuncts.collectFirst {
        case b: BBoxIntersectsExpr
            if b.left.references.subsetOf(left.outputSet) &&
              b.right.references.subsetOf(right.outputSet) &&
              b.checkInputDataTypes().isSuccess => b
      } match {
        case Some(marker) =>
          rewrite(j, left, right, marker, conjuncts.filterNot(_ fastEquals marker))
        case None => j
      }
  }

  private def rewrite(
      j: Join, left: LogicalPlan, right: LogicalPlan,
      marker: BBoxIntersectsExpr, rest: Seq[Expression]): LogicalPlan = {
    val cs = cellSize
    def cellOf(e: Column): Column = floor(e / lit(cs)).cast("long")
    val lEnv = GraftBridge.column(marker.left)
    val rEnv = GraftBridge.column(marker.right)
    val lDf = GraftBridge.ofRows(spark, left)
      .withColumn("__gj_cx", explode(sequence(
        cellOf(lEnv.getField("xmin")), cellOf(lEnv.getField("xmax")))))
      .withColumn("__gj_cy", explode(sequence(
        cellOf(lEnv.getField("ymin")), cellOf(lEnv.getField("ymax")))))
    val rDf = GraftBridge.ofRows(spark, right)
      .withColumn("__gj_cx_r", explode(sequence(
        cellOf(rEnv.getField("xmin")), cellOf(rEnv.getField("xmax")))))
      .withColumn("__gj_cy_r", explode(sequence(
        cellOf(rEnv.getField("ymin")), cellOf(rEnv.getField("ymax")))))
    val exact =
      lEnv.getField("xmin") <= rEnv.getField("xmax") &&
        rEnv.getField("xmin") <= lEnv.getField("xmax") &&
        lEnv.getField("ymin") <= rEnv.getField("ymax") &&
        rEnv.getField("ymin") <= lEnv.getField("ymax")
    val refX = greatest(lEnv.getField("xmin"), rEnv.getField("xmin"))
    val refY = greatest(lEnv.getField("ymin"), rEnv.getField("ymin"))
    val joinCond = rest.map(GraftBridge.column).foldLeft(
      col("__gj_cx") === col("__gj_cx_r") &&
        col("__gj_cy") === col("__gj_cy_r") &&
        exact &&
        cellOf(refX) === col("__gj_cx") &&
        cellOf(refY) === col("__gj_cy"))(_ && _)
    lDf.join(rDf, joinCond)
      .select(j.output.map(a => GraftBridge.column(a)): _*)
      .queryExecution.analyzed
  }
}
