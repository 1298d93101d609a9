package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StructType}

/** `st_bbox_intersects(a, b)` — closed-interval envelope intersection over
  * two `(xmin, ymin, xmax, ymax)` double structs (as built by
  * [[SpatialOps.bbox]] / [[SpatialOps.wktEnvelope]]).
  *
  * This is a REAL predicate (eval + codegen), so a join conditioned on it
  * is always correct — planned as a nested-loop join when nothing else
  * applies. Its second role is as a recognizable marker:
  * [[graft.plans.SpatialJoinRewrite]] detects it in inner-join conditions
  * and rewrites the cartesian shape into the binned PBSM equi-join
  * (SURVEY.md §4 custom item 3). Field positions are resolved by NAME from
  * the struct schema; a NULL struct or NULL field never intersects.
  */
case class BBoxIntersectsExpr(left: Expression, right: Expression)
    extends BinaryExpression with Predicate {

  private def fieldsOk(dt: DataType): Boolean = dt match {
    case s: StructType =>
      Seq("xmin", "ymin", "xmax", "ymax").forall(n =>
        s.fields.exists(f => f.name == n && f.dataType == DoubleType))
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (fieldsOk(left.dataType) && fieldsOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "st_bbox_intersects requires struct(xmin,ymin,xmax,ymax double) inputs, " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def nullable: Boolean = left.nullable || right.nullable

  private lazy val lIdx = fieldIdx(left.dataType)
  private lazy val rIdx = fieldIdx(right.dataType)
  private def fieldIdx(dt: DataType): Array[Int] = {
    val s = dt.asInstanceOf[StructType]
    Array("xmin", "ymin", "xmax", "ymax").map(s.fieldIndex)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[InternalRow]
    val b = r.asInstanceOf[InternalRow]
    val anyNull = lIdx.exists(a.isNullAt) || rIdx.exists(b.isNullAt)
    if (anyNull) false
    else a.getDouble(lIdx(0)) <= b.getDouble(rIdx(2)) &&
      b.getDouble(rIdx(0)) <= a.getDouble(lIdx(2)) &&
      a.getDouble(lIdx(1)) <= b.getDouble(rIdx(3)) &&
      b.getDouble(rIdx(1)) <= a.getDouble(lIdx(3))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ln = lIdx.map(i => s"$a.isNullAt($i)").mkString(" || ")
      val rn = rIdx.map(i => s"$b.isNullAt($i)").mkString(" || ")
      s"""
         |if ($ln || $rn) {
         |  ${ev.value} = false;
         |} else {
         |  ${ev.value} = $a.getDouble(${lIdx(0)}) <= $b.getDouble(${rIdx(2)})
         |    && $b.getDouble(${rIdx(0)}) <= $a.getDouble(${lIdx(2)})
         |    && $a.getDouble(${lIdx(1)}) <= $b.getDouble(${rIdx(3)})
         |    && $b.getDouble(${rIdx(1)}) <= $a.getDouble(${lIdx(3)});
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BBoxIntersectsExpr =
    copy(left = newLeft, right = newRight)
}
