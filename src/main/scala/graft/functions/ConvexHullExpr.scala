package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** STRICT convex hull of a point set (r16) — Andrew's monotone chain
  * (Andrew 1979, the public textbook algorithm): distinct points sorted
  * by (x, y), lower and upper chains built with the `cross ≤ 0` pop rule
  * (collinear boundary points DROPPED — every emitted vertex is a strict
  * corner), output the CLOSED CCW ring starting at the lexicographically
  * smallest point: [min, …lower interior…, max, …upper interior
  * (descending)…, min]. Deterministic for any input ORDER (the kernel
  * sorts and dedupes first), so `collect_list` feeds it safely. Fewer
  * than 3 hull vertices (all points collinear or <3 distinct) fail
  * loudly — a degenerate hull is not a polygon.
  *
  * The emission order is load-bearing: the oracle reconstructs it from
  * the hull SET alone (min/max chord classification + per-side lex
  * sort), so an independent hull-edge census can replay the full ring.
  */
case class ConvexHullExpr(child: Expression) extends UnaryExpression {

  private def ptsTypeOk(t: DataType): Boolean = t match {
    case ArrayType(s: StructType, _) =>
      s.length == 2 && s.fields.forall(_.dataType == DoubleType) &&
        s.fields(0).name == "x" && s.fields(1).name == "y"
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!ptsTypeOk(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"st_convex_hull needs array<struct<x:double,y:double>> points, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = child.dataType match {
    case ArrayType(s, _) => ArrayType(s, containsNull = false)
    case other => other
  }

  override protected def nullSafeEval(points: Any): Any =
    ConvexHullExprs.hull(points.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p =>
      s"${ev.value} = graft.functions.ConvexHullExprs.hull($p);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ConvexHullExprs {

  /** Column entry. */
  def convexHullCol(points: Column): Column =
    GraftBridge.column(ConvexHullExpr(GraftBridge.expression(points)))

  /** Static kernel (also the codegen target). */
  def hull(points: ArrayData): ArrayData = {
    val n = points.numElements()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    var i = 0
    while (i < n) {
      if (points.isNullAt(i))
        throw new IllegalArgumentException(s"null point at index $i")
      val p = points.getStruct(i, 2)
      if (p.isNullAt(0) || p.isNullAt(1))
        throw new IllegalArgumentException(s"null coordinate at index $i")
      buf += ((p.getDouble(0), p.getDouble(1)))
      i += 1
    }
    val pts = buf.distinct.sortBy(identity).toArray
    if (pts.length < 3)
      throw new IllegalArgumentException(
        s"convex hull needs >= 3 distinct points, got ${pts.length}")
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def chain(ps: Iterator[(Double, Double)]): Array[(Double, Double)] = {
      val h = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
      ps.foreach { p =>
        while (h.length >= 2 && cross(h(h.length - 2), h(h.length - 1), p) <= 0.0)
          h.remove(h.length - 1)
        h += p
      }
      h.toArray
    }
    val lower = chain(pts.iterator)
    val upper = chain(pts.reverseIterator)
    val ring = lower.dropRight(1) ++ upper.dropRight(1)
    if (ring.length < 3)
      throw new IllegalArgumentException(
        "degenerate convex hull (all points collinear) is not a polygon")
    val closed = ring :+ ring.head
    val out = new Array[Any](closed.length)
    var j = 0
    while (j < closed.length) {
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](closed(j)._1, closed(j)._2))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
