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

/** Minimum-area bounding rectangle AREA of a closed convex ring (r16) —
  * the edge-flush theorem (a minimum rectangle is flush with some hull
  * edge, Freeman–Shapira 1975): per edge d = b−a the UNNORMALIZED vertex
  * projections dot = (v−a)·d and crs = d×(v−a) span the rectangle, so
  * area_e = (Δdot·Δcrs)/|d|² — one division per edge, every other term
  * an exact integer product on lattice fixtures, which is what lets an
  * independent relational oracle reproduce the min VALUE bitwise without
  * replaying any fold order. Input contract: a closed convex ring (the
  * st_convex_hull output); fail-closed on open/short rings.
  */
case class MbrAreaExpr(child: Expression) extends UnaryExpression {

  private def ringTypeOk(t: DataType): Boolean = t match {
    case ArrayType(s: StructType, _) =>
      s.length == 2 && s.fields.forall(_.dataType == DoubleType) &&
        s.fields(0).name == "x" && s.fields(1).name == "y"
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!ringTypeOk(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"st_min_bbox_area needs one array<struct<x:double,y:double>> closed ring, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(ring: Any): Any =
    ConvexHullExprs.mbrArea(ring.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, r =>
      s"${ev.value} = graft.functions.ConvexHullExprs.mbrArea($r);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ConvexHullExprs {

  /** Column entry. */
  def convexHullCol(points: Column): Column =
    GraftBridge.column(ConvexHullExpr(GraftBridge.expression(points)))

  /** Column entry. */
  def mbrAreaCol(ring: Column): Column =
    GraftBridge.column(MbrAreaExpr(GraftBridge.expression(ring)))

  /** [[MbrAreaExpr]]'s kernel. */
  def mbrArea(ring: ArrayData): Double = {
    val n = ring.numElements()
    if (n < 4)
      throw new IllegalArgumentException(
        s"min bbox needs a closed ring with >= 3 vertices, got $n points")
    val xs = new Array[Double](n)
    val ys = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (ring.isNullAt(i))
        throw new IllegalArgumentException(s"null point at index $i")
      val p = ring.getStruct(i, 2)
      if (p.isNullAt(0) || p.isNullAt(1))
        throw new IllegalArgumentException(s"null coordinate at index $i")
      xs(i) = p.getDouble(0)
      ys(i) = p.getDouble(1)
      i += 1
    }
    if (xs(0) != xs(n - 1) || ys(0) != ys(n - 1))
      throw new IllegalArgumentException("ring must be closed (first == last)")
    var best = Double.PositiveInfinity
    var e = 0
    while (e < n - 1) {
      val dx = xs(e + 1) - xs(e)
      val dy = ys(e + 1) - ys(e)
      val l2 = dx * dx + dy * dy
      if (l2 == 0.0)
        throw new IllegalArgumentException(s"zero-length edge at index $e")
      var mind = Double.PositiveInfinity
      var maxd = Double.NegativeInfinity
      var minc = Double.PositiveInfinity
      var maxc = Double.NegativeInfinity
      var v = 0
      while (v < n - 1) {
        val rx = xs(v) - xs(e)
        val ry = ys(v) - ys(e)
        val dot = rx * dx + ry * dy
        val crs = dx * ry - dy * rx
        if (dot < mind) mind = dot
        if (dot > maxd) maxd = dot
        if (crs < minc) minc = crs
        if (crs > maxc) maxc = crs
        v += 1
      }
      val area = ((maxd - mind) * (maxc - minc)) / l2
      if (area < best) best = area
      e += 1
    }
    best
  }

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
