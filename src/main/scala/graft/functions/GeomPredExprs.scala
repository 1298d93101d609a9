package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, StructType}

/** Codegen kernels for the exact-geometry REFINE predicates (r13).
  *
  * The Column spellings ([[SpatialOps.ringsContainPoint]] /
  * [[SpatialOps.ringsIntersectPolys]]) are nested higher-order functions,
  * which Spark evaluates INTERPRETED — measured ~340 µs per candidate pair
  * on the j18 overlap refine (12.7 s at sf0.1 over 205 k bbox candidates).
  * These expressions run the identical IEEE arithmetic — every +,−,×,÷ and
  * comparison in the same order as the HOF forms, so the decisions are
  * bit-for-bit the Column forms' (spec-asserted) — as one static call per
  * row inside whole-stage codegen.
  *
  * Semantics deltas, documented: the HOF forms NULL-propagate on an empty
  * ring list (element_at of a missing first vertex); these return FALSE
  * there — indistinguishable inside a join refine (both drop the pair),
  * and the honest answer for a region with no area. NULL INPUTS still
  * propagate NULL (null-intolerant expressions).
  */
object GeomPredExprs {

  private def ringsTypeOk(t: DataType): Boolean = t match {
    // field NAMES checked too (the BBoxIntersectsExpr convention): eval
    // reads positionally, so a named_struct('y',...,'x',...) would
    // silently transpose coordinates if shape alone were accepted
    case ArrayType(ArrayType(s: StructType, _), _) =>
      s.length == 2 && s.fields.forall(_.dataType == DoubleType) &&
        s.fields(0).name == "x" && s.fields(1).name == "y"
    case _ => false
  }

  /** Fail closed on null rings/points/coordinates (the RhpBucketsExpr
    * lesson: an unchecked getDouble on a null slot silently reads 0.0,
    * silently diverging from the HOF forms, which null-poison — a
    * malformed WKT must reject, not fabricate a coordinate at origin).
    */
  private def pt(pts: ArrayData, i: Int): InternalRow = {
    if (pts.isNullAt(i))
      throw new IllegalArgumentException(s"null point at ring index $i (malformed WKT?)")
    val p = pts.getStruct(i, 2)
    if (p.isNullAt(0) || p.isNullAt(1))
      throw new IllegalArgumentException(s"null coordinate at ring index $i (malformed WKT?)")
    p
  }

  private def ring(rings: ArrayData, ri: Int): ArrayData = {
    if (rings.isNullAt(ri))
      throw new IllegalArgumentException(s"null ring at index $ri (malformed WKT?)")
    rings.getArray(ri)
  }

  /** Rightward-ray crossing count — ringsCrossingNumber's loop. */
  def crossings(rings: ArrayData, x: Double, y: Double): Int = {
    var total = 0
    var ri = 0
    val nr = rings.numElements()
    while (ri < nr) {
      val pts = ring(rings, ri)
      val n = pts.numElements()
      var i = 0
      while (i < n - 1) {
        val p1 = pt(pts, i); val p2 = pt(pts, i + 1)
        val x1 = p1.getDouble(0); val y1 = p1.getDouble(1)
        val x2 = p2.getDouble(0); val y2 = p2.getDouble(1)
        if ((y1 > y) != (y2 > y) && x < x1 + (y - y1) * (x2 - x1) / (y2 - y1))
          total += 1
        i += 1
      }
      ri += 1
    }
    total
  }

  /** Exact point-on-segment over all rings — ringsPointOnBoundary's loop. */
  def onBoundary(rings: ArrayData, x: Double, y: Double): Boolean = {
    var ri = 0
    val nr = rings.numElements()
    while (ri < nr) {
      val pts = ring(rings, ri)
      val n = pts.numElements()
      var i = 0
      while (i < n - 1) {
        val p1 = pt(pts, i); val p2 = pt(pts, i + 1)
        val x1 = p1.getDouble(0); val y1 = p1.getDouble(1)
        val x2 = p2.getDouble(0); val y2 = p2.getDouble(1)
        if ((x2 - x1) * (y - y1) - (y2 - y1) * (x - x1) == 0.0 &&
            x >= math.min(x1, x2) && x <= math.max(x1, x2) &&
            y >= math.min(y1, y2) && y <= math.max(y1, y2))
          return true
        i += 1
      }
      ri += 1
    }
    false
  }

  /** Closed containment = boundary OR odd parity — ringsContainPoint. */
  def containsPoint(rings: ArrayData, x: Double, y: Double): Boolean =
    onBoundary(rings, x, y) || crossings(rings, x, y) % 2 == 1

  /** CLRS closed segment-pair test — segmentsIntersect's algebra. */
  private def segInt(x1: Double, y1: Double, x2: Double, y2: Double,
      x3: Double, y3: Double, x4: Double, y4: Double): Boolean = {
    def orient(ax: Double, ay: Double, bx: Double, by: Double,
        cx: Double, cy: Double): Double =
      (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    def on(ax: Double, ay: Double, bx: Double, by: Double,
        cx: Double, cy: Double): Boolean =
      cx >= math.min(ax, bx) && cx <= math.max(ax, bx) &&
        cy >= math.min(ay, by) && cy <= math.max(ay, by)
    val d1 = orient(x3, y3, x4, y4, x1, y1)
    val d2 = orient(x3, y3, x4, y4, x2, y2)
    val d3 = orient(x1, y1, x2, y2, x3, y3)
    val d4 = orient(x1, y1, x2, y2, x4, y4)
    (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
      ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) ||
      (d1 == 0 && on(x3, y3, x4, y4, x1, y1)) ||
      (d2 == 0 && on(x3, y3, x4, y4, x2, y2)) ||
      (d3 == 0 && on(x1, y1, x2, y2, x3, y3)) ||
      (d4 == 0 && on(x1, y1, x2, y2, x4, y4))
  }

  /** Any segment pair intersects — ringsEdgesIntersect's loops. */
  def edgesIntersect(a: ArrayData, b: ArrayData): Boolean = {
    var ai = 0
    val na = a.numElements()
    while (ai < na) {
      val pa = ring(a, ai)
      val nl = pa.numElements()
      var i = 0
      while (i < nl - 1) {
        val q1 = pt(pa, i); val q2 = pt(pa, i + 1)
        val x1 = q1.getDouble(0); val y1 = q1.getDouble(1)
        val x2 = q2.getDouble(0); val y2 = q2.getDouble(1)
        var bi = 0
        val nb = b.numElements()
        while (bi < nb) {
          val pb = ring(b, bi)
          val nm = pb.numElements()
          var j = 0
          while (j < nm - 1) {
            val r1 = pt(pb, j); val r2 = pt(pb, j + 1)
            if (segInt(x1, y1, x2, y2,
                r1.getDouble(0), r1.getDouble(1), r2.getDouble(0), r2.getDouble(1)))
              return true
            j += 1
          }
          bi += 1
        }
        i += 1
      }
      ai += 1
    }
    false
  }

  /** ringsIntersectPolys: edges cross, or a representative vertex of one
    * lies inside the other. Empty ring lists (or an empty first ring)
    * intersect nothing — see the object doc for the NULL-vs-false delta.
    */
  def polysIntersect(a: ArrayData, b: ArrayData): Boolean = {
    if (edgesIntersect(a, b)) return true
    if (a.numElements() == 0 || b.numElements() == 0) return false
    val ra = ring(a, 0); val rb = ring(b, 0)
    if (ra.numElements() == 0 || rb.numElements() == 0) return false
    val pa = pt(ra, 0); val pb = pt(rb, 0)
    containsPoint(b, pa.getDouble(0), pa.getDouble(1)) ||
      containsPoint(a, pb.getDouble(0), pb.getDouble(1))
  }

  /** Boundary distance² — ringsBoundaryDistSq's loops (clamped segment
    * projection, zero-length segments fall back to the endpoint).
    */
  def boundaryDistSq(rings: ArrayData, x: Double, y: Double): Double = {
    var best = Double.MaxValue
    var ri = 0
    val nr = rings.numElements()
    while (ri < nr) {
      val pts = ring(rings, ri)
      val n = pts.numElements()
      var i = 0
      while (i < n - 1) {
        val p1 = pt(pts, i); val p2 = pt(pts, i + 1)
        val x1 = p1.getDouble(0); val y1 = p1.getDouble(1)
        val dx = p2.getDouble(0) - x1; val dy = p2.getDouble(1) - y1
        val l2 = dx * dx + dy * dy
        val t =
          if (l2 == 0.0) 0.0
          else math.max(0.0, math.min(1.0, ((x - x1) * dx + (y - y1) * dy) / l2))
        val qx = x1 + t * dx; val qy = y1 + t * dy
        val d2 = (x - qx) * (x - qx) + (y - qy) * (y - qy)
        if (d2 < best) best = d2
        i += 1
      }
      ri += 1
    }
    best
  }

  /** ringsWithinDist: in the region, or within `dist` of its boundary. */
  def withinDist(rings: ArrayData, x: Double, y: Double, dist: Double): Boolean =
    containsPoint(rings, x, y) || boundaryDistSq(rings, x, y) <= dist * dist

  /** Symmetric BOUNDARY Hausdorff distance² between two polygons (r16):
    * max over A's vertices of [[boundaryDistSq]] to B, and vice versa,
    * the larger taken — the polyline-Hausdorff on vertex samples, which
    * for polygon boundaries is EXACT in the A→B direction whenever the
    * farthest boundary point is a vertex (always true when B is convex
    * relative to A's edges; documented as the vertex-Hausdorff measure,
    * the standard discrete form). Value-max over bitwise-replayed
    * per-vertex minima — no fold-order coupling, so the oracle spells
    * GREATEST over LEAST terms. Closing vertices repeat and cannot move
    * the max.
    */
  def hausdorffBoundarySq(a: ArrayData, b: ArrayData): Double = {
    var best = 0.0
    var dir = 0
    while (dir < 2) {
      val (src, dst) = if (dir == 0) (a, b) else (b, a)
      var ri = 0
      while (ri < src.numElements()) {
        val pts = ring(src, ri)
        var i = 0
        while (i < pts.numElements()) {
          val p = pt(pts, i)
          val d = boundaryDistSq(dst, p.getDouble(0), p.getDouble(1))
          if (d > best) best = d
          i += 1
        }
        ri += 1
      }
      dir += 1
    }
    best
  }

  /** ringsRegionDistSq: 0 inside the region, else boundary distance². */
  def regionDistSq(rings: ArrayData, x: Double, y: Double): Double =
    if (containsPoint(rings, x, y)) 0.0 else boundaryDistSq(rings, x, y)

  /** Column builder: TRUE point-in-polygon, codegen form. */
  def pointInRings(rings: Column, x: Column, y: Column): Column =
    GraftBridge.column(PointInRingsExpr(GraftBridge.expression(rings),
      GraftBridge.expression(x), GraftBridge.expression(y)))

  /** Column builder: TRUE polygon-overlap, codegen form. */
  def ringsIntersect(a: Column, b: Column): Column =
    GraftBridge.column(RingsIntersectExpr(GraftBridge.expression(a),
      GraftBridge.expression(b)))

  /** Column builder: ST_DWithin(point, polygon), codegen form. */
  def withinDistCol(rings: Column, x: Column, y: Column, dist: Column): Column =
    GraftBridge.column(WithinDistExpr(GraftBridge.expression(rings),
      GraftBridge.expression(x), GraftBridge.expression(y),
      GraftBridge.expression(dist)))

  /** Column builder: squared region distance (ST_Distance² value form). */
  def regionDistSqCol(rings: Column, x: Column, y: Column): Column =
    GraftBridge.column(RegionDistSqExpr(GraftBridge.expression(rings),
      GraftBridge.expression(x), GraftBridge.expression(y)))

  /** Column builder: symmetric boundary Hausdorff distance², codegen form. */
  def hausdorffBoundarySqCol(a: Column, b: Column): Column =
    GraftBridge.column(HausdorffBoundarySqExpr(GraftBridge.expression(a),
      GraftBridge.expression(b)))

  private[functions] def checkRings(t: DataType, what: String): TypeCheckResult =
    if (ringsTypeOk(t)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$what requires array<array<struct<x double, y double>>> " +
        s"(SpatialOps.wktRings output), got $t")
}

/** Codegen point-in-polygon over parsed rings (see [[GeomPredExprs]]). */
case class PointInRingsExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val r = GeomPredExprs.checkRings(first.dataType, "point_in_rings")
    if (r != TypeCheckResult.TypeCheckSuccess) r
    else if (second.dataType != DoubleType || third.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"point_in_rings needs double coordinates, got ${second.dataType}/${third.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(rings: Any, x: Any, y: Any): Any =
    GeomPredExprs.containsPoint(rings.asInstanceOf[ArrayData],
      x.asInstanceOf[Double], y.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, x, y) =>
      s"${ev.value} = graft.functions.GeomPredExprs.containsPoint($r, $x, $y);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Codegen squared region distance (see [[GeomPredExprs.regionDistSq]]). */
case class RegionDistSqExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  // expensive-kernel marker — see ClipAreaExpr.deterministic (j20/j24
  // project d2 then filter on the radius; deterministic, the pushed
  // filter re-ran the clamped-segment-projection scan per candidate in
  // the join condition AND per survivor in the projection)
  override lazy val deterministic: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val r = GeomPredExprs.checkRings(first.dataType, "st_region_dist_sq")
    if (r != TypeCheckResult.TypeCheckSuccess) r
    else if (second.dataType != DoubleType || third.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"st_region_dist_sq needs double coordinates, got ${second.dataType}/${third.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(rings: Any, x: Any, y: Any): Any =
    GeomPredExprs.regionDistSq(rings.asInstanceOf[ArrayData],
      x.asInstanceOf[Double], y.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, x, y) =>
      s"${ev.value} = graft.functions.GeomPredExprs.regionDistSq($r, $x, $y);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Codegen ST_DWithin over parsed rings (see [[GeomPredExprs.withinDist]]). */
case class WithinDistExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val r = GeomPredExprs.checkRings(first.dataType, "st_within_dist")
    if (r != TypeCheckResult.TypeCheckSuccess) r
    else if (Seq(second, third, fourth).exists(_.dataType != DoubleType))
      TypeCheckResult.TypeCheckFailure(
        "st_within_dist needs double coordinates and distance, got " +
          s"${second.dataType}/${third.dataType}/${fourth.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(rings: Any, x: Any, y: Any, d: Any): Any =
    GeomPredExprs.withinDist(rings.asInstanceOf[ArrayData],
      x.asInstanceOf[Double], y.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, x, y, d) =>
      s"${ev.value} = graft.functions.GeomPredExprs.withinDist($r, $x, $y, $d);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

/** Codegen symmetric boundary Hausdorff distance² (see
  * [[GeomPredExprs.hausdorffBoundarySq]]). */
case class HausdorffBoundarySqExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = GeomPredExprs.checkRings(left.dataType, "st_hausdorff_boundary_sq")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else GeomPredExprs.checkRings(right.dataType, "st_hausdorff_boundary_sq")
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeomPredExprs.hausdorffBoundarySq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GeomPredExprs.hausdorffBoundarySq($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen polygon-overlap over two parsed ring lists (see [[GeomPredExprs]]). */
case class RingsIntersectExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = GeomPredExprs.checkRings(left.dataType, "rings_intersect")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else GeomPredExprs.checkRings(right.dataType, "rings_intersect")
  }

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeomPredExprs.polysIntersect(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GeomPredExprs.polysIntersect($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
