package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructType}

/** CONVEX polygon BUFFER (miter offset) — the outward-growth constructor
  * next to simplify and the clip emitters (the r15 verdict's named gap):
  * every edge of a STRICTLY convex closed ring moves outward by `d`
  * along its normal, and each vertex becomes the intersection of its two
  * adjacent offset edge LINES (the miter join — exact for convex rings,
  * where miters always point outward and never self-intersect).
  *
  * Determinism contract (oracle-able): per edge a→b the unit outward
  * normal is (ey/len, −ex/len) for CCW rings (negated for CW), len the
  * IEEE sqrt of ex²+ey²; per vertex the intersection is
  * t = ((p2−p1) × e2) / (e1 × e2) applied to the offset anchor p1 — a
  * fixed multiply/divide chain DuckDB replays operation for operation
  * (sqrt and ÷ are correctly rounded in both engines), so buffered
  * VERTICES hash-gate as raw doubles (the j27 discipline).
  *
  * Fail-closed: non-convex rings (a miter join on a reflex vertex
  * self-intersects — silently wrong, not approximate), collinear
  * consecutive edges (no unique miter — run [[SimplifyRingExpr]] first;
  * the composition is the intended pipeline), unclosed/degenerate rings,
  * negative or non-finite `d`. `d = 0` is the identity on vertices up to
  * the arithmetic chain (spec-gated exact).
  */
case class BufferConvexExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ringTypeOk(t: DataType): Boolean = t match {
    case ArrayType(s: StructType, _) =>
      s.length == 2 && s.fields.forall(_.dataType == DoubleType) &&
        s.fields(0).name == "x" && s.fields(1).name == "y"
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!ringTypeOk(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"st_buffer_convex needs one array<struct<x:double,y:double>> ring, got ${left.dataType}")
    else if (right.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"st_buffer_convex needs a DOUBLE distance, got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = left.dataType

  override protected def nullSafeEval(ring: Any, d: Any): Any =
    BufferExprs.bufferConvex(ring.asInstanceOf[ArrayData], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, d) =>
      s"${ev.value} = graft.functions.BufferExprs.bufferConvex($r, $d);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BufferExprs {

  /** Column entry (closed convex ring, outward distance d ≥ 0). */
  def bufferConvexCol(ring: Column, d: Column): Column =
    GraftBridge.column(BufferConvexExpr(
      GraftBridge.expression(ring), GraftBridge.expression(d)))

  /** Static kernel (also the codegen target). */
  def bufferConvex(ring: ArrayData, d: Double): ArrayData = {
    if (!(d >= 0.0) || d.isInfinite)
      throw new IllegalArgumentException(s"buffer distance must be finite and >= 0, got $d")
    val m = ring.numElements()
    if (m < 4)
      throw new IllegalArgumentException(s"convex ring needs >= 4 points (closed), got $m")
    val xs = new Array[Double](m)
    val ys = new Array[Double](m)
    var i = 0
    while (i < m) {
      if (ring.isNullAt(i))
        throw new IllegalArgumentException(s"null point at ring index $i (malformed WKT?)")
      val p = ring.getStruct(i, 2)
      if (p.isNullAt(0) || p.isNullAt(1))
        throw new IllegalArgumentException(s"null coordinate at ring index $i (malformed WKT?)")
      xs(i) = p.getDouble(0)
      ys(i) = p.getDouble(1)
      i += 1
    }
    if (xs(0) != xs(m - 1) || ys(0) != ys(m - 1))
      throw new IllegalArgumentException("ring must be closed (first == last)")
    var twice = 0.0
    i = 0
    while (i < m - 1) {
      twice += xs(i) * ys(i + 1) - xs(i + 1) * ys(i)
      i += 1
    }
    if (twice == 0.0)
      throw new IllegalArgumentException("ring has zero area")
    val ccw = twice > 0.0
    // STRICT convexity: any collinear or reflex turn fails
    i = 0
    while (i < m - 1) {
      val j = if (i + 2 <= m - 1) i + 2 else 1
      val turn = (xs(i + 1) - xs(i)) * (ys(j) - ys(i + 1)) -
        (ys(i + 1) - ys(i)) * (xs(j) - xs(i + 1))
      if (turn == 0.0)
        throw new IllegalArgumentException(
          s"collinear consecutive edges at vertex ${i + 1} — no unique miter; " +
            "simplify the ring first (st_simplify_ring)")
      if (if (ccw) turn < 0.0 else turn > 0.0)
        throw new IllegalArgumentException(
          s"ring is not convex (reflex turn at vertex ${i + 1}) — a miter buffer " +
            "on a reflex vertex self-intersects")
      i += 1
    }
    val n = m - 1 // distinct vertices
    val out = new Array[Any](m)
    i = 0
    while (i < n) {
      // incoming edge prev->v, outgoing edge v->next
      val prev = (i + n - 1) % n
      val next = (i + 1) % n
      val e1x = xs(i) - xs(prev); val e1y = ys(i) - ys(prev)
      val e2x = xs(next) - xs(i); val e2y = ys(next) - ys(i)
      val l1 = math.sqrt(e1x * e1x + e1y * e1y)
      val l2 = math.sqrt(e2x * e2x + e2y * e2y)
      // outward unit normal: right of direction for CCW, left for CW
      val s = if (ccw) 1.0 else -1.0
      val n1x = s * (e1y / l1); val n1y = s * (-e1x / l1)
      val n2x = s * (e2y / l2); val n2y = s * (-e2x / l2)
      // offset anchor points
      val p1x = xs(prev) + d * n1x; val p1y = ys(prev) + d * n1y
      val p2x = xs(i) + d * n2x; val p2y = ys(i) + d * n2y
      // line intersection: p1 + t*e1 meets p2 + s*e2
      val denom = e1x * e2y - e1y * e2x
      val t = ((p2x - p1x) * e2y - (p2y - p1y) * e2x) / denom
      out(i) = new GenericInternalRow(Array[Any](p1x + t * e1x, p1y + t * e1y))
      i += 1
    }
    out(m - 1) = out(0)
    new GenericArrayData(out)
  }
}
