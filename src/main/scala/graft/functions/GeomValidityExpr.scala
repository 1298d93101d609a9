package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, StructType}

/** ST_IsSimple for one ring — the CHECKABLE form of the "SIMPLE ring is
  * caller contract" every clip/refine kernel declares
  * ([[ClipAreaGeneralExpr]], [[ClipAreaMultiPolygonExpr]]): a 100 TB
  * ingest of third-party parcels needs invalid geometries to become
  * COUNTABLE REJECTS (the media-census doctrine applied to vectors),
  * not wrong areas discovered downstream — the ear-clipping kernels
  * fail closed only on the detectable no-ear subset, so this predicate
  * is the gate that makes their contract enforceable scan-side.
  *
  * A ring is SIMPLE iff it is closed (first == last), has ≥ 3 distinct
  * vertices, no zero-length edge, no repeated vertex (a figure-eight
  * pinch), and no two edges share any point beyond the single vertex
  * consecutive edges must share — adjacent edges may not double back
  * collinearly (a spike), non-adjacent edges may neither cross nor
  * touch. The test is the classic O(n²) segment-pair scan with
  * orientation signs ((qx−px)(ry−py) − (qy−py)(rx−px) compared to 0) —
  * vertex-bounded, deterministic double arithmetic, no tolerance —
  * inside whole-stage codegen. Unclosed/short rings return false
  * (countable geometry rejects); NULL points/coordinates throw (the
  * GeomPredExprs doctrine — malformed DATA must reject loudly, only
  * GEOMETRY gets a verdict).
  */
case class RingIsSimpleExpr(child: Expression) extends UnaryExpression {

  private def ringTypeOk(t: DataType): Boolean = t match {
    case ArrayType(s: StructType, _) =>
      s.length == 2 && s.fields.forall(_.dataType == DoubleType) &&
        s.fields(0).name == "x" && s.fields(1).name == "y"
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!ringTypeOk(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"st_is_simple_ring needs one array<struct<x:double,y:double>> ring, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(ring: Any): Any =
    GeomValidity.ringIsSimple(ring.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, r => s"graft.functions.GeomValidity.ringIsSimple($r)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GeomValidity {

  /** Column entry: true iff the closed ring is simple (see
    * [[RingIsSimpleExpr]]). */
  def ringIsSimpleCol(ring: Column): Column =
    GraftBridge.column(RingIsSimpleExpr(GraftBridge.expression(ring)))

  /** Static kernel (also the codegen target). */
  def ringIsSimple(ring: ArrayData): Boolean = {
    val m = ring.numElements()
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
    // structural verdicts (countable rejects, not exceptions)
    if (m < 4) return false
    if (xs(0) != xs(m - 1) || ys(0) != ys(m - 1)) return false
    val ne = m - 1 // edge count over the closed list
    // zero-length edges
    i = 0
    while (i < ne) {
      if (xs(i) == xs(i + 1) && ys(i) == ys(i + 1)) return false
      i += 1
    }
    // repeated vertices among the ne distinct ring positions (a pinch)
    i = 0
    while (i < ne) {
      var j = i + 1
      while (j < ne) {
        if (xs(i) == xs(j) && ys(i) == ys(j)) return false
        j += 1
      }
      i += 1
    }
    // pairwise edge scan
    i = 0
    while (i < ne) {
      var j = i + 1
      while (j < ne) {
        if (j == i + 1 || (i == 0 && j == ne - 1)) {
          // adjacent (incl. the wrap pair): sharing exactly one vertex v;
          // with distinct vertices guaranteed above, the only remaining
          // violation is a collinear double-back past v (a spike)
          val (u, v, w) =
            if (j == i + 1) (i, i + 1, j + 1) // v = shared point i+1
            else (1, 0, ne - 1)               // wrap: v = point 0
          val turn = (xs(v) - xs(u)) * (ys(w) - ys(u)) -
            (ys(v) - ys(u)) * (xs(w) - xs(u))
          val dot = (xs(u) - xs(v)) * (xs(w) - xs(v)) +
            (ys(u) - ys(v)) * (ys(w) - ys(v))
          if (turn == 0.0 && dot > 0.0) return false
        } else {
          if (segmentsMeet(xs(i), ys(i), xs(i + 1), ys(i + 1),
              xs(j), ys(j), xs(j + 1), ys(j + 1))) return false
        }
        j += 1
      }
      i += 1
    }
    true
  }

  private def orient(px: Double, py: Double, qx: Double, qy: Double,
      rx: Double, ry: Double): Double =
    (qx - px) * (ry - py) - (qy - py) * (rx - px)

  private def onSeg(ax: Double, ay: Double, bx: Double, by: Double,
      px: Double, py: Double): Boolean =
    math.min(ax, bx) <= px && px <= math.max(ax, bx) &&
      math.min(ay, by) <= py && py <= math.max(ay, by)

  /** CLOSED intersection test (any shared point counts) — the CLRS
    * orientation scheme with collinear-touch handling. */
  private def segmentsMeet(a1x: Double, a1y: Double, a2x: Double, a2y: Double,
      b1x: Double, b1y: Double, b2x: Double, b2y: Double): Boolean = {
    val d1 = orient(a1x, a1y, a2x, a2y, b1x, b1y)
    val d2 = orient(a1x, a1y, a2x, a2y, b2x, b2y)
    val d3 = orient(b1x, b1y, b2x, b2y, a1x, a1y)
    val d4 = orient(b1x, b1y, b2x, b2y, a2x, a2y)
    if (((d1 > 0.0 && d2 < 0.0) || (d1 < 0.0 && d2 > 0.0)) &&
        ((d3 > 0.0 && d4 < 0.0) || (d3 < 0.0 && d4 > 0.0))) true
    else if (d1 == 0.0 && onSeg(a1x, a1y, a2x, a2y, b1x, b1y)) true
    else if (d2 == 0.0 && onSeg(a1x, a1y, a2x, a2y, b2x, b2y)) true
    else if (d3 == 0.0 && onSeg(b1x, b1y, b2x, b2y, a1x, a1y)) true
    else if (d4 == 0.0 && onSeg(b1x, b1y, b2x, b2y, a2x, a2y)) true
    else false
  }
}
