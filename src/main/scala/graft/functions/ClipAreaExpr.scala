package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructType}

/** EXACT polygon ∩ box intersection AREA — the measure step past j18's
  * boolean overlap refine, and the kernel of true zonal statistics: a
  * polygon store joined to a tile/cell grid where each pair reports how
  * much of the polygon the cell actually contains (not just "touches").
  *
  * Algorithm: Sutherland–Hodgman (1974) against the box's four
  * half-planes in fixed order (left x≥xmin, right x≤xmax, bottom y≥ymin,
  * top y≤ymax), then the shoelace signed sum per clipped ring. Rings keep
  * their orientation through clipping, so holes subtract exactly as in
  * [[SpatialOps.ringsArea]]; S-H's degenerate boundary bridges on concave
  * subjects trace the box edge forward and back and cancel in the signed
  * sum, so the AREA is exact even where the vertex list is not minimal.
  * Every +,−,×,÷ and comparison is in a documented order — the DuckDB
  * oracle replays the identical expression sequence (list lambdas + a
  * sequential list_reduce fold), so j21's areas hash-match bit-for-bit
  * (the j16/j19 refine-arithmetic discipline, one step further: this is
  * the first oracled REAL-VALUED geometry measure on clipped vertices).
  *
  * Scale shape: one static call per candidate pair inside whole-stage
  * codegen, after bbox pruning — the zonal-stats cost is the candidate
  * count, never the corpus.
  *
  * Reference analog: zonal aggregation of segment polygons over tile
  * grids (image_segmentation.py:160-162 outputs; feature_stacking.py's
  * tiled layout) — "how much of this polygon is in this tile".
  */
case class ClipAreaExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ringsTypeOk(t: DataType): Boolean = t match {
    case ArrayType(ArrayType(s: StructType, _), _) =>
      s.length == 2 && s.fields.forall(_.dataType == DoubleType) &&
        s.fields(0).name == "x" && s.fields(1).name == "y"
    case _ => false
  }

  private def envTypeOk(t: DataType): Boolean = t match {
    case s: StructType =>
      s.length == 4 && s.fields.forall(_.dataType == DoubleType) &&
        s.fields.map(_.name).sameElements(Array("xmin", "ymin", "xmax", "ymax"))
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!ringsTypeOk(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"clip_area needs array<array<struct<x:double,y:double>>> rings, got ${left.dataType}")
    else if (!envTypeOk(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"clip_area needs a struct<xmin,ymin,xmax,ymax:double> box, got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(rings: Any, env: Any): Any =
    ClipExprs.clipAreaBox(rings.asInstanceOf[ArrayData], env.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, e) =>
      s"${ev.value} = graft.functions.ClipExprs.clipAreaBox($r, $e);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ClipExprs {

  /** Column entry: rings in the st_rings layout, env in the bbox-struct
    * layout ([[SpatialOps.bbox]]). */
  def clipArea(rings: Column, env: Column): Column =
    GraftBridge.column(ClipAreaExpr(
      GraftBridge.expression(rings), GraftBridge.expression(env)))

  /** Static kernel (also the codegen target). Fail-closed on null
    * points/coordinates and inverted boxes — the GeomPredExprs doctrine:
    * a malformed input must reject, not fabricate geometry.
    */
  def clipAreaBox(rings: ArrayData, env: InternalRow): Double = {
    if (env.isNullAt(0) || env.isNullAt(1) || env.isNullAt(2) || env.isNullAt(3))
      throw new IllegalArgumentException("null box coordinate in clip_area")
    val xmin = env.getDouble(0)
    val ymin = env.getDouble(1)
    val xmax = env.getDouble(2)
    val ymax = env.getDouble(3)
    if (!(xmin <= xmax && ymin <= ymax))
      throw new IllegalArgumentException(
        s"inverted clip box ($xmin,$ymin,$xmax,$ymax)")
    var total = 0.0
    var ri = 0
    while (ri < rings.numElements()) {
      if (rings.isNullAt(ri))
        throw new IllegalArgumentException(s"null ring at index $ri (malformed WKT?)")
      val r = rings.getArray(ri)
      val n = r.numElements()
      var xs = new Array[Double](n)
      var ys = new Array[Double](n)
      var i = 0
      while (i < n) {
        if (r.isNullAt(i))
          throw new IllegalArgumentException(s"null point at ring index $i (malformed WKT?)")
        val p = r.getStruct(i, 2)
        if (p.isNullAt(0) || p.isNullAt(1))
          throw new IllegalArgumentException(s"null coordinate at ring index $i (malformed WKT?)")
        xs(i) = p.getDouble(0)
        ys(i) = p.getDouble(1)
        i += 1
      }
      // the four half-plane passes, fixed order (mirrored by the oracle)
      var st = (xs, ys)
      st = clipPass(st._1, st._2, onX = true, bound = xmin, keepGE = true)
      st = clipPass(st._1, st._2, onX = true, bound = xmax, keepGE = false)
      st = clipPass(st._1, st._2, onX = false, bound = ymin, keepGE = true)
      st = clipPass(st._1, st._2, onX = false, bound = ymax, keepGE = false)
      total += cross(st._1, st._2)
      ri += 1
    }
    math.abs(total) / 2.0
  }

  /** One Sutherland–Hodgman half-plane pass over a CLOSED vertex list
    * (first == last); returns the clipped list re-closed. Edge walk and
    * emit rules in the canonical order: for each edge p→q, inside q emits
    * q (preceded by the entry intersection when p is outside); outside q
    * emits only the exit intersection when p was inside.
    */
  private def clipPass(xs: Array[Double], ys: Array[Double],
      onX: Boolean, bound: Double, keepGE: Boolean): (Array[Double], Array[Double]) = {
    val n = xs.length
    if (n < 2) return (Array.empty, Array.empty)
    def inside(i: Int): Boolean = {
      val v = if (onX) xs(i) else ys(i)
      if (keepGE) v >= bound else v <= bound
    }
    val ox = new scala.collection.mutable.ArrayBuffer[Double](n + 4)
    val oy = new scala.collection.mutable.ArrayBuffer[Double](n + 4)
    def emitIsect(p: Int, q: Int): Unit =
      if (onX) {
        val t = (bound - xs(p)) / (xs(q) - xs(p))
        ox += bound
        oy += ys(p) + t * (ys(q) - ys(p))
      } else {
        val t = (bound - ys(p)) / (ys(q) - ys(p))
        ox += xs(p) + t * (xs(q) - xs(p))
        oy += bound
      }
    var i = 0
    while (i < n - 1) {
      val inP = inside(i)
      val inQ = inside(i + 1)
      if (inQ) {
        if (!inP) emitIsect(i, i + 1)
        ox += xs(i + 1); oy += ys(i + 1)
      } else if (inP) emitIsect(i, i + 1)
      i += 1
    }
    if (ox.nonEmpty) { ox += ox(0); oy += oy(0) }
    (ox.toArray, oy.toArray)
  }

  /** Shoelace signed sum over a closed list, sequential left fold (the
    * oracle's list_reduce order). */
  private def cross(xs: Array[Double], ys: Array[Double]): Double = {
    val n = xs.length
    if (n < 2) return 0.0
    var acc = 0.0
    var i = 0
    while (i < n - 1) {
      acc += xs(i) * ys(i + 1) - xs(i + 1) * ys(i)
      i += 1
    }
    acc
  }
}
