package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve cell index — the clustering key one step up from the
  * Morton/Z-order key `ZoneMap.writeZOrdered` interleaves: consecutive
  * Hilbert indices are ALWAYS 4-adjacent cells (proven exhaustively in
  * HilbertSpec), so a 2-D box predicate decomposes into ~1.8x fewer
  * contiguous key ranges than under Z-order (measured over every 8x8 box
  * of a 64x64 grid: 25,544 vs 45,312 runs). At 100 TB that is directly
  * fewer files opened per box read, because file key-ranges are
  * contiguous after the range-partitioned write.
  *
  * The transform is the classic per-bit rotate/reflect walk (Hilbert
  * 1891; the iterative form popularized by Warren, "Hacker's Delight"
  * §16, and the public-domain Wikipedia listing): at each scale bit the
  * quadrant number ((3*rx) XOR ry) weights s^2, then the frame
  * rotates/reflects so the child quadrant re-enters in canonical
  * orientation. All-integer — any faithful re-derivation (the DuckDB
  * oracle unrolls the identical loop as a 16-level CTE chain) matches
  * bit-for-bit, the GeohashExprs exactness contract.
  *
  * Reference analog: the tiled layouts of feature_stacking.py:227-229
  * order blocks row-major; a curve-ordered write is the same
  * "neighbors stay close in the file" idea made resolution-recursive.
  */
case class HilbertIndexExpr(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {
  require(order >= 1 && order <= 31,
    s"hilbert order (bits per axis) must be in [1,31], got $order")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"hilbert cell coordinates must be bigint, got ($a, $b)")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(x: Any, y: Any): Any =
    HilbertExprs.xy2d(order, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.HilbertExprs.xy2d($order, $x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertExprs {

  /** (x, y) cell → distance along the order-`order` Hilbert curve.
    * Fail-closed on coordinates outside [0, 2^order) — a silently-masked
    * coordinate would alias a far-away cell and quietly break clustering
    * (the GeohashQuantsExpr doctrine).
    */
  def xy2d(order: Int, x0: Long, y0: Long): Long = {
    val n = 1L << order
    if (x0 < 0 || x0 >= n || y0 < 0 || y0 >= n)
      throw new IllegalArgumentException(
        s"hilbert cell ($x0, $y0) outside the order-$order grid [0, $n)")
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate/reflect the frame so the child quadrant is canonical;
      // n-1-x complements every bit, and bits >= s are never read again
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk: curve distance → (x, y). Spec-side witness that xy2d
    * is a bijection; also the tool a reader uses to materialize the box
    * ranges a Hilbert-clustered layout serves.
    */
  def d2xy(order: Int, d0: Long): (Long, Long) = {
    val n = 1L << order
    if (d0 < 0 || d0 >= n * n)
      throw new IllegalArgumentException(
        s"hilbert distance $d0 outside the order-$order curve [0, ${n * n})")
    var t = d0
    var x = 0L
    var y = 0L
    var s = 1L
    while (s < n) {
      val rx = 1L & (t >> 1)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val tt = x; x = y; y = tt
      }
      x += s * rx
      y += s * ry
      t >>= 2
      s <<= 1
    }
    (x, y)
  }

  /** Column entry point: `order` bits per axis, both inputs bigint cells. */
  def indexCol(x: Column, y: Column, order: Int): Column =
    GraftBridge.column(HilbertIndexExpr(
      GraftBridge.expression(x), GraftBridge.expression(y), order))

  /** Decompose a cell box (inclusive corners) into the MINIMAL sorted set
    * of contiguous curve-distance ranges `[lo, hi)` covering exactly the
    * box's cells — the planning step that turns the adjacency theorem
    * into fewer file reads: a Hilbert-keyed layout serves a box with
    * ~1.8x fewer ranges than Z-order needs (HilbertSpec's measured run
    * counts), and each range is one contiguous key scan.
    *
    * Algorithm: aligned-quadrant descent. The curve fills every aligned
    * 2^k-square CONTIGUOUSLY (each scale bit finishes one quadrant
    * before the next), so a block fully inside the box contributes the
    * single range d & ~(s²−1) .. +s² for ANY of its cells d — no
    * orientation bookkeeping. Blocks disjoint from the box prune; the
    * rest recurse. O(perimeter · order) ranges before coalescing.
    */
  def boxRanges(order: Int, xmin: Long, ymin: Long, xmax: Long, ymax: Long): Seq[(Long, Long)] = {
    val n = 1L << order
    require(xmin <= xmax && ymin <= ymax, s"inverted box ($xmin,$ymin)-($xmax,$ymax)")
    require(xmin >= 0 && ymin >= 0 && xmax < n && ymax < n,
      s"box ($xmin,$ymin)-($xmax,$ymax) outside the order-$order grid [0,$n)")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def descend(x0: Long, y0: Long, s: Long): Unit = {
      if (x0 > xmax || y0 > ymax || x0 + s - 1 < xmin || y0 + s - 1 < ymin) ()
      else if (x0 >= xmin && y0 >= ymin && x0 + s - 1 <= xmax && y0 + s - 1 <= ymax) {
        val d = xy2d(order, x0, y0)
        val lo = d & ~(s * s - 1)
        out += ((lo, lo + s * s))
      } else {
        val h = s >> 1
        descend(x0, y0, h); descend(x0 + h, y0, h)
        descend(x0, y0 + h, h); descend(x0 + h, y0 + h, h)
      }
    }
    descend(0L, 0L, n)
    // coalesce touching ranges so the count is the true run count
    val sorted = out.sortBy(_._1)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    sorted.foreach { case (lo, hi) =>
      if (merged.nonEmpty && merged.last._2 == lo)
        merged(merged.size - 1) = (merged.last._1, hi)
      else merged += ((lo, hi))
    }
    merged.toSeq
  }
}
