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

/** ST_IsValid for a whole polygon (outer + holes in the st_rings
  * layout) — see [[GeomValidity.polygonIsValid]] for the exact clause
  * list and the documented interior-connectivity trade.
  */
case class PolygonIsValidExpr(child: Expression) extends UnaryExpression {

  private def ringsTypeOk(t: DataType): Boolean = t match {
    case ArrayType(ArrayType(s: StructType, _), _) =>
      s.length == 2 && s.fields.forall(_.dataType == DoubleType) &&
        s.fields(0).name == "x" && s.fields(1).name == "y"
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!ringsTypeOk(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"st_is_valid_polygon needs array<array<struct<x:double,y:double>>> rings, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(rings: Any): Any =
    GeomValidity.polygonIsValid(rings.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, r => s"graft.functions.GeomValidity.polygonIsValid($r)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GeomValidity {

  /** Column entry: true iff the closed ring is simple (see
    * [[RingIsSimpleExpr]]). */
  def ringIsSimpleCol(ring: Column): Column =
    GraftBridge.column(RingIsSimpleExpr(GraftBridge.expression(ring)))

  /** Column entry: true iff the whole polygon (outer + holes) is valid
    * (see [[polygonIsValid]]). */
  def polygonIsValidCol(rings: Column): Column =
    GraftBridge.column(PolygonIsValidExpr(GraftBridge.expression(rings)))

  /** Extract one ring's coordinates, throwing on structural nulls (the
    * GeomPredExprs doctrine). */
  private[functions] def extractRing(ring: ArrayData): (Array[Double], Array[Double]) = {
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
    (xs, ys)
  }

  /** Static kernel (also the codegen target). */
  def ringIsSimple(ring: ArrayData): Boolean = {
    val (xs, ys) = extractRing(ring)
    ringIsSimpleArr(xs, ys)
  }

  /** The simplicity verdict over extracted coordinates. */
  private[functions] def ringIsSimpleArr(xs: Array[Double], ys: Array[Double]): Boolean = {
    val m = xs.length
    // structural verdicts (countable rejects, not exceptions)
    if (m < 4) return false
    if (xs(0) != xs(m - 1) || ys(0) != ys(m - 1)) return false
    val ne = m - 1 // edge count over the closed list
    // zero-length edges
    var i = 0
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

  /** POLYGON-level validity (the [[ringIsSimple]] story one level up —
    * the whole-geometry ingest gate): ring 0 the outer, rings 1.. holes;
    * valid iff every ring is SIMPLE, every hole winds OPPOSITE the outer
    * (the engine's storage convention — [[SpatialOps.ringsArea]] and the
    * clip kernels subtract holes by signed cross), no two rings' edges
    * properly cross or overlap collinearly (point-touches allowed, the
    * OGC rule), every hole vertex lies inside-or-on the outer ring with
    * at least one STRICTLY inside (all-on-boundary degenerates fail
    * closed), and no hole vertex lies strictly inside another hole
    * (nesting), and — the last OGC axiom, closed in r16 — the INTERIOR
    * IS CONNECTED: point-touches are individually legal, but a chain of
    * touches that closes a loop through two or more DISTINCT touch
    * points (hole touching the outer twice; holes chaining wall to
    * wall; two holes touching each other at two points) walls off part
    * of the interior. The test is the classic touch-graph acyclicity
    * condition on the BIPARTITE graph of rings and touch points: since
    * proper crossings and collinear overlaps are already rejected,
    * every inter-ring contact happens AT a vertex of at least one ring,
    * so touch points are exactly the vertices lying on another ring;
    * each (ring, point) incidence is a graph edge, and a union-find
    * cycle = a closed curve alternating along ring boundaries through
    * distinct touch points, which separates the plane (Jordan) and
    * pinches the interior. Three rings meeting at ONE shared point form
    * a star (no cycle) and stay valid — the interior connects around
    * them, which is why the graph must be bipartite on points rather
    * than rings-only.
    */
  def polygonIsValid(rings: ArrayData): Boolean = {
    val nr = rings.numElements()
    if (nr < 1) return false
    val xs = new Array[Array[Double]](nr)
    val ys = new Array[Array[Double]](nr)
    var i = 0
    while (i < nr) {
      if (rings.isNullAt(i))
        throw new IllegalArgumentException(s"null ring at index $i (malformed WKT?)")
      val (rx, ry) = extractRing(rings.getArray(i))
      xs(i) = rx; ys(i) = ry
      i += 1
    }
    i = 0
    while (i < nr) {
      if (!ringIsSimpleArr(xs(i), ys(i))) return false
      i += 1
    }
    val w0 = shoelace(xs(0), ys(0))
    i = 1
    while (i < nr) {
      if ((shoelace(xs(i), ys(i)) > 0.0) == (w0 > 0.0)) return false
      i += 1
    }
    // cross-ring edge discipline: no proper crossing, no collinear
    // overlap of positive length (point-touches pass)
    var a = 0
    while (a < nr) {
      var b = a + 1
      while (b < nr) {
        if (ringsEdgesConflict(xs(a), ys(a), xs(b), ys(b))) return false
        b += 1
      }
      a += 1
    }
    // hole containment census (EVERY vertex inside-or-on the outer, one
    // strictly inside) and hole-vs-hole non-nesting
    i = 1
    while (i < nr) {
      var strictlyIn = false
      var v = 0
      while (v < xs(i).length - 1) {
        val px = xs(i)(v); val py = ys(i)(v)
        if (!pointOnRing(xs(0), ys(0), px, py)) {
          if (!pointInRing(xs(0), ys(0), px, py)) return false
          strictlyIn = true
        }
        v += 1
      }
      if (!strictlyIn) return false
      var j = 1
      while (j < nr) {
        if (j != i) {
          v = 0
          while (v < xs(i).length - 1) {
            val px = xs(i)(v); val py = ys(i)(v)
            if (!pointOnRing(xs(j), ys(j), px, py) &&
                pointInRing(xs(j), ys(j), px, py)) return false
            v += 1
          }
        }
        j += 1
      }
      i += 1
    }
    interiorConnected(xs, ys)
  }

  /** The interior-connectivity clause (see [[polygonIsValid]]): touch
    * points = vertices of any ring lying on a DIFFERENT ring; the
    * bipartite ring/point incidence graph must be acyclic. */
  private def interiorConnected(xs: Array[Array[Double]], ys: Array[Array[Double]]): Boolean = {
    val nr = xs.length
    if (nr < 2) return true
    // ONE pass collects touch points AND their ring incidences (dedup
    // by exact coordinates — touches are vertex-exact because crossings
    // and overlaps are already rejected): vertex v of ring a on ring b
    // makes (a, P) and (b, P) incidences; a vertex of a third ring at
    // the same P merges into the same point node
    val ptIdx = scala.collection.mutable.LinkedHashMap.empty[(Double, Double), Int]
    val incid = scala.collection.mutable.LinkedHashSet.empty[(Int, Int)] // (ring, point)
    var a = 0
    while (a < nr) {
      var v = 0
      while (v < xs(a).length - 1) {
        val px = xs(a)(v); val py = ys(a)(v)
        var b = 0
        var touched = false
        while (b < nr) {
          if (b != a && pointOnRing(xs(b), ys(b), px, py)) {
            val pi = ptIdx.getOrElseUpdate((px, py), ptIdx.size)
            incid += ((b, pi))
            touched = true
          }
          b += 1
        }
        if (touched) incid += ((a, ptIdx((px, py))))
        v += 1
      }
      a += 1
    }
    if (ptIdx.isEmpty) return true
    // union-find over nr ring nodes + point nodes; an incidence closing
    // a cycle = a pinching touch loop
    val parent = Array.tabulate(nr + ptIdx.size)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    val it = incid.iterator
    while (it.hasNext) {
      val (ring, pi) = it.next()
      val fr = find(ring)
      val fp = find(nr + pi)
      if (fr == fp) return false
      parent(fr) = fp
    }
    true
  }

  private def shoelace(xs: Array[Double], ys: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < xs.length - 1) {
      acc += xs(i) * ys(i + 1) - xs(i + 1) * ys(i)
      i += 1
    }
    acc
  }

  /** True iff any edge of ring A properly crosses or collinearly
    * overlaps (positive length) any edge of ring B. */
  private def ringsEdgesConflict(ax: Array[Double], ay: Array[Double],
      bx: Array[Double], by: Array[Double]): Boolean = {
    var i = 0
    while (i < ax.length - 1) {
      var j = 0
      while (j < bx.length - 1) {
        val d1 = orient(ax(i), ay(i), ax(i + 1), ay(i + 1), bx(j), by(j))
        val d2 = orient(ax(i), ay(i), ax(i + 1), ay(i + 1), bx(j + 1), by(j + 1))
        val d3 = orient(bx(j), by(j), bx(j + 1), by(j + 1), ax(i), ay(i))
        val d4 = orient(bx(j), by(j), bx(j + 1), by(j + 1), ax(i + 1), ay(i + 1))
        if (((d1 > 0.0 && d2 < 0.0) || (d1 < 0.0 && d2 > 0.0)) &&
            ((d3 > 0.0 && d4 < 0.0) || (d3 < 0.0 && d4 > 0.0))) return true
        if (d1 == 0.0 && d2 == 0.0 && d3 == 0.0 && d4 == 0.0) {
          // collinear: positive-length 1-D overlap on the dominant axis
          val horiz = math.abs(ax(i + 1) - ax(i)) >= math.abs(ay(i + 1) - ay(i))
          val (a1, a2, b1, b2) =
            if (horiz) (ax(i), ax(i + 1), bx(j), bx(j + 1))
            else (ay(i), ay(i + 1), by(j), by(j + 1))
          val lo = math.max(math.min(a1, a2), math.min(b1, b2))
          val hi = math.min(math.max(a1, a2), math.max(b1, b2))
          if (hi > lo) return true
        }
        j += 1
      }
      i += 1
    }
    false
  }

  /** Point exactly on any segment of the ring. */
  private def pointOnRing(xs: Array[Double], ys: Array[Double],
      px: Double, py: Double): Boolean = {
    var i = 0
    while (i < xs.length - 1) {
      if (orient(xs(i), ys(i), xs(i + 1), ys(i + 1), px, py) == 0.0 &&
          onSeg(xs(i), ys(i), xs(i + 1), ys(i + 1), px, py)) return true
      i += 1
    }
    false
  }

  /** Strict rightward-ray crossing parity (caller excludes on-boundary
    * points first). */
  private def pointInRing(xs: Array[Double], ys: Array[Double],
      px: Double, py: Double): Boolean = {
    var in = false
    var i = 0
    while (i < xs.length - 1) {
      if ((ys(i) > py) != (ys(i + 1) > py) &&
          px < xs(i) + (py - ys(i)) * (xs(i + 1) - xs(i)) / (ys(i + 1) - ys(i)))
        in = !in
      i += 1
    }
    in
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
