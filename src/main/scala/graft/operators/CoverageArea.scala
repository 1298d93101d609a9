package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** COVERAGE (UNION) AREA — the dissolve measure zs2-style zonal rollups
  * are missing: per group, the area of the UNION of a set of possibly
  * OVERLAPPING polygons (with holes), so sliver-overlapping zones
  * (adjacent parcels, tile halos — reference image_segmentation.py's
  * Stage-2 output drifts exactly this way) stop double-counting. The
  * 2-D sibling of [[TimeSeries.intervalCoverage]]'s 1-D sweep.
  *
  * Algorithm (exact, deterministic): the y-slab scanline — the classic
  * sweep-line area-of-union family (Bentley 1977's segment-tree sweep
  * is the O(n log n) sibling; this kernel trades it for EVENT-COMPLETE
  * slabs, which keeps every intermediate a closed-form function of the
  * inputs and the result independently checkable). Events are
  * every vertex y, every PAIRWISE proper edge-crossing y (across all
  * polygons of the group), and — when clipping to a cell — the cell's
  * y-bounds and every edge's crossing with the cell's x-walls. Between
  * consecutive events no two edges cross and no edge enters/leaves the
  * clip walls, so each polygon's even-odd x-interval structure at the
  * slab midline is CONSTANT across the slab and the union length L(y)
  * is LINEAR in y — the midpoint rule ∫L dy = (y₂−y₁)·L(ym) is exact,
  * not an approximation. Holes need no special casing: even-odd
  * crossing parity over all of a polygon's rings subtracts them.
  *
  * Scale shape: the kernel runs per GROUP over a
  * `collect_list`-bounded polygon set — O(E²) edge-pair events and
  * O(S·E log E) slab work, E = total edge count. [[unionArea]] is the
  * direct form for groups a caller knows are small (zone sets, parcel
  * clusters); [[unionAreaByCell]] is the 100 TB path — polygons explode
  * to the grid cells their envelopes touch, each (group, cell) unions
  * the CLIPPED slivers independently (bounded by local density, never
  * corpus size), and cell areas sum per group, exactly, because the
  * clip walls are event-aligned. Pair with
  * [[graft.functions.RingIsSimpleExpr]] upstream: the kernel assumes
  * simple rings (the clip-kernel contract).
  */
object CoverageArea {

  /** Per-group union area, directly: group cols + `n_polys` +
    * `sum_area` (Σ individual shoelace areas — union < sum measures the
    * overlap) + `union_area`. Rings in the st_rings layout.
    *
    * `maxEdgesPerGroup` is the no-silent-caps guard: the kernel's
    * pairwise event scan is O(E²) per group, so a group whose edge
    * count exceeds the cap FAILS LOUDLY (with the cell path named in
    * the error) instead of quietly burning a task for hours — the
    * direct form is for groups a caller KNOWS are small.
    */
  def unionArea(df: DataFrame, ringsCol: String, groupCols: Seq[String],
      maxEdgesPerGroup: Int = 20000): DataFrame = {
    require(groupCols.nonEmpty, "unionArea needs at least one group column")
    require(maxEdgesPerGroup > 0, s"maxEdgesPerGroup must be positive, got $maxEdgesPerGroup")
    val u = udf((xs: Seq[Seq[Seq[Double]]], ys: Seq[Seq[Seq[Double]]]) => {
      val edges = xs.iterator.flatMap(_.iterator.map(r => math.max(r.length - 1, 0))).sum
      if (edges > maxEdgesPerGroup)
        throw new IllegalArgumentException(
          s"unionArea group holds $edges edges > cap $maxEdgesPerGroup: the direct " +
            "per-group kernel is O(edges^2) — use unionAreaByCell (bounded by local " +
            "density) or raise maxEdgesPerGroup knowingly")
      unionAreaOf(toPolys(xs, ys), None)
    })
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_polys"),
        sum(graft.functions.SpatialOps.ringsArea(col(ringsCol))).as("sum_area"),
        u(collect_list(ringXs(col(ringsCol))), collect_list(ringYs(col(ringsCol))))
          .as("union_area"))
  }

  /** Per-group union area via grid-cell decomposition — the scale path:
    * each polygon replicates to the ⌈w/cs⌉×⌈h/cs⌉ cells its envelope
    * touches, each (group, cell) unions its members clipped to the cell
    * box, and the per-cell areas (disjoint by construction) sum per
    * group. Exact: the kernel event set includes the cell walls, so
    * clipping never breaks the within-slab linearity. Same output
    * schema as [[unionArea]].
    */
  def unionAreaByCell(
      df: DataFrame,
      ringsCol: String,
      groupCols: Seq[String],
      cellSize: Double,
      maxEdgesPerCell: Int = 20000,
      /** Fail-loud fan-out budget (the same no-silent-caps doctrine as
        * the edge budgets): one polygon whose envelope spans more than
        * this many cells — a bad cellSize or an outlier geometry —
        * errors with the knob named instead of silently exploding to
        * millions of rows. */
      maxCellsPerPolygon: Long = 4096L): DataFrame = {
    require(groupCols.nonEmpty, "unionAreaByCell needs at least one group column")
    require(cellSize > 0, s"cellSize must be positive, got $cellSize")
    require(maxEdgesPerCell > 0, s"maxEdgesPerCell must be positive, got $maxEdgesPerCell")
    require(maxCellsPerPolygon > 0, s"maxCellsPerPolygon must be positive, got $maxCellsPerPolygon")
    val env = graft.functions.SpatialOps.ringsEnvelope(col(ringsCol))
    val nCells =
      (floor(col("__env.xmax") / cellSize).cast("long") -
        floor(col("__env.xmin") / cellSize).cast("long") + lit(1L)) *
      (floor(col("__env.ymax") / cellSize).cast("long") -
        floor(col("__env.ymin") / cellSize).cast("long") + lit(1L))
    // the guard lives INSIDE the exploded expression — a standalone
    // guard column would be pruned by Catalyst (and its raise_error
    // with it). A NULL count (empty rings -> null envelope) skips the
    // `when` branch: the explode drops the row and the left join below
    // restores the group at union_area 0.
    val withCells = df
      .withColumn("__env", env)
      .withColumn("__cx", explode(
        when(nCells > maxCellsPerPolygon, raise_error(concat(
          lit("unionAreaByCell polygon envelope spans "), nCells.cast("string"),
          lit(s" cells > cap $maxCellsPerPolygon (cellSize $cellSize): grow cellSize " +
            "or raise maxCellsPerPolygon knowingly"))))
        .otherwise(sequence(
          floor(col("__env.xmin") / cellSize).cast("long"),
          floor(col("__env.xmax") / cellSize).cast("long")))))
      .withColumn("__cy", explode(sequence(
        floor(col("__env.ymin") / cellSize).cast("long"),
        floor(col("__env.ymax") / cellSize).cast("long"))))
    val u = udf((xs: Seq[Seq[Seq[Double]]], ys: Seq[Seq[Seq[Double]]],
        cx: Long, cy: Long) => {
      val edges = xs.iterator.flatMap(_.iterator.map(r => math.max(r.length - 1, 0))).sum
      if (edges > maxEdgesPerCell)
        throw new IllegalArgumentException(
          s"unionAreaByCell cell ($cx,$cy) holds $edges edges > cap $maxEdgesPerCell: " +
            "local density exceeds the per-cell kernel budget — shrink cellSize or " +
            "raise maxEdgesPerCell knowingly")
      unionAreaOf(toPolys(xs, ys),
        Some((cx * cellSize, cy * cellSize,
          (cx + 1) * cellSize, (cy + 1) * cellSize)))
    })
    val perCell = withCells
      .groupBy((groupCols ++ Seq("__cx", "__cy")).map(col): _*)
      .agg(u(collect_list(ringXs(col(ringsCol))), collect_list(ringYs(col(ringsCol))),
        first(col("__cx")), first(col("__cy"))).as("__cell_area"))
    val unions = perCell
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__cell_area")).as("union_area"))
    val base = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_polys"),
        sum(graft.functions.SpatialOps.ringsArea(col(ringsCol))).as("sum_area"))
    // LEFT join from base: a group whose rows all have empty rings (null
    // envelope -> the explode drops every row) must still come back with
    // union_area 0, matching unionArea's degenerate-case answer
    base.join(unions, groupCols, "left")
      .select((groupCols.map(col) ++
        Seq(col("n_polys"), col("sum_area"),
          coalesce(col("union_area"), lit(0.0)).as("union_area"))): _*)
  }

  // ---- kernel ----

  /** Struct rings → parallel coordinate arrays (Spark 4's UDF encoder
    * cannot bind nested Row inputs, so coordinates travel as plain
    * nested double arrays; a NULL point/coordinate fails the encoder's
    * non-nullable Double check loudly — the malformed-WKT doctrine). */
  private def ringXs(rings: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(rings, r => transform(r, p => p.getField("x")))
  private def ringYs(rings: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(rings, r => transform(r, p => p.getField("y")))

  private def toPolys(xs: Seq[Seq[Seq[Double]]], ys: Seq[Seq[Seq[Double]]])
      : Seq[Array[(Array[Double], Array[Double])]] =
    xs.zip(ys).map { case (px, py) =>
      px.zip(py).map { case (rx, ry) => (rx.toArray, ry.toArray) }.toArray
    }

  /** Exact union area of `polys` (each an array of closed rings,
    * even-odd), optionally clipped to a box. Static so tests can drive
    * it directly.
    */
  def unionAreaOf(
      polys: Seq[Array[(Array[Double], Array[Double])]],
      clip: Option[(Double, Double, Double, Double)]): Double = {
    if (polys.isEmpty) return 0.0
    // flatten edges per polygon: (poly, x1, y1, x2, y2), skipping
    // zero-length entries; horizontal edges still contribute their
    // vertex events but never a midline crossing
    val edges = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double, Double, Double)]
    var pi = 0
    while (pi < polys.length) {
      for ((xs, ys) <- polys(pi)) {
        var i = 0
        while (i < xs.length - 1) {
          if (!(xs(i) == xs(i + 1) && ys(i) == ys(i + 1)))
            edges += ((pi, xs(i), ys(i), xs(i + 1), ys(i + 1)))
          i += 1
        }
      }
      pi += 1
    }
    if (edges.isEmpty) return 0.0
    val events = scala.collection.mutable.ArrayBuffer.empty[Double]
    edges.foreach { case (_, _, y1, _, y2) => events += y1; events += y2 }
    // pairwise proper crossings (any two edges, same or different
    // polygon — simple rings never self-cross, but the extra events are
    // harmless and keep the kernel honest on near-invalid input)
    var a = 0
    while (a < edges.length) {
      val (_, a1x, a1y, a2x, a2y) = edges(a)
      var b = a + 1
      while (b < edges.length) {
        val (_, b1x, b1y, b2x, b2y) = edges(b)
        val denom = (a2x - a1x) * (b2y - b1y) - (a2y - a1y) * (b2x - b1x)
        if (denom != 0.0) {
          val t = ((b1x - a1x) * (b2y - b1y) - (b1y - a1y) * (b2x - b1x)) / denom
          val s = ((b1x - a1x) * (a2y - a1y) - (b1y - a1y) * (a2x - a1x)) / denom
          if (t > 0.0 && t < 1.0 && s > 0.0 && s < 1.0)
            events += a1y + t * (a2y - a1y)
        }
        b += 1
      }
      a += 1
    }
    clip.foreach { case (cxmin, cymin, cxmax, cymax) =>
      events += cymin; events += cymax
      // edge crossings with the clip x-walls: clamping interval
      // endpoints kinks L(y) exactly where an edge crosses x = wall, so
      // those ys must bound slabs for midpoint exactness
      edges.foreach { case (_, x1, y1, x2, y2) =>
        if (x1 != x2) {
          for (wall <- Seq(cxmin, cxmax)) {
            val t = (wall - x1) / (x2 - x1)
            if (t > 0.0 && t < 1.0) events += y1 + t * (y2 - y1)
          }
        }
      }
    }
    val (loY, hiY) = clip match {
      case Some((_, cymin, _, cymax)) => (cymin, cymax)
      case None => (Double.NegativeInfinity, Double.PositiveInfinity)
    }
    val ys = events.filter(y => y >= loY && y <= hiY).distinct.sorted
    var total = 0.0
    var si = 0
    while (si < ys.length - 1) {
      val y1 = ys(si)
      val y2 = ys(si + 1)
      if (y2 > y1) {
        val ym = (y1 + y2) / 2.0
        // per polygon: even-odd x-intervals at the midline
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
        var p = 0
        while (p < polys.length) {
          val xs = scala.collection.mutable.ArrayBuffer.empty[Double]
          edges.foreach { case (ep, x1, ey1, x2, ey2) =>
            if (ep == p && ((ey1 < ym) != (ey2 < ym)))
              xs += x1 + (ym - ey1) * (x2 - x1) / (ey2 - ey1)
          }
          val sorted = xs.sorted
          var k = 0
          while (k + 1 < sorted.length) {
            var lo = sorted(k)
            var hi = sorted(k + 1)
            clip.foreach { case (cxmin, _, cxmax, _) =>
              lo = math.max(lo, cxmin); hi = math.min(hi, cxmax)
            }
            if (hi > lo) spans += ((lo, hi))
            k += 2
          }
          p += 1
        }
        // merge across polygons, sum the union length
        val merged = spans.sortBy(s => (s._1, s._2))
        var L = 0.0
        var curLo = 0.0
        var curHi = Double.NegativeInfinity
        var open = false
        merged.foreach { case (lo, hi) =>
          if (!open) { curLo = lo; curHi = hi; open = true }
          else if (lo <= curHi) { if (hi > curHi) curHi = hi }
          else { L += curHi - curLo; curLo = lo; curHi = hi }
        }
        if (open) L += curHi - curLo
        total += (y2 - y1) * L
      }
      si += 1
    }
    total
  }
}
