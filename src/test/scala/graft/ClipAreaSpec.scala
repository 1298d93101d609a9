package graft

import graft.functions.{ClipExprs, SpatialOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClipAreaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def clipOf(wkt: String, box: (Double, Double, Double, Double)): Double =
    Seq(wkt).toDF("g")
      .select(ClipExprs.clipArea(SpatialOps.wktRings(col("g")),
        SpatialOps.bbox(lit(box._1), lit(box._2), lit(box._3), lit(box._4))).as("a"))
      .head().getDouble(0)

  private val arrowHole =
    "POLYGON ((0 0, 6 0, 6 8, 3 4, 0 8, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))"

  test("rectangle vs box: closed-form overlap areas") {
    val rect = "POLYGON ((2 3, 10 3, 10 9, 2 9, 2 3))" // 8 x 6 = 48
    assert(clipOf(rect, (0, 0, 20, 20)) == 48.0)        // box contains polygon
    assert(clipOf(rect, (4, 5, 8, 7)) == 8.0)           // box inside polygon: 4x2
    assert(clipOf(rect, (6, 6, 14, 12)) == 12.0)        // partial: 4x3
    assert(clipOf(rect, (10, 9, 20, 20)) == 0.0)        // corner touch only
    assert(clipOf(rect, (11, 3, 20, 9)) == 0.0)         // disjoint
  }

  test("concave arrow with hole: partition over a covering grid sums to the full area") {
    val full = Seq(arrowHole).toDF("g")
      .select(SpatialOps.ringsArea(SpatialOps.wktRings(col("g"))).as("a"))
      .head().getDouble(0)
    // outer: shoelace of the arrow = 36; hole 1x1 subtracts -> 35
    assert(math.abs(full - 35.0) < 1e-12, s"fixture area drifted: $full")
    val cell = 3.0
    var sum = 0.0
    for (gx <- 0 until 3; gy <- 0 until 3)
      sum += clipOf(arrowHole,
        (gx * cell, gy * cell, gx * cell + cell, gy * cell + cell))
    assert(math.abs(sum - full) < 1e-9,
      s"grid partition $sum must reassemble the polygon area $full")
  }

  test("hole semantics: a box inside the hole has zero area; straddling subtracts") {
    assert(clipOf(arrowHole, (1.25, 1.25, 1.75, 1.75)) == 0.0)
    // box (0.5,0.5)-(2.5,2.5): 2x2 gross minus the full 1x1 hole
    assert(clipOf(arrowHole, (0.5, 0.5, 2.5, 2.5)) == 3.0)
  }

  test("concave notch: the box over the notch counts only the prongs") {
    // arrow outer only; box (0,4)-(6,8) covers the notch region: two
    // triangular prongs, each 1.5x... closed form: area above y=4 of the
    // arrow = total(36) - area below y=4 (6x4=24) = 12
    val outer = "POLYGON ((0 0, 6 0, 6 8, 3 4, 0 8, 0 0))"
    assert(clipOf(outer, (0, 4, 6, 8)) == 12.0)
    // independent check by point sampling on a fine deterministic grid
    val pts = for (i <- 0 until 120; j <- 0 until 80)
      yield (i * 0.05 + 0.025, 4.0 + j * 0.05 + 0.025)
    val inside = Seq(outer).toDF("g")
      .select(SpatialOps.wktRings(col("g")).as("r"))
      .crossJoin(pts.toDF("px", "py"))
      .select(graft.functions.GeomPredExprs.pointInRings(col("r"), col("px"), col("py"))
        .cast("int").as("in"))
      .agg(sum(col("in"))).head().getLong(0)
    val mc = inside * 0.05 * 0.05
    assert(math.abs(mc - 12.0) < 0.3, s"sampling census $mc disagrees with clip area")
  }

  test("degenerate inputs: zero-width polygons and edge-touch boxes are 0; empty rings are 0") {
    assert(clipOf("POLYGON ((1 1, 5 1, 1 1))", (0, 0, 10, 10)) == 0.0)
    assert(clipOf("POLYGON ((2 3, 10 3, 10 9, 2 9, 2 3))", (0, 0, 2, 20)) == 0.0)
    // a zero-area (point) box at the polygon's corner clips to nothing
    assert(clipOf("POLYGON ((2 3, 10 3, 10 9, 2 9, 2 3))", (2, 3, 2, 3)) == 0.0)
  }

  test("fail-closed: inverted box and non-struct inputs") {
    val e = intercept[Exception](clipOf(arrowHole, (5, 5, 1, 1)))
    assert(e.getMessage.contains("inverted clip box"))
    val e2 = intercept[Exception](
      Seq(1).toDF("x").select(ClipExprs.clipArea(col("x"),
        SpatialOps.bbox(lit(0.0), lit(0.0), lit(1.0), lit(1.0)))).collect())
    assert(e2.getMessage.toLowerCase.contains("rings"))
  }

  // ---- convex-window form (ClipAreaPolyExpr) ----

  private def clipPolyOf(wkt: String, clipWkt: String): Double =
    Seq((wkt, clipWkt)).toDF("g", "c")
      .select(ClipExprs.clipAreaPoly(SpatialOps.wktRings(col("g")),
        element_at(SpatialOps.wktRings(col("c")), 1)).as("a"))
      .head().getDouble(0)

  private def diamondWkt(cx: Double, cy: Double, r: Double): String =
    s"POLYGON (($cx ${cy - r}, ${cx + r} $cy, $cx ${cy + r}, ${cx - r} $cy, $cx ${cy - r}))"

  test("convex clip: closed forms against diamonds") {
    val bigRect = "POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0))"
    // diamond fully inside the rect: intersection = diamond area 2r^2
    assert(clipPolyOf(bigRect, diamondWkt(50, 50, 3)) == 18.0)
    // rect fully inside a huge diamond: intersection = rect area
    val unitRect = "POLYGON ((49 49, 51 49, 51 51, 49 51, 49 49))"
    assert(clipPolyOf(unitRect, diamondWkt(50, 50, 40)) == 4.0)
    // disjoint
    assert(clipPolyOf(unitRect, diamondWkt(80, 80, 2)) == 0.0)
  }

  test("convex clip by an axis-aligned square ring equals the box kernel") {
    val square = "POLYGON ((2 1, 7 1, 7 6, 2 6, 2 1))"
    val viaPoly = clipPolyOf(arrowHole, square)
    val viaBox = clipOf(arrowHole, (2, 1, 7, 6))
    assert(viaPoly == viaBox && viaPoly > 0,
      s"kernels disagree: poly=$viaPoly box=$viaBox")
  }

  test("convex clip: diamond tiling reassembles the subject's full area") {
    // radius-r diamonds centered on the 2r lattice + the r-offset lattice
    // tile the plane; summing clip areas over a covering tiling must
    // reassemble the arrow+hole polygon exactly
    val r = 2.0
    var sum = 0.0
    for (i <- -1 to 4; j <- -1 to 4) {
      sum += clipPolyOf(arrowHole, diamondWkt(2 * r * i, 2 * r * j, r))
      sum += clipPolyOf(arrowHole, diamondWkt(2 * r * i + r, 2 * r * j + r, r))
    }
    assert(math.abs(sum - 35.0) < 1e-9, s"tiling sum $sum != 35")
  }

  test("convex clip winding: a clockwise clip ring gives the same area") {
    val ccw = diamondWkt(3, 3, 2)
    val cw = "POLYGON ((3 1, 1 3, 3 5, 5 3, 3 1))"
    // reversing the ring reorders the edge passes, so the intersection
    // arithmetic rounds differently — equality is semantic, not bitwise
    assert(math.abs(clipPolyOf(arrowHole, ccw) - clipPolyOf(arrowHole, cw)) < 1e-9)
  }

  test("convex clip fail-closed: concave, unclosed, degenerate clip rings") {
    val arrowRing = "POLYGON ((0 0, 6 0, 6 8, 3 4, 0 8, 0 0))" // concave
    val e1 = intercept[Exception](clipPolyOf(arrowHole, arrowRing))
    assert(e1.getMessage.contains("not convex"))
    val e2 = intercept[Exception](
      Seq(1).toDF("x").select(ClipExprs.clipAreaPoly(col("x"), col("x"))).collect())
    assert(e2.getMessage.toLowerCase.contains("rings"))
    // degenerate (zero-area line ring)
    val e3 = intercept[Exception](
      clipPolyOf(arrowHole, "POLYGON ((0 0, 4 0, 2 0, 0 0))"))
    assert(e3.getMessage.contains("zero area"))
  }

  test("SQL surface: st_clip_area matches the Column form") {
    GraftFunctions.register(spark)
    Seq(arrowHole).toDF("g").createOrReplaceTempView("clipspec")
    val viaSql = spark.sql(
      """SELECT st_clip_area(st_rings(g), named_struct(
        |  'xmin', CAST(0.5 AS DOUBLE), 'ymin', CAST(0.5 AS DOUBLE),
        |  'xmax', CAST(2.5 AS DOUBLE), 'ymax', CAST(2.5 AS DOUBLE))) AS a
        |FROM clipspec""".stripMargin).head().getDouble(0)
    assert(viaSql == 3.0)
  }
}
