package graft

import graft.operators.CoverageArea
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CoverageAreaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double) =
    Array((Array(x0, x1, x1, x0, x0), Array(y0, y0, y1, y1, y0)))

  /** Full inclusion–exclusion over axis-aligned rects — the independent
    * reference (2^n terms, exact on integer coordinates). */
  private def ieUnion(rects: Seq[(Double, Double, Double, Double)]): Double = {
    val n = rects.length
    var total = 0.0
    for (mask <- 1 until (1 << n)) {
      val sel = (0 until n).filter(i => (mask & (1 << i)) != 0)
      val x0 = sel.map(i => rects(i)._1).max
      val y0 = sel.map(i => rects(i)._2).max
      val x1 = sel.map(i => rects(i)._3).min
      val y1 = sel.map(i => rects(i)._4).min
      val a = math.max(0.0, x1 - x0) * math.max(0.0, y1 - y0)
      total += (if (sel.length % 2 == 1) a else -a)
    }
    total
  }

  test("kernel: disjoint sum, identical collapse, nested outer, empty") {
    val r1 = rect(0, 0, 4, 3)
    val r2 = rect(10, 10, 12, 12)
    assert(CoverageArea.unionAreaOf(Seq(r1, r2), None) == 16.0)
    assert(CoverageArea.unionAreaOf(Seq(r1, r1, r1), None) == 12.0)
    assert(CoverageArea.unionAreaOf(Seq(r1, rect(1, 1, 2, 2)), None) == 12.0)
    assert(CoverageArea.unionAreaOf(Nil, None) == 0.0)
  }

  test("kernel: triple overlap where pairwise-only I-E would be wrong") {
    // three stepped 5x4 rects with a nonempty triple overlap
    val rs = Seq((0.0, 0.0, 5.0, 4.0), (2.0, 1.0, 7.0, 5.0), (4.0, 2.0, 9.0, 6.0))
    val got = CoverageArea.unionAreaOf(rs.map(r => rect(r._1, r._2, r._3, r._4)), None)
    assert(got == ieUnion(rs), s"got $got want ${ieUnion(rs)}")
    // pairwise-only I-E undercounts by the triple area — prove the
    // fixture actually exercises depth 3
    val pairwiseOnly = 20.0 * 3 - (9.0 + 2.0 + 9.0)
    assert(got != pairwiseOnly)
  }

  test("kernel: polygon with hole unions even-odd; overlap covering a hole fills it") {
    // 6x6 square with a 2x2 hole = 32; a 4x4 square covering the hole
    // brings the union to the full 36 + the 4x4's own spill
    val holed = Array(
      (Array(0.0, 6, 6, 0, 0), Array(0.0, 0, 6, 6, 0)),
      (Array(2.0, 2, 4, 4, 2), Array(2.0, 4, 4, 2, 2))) // CW hole
    assert(CoverageArea.unionAreaOf(Seq(holed), None) == 32.0)
    val cover = rect(1, 1, 5, 5)
    assert(CoverageArea.unionAreaOf(Seq(holed, cover), None) == 36.0)
  }

  test("kernel: slanted polygons (triangles/darts) against the shoelace closed form") {
    val tri = Array((Array(0.0, 8, 0, 0), Array(0.0, 0, 8, 0))) // area 32
    assert(CoverageArea.unionAreaOf(Seq(tri), None) == 32.0)
    // two copies shifted so they overlap on a parallelogram: union =
    // 2*32 - overlap; overlap computed by the clip kernel as reference
    val tri2 = Array((Array(2.0, 10, 2, 2), Array(0.0, 0, 8, 0)))
    val got = CoverageArea.unionAreaOf(Seq(tri, tri2), None)
    // overlap of the two right triangles: triangle (2,0)-(8,0)-(2,6), area 18
    assert(math.abs(got - (32.0 + 32.0 - 18.0)) < 1e-12, s"got $got")
  }

  test("property: union of random integer rects equals full inclusion-exclusion") {
    val rnd = new scala.util.Random(42)
    (1 to 60).foreach { trial =>
      val n = 2 + rnd.nextInt(4) // up to 5 rects: 31 I-E terms
      val rs = (1 to n).map { _ =>
        val x0 = rnd.nextInt(20).toDouble
        val y0 = rnd.nextInt(20).toDouble
        (x0, y0, x0 + 1 + rnd.nextInt(10), y0 + 1 + rnd.nextInt(10))
      }
      val got = CoverageArea.unionAreaOf(rs.map(r => rect(r._1, r._2, r._3, r._4)), None)
      val want = ieUnion(rs)
      assert(got == want, s"trial $trial: got $got want $want for $rs")
    }
  }

  test("cell decomposition: clipped per-cell unions sum to the direct union") {
    val rnd = new scala.util.Random(7)
    (1 to 25).foreach { trial =>
      val rs = (1 to 4).map { _ =>
        val x0 = rnd.nextInt(20).toDouble
        val y0 = rnd.nextInt(20).toDouble
        (x0, y0, x0 + 1 + rnd.nextInt(12), y0 + 1 + rnd.nextInt(12))
      }
      val polys = rs.map(r => rect(r._1, r._2, r._3, r._4))
      val direct = CoverageArea.unionAreaOf(polys, None)
      val cs = 8.0
      var cellSum = 0.0
      for (cx <- -1 to 4; cy <- -1 to 4)
        cellSum += CoverageArea.unionAreaOf(polys,
          Some((cx * cs, cy * cs, (cx + 1) * cs, (cy + 1) * cs)))
      assert(cellSum == direct, s"trial $trial: cells $cellSum direct $direct")
    }
    // slanted geometry across cell walls: x-wall crossing events keep
    // the midpoint rule exact (within float round-off of the crossings)
    val tri = Array((Array(1.0, 15, 1, 1), Array(1.0, 3, 13, 1)))
    val direct = CoverageArea.unionAreaOf(Seq(tri), None)
    var cellSum = 0.0
    for (cx <- 0 to 2; cy <- 0 to 2)
      cellSum += CoverageArea.unionAreaOf(Seq(tri),
        Some((cx * 8.0, cy * 8.0, (cx + 1) * 8.0, (cy + 1) * 8.0)))
    assert(math.abs(cellSum - direct) < 1e-9, s"cells $cellSum direct $direct")
  }

  test("edge-count guards fail loudly and name the escape hatch") {
    val df = Seq((1L, 0)).toDF("g", "m")
      .withColumn("rings", array(array(
        struct(lit(0.0).as("x"), lit(0.0).as("y")),
        struct(lit(5.0).as("x"), lit(0.0).as("y")),
        struct(lit(5.0).as("x"), lit(4.0).as("y")),
        struct(lit(0.0).as("x"), lit(4.0).as("y")),
        struct(lit(0.0).as("x"), lit(0.0).as("y")))))
      .select("g", "rings")
    val e = intercept[Exception](
      CoverageArea.unionArea(df, "rings", Seq("g"), maxEdgesPerGroup = 3).collect())
    assert(e.getMessage.contains("unionAreaByCell"), s"got: ${e.getMessage}")
    val e2 = intercept[Exception](
      CoverageArea.unionAreaByCell(df, "rings", Seq("g"), cellSize = 8.0,
        maxEdgesPerCell = 3).collect())
    assert(e2.getMessage.contains("cellSize"), s"got: ${e2.getMessage}")
    intercept[IllegalArgumentException](
      CoverageArea.unionArea(df, "rings", Seq("g"), maxEdgesPerGroup = 0))
  }

  test("cell fan-out budget fails loudly; degenerate all-empty group returns 0 on both paths") {
    val df = Seq((1L, 0)).toDF("g", "m")
      .withColumn("rings", array(array(
        struct(lit(0.0).as("x"), lit(0.0).as("y")),
        struct(lit(100.0).as("x"), lit(0.0).as("y")),
        struct(lit(100.0).as("x"), lit(80.0).as("y")),
        struct(lit(0.0).as("x"), lit(80.0).as("y")),
        struct(lit(0.0).as("x"), lit(0.0).as("y")))))
      .select("g", "rings")
    // envelope spans 101x81 = 8181 unit cells > the 100 cap -> loud, knob named
    val e = intercept[Exception](
      CoverageArea.unionAreaByCell(df, "rings", Seq("g"), cellSize = 1.0,
        maxCellsPerPolygon = 100L).collect())
    assert(e.getMessage.contains("maxCellsPerPolygon"), s"got: ${e.getMessage}")
    // a group whose rows all carry EMPTY ring lists must come back with
    // union_area 0 from BOTH paths (ADVICE r15: the inner join dropped it)
    val deg = Seq((7L, 0)).toDF("g", "m")
      .withColumn("rings",
        filter(array(array(struct(lit(0.0).as("x"), lit(0.0).as("y")))), _ => lit(false)))
      .select("g", "rings")
    val d = CoverageArea.unionArea(deg, "rings", Seq("g")).collect()
    val c = CoverageArea.unionAreaByCell(deg, "rings", Seq("g"), cellSize = 8.0).collect()
    assert(d.length == 1 && d(0).getDouble(3) == 0.0)
    assert(c.length == 1 && c(0).getDouble(3) == 0.0, "cell path must keep the degenerate group")
  }

  // ---- geometry-emitting dissolve (r16) ----

  /** Shoelace over emitted rings, signed sum (CCW outers +, CW holes −). */
  private def shoelace(rings: Array[(Array[Double], Array[Double])]): Double =
    rings.map { case (xs, ys) =>
      (0 until xs.length - 1).map(i => xs(i) * ys(i + 1) - xs(i + 1) * ys(i)).sum
    }.sum / 2.0

  test("unionRingsOf: overlapping staircase dissolves to the closed-form 12-corner ring") {
    val polys = Seq(rect(0, 0, 5, 4), rect(2, 1, 7, 5), rect(4, 2, 9, 6))
    val rings = CoverageArea.unionRingsOf(polys)
    assert(rings.length == 1)
    val (xs, ys) = rings(0)
    val expect = Seq((0.0, 0.0), (5.0, 0.0), (5.0, 1.0), (7.0, 1.0), (7.0, 2.0), (9.0, 2.0),
      (9.0, 6.0), (4.0, 6.0), (4.0, 5.0), (2.0, 5.0), (2.0, 4.0), (0.0, 4.0), (0.0, 0.0))
    assert(xs.zip(ys).toSeq == expect, s"got ${xs.zip(ys).toSeq}")
    assert(shoelace(rings) == CoverageArea.unionAreaOf(polys, None))
  }

  test("unionRingsOf: disconnected union emits two CCW outers; frame emits a CW hole") {
    val two = CoverageArea.unionRingsOf(Seq(rect(0, 0, 2, 2), rect(5, 5, 7, 7)))
    assert(two.length == 2)
    assert(two.forall { case (xs, ys) =>
      (0 until xs.length - 1).map(i => xs(i) * ys(i + 1) - xs(i + 1) * ys(i)).sum > 0 })
    assert(shoelace(two) == 8.0)
    // a frame: four overlapping strips around an empty 2x2 middle
    val frame = Seq(rect(0, 0, 6, 1), rect(0, 5, 6, 6), rect(0, 0, 1, 6), rect(5, 0, 6, 6))
    // inner hole is [1,5]x[1,5] minus... strips: bottom y<=1, top y>=5, left x<=1, right x>=5
    // -> hole (1,1)-(5,5), outer (0,0)-(6,6)
    val fr = CoverageArea.unionRingsOf(frame)
    assert(fr.length == 2)
    val signs = fr.map { case (xs, ys) =>
      (0 until xs.length - 1).map(i => xs(i) * ys(i + 1) - xs(i + 1) * ys(i)).sum }
    assert(signs(0) > 0 && signs(1) < 0, s"outer-then-hole expected, got $signs")
    assert(shoelace(fr) == 36.0 - 16.0)
    assert(shoelace(fr) == CoverageArea.unionAreaOf(frame, None))
  }

  test("unionRingsOf: checkerboard pinch traces two simple touching rings; nested/duplicate collapse") {
    val pinch = Seq(rect(0, 0, 1, 1), rect(1, 1, 2, 2))
    val pr = CoverageArea.unionRingsOf(pinch)
    assert(pr.length == 2, "diagonal cells must come back as two simple rings")
    pr.foreach { case (xs, ys) =>
      val opens = xs.zip(ys).dropRight(1)
      assert(opens.distinct.length == opens.length, "ring must be simple (no repeated vertex)")
    }
    assert(shoelace(pr) == 2.0)
    // identical copies and a nested rect collapse to the one outer
    val nested = CoverageArea.unionRingsOf(Seq(rect(0, 0, 4, 4), rect(1, 1, 2, 2), rect(0, 0, 4, 4)))
    assert(nested.length == 1 && shoelace(nested) == 16.0)
  }

  test("unionRingsOf: a polygon WITH a hole unions even-odd; slants and blowups fail loudly") {
    // rect with a hole (even-odd: outer + opposite-wound inner ring),
    // partially covered by a second rect plugging half the hole
    val holed = Array(
      (Array(0.0, 6.0, 6.0, 0.0, 0.0), Array(0.0, 0.0, 6.0, 6.0, 0.0)),
      (Array(2.0, 2.0, 4.0, 4.0, 2.0), Array(2.0, 4.0, 4.0, 2.0, 2.0)))
    val plug = rect(2, 2, 3, 4)
    val ur = CoverageArea.unionRingsOf(Seq(holed, plug))
    // remaining hole: (3,2)-(4,4)
    assert(shoelace(ur) == 36.0 - 4.0 + 2.0)
    assert(shoelace(ur) == CoverageArea.unionAreaOf(Seq(holed, plug), None))
    val e = intercept[IllegalArgumentException](CoverageArea.unionRingsOf(
      Seq(Array((Array(0.0, 4.0, 0.0, 0.0), Array(0.0, 0.0, 3.0, 0.0))))))
    assert(e.getMessage.contains("RECTILINEAR"))
    val e2 = intercept[IllegalArgumentException](
      CoverageArea.unionRingsOf(Seq(rect(0, 0, 10, 10), rect(1, 1, 2, 2)), maxCells = 3))
    assert(e2.getMessage.contains("maxCells"))
  }

  test("operator: unionGeometry emits rings whose shoelace equals unionArea; WKT bridges") {
    val rows = for (g <- 0 until 4; m <- 0 until 3) yield (g.toLong, m)
    val df = rows.toDF("g", "m")
      .withColumn("x0", (col("g") % 5) * 2 + col("m") * 2)
      .withColumn("y0", (col("g") % 3) * 2 + col("m"))
      .withColumn("rings", array(array(
        struct(col("x0").cast("double").as("x"), col("y0").cast("double").as("y")),
        struct((col("x0") + 5).cast("double").as("x"), col("y0").cast("double").as("y")),
        struct((col("x0") + 5).cast("double").as("x"), (col("y0") + 4).cast("double").as("y")),
        struct(col("x0").cast("double").as("x"), (col("y0") + 4).cast("double").as("y")),
        struct(col("x0").cast("double").as("x"), col("y0").cast("double").as("y")))))
      .select("g", "rings")
    val geo = CoverageArea.unionGeometry(df, "rings", Seq("g")).orderBy("g")
    val area = CoverageArea.unionArea(df, "rings", Seq("g")).orderBy("g")
    val j = geo.select(col("g"), col("union_area"))
      .join(area.select(col("g"), col("union_area").as("scanline")), "g")
    assert(j.count() == 4)
    assert(j.filter(col("union_area") =!= col("scanline")).count() == 0,
      "shoelace over emitted rings must equal the scanline union exactly on integer coords")
    // the emitted geometry survives the WKT bridge with its area intact
    val viaWkt = geo.select(col("g"),
      graft.functions.SpatialOps.ringsArea(graft.functions.SpatialOps.wktRings(
        graft.functions.SpatialOps.ringsToWkt(col("rings")))).as("a2"),
      col("union_area"))
    assert(viaWkt.filter(col("a2") =!= col("union_area")).count() == 0)
  }

  test("operator: unionGeometryByCell pieces sum to the direct union; straddlers split cleanly") {
    // one group straddling a cell wall at x = 8 (cellSize 8): two rects
    // overlapping across the wall
    val df = Seq((1L, 0), (1L, 1)).toDF("g", "m")
      .withColumn("x0", col("m") * 5)         // rects [0,7]x[0,4] and [5,12]x[0,4]
      .withColumn("rings", array(array(
        struct(col("x0").cast("double").as("x"), lit(0.0).as("y")),
        struct((col("x0") + 7).cast("double").as("x"), lit(0.0).as("y")),
        struct((col("x0") + 7).cast("double").as("x"), lit(4.0).as("y")),
        struct(col("x0").cast("double").as("x"), lit(4.0).as("y")),
        struct(col("x0").cast("double").as("x"), lit(0.0).as("y")))))
      .select("g", "rings")
    val cells = CoverageArea.unionGeometryByCell(df, "rings", Seq("g"), cellSize = 8.0)
      .orderBy("cell_x", "cell_y").collect()
    assert(cells.length == 2, s"union [0,12]x[0,4] must split into two 8-cells, got ${cells.length}")
    assert(cells.map(_.getDouble(4)).sum == 48.0) // 12 x 4
    // the direct union agrees
    val direct = CoverageArea.unionArea(df, "rings", Seq("g")).collect()
    assert(direct(0).getDouble(3) == 48.0)
    // each cell's geometry is a clean rectangle clipped at the wall x=8
    val areas = cells.map(r => (r.getLong(1), r.getDouble(4))).toMap
    assert(areas == Map(0L -> 32.0, 1L -> 16.0), s"got $areas")
  }

  test("operator: unionArea and unionAreaByCell agree with the kernel over groups") {
    val rows = for {
      g <- 0 until 6
      m <- 0 until 3
    } yield (g.toLong, m)
    val df = rows.toDF("g", "m")
      .withColumn("x0", (col("g") % 5) * 2 + col("m") * 2)
      .withColumn("y0", (col("g") % 3) * 2 + col("m"))
      .withColumn("rings", array(array(
        struct(col("x0").cast("double").as("x"), col("y0").cast("double").as("y")),
        struct((col("x0") + 5).cast("double").as("x"), col("y0").cast("double").as("y")),
        struct((col("x0") + 5).cast("double").as("x"), (col("y0") + 4).cast("double").as("y")),
        struct(col("x0").cast("double").as("x"), (col("y0") + 4).cast("double").as("y")),
        struct(col("x0").cast("double").as("x"), col("y0").cast("double").as("y")))))
      .select("g", "rings")
    val direct = CoverageArea.unionArea(df, "rings", Seq("g"))
      .orderBy("g").collect()
    val cells = CoverageArea.unionAreaByCell(df, "rings", Seq("g"), cellSize = 8.0)
      .orderBy("g").collect()
    assert(direct.length == 6 && cells.length == 6)
    direct.zip(cells).foreach { case (d, c) =>
      assert(d.getLong(1) == 3 && c.getLong(1) == 3)
      assert(d.getDouble(2) == 60.0 && c.getDouble(2) == 60.0) // 3 x (5*4)
      assert(d.getDouble(3) == c.getDouble(3), s"group ${d.getLong(0)}")
      // reference: the stepped-rect I-E per group
      val g = d.getLong(0)
      val rs = (0 until 3).map { m =>
        val x0 = (g % 5) * 2.0 + m * 2; val y0 = (g % 3) * 2.0 + m
        (x0, y0, x0 + 5, y0 + 4)
      }
      assert(d.getDouble(3) == ieUnion(rs), s"group $g")
    }
  }
}
