package graft

import graft.operators.Regrid
import graft.operators.Regrid.GridDef
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Grid alignment invariants (feature_stacking.py:72-102 semantics):
  * nearest picks the aux cell containing the master center, bilinear
  * reproduces linear fields exactly and renormalizes at coverage edges.
  */
class RegridSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // master: 4×4 grid of 1×1 cells, top-left world corner (0, 4)
  private val masterGrid = GridDef(0.0, 4.0, 1.0, 1.0)
  private def master = (for { r <- 0 until 4; c <- 0 until 4 } yield (r, c))
    .toDF("px_row", "px_col")

  // aux: 2×2 grid of 2×2 cells over the same extent, value = 10r + c
  private val auxGrid = GridDef(0.0, 4.0, 2.0, 2.0)
  private def aux = (for { r <- 0 until 2; c <- 0 until 2 } yield (r, c, (10 * r + c).toDouble))
    .toDF("px_row", "px_col", "dem")

  test("nearest downsample: each master cell reads the containing aux cell") {
    val out = Regrid.regridNearest(master, aux, masterGrid, auxGrid, Seq("dem"))
    assert(out.count() == 16)
    val got = out.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for { r <- 0 until 4; c <- 0 until 4 }
      assert(got((r, c)) == 10.0 * (r / 2) + (c / 2), s"cell ($r,$c)")
  }

  test("nearest out-of-coverage master cells get NULL (dst_nodata fill)") {
    // shift the aux origin right+down by one master cell: master col 0 /
    // row 0 centers now fall outside aux coverage
    val shifted = GridDef(1.0, 3.0, 2.0, 2.0)
    val out = Regrid.regridNearest(master, aux, masterGrid, shifted, Seq("dem"))
    assert(out.count() == 16)
    assert(out.filter(col("dem").isNull).count() == 7) // row 0 ∪ col 0
    assert(out.filter(col("px_row") === 0 && col("dem").isNotNull).count() == 0)
  }

  test("master/valueCols name clash is rejected, not silently duplicated") {
    val masterWithDem = master.withColumn("dem", lit(0.0))
    val e1 = intercept[IllegalArgumentException] {
      Regrid.regridNearest(masterWithDem, aux, masterGrid, auxGrid, Seq("dem"))
    }
    assert(e1.getMessage.contains("disjoint"))
    val e2 = intercept[IllegalArgumentException] {
      Regrid.regridBilinear(masterWithDem, aux, masterGrid, auxGrid, Seq("dem"))
    }
    assert(e2.getMessage.contains("disjoint"))
  }

  test("bilinear reproduces a linear field exactly where all 4 taps exist") {
    // aux value = world x + world y sampled at aux pixel centers
    val linAux = (for { r <- 0 until 2; c <- 0 until 2 } yield {
      val x = 0.0 + (c + 0.5) * 2.0
      val y = 4.0 - (r + 0.5) * 2.0
      (r, c, x + y)
    }).toDF("px_row", "px_col", "f")
    val out = Regrid.regridBilinear(master, linAux, masterGrid, auxGrid, Seq("f"))
    // interior master cells (all four taps in coverage): rows/cols 1-2
    val got = out.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for { r <- 1 to 2; c <- 1 to 2 } {
      val x = 0.0 + (c + 0.5) * 1.0
      val y = 4.0 - (r + 0.5) * 1.0
      assert(math.abs(got((r, c)) - (x + y)) < 1e-12, s"cell ($r,$c)")
    }
  }

  test("bilinear renormalizes dropped edge taps; constant field stays constant") {
    val const = aux.withColumn("dem", lit(7.0))
    val out = Regrid.regridBilinear(master, const, masterGrid, auxGrid, Seq("dem"))
    assert(out.count() == 16)
    // corners/edges lose taps but the renormalized weights still sum to 1
    val vals = out.select("dem").as[Double].collect()
    assert(vals.forall(v => math.abs(v - 7.0) < 1e-12))
  }

  test("cubic on the identity grid reproduces aux values exactly (interior)") {
    // same grid both sides → fx = fy = 0, and Catmull-Rom is interpolating:
    // weights collapse to (0, 1, 0, 0)
    val aux6 = (for { r <- 0 until 6; c <- 0 until 6 } yield (r, c, (10 * r + c).toDouble))
      .toDF("px_row", "px_col", "f")
    val grid6 = GridDef(0.0, 6.0, 1.0, 1.0)
    val out = Regrid.regridCubic(aux6.select("px_row", "px_col"), aux6, grid6, grid6, Seq("f"))
    val got = out.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for { r <- 1 to 3; c <- 1 to 3 } // all 16 taps in coverage
      assert(math.abs(got((r, c)) - (10 * r + c)) < 1e-12, s"cell ($r,$c)")
  }

  test("cubic reproduces a linear field at half-cell offsets (linear precision)") {
    // aux 8×8 of 1×1 cells with f = x + y at centers; master shifted so
    // every master center sits exactly between aux centers (fx = fy = 0.5)
    val aux8 = (for { r <- 0 until 8; c <- 0 until 8 } yield {
      val x = 0.0 + (c + 0.5); val y = 8.0 - (r + 0.5)
      (r, c, x + y)
    }).toDF("px_row", "px_col", "f")
    val masterShift = GridDef(0.5, 7.5, 1.0, 1.0)
    val master8 = (for { r <- 0 until 7; c <- 0 until 7 } yield (r, c)).toDF("px_row", "px_col")
    val out = Regrid.regridCubic(master8, aux8, masterShift, GridDef(0.0, 8.0, 1.0, 1.0), Seq("f"))
    val got = out.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for { r <- 1 to 5; c <- 1 to 5 } { // interior: all 16 taps exist
      val x = 0.5 + (c + 0.5); val y = 7.5 - (r + 0.5)
      assert(math.abs(got((r, c)) - (x + y)) < 1e-12, s"cell ($r,$c)")
    }
  }

  test("bilinear with zero coverage yields NULL") {
    val far = GridDef(100.0, 200.0, 2.0, 2.0)
    val out = Regrid.regridBilinear(master, aux, masterGrid, far, Seq("dem"))
    assert(out.filter(col("dem").isNotNull).count() == 0)
    assert(out.count() == 16)
  }

  // ---- CRS-to-CRS reprojection (feature_stacking.py:85-96) ----

  test("projective inverse composes to identity on sample points") {
    val t = Regrid.ProjectiveTransform(
      1.25, 0.25, 2.0, -0.125, 1.25, 2.0, 0.0009765625, -0.00048828125, 1.0)
    val inv = t.inverse
    val pts = (for { x <- 0 to 10; y <- 0 to 10 } yield (x.toDouble, y.toDouble))
      .toDF("x", "y")
    val (fx, fy) = t(col("x"), col("y"))
    val fwd = pts.select(col("x"), col("y"), fx.as("tx"), fy.as("ty"))
    val (bx, by) = inv(col("tx"), col("ty"))
    val back = fwd.select(col("x"), col("y"), bx.as("rx"), by.as("ry")).collect()
    back.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 1e-9, r)
      assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-9, r)
    }
  }

  test("nearest reproject with an affine shift reads the shifted aux cell") {
    // translate +2 world units in x: master cell (r, c) lands in aux (r, c+2)
    val t = Regrid.AffineTransform(1.0, 0.0, 2.0, 0.0, 1.0, 0.0)
    val aux4 = (for { r <- 0 until 4; c <- 0 until 4 } yield (r, c, (10 * r + c).toDouble))
      .toDF("px_row", "px_col", "dem")
    val g4 = GridDef(0.0, 4.0, 1.0, 1.0)
    val out = Regrid.reproject(master, aux4, g4, g4, t, Seq("dem"), kernel = "nearest")
    val got = out.collect().map(r =>
      (r.getInt(0), r.getInt(1)) -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    for { r <- 0 until 4; c <- 0 until 4 } {
      if (c + 2 < 4) assert(got((r, c)).contains(10.0 * r + c + 2), s"cell ($r,$c)")
      else assert(got((r, c)).isEmpty, s"cell ($r,$c) should be outside coverage")
    }
  }

  test("affine reproject there and back is identity on interior cells") {
    // linear field sampled on an 8×8 grid; mild shear+shift affine. A
    // linear field stays linear under an affine map, and bilinear is
    // exact on linear fields, so the round trip is exact (not just ≈)
    // wherever all taps exist in both directions.
    val g8 = GridDef(0.0, 8.0, 1.0, 1.0)
    val aux8 = (for { r <- 0 until 8; c <- 0 until 8 } yield {
      val x = c + 0.5; val y = 8.0 - (r + 0.5)
      (r, c, 3.0 * x + 2.0 * y)
    }).toDF("px_row", "px_col", "f")
    val grid8 = aux8.select("px_row", "px_col")
    val t = Regrid.AffineTransform(1.0, 0.125, -0.5, -0.0625, 1.0, 0.75)
    val there = Regrid.reproject(grid8, aux8, g8, g8, t, Seq("f"), kernel = "bilinear")
      .withColumnRenamed("f", "g")
    val back = Regrid.reproject(grid8, there.withColumnRenamed("g", "f"),
      g8, g8, t.inverse, Seq("f"), kernel = "bilinear")
    val got = back.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for { r <- 2 to 5; c <- 2 to 5 } {
      val x = c + 0.5; val y = 8.0 - (r + 0.5)
      assert(math.abs(got((r, c)) - (3.0 * x + 2.0 * y)) < 1e-9, s"cell ($r,$c)")
    }
  }

  test("reproject rejects an unknown kernel") {
    val e = intercept[IllegalArgumentException] {
      Regrid.reproject(master, aux, masterGrid, auxGrid,
        Regrid.IdentityTransform, Seq("dem"), kernel = "lanczos")
    }
    assert(e.getMessage.contains("unknown kernel"))
  }

  test("singular transforms are rejected") {
    intercept[IllegalArgumentException] {
      Regrid.AffineTransform(1.0, 2.0, 0.0, 2.0, 4.0, 0.0).inverse
    }
    intercept[IllegalArgumentException] {
      Regrid.ProjectiveTransform(1, 2, 3, 2, 4, 6, 0, 0, 1).inverse
    }
  }

  // ---- UTM <-> geographic (Snyder series; feature_stacking.py:85-96) ----

  /** Evaluate a Transform2D on literal points through a real plan. */
  private def evalXform(t: Regrid.Transform2D, pts: Seq[(Double, Double)]): Seq[(Double, Double)] = {
    import spark.implicits._
    val df = pts.toDF("x", "y")
    val (ox, oy) = t(org.apache.spark.sql.functions.col("x"),
      org.apache.spark.sql.functions.col("y"))
    df.select(ox.as("ox"), oy.as("oy")).as[(Double, Double)].collect().toSeq
  }

  test("UTM forward hits published anchor values") {
    // central meridian of zone 33 is 15E: maps to false easting exactly;
    // the equator maps to northing 0; 45N on the central meridian is the
    // scaled WGS84 meridian arc (Snyder table: M(45) = 4984944.38 m).
    val fwd = Regrid.UtmFromGeographic(33)
    val out = evalXform(fwd, Seq((15.0, 0.0), (15.0, 45.0)))
    assert(math.abs(out(0)._1 - 500000.0) < 1e-6 && math.abs(out(0)._2) < 1e-6)
    assert(math.abs(out(1)._1 - 500000.0) < 1e-6)
    assert(math.abs(out(1)._2 - 0.9996 * 4984944.38) < 1.0)
    // southern-hemisphere false northing
    val south = evalXform(Regrid.UtmFromGeographic(33, southern = true), Seq((15.0, 0.0)))
    assert(math.abs(south(0)._2 - 10000000.0) < 1e-6)
  }

  test("UTM forward/inverse round-trip to sub-millimeter inside the zone") {
    val fwd = Regrid.UtmFromGeographic(33)
    val pts = for (lon <- Seq(12.5, 15.0, 17.3); lat <- Seq(-60.0, -5.0, 0.1, 48.017, 71.5))
      yield (lon, lat)
    val utm = evalXform(fwd, pts)
    val back = evalXform(fwd.inverse, utm)
    pts.zip(back).foreach { case ((lon, lat), (lon2, lat2)) =>
      // 1e-8 degrees is ~1 mm of ground distance
      assert(math.abs(lon - lon2) < 1e-8 && math.abs(lat - lat2) < 1e-8,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  test("UTM zone bounds are validated") {
    intercept[IllegalArgumentException](Regrid.UtmFromGeographic(0))
    intercept[IllegalArgumentException](Regrid.GeographicFromUtm(61))
  }

  test("Web-Mercator forward hits published anchor values") {
    // EPSG:3857 world edge: lon 180 maps to pi*R = 20037508.342789244 m;
    // the equator maps to y = 0; lon 0 maps to x = 0.
    val pts = Seq((180.0, 0.0), (0.0, 0.0), (90.0, 0.0))
    val out = evalXform(Regrid.WebMercatorFromGeographic, pts)
    assert(math.abs(out(0)._1 - 20037508.342789244) < 1e-6)
    assert(math.abs(out(0)._2) < 1e-9 && math.abs(out(1)._1) < 1e-9)
    assert(math.abs(out(2)._1 - 20037508.342789244 / 2) < 1e-6)
    // the projection truncation latitude: y(85.05112878°) ≈ pi*R (square world)
    val top = evalXform(Regrid.WebMercatorFromGeographic, Seq((0.0, 85.05112878)))
    assert(math.abs(top(0)._2 - 20037508.342789244) < 0.5)
  }

  test("Web-Mercator forward/inverse round-trip to sub-millimeter") {
    val pts = for (lon <- Seq(-179.0, -12.5, 0.0, 139.7); lat <- Seq(-80.0, -5.0, 0.1, 35.68, 84.0))
      yield (lon, lat)
    val merc = evalXform(Regrid.WebMercatorFromGeographic, pts)
    val back = evalXform(Regrid.WebMercatorFromGeographic.inverse, merc)
    pts.zip(back).foreach { case ((lon, lat), (lon2, lat2)) =>
      assert(math.abs(lon - lon2) < 1e-8 && math.abs(lat - lat2) < 1e-8,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  // ---- Lambert conformal conic (Snyder 15-1..15-11, 3-5) ----

  test("LCC construction invariants: unit scale on both standard parallels, origin anchor") {
    val p = Regrid.LccParams(33.0, 45.0, 23.0, -96.0)
    // the secant cone touches the ellipsoid exactly at the two standard
    // parallels: k(phi1) = k(phi2) = 1 by construction — a formula error
    // in t/m/n/F breaks this immediately
    assert(math.abs(p.scaleAt(33.0) - 1.0) < 1e-12)
    assert(math.abs(p.scaleAt(45.0) - 1.0) < 1e-12)
    // scale grows away from the parallels (conic distortion profile)
    assert(p.scaleAt(23.0) > 1.0 && p.scaleAt(49.0) > 1.0 && p.scaleAt(39.0) < 1.0)
    // the grid origin (lon0, phi0) maps to exactly (FE, FN)
    val out = evalXform(Regrid.LambertConformalFromGeographic(p), Seq((-96.0, 23.0)))
    assert(math.abs(out(0)._1) < 1e-9 && math.abs(out(0)._2) < 1e-9)
    val fe = Regrid.LccParams(33.0, 45.0, 23.0, -96.0, falseEasting = 2000000.0, falseNorthing = 500000.0)
    val out2 = evalXform(Regrid.LambertConformalFromGeographic(fe), Seq((-96.0, 23.0)))
    assert(math.abs(out2(0)._1 - 2000000.0) < 1e-9 && math.abs(out2(0)._2 - 500000.0) < 1e-9)
  }

  test("LCC ellipsoidal forward agrees with an independent spherical formulation as e -> 0") {
    // with e2 = 0 the ellipsoidal series degenerates to the textbook
    // sphere case: n = ln(cos p1 / cos p2) / ln(tan(pi/4+p2/2)/tan(pi/4+p1/2)),
    // rho = a F / tan(pi/4+phi/2)^n — coded here independently of the
    // Transform2D implementation
    val R = 6370997.0
    val p = Regrid.LccParams(33.0, 45.0, 23.0, -96.0, a = R, e2 = 0.0)
    val d2r = math.Pi / 180
    def sphere(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val (p1, p2, p0, l0) = (33.0 * d2r, 45.0 * d2r, 23.0 * d2r, -96.0 * d2r)
      val n = math.log(math.cos(p1) / math.cos(p2)) /
        math.log(math.tan(math.Pi / 4 + p2 / 2) / math.tan(math.Pi / 4 + p1 / 2))
      val f = math.cos(p1) * math.pow(math.tan(math.Pi / 4 + p1 / 2), n) / n
      def rho(phi: Double) = R * f / math.pow(math.tan(math.Pi / 4 + phi / 2), n)
      val theta = n * (lonDeg * d2r - l0)
      (rho(latDeg * d2r) * math.sin(theta), rho(p0) - rho(latDeg * d2r) * math.cos(theta))
    }
    val pts = Seq((-96.0, 39.0), (-75.0, 35.0), (-120.0, 41.5), (-96.0, 23.0))
    val got = evalXform(Regrid.LambertConformalFromGeographic(p), pts)
    pts.zip(got).foreach { case ((lon, lat), (x, y)) =>
      val (ex, ey) = sphere(lon, lat)
      assert(math.abs(x - ex) < 1e-6 && math.abs(y - ey) < 1e-6,
        s"($lon,$lat): got ($x,$y) expected ($ex,$ey)")
    }
  }

  test("LCC forward/inverse round-trip to sub-millimeter across the cone") {
    val p = Regrid.LccParams(33.0, 45.0, 23.0, -96.0)
    val fwd = Regrid.LambertConformalFromGeographic(p)
    val pts = for (lon <- Seq(-120.0, -96.0, -75.0); lat <- Seq(24.0, 33.0, 39.1, 45.0, 52.0))
      yield (lon, lat)
    val xy = evalXform(fwd, pts)
    val back = evalXform(fwd.inverse, xy)
    pts.zip(back).foreach { case ((lon, lat), (lon2, lat2)) =>
      assert(math.abs(lon - lon2) < 1e-8 && math.abs(lat - lat2) < 1e-8,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
    // southern-hemisphere cone (negative n) round-trips too
    val ps = Regrid.LccParams(-30.0, -45.0, -20.0, 135.0)
    val fs = Regrid.LambertConformalFromGeographic(ps)
    assert(ps.n < 0)
    val spts = Seq((120.0, -25.0), (135.0, -37.0), (150.0, -44.0))
    val sxy = evalXform(fs, spts)
    val sback = evalXform(fs.inverse, sxy)
    spts.zip(sback).foreach { case ((lon, lat), (lon2, lat2)) =>
      assert(math.abs(lon - lon2) < 1e-8 && math.abs(lat - lat2) < 1e-8,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  // ---- Albers equal-area conic (Snyder 14-1..14-11, 3-18) ----

  test("Albers invariants: unit scale on both standard parallels, origin anchor") {
    val p = Regrid.AeaParams(29.5, 45.5, 23.0, -96.0)
    assert(math.abs(p.scaleAt(29.5) - 1.0) < 1e-12)
    assert(math.abs(p.scaleAt(45.5) - 1.0) < 1e-12)
    // between the parallels the PARALLEL scale dips below 1 (meridian
    // scale is its reciprocal — that's the equal-area property)
    assert(p.scaleAt(37.5) < 1.0 && p.scaleAt(23.0) > 1.0 && p.scaleAt(49.0) > 1.0)
    val out = evalXform(Regrid.AlbersFromGeographic(p), Seq((-96.0, 23.0)))
    assert(math.abs(out(0)._1) < 1e-9 && math.abs(out(0)._2) < 1e-9)
  }

  test("Albers preserves area: a small quad keeps its ellipsoid area on the plane") {
    // equal-area acid test: the projected area of a small geographic
    // quad equals its authalic-sphere area to first order, anywhere in
    // the cone — compare two quads far apart in latitude
    val p = Regrid.AeaParams(29.5, 45.5, 23.0, -96.0)
    val fwd = Regrid.AlbersFromGeographic(p)
    def quadArea(lon: Double, lat: Double, d: Double): Double = {
      val pts = evalXform(fwd, Seq((lon, lat), (lon + d, lat), (lon + d, lat + d), (lon, lat + d)))
      // shoelace
      math.abs((0 until 4).map { i =>
        val (x1, y1) = pts(i); val (x2, y2) = pts((i + 1) % 4)
        x1 * y2 - x2 * y1
      }.sum / 2)
    }
    // ellipsoid patch area: dA = M·N·cosφ dφ dλ (exact to first order)
    def patchArea(lat: Double, d: Double): Double = {
      val phi = lat * math.Pi / 180
      val s = math.sin(phi)
      val w2 = 1 - Regrid.Utm.E2 * s * s
      val m = Regrid.Utm.A * (1 - Regrid.Utm.E2) / (w2 * math.sqrt(w2))
      val n = Regrid.Utm.A / math.sqrt(w2)
      val dr = d * math.Pi / 180
      m * n * math.cos(phi + dr / 2) * dr * dr
    }
    for (lat <- Seq(25.0, 37.5, 48.0)) {
      val got = quadArea(-96.0, lat, 0.01)
      val want = patchArea(lat, 0.01)
      assert(math.abs(got / want - 1.0) < 1e-5, s"lat=$lat got=$got want=$want")
    }
  }

  test("Albers forward/inverse round-trip (series truncation ~1e-8 deg)") {
    val p = Regrid.AeaParams(29.5, 45.5, 23.0, -96.0)
    val fwd = Regrid.AlbersFromGeographic(p)
    val pts = for (lon <- Seq(-120.0, -96.0, -75.0); lat <- Seq(24.0, 29.5, 38.35, 45.5, 52.0))
      yield (lon, lat)
    val xy = evalXform(fwd, pts)
    val back = evalXform(fwd.inverse, xy)
    pts.zip(back).foreach { case ((lon, lat), (lon2, lat2)) =>
      assert(math.abs(lon - lon2) < 1e-7 && math.abs(lat - lat2) < 1e-7,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  // ---- datum shift (abridged Molodensky) + composition ----

  test("parameterized TM reproduces the pinned UTM pair bit-for-bit on UTM parameters") {
    val utm = Regrid.UtmFromGeographic(33)
    val gen = Regrid.TransverseMercatorFromGeographic(Regrid.TmParams(15.0))
    val pts = for (lon <- Seq(12.0, 15.0, 17.9); lat <- Seq(-40.0, 0.0, 38.7, 71.2))
      yield (lon, lat)
    evalXform(utm, pts).zip(evalXform(gen, pts)).foreach { case ((ux, uy), (gx, gy)) =>
      // exact double equality: same series, same constants, and the
      // M(phi0)=0 offset subtracts an exact zero
      assert(ux == gx && uy == gy, s"($ux,$uy) vs ($gx,$gy)")
    }
    evalXform(utm.inverse, pts.map(p => (p._1 * 40000, p._2 * 50000)))
      .zip(evalXform(gen.inverse, pts.map(p => (p._1 * 40000, p._2 * 50000))))
      .foreach { case ((ux, uy), (gx, gy)) =>
        assert(ux == gx && uy == gy, s"inverse ($ux,$uy) vs ($gx,$gy)")
      }
  }

  test("parameterized TM: GRS80 ellipsoid + nonzero origin round-trips sub-millimeter") {
    val grs80 = Regrid.Ellipsoid(6378137.0, 298.257222101)
    // a Gauss-Krüger-ish zone: k0=1, lat0=40, offset origins, GRS80
    val p = Regrid.TmParams(-93.0, 40.0, 1.0, 250000.0, 100000.0, grs80.a, grs80.e2)
    val fwd = Regrid.TransverseMercatorFromGeographic(p)
    // the grid origin maps to exactly (FE, FN): M(phi0) cancels M(phi)
    val at0 = evalXform(fwd, Seq((-93.0, 40.0)))
    assert(math.abs(at0(0)._1 - 250000.0) < 1e-9 &&
      math.abs(at0(0)._2 - 100000.0) < 1e-9, at0(0).toString)
    val pts = for (lon <- Seq(-95.5, -93.0, -90.2); lat <- Seq(30.0, 40.0, 48.9))
      yield (lon, lat)
    evalXform(fwd.inverse, evalXform(fwd, pts)).zip(pts).foreach {
      case ((lon2, lat2), (lon, lat)) =>
        assert(math.abs(lon - lon2) < 1e-8 && math.abs(lat - lat2) < 1e-8,
          s"($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  // ---- polar stereographic (Snyder 21-30..21-41, 3-5) ----

  test("Polar stereographic invariants: unit scale at the standard parallel, pole anchor") {
    val n = Regrid.PsParams(70.0, -45.0) // EPSG:3413
    assert(math.abs(n.scaleAt(70.0) - 1.0) < 1e-12)
    // azimuthal distortion profile: shrinks toward the pole, grows away
    assert(n.scaleAt(89.0) < 1.0 && n.scaleAt(55.0) > 1.0)
    // the pole maps to exactly (FE, FN) at any longitude (t(90) = 0)
    val fwd = Regrid.PolarStereographicFromGeographic(n)
    val atPole = evalXform(fwd, Seq((0.0, 90.0), (123.0, 90.0)))
    atPole.foreach { case (x, y) =>
      assert(math.abs(x) < 1e-9 && math.abs(y) < 1e-9) }
    // on the central meridian at the standard parallel: x = 0,
    // y = -a·m(70) (ρ = a·m_c exactly there, independent mini-formula)
    val e2 = Regrid.Ellipsoid.Wgs84.e2
    val s70 = math.sin(70.0 * math.Pi / 180)
    val m70 = math.cos(70.0 * math.Pi / 180) / math.sqrt(1 - e2 * s70 * s70)
    val onCm = evalXform(fwd, Seq((-45.0, 70.0)))
    assert(math.abs(onCm(0)._1) < 1e-9)
    assert(math.abs(onCm(0)._2 - (-6378137.0 * m70)) < 1e-6,
      s"y = ${onCm(0)._2}, expected ${-6378137.0 * m70}")
    // the variant-A spelling (parallel at the pole) rejects
    intercept[IllegalArgumentException](Regrid.PsParams(90.0, 0.0))
    intercept[IllegalArgumentException](Regrid.PsParams(-90.0, 0.0))
  }

  test("Polar stereographic ellipsoidal forward degenerates to the textbook sphere as e -> 0") {
    // sphere: rho = R(1 + sin phi_c)·tan(pi/4 − phi/2) (half-angle identity
    // collapses m_c/t(phi_c)), x = rho sin(dlam), y = −rho cos(dlam) —
    // coded independently of the Transform2D implementation
    val R = 6370997.0
    val p = Regrid.PsParams(70.0, -45.0, a = R, e2 = 0.0)
    val d2r = math.Pi / 180
    def sphere(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val rho = R * (1 + math.sin(70.0 * d2r)) * math.tan(math.Pi / 4 - latDeg * d2r / 2)
      val dlam = (lonDeg - (-45.0)) * d2r
      (rho * math.sin(dlam), -rho * math.cos(dlam))
    }
    val pts = Seq((-45.0, 70.0), (0.0, 75.0), (90.0, 82.0), (-135.0, 65.0), (180.0, 88.0))
    val got = evalXform(Regrid.PolarStereographicFromGeographic(p), pts)
    pts.zip(got).foreach { case ((lon, lat), (x, y)) =>
      val (ex, ey) = sphere(lon, lat)
      assert(math.abs(x - ex) < 1e-6 && math.abs(y - ey) < 1e-6,
        s"($lon,$lat): got ($x,$y) expected ($ex,$ey)")
    }
  }

  test("Polar stereographic round-trips sub-millimeter, both aspects, with false offsets") {
    val north = Regrid.PolarStereographicFromGeographic(
      Regrid.PsParams(70.0, -45.0, falseEasting = 100000.0, falseNorthing = -200000.0))
    val npts = for (lon <- Seq(-180.0, -45.0, 0.0, 120.0); lat <- Seq(60.0, 70.0, 85.0, 89.9))
      yield (lon, lat)
    evalXform(north.inverse, evalXform(north, npts)).zip(npts).foreach {
      case ((lon2, lat2), (lon, lat)) =>
        assert(math.abs(lon - lon2) < 1e-8 && math.abs(lat - lat2) < 1e-8,
          s"($lon,$lat) -> ($lon2,$lat2)")
    }
    // south aspect (EPSG:3031 parameters): quadrant orientation matches
    // the PROJ convention — along lon0 toward the equator, y is POSITIVE
    val sp = Regrid.PsParams(-71.0, 0.0)
    val south = Regrid.PolarStereographicFromGeographic(sp)
    val at0 = evalXform(south, Seq((0.0, -75.0), (90.0, -75.0)))
    assert(at0(0)._2 > 0 && math.abs(at0(0)._1) < 1e-9, at0(0).toString)
    assert(at0(1)._1 > 0 && math.abs(at0(1)._2) < 1e-9, at0(1).toString) // 90E -> +x
    assert(math.abs(sp.scaleAt(-71.0) - 1.0) < 1e-12)
    val spts = for (lon <- Seq(-120.0, 0.0, 45.0, 179.0); lat <- Seq(-60.0, -71.0, -89.5))
      yield (lon, lat)
    evalXform(south.inverse, evalXform(south, spts)).zip(spts).foreach {
      case ((lon2, lat2), (lon, lat)) =>
        assert(math.abs(lon - lon2) < 1e-8 && math.abs(lat - lat2) < 1e-8,
          s"($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  test("Molodensky WGS84->Tokyo reproduces the published ~11.6 arcsec offset over Tokyo") {
    // EPSG Tokyo->WGS84 shift is (-146.414, 507.337, 680.507); going the
    // other way, a point near Tokyo must move ≈ -11.6" in lat, +11.6" in
    // lon (the classic documented Tokyo-Datum offset, ~360 m ground)
    val t = Regrid.AbridgedMolodensky(146.414, -507.337, -680.507,
      Regrid.Ellipsoid.Wgs84, Regrid.Ellipsoid.Bessel1841)
    val Seq((lon2, lat2)) = evalXform(t, Seq((139.68, 35.68)))
    val dLatAs = (lat2 - 35.68) * 3600
    val dLonAs = (lon2 - 139.68) * 3600
    assert(math.abs(dLatAs - -11.65) < 0.1, s"dLat=$dLatAs arcsec")
    assert(math.abs(dLonAs - 11.62) < 0.1, s"dLon=$dLonAs arcsec")
  }

  test("Molodensky inverse closes to sub-centimeter (abridged reciprocal)") {
    val fwd = Regrid.AbridgedMolodensky(146.414, -507.337, -680.507,
      Regrid.Ellipsoid.Wgs84, Regrid.Ellipsoid.Bessel1841)
    val pts = for (lon <- Seq(129.5, 139.68, 145.2); lat <- Seq(26.0, 35.68, 44.9))
      yield (lon, lat)
    val shifted = evalXform(fwd, pts)
    val back = evalXform(fwd.inverse, shifted)
    // the abridged formulas are reciprocal only to their own truncation
    // order: ~1e-7 degrees (~1 cm) closure, far below the 360 m signal
    pts.zip(back).foreach { case ((lon, lat), (lon2, lat2)) =>
      assert(math.abs(lon - lon2) < 1e-6 && math.abs(lat - lat2) < 1e-6,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  test("ComposedTransform chains and inverts in the right order") {
    // Web-Mercator -> geographic -> datum shift, inverted back
    val chain = Regrid.ComposedTransform(
      Regrid.GeographicFromWebMercator,
      Regrid.AbridgedMolodensky(146.414, -507.337, -680.507,
        Regrid.Ellipsoid.Wgs84, Regrid.Ellipsoid.Bessel1841))
    val pts = Seq((15550000.0, 4260000.0), (15551000.0, 4259000.0))
    val out = evalXform(chain, pts)
    val back = evalXform(chain.inverse, out)
    pts.zip(back).foreach { case ((x, y), (x2, y2)) =>
      assert(math.abs(x - x2) < 0.2 && math.abs(y - y2) < 0.2,
        s"($x,$y) -> ($x2,$y2)") // meters; dominated by the ~1e-6 deg
    } // Molodensky abridged-reciprocal closure (~0.1 m), not composition
    // composition applies first-then-second: the first leg alone must
    // reproduce the Web-Mercator inverse
    val direct = evalXform(Regrid.GeographicFromWebMercator, pts)
    val shiftedOnly = evalXform(Regrid.AbridgedMolodensky(146.414, -507.337, -680.507,
      Regrid.Ellipsoid.Wgs84, Regrid.Ellipsoid.Bessel1841), direct)
    out.zip(shiftedOnly).foreach { case ((a1, b1), (a2, b2)) =>
      assert(math.abs(a1 - a2) < 1e-12 && math.abs(b1 - b2) < 1e-12)
    }
  }

  test("polar stereographic variant A (k0 at pole): B-equivalence, pole anchor, round trip") {
    import Regrid.{PsParams, PolarStereographicFromGeographic}
    // a variant-B projection IS a variant-A one with k0 = rhoF_B / rhoF_A(k0=1)
    // (both scale the same t-kernel) — the standard EPSG equivalence
    val vb = PsParams(70.0, -45.0)
    val k0equiv = vb.rhoF / PsParams(90.0, -45.0, k0Pole = Some(1.0)).rhoF
    val va = PsParams(90.0, -45.0, k0Pole = Some(k0equiv))
    val pts = for (lon <- Seq(-170.0, -45.3, 60.7); lat <- Seq(61.2, 75.8, 88.4))
      yield (lon, lat)
    evalXform(PolarStereographicFromGeographic(vb), pts)
      .zip(evalXform(PolarStereographicFromGeographic(va), pts))
      .foreach { case ((xb, yb), (xa, ya)) =>
        assert(math.abs(xb - xa) < 1e-6 && math.abs(yb - ya) < 1e-6,
          s"($xb,$yb) vs ($xa,$ya)")
      }
    // UPS North: the pole maps to (FE, FN) exactly
    val ups = PsParams(90.0, 0.0, 2000000.0, 2000000.0, k0Pole = Some(0.994))
    val Seq((px, py)) = evalXform(PolarStereographicFromGeographic(ups), Seq((37.0, 90.0)))
    assert(px == 2000000.0 && math.abs(py - 2000000.0) < 1e-9, s"($px,$py)")
    // round trip closes
    val fwd = PolarStereographicFromGeographic(ups)
    val back = evalXform(fwd.inverse, evalXform(fwd, pts))
    pts.zip(back).foreach { case ((lon, lat), (lon2, lat2)) =>
      assert(math.abs(lon - lon2) < 1e-9 && math.abs(lat - lat2) < 1e-9,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
    // WKT1 .prj with a pole latitude_of_origin dispatches variant A, and
    // the EPSG:5041 shorthand is the identical parameterization
    import graft.operators.CrsWkt
    val upsWkt =
      """PROJCS["WGS 84 / UPS North (E,N)",GEOGCS["WGS 84",DATUM["WGS_1984",""" +
        """SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],""" +
        """UNIT["degree",0.0174532925199433]],PROJECTION["Polar_Stereographic"],""" +
        """PARAMETER["latitude_of_origin",90],PARAMETER["central_meridian",0],""" +
        """PARAMETER["scale_factor",0.994],PARAMETER["false_easting",2000000],""" +
        """PARAMETER["false_northing",2000000],UNIT["metre",1]]"""
    assert(CrsWkt.parseCrs(upsWkt).asInstanceOf[CrsWkt.Projected].forward ==
      CrsWkt.parseCrs("EPSG:5041").asInstanceOf[CrsWkt.Projected].forward)
  }

  // DHDN → WGS84 Bursa–Wolf parameters (the published German national set)
  private val Dhdn7 = (598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7)

  test("Helmert: pure Z rotation shifts longitude by exactly the rotation angle") {
    // position-vector convention: +rz rotates X toward Y → lon' = lon + rz.
    // Z and p are (to O(rz²)) unchanged, so latitude must not move.
    val eps = 1.5 // arc-seconds
    val t = Regrid.HelmertDatumShift(0, 0, 0, 0, 0, eps, 0,
      Regrid.Ellipsoid.Wgs84, Regrid.Ellipsoid.Wgs84)
    val pts = Seq((7.5, 47.6), (-120.0, -33.0), (139.68, 35.68))
    evalXform(t, pts).zip(pts).foreach { case ((lon2, lat2), (lon, lat)) =>
      assert(math.abs((lon2 - lon) * 3600.0 - eps) < 1e-6,
        s"dLon=${(lon2 - lon) * 3600}")
      assert(math.abs(lat2 - lat) < 1e-8, s"dLat=${lat2 - lat}")
    }
  }

  test("Helmert fwd ∘ inverse closes horizontally (exact matrix inverse)") {
    val (dx, dy, dz, rx, ry, rz, ds) = Dhdn7
    val fwd = Regrid.HelmertDatumShift(dx, dy, dz, rx, ry, rz, ds,
      Regrid.Ellipsoid.Bessel1841, Regrid.Ellipsoid.Wgs84)
    val pts = for (lon <- Seq(6.1, 9.7, 13.4); lat <- Seq(47.5, 50.2, 54.8))
      yield (lon, lat)
    val back = evalXform(fwd.inverse, evalXform(fwd, pts))
    // the affine XYZ leg inverts exactly; the only residual is Bowring's
    // h=0 re-projection of the ~0-500 m induced ellipsoidal height —
    // second-order in horizontal position (sub-millimetre)
    pts.zip(back).foreach { case ((lon, lat), (lon2, lat2)) =>
      assert(math.abs(lon - lon2) < 1e-8 && math.abs(lat - lat2) < 1e-8,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  test("Helmert translation-only agrees with abridged Molodensky to its truncation") {
    val (tx, ty, tz) = (146.414, -507.337, -680.507)
    val exact = Regrid.HelmertDatumShift(tx, ty, tz, 0, 0, 0, 0,
      Regrid.Ellipsoid.Wgs84, Regrid.Ellipsoid.Bessel1841)
    val abridged = Regrid.AbridgedMolodensky(tx, ty, tz,
      Regrid.Ellipsoid.Wgs84, Regrid.Ellipsoid.Bessel1841)
    val pts = Seq((129.5, 26.0), (139.68, 35.68), (145.2, 44.9))
    evalXform(exact, pts).zip(evalXform(abridged, pts)).foreach {
      case ((lonE, latE), (lonA, latA)) =>
        // abridged drops the Δh-coupled terms: agreement ~1e-5 deg (~1 m)
        assert(math.abs(lonE - lonA) < 1e-4 && math.abs(latE - latA) < 1e-4,
          s"exact ($lonE,$latE) vs abridged ($lonA,$latA)")
    }
  }

  test("7-param TOWGS84 in WKT routes through the composed geocentric Helmert") {
    import graft.operators.CrsWkt
    val (dx, dy, dz, rx, ry, rz, ds) = Dhdn7
    val dhdn = "GEOGCS[\"DHDN\",DATUM[\"Deutsches_Hauptdreiecksnetz\"," +
      "SPHEROID[\"Bessel 1841\",6377397.155,299.1528128]," +
      s"TOWGS84[$dx,$dy,$dz,$rx,$ry,$rz,$ds]]," +
      "PRIMEM[\"Greenwich\",0],UNIT[\"degree\",0.0174532925199433]]"
    val wgs84 = "GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\"," +
      "SPHEROID[\"WGS 84\",6378137,298.257223563]],PRIMEM[\"Greenwich\",0]," +
      "UNIT[\"degree\",0.0174532925199433]]"
    val t = CrsWkt.transformBetween(dhdn, wgs84)
    // the g15 structural-proof shape: WGS84's identity leg folds away
    // exactly, so the dispatch must equal the hand-built single Helmert
    // in every double slot (case-class equality)
    val want = Regrid.HelmertDatumShift(dx, dy, dz, rx, ry, rz, ds,
      Regrid.Ellipsoid.Bessel1841, Regrid.Ellipsoid.Wgs84)
    assert(t == want, s"$t")
    // and 3-param TOWGS84 still routes through abridged Molodensky
    val tokyo3 = "GEOGCS[\"Tokyo\",DATUM[\"Tokyo\"," +
      "SPHEROID[\"Bessel 1841\",6377397.155,299.1528128]," +
      "TOWGS84[-146.414,507.337,680.507]],PRIMEM[\"Greenwich\",0]," +
      "UNIT[\"degree\",0.0174532925199433]]"
    assert(CrsWkt.transformBetween(tokyo3, wgs84)
      .isInstanceOf[Regrid.AbridgedMolodensky])
  }
}
