package graft

import graft.operators.{CrsWkt, Regrid}
import graft.operators.Regrid._
import org.scalatest.funsuite.AnyFunSuite

/** WKT1 → Transform2D dispatch: the GDAL and ESRI spellings of each
  * implemented family resolve to the exact transform constants the g6-g10
  * queries hash against; everything outside the surface rejects loudly.
  */
class CrsWktSpec extends AnyFunSuite {

  private val GdalWgs84Geo =
    "GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\",SPHEROID[\"WGS 84\",6378137,298.257223563]]," +
      "PRIMEM[\"Greenwich\",0],UNIT[\"degree\",0.0174532925199433]]"
  private val EsriWgs84Geo = // ESRI: GCS_/D_ prefixes, underscored spheroid
    "GEOGCS[\"GCS_WGS_1984\",DATUM[\"D_WGS_1984\",SPHEROID[\"WGS_1984\",6378137.0,298.257223563]]," +
      "PRIMEM[\"Greenwich\",0.0],UNIT[\"Degree\",0.0174532925199433]]"

  private def utmProjcs(zone: Int, geogcs: String = GdalWgs84Geo,
      fn: Double = 0.0, unit: String = "UNIT[\"metre\",1]"): String = {
    val cm = Utm.centralMeridianDeg(zone)
    s"""PROJCS["WGS 84 / UTM zone $zone",$geogcs,PROJECTION["Transverse_Mercator"],""" +
      s"""PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",$cm],""" +
      s"""PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],""" +
      s"""PARAMETER["false_northing",$fn],$unit]"""
  }

  test("GDAL UTM PROJCS parses to the exact UtmFromGeographic transform") {
    val crs = CrsWkt.parseCrs(utmProjcs(33))
    assert(crs == CrsWkt.Projected(
      CrsWkt.GeogCrs("WGS_1984", Ellipsoid.Wgs84, (0.0, 0.0, 0.0)),
      UtmFromGeographic(33)))
    // southern-hemisphere false northing flips the flag
    val south = CrsWkt.parseCrs(utmProjcs(54, fn = 10000000.0))
    assert(south.asInstanceOf[CrsWkt.Projected].forward == UtmFromGeographic(54, southern = true))
  }

  test("ESRI spelling drift (GCS_/D_ prefixes, capitalized parameters) resolves identically") {
    val esri =
      s"""PROJCS["WGS_1984_UTM_Zone_33N",$EsriWgs84Geo,PROJECTION["Transverse_Mercator"],""" +
        """PARAMETER["False_Easting",500000.0],PARAMETER["False_Northing",0.0],""" +
        """PARAMETER["Central_Meridian",15.0],PARAMETER["Scale_Factor",0.9996],""" +
        """PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]"""
    assert(CrsWkt.parseCrs(esri).asInstanceOf[CrsWkt.Projected].forward ==
      UtmFromGeographic(33))
    // the () bracket variant of WKT1 parses identically
    val parens = esri.replace("[", "(").replace("]", ")")
    assert(CrsWkt.parseCrs(parens).asInstanceOf[CrsWkt.Projected].forward ==
      UtmFromGeographic(33))
  }

  test("LCC 2SP and Albers dispatch with their parameters (GDAL + ESRI names)") {
    val lcc =
      s"""PROJCS["NAD83 / Conus Albers-ish",$GdalWgs84Geo,PROJECTION["Lambert_Conformal_Conic_2SP"],""" +
        """PARAMETER["standard_parallel_1",33],PARAMETER["standard_parallel_2",45],""" +
        """PARAMETER["latitude_of_origin",23],PARAMETER["central_meridian",-96],""" +
        """PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1]]"""
    assert(CrsWkt.parseCrs(lcc).asInstanceOf[CrsWkt.Projected].forward ==
      LambertConformalFromGeographic(LccParams(33.0, 45.0, 23.0, -96.0)))
    // ESRI drops the _2SP suffix
    val esriLcc = lcc.replace("Lambert_Conformal_Conic_2SP", "Lambert_Conformal_Conic")
    assert(CrsWkt.parseCrs(esriLcc).asInstanceOf[CrsWkt.Projected].forward ==
      LambertConformalFromGeographic(LccParams(33.0, 45.0, 23.0, -96.0)))
    val aea =
      s"""PROJCS["Albers",$GdalWgs84Geo,PROJECTION["Albers_Conic_Equal_Area"],""" +
        """PARAMETER["standard_parallel_1",29.5],PARAMETER["standard_parallel_2",45.5],""" +
        """PARAMETER["latitude_of_origin",23],PARAMETER["central_meridian",-96],UNIT["metre",1]]"""
    assert(CrsWkt.parseCrs(aea).asInstanceOf[CrsWkt.Projected].forward ==
      AlbersFromGeographic(AeaParams(29.5, 45.5, 23.0, -96.0)))
  }

  test("Web-Mercator spellings resolve; Tokyo GEOGCS carries the published datum") {
    val merc =
      s"""PROJCS["WGS 84 / Pseudo-Mercator",$GdalWgs84Geo,PROJECTION["Mercator_1SP"],""" +
        """PARAMETER["central_meridian",0],PARAMETER["scale_factor",1],""" +
        """PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1]]"""
    assert(CrsWkt.parseCrs(merc).asInstanceOf[CrsWkt.Projected].forward ==
      WebMercatorFromGeographic)
    val tokyo =
      "GEOGCS[\"Tokyo\",DATUM[\"Tokyo\",SPHEROID[\"Bessel 1841\",6377397.155,299.1528128]," +
        "TOWGS84[-146.414,507.337,680.507]],PRIMEM[\"Greenwich\",0]," +
        "UNIT[\"degree\",0.0174532925199433]]"
    val t = CrsWkt.parseCrs(tokyo)
    assert(t == CrsWkt.Geographic(CrsWkt.GeogCrs(
      "TOKYO", Ellipsoid.Bessel1841, (-146.414, 507.337, 680.507))))
    // the named-datum table covers the same datum with no TOWGS84 node
    val tokyoNoShift = tokyo.replace(",TOWGS84[-146.414,507.337,680.507]", "")
    assert(CrsWkt.parseCrs(tokyoNoShift) == t)
  }

  test("transform chains: projection inverse -> datum shift -> projection forward") {
    // UTM(WGS84) -> geographic(WGS84): bare inverse, no shift
    assert(CrsWkt.transformBetween(utmProjcs(33), GdalWgs84Geo) == GeographicFromUtm(33))
    // geographic(WGS84) -> UTM(WGS84): bare forward
    assert(CrsWkt.transformBetween(GdalWgs84Geo, utmProjcs(33)) == UtmFromGeographic(33))
    // same CRS both sides: identity
    assert(CrsWkt.transformBetween(GdalWgs84Geo, GdalWgs84Geo) == IdentityTransform)
    assert(CrsWkt.transformBetween(EsriWgs84Geo, GdalWgs84Geo) == IdentityTransform)
    // UTM(WGS84) -> geographic(Tokyo): inverse THEN the g9 Molodensky
    val tokyo =
      "GEOGCS[\"Tokyo\",DATUM[\"Tokyo\",SPHEROID[\"Bessel 1841\",6377397.155,299.1528128]," +
        "TOWGS84[-146.414,507.337,680.507]],PRIMEM[\"Greenwich\",0]," +
        "UNIT[\"degree\",0.0174532925199433]]"
    assert(CrsWkt.transformBetween(utmProjcs(54), tokyo) ==
      ComposedTransform(GeographicFromUtm(54),
        AbridgedMolodensky(146.414, -507.337, -680.507,
          Ellipsoid.Wgs84, Ellipsoid.Bessel1841)))
    // geographic(Tokyo) -> UTM(WGS84): shift first, then forward
    assert(CrsWkt.transformBetween(tokyo, utmProjcs(54)) ==
      ComposedTransform(
        AbridgedMolodensky(-146.414, 507.337, 680.507,
          Ellipsoid.Bessel1841, Ellipsoid.Wgs84),
        UtmFromGeographic(54)))
  }

  test("everything outside the surface rejects loudly") {
    def rejects(wkt: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](CrsWkt.parseCrs(wkt))
      assert(e.getMessage.toLowerCase.contains(needle.toLowerCase),
        s"message '${e.getMessage}' lacks '$needle'")
    }
    // unknown projection method
    rejects(
      s"""PROJCS["sinu",$GdalWgs84Geo,PROJECTION["Sinusoidal"],PARAMETER["central_meridian",0],UNIT["metre",1]]""",
      "not implemented")
    // a UTM spelled in feet is no longer the pinned UTM parameterization
    // (the scaled false easting differs) — since r9 it dispatches the
    // parameterized TM wrapped in the exact foot-unit affine
    locally {
      val u = 0.304800609601219
      assert(CrsWkt.parseCrs(
          utmProjcs(33, unit = s"""UNIT["US survey foot",$u]"""))
        .asInstanceOf[CrsWkt.Projected].forward ==
        ComposedTransform(
          TransverseMercatorFromGeographic(TmParams(15.0, 0.0, 0.9996, 500000.0 * u, 0.0)),
          AffineTransform(1.0 / u, 0.0, 0.0, 0.0, 1.0 / u, 0.0)))
    }
    // nonsense unit factors reject rather than scale
    rejects(utmProjcs(33, unit = "UNIT[\"weird\",-1]"), "positive")
    // non-UTM transverse Mercator dispatches the PARAMETERIZED series
    // since r9 (it was a reject before): k0=1 Gauss-Krüger style and an
    // off-zone central meridian both resolve to TmParams chains
    assert(CrsWkt.parseCrs(utmProjcs(33).replace("0.9996", "1.0000"))
      .asInstanceOf[CrsWkt.Projected].forward ==
      TransverseMercatorFromGeographic(TmParams(15.0, 0.0, 1.0, 500000.0, 0.0)))
    assert(CrsWkt.parseCrs(
        utmProjcs(33).replace("\"central_meridian\",15", "\"central_meridian\",14"))
      .asInstanceOf[CrsWkt.Projected].forward ==
      TransverseMercatorFromGeographic(TmParams(14.0, 0.0, 0.9996, 500000.0, 0.0)))
    // unknown datum with no TOWGS84
    rejects(GdalWgs84Geo.replace("WGS_1984", "Unknown_Local_1901"), "named datum")
    // 7-param TOWGS84 with a rotation is ACCEPTED since r10 (the
    // geocentric Helmert path) — the parse carries all seven parameters
    val seven = CrsWkt.parseCrs(
      "GEOGCS[\"x\",DATUM[\"Tokyo\",SPHEROID[\"Bessel 1841\",6377397.155,299.1528128]," +
        "TOWGS84[-146.414,507.337,680.507,0,0,1.0,0]],PRIMEM[\"Greenwich\",0]," +
        "UNIT[\"degree\",0.0174532925199433]]")
    assert(seven.geog.toWgs84 == ((-146.414, 507.337, 680.507)))
    assert(seven.geog.rotWgs84 == ((0.0, 0.0, 1.0)))
    assert(seven.geog.scaleWgs84Ppm == 0.0)
    // wrong arity still rejects
    rejects(
      "GEOGCS[\"x\",DATUM[\"Tokyo\",SPHEROID[\"Bessel 1841\",6377397.155,299.1528128]," +
        "TOWGS84[-146.414,507.337]],PRIMEM[\"Greenwich\",0]," +
        "UNIT[\"degree\",0.0174532925199433]]",
      "3 or 7 parameters")
    // gradian angular unit
    rejects(GdalWgs84Geo.replace("\"degree\",0.0174532925199433", "\"grad\",0.01570796326794897"),
      "not degrees")
  }

  test("Polar stereographic: GDAL WKT1, ESRI spelling, and EPSG shorthand dispatch identically") {
    // the GDAL .prj for EPSG:3413 (standard parallel rides latitude_of_origin)
    val gdal3413 =
      s"""PROJCS["WGS 84 / NSIDC Sea Ice Polar Stereographic North",$GdalWgs84Geo,""" +
        """PROJECTION["Polar_Stereographic"],PARAMETER["latitude_of_origin",70],""" +
        """PARAMETER["central_meridian",-45],PARAMETER["scale_factor",1],""" +
        """PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1]]"""
    val expected = PolarStereographicFromGeographic(PsParams(70.0, -45.0))
    assert(CrsWkt.parseCrs(gdal3413).asInstanceOf[CrsWkt.Projected].forward == expected)
    assert(CrsWkt.parseCrs("EPSG:3413").asInstanceOf[CrsWkt.Projected].forward == expected)
    // ESRI spells the south aspect with its own projection name and
    // standard_parallel_1
    val esri3031 =
      s"""PROJCS["WGS_1984_Antarctic_Polar_Stereographic",$EsriWgs84Geo,""" +
        """PROJECTION["Stereographic_South_Pole"],PARAMETER["standard_parallel_1",-71.0],""" +
        """PARAMETER["central_meridian",0.0],PARAMETER["false_easting",0.0],""" +
        """PARAMETER["false_northing",0.0],UNIT["Meter",1.0]]"""
    assert(CrsWkt.parseCrs(esri3031).asInstanceOf[CrsWkt.Projected].forward ==
      PolarStereographicFromGeographic(PsParams(-71.0, 0.0)))
    assert(CrsWkt.parseCrs("EPSG:3976").asInstanceOf[CrsWkt.Projected].forward ==
      PolarStereographicFromGeographic(PsParams(-70.0, 0.0)))
    // a pole latitude_of_origin dispatches variant A since r10 (k0 = the
    // pole scale; 3413's spelling with lat 90 is UPS-style k0=1)
    val variantA = gdal3413.replace("\"latitude_of_origin\",70", "\"latitude_of_origin\",90")
    assert(CrsWkt.parseCrs(variantA).asInstanceOf[CrsWkt.Projected].forward ==
      PolarStereographicFromGeographic(PsParams(90.0, -45.0, k0Pole = Some(1.0))))
    // a non-1 scale factor with a NON-pole standard parallel still rejects
    val badK = gdal3413.replace("\"scale_factor\",1", "\"scale_factor\",0.994")
    val e2 = intercept[IllegalArgumentException](CrsWkt.parseCrs(badK))
    assert(e2.getMessage.contains("scale_factor") ||
      e2.getMessage.contains("variant B"))
  }

  test("US-survey-foot State Plane LCC dispatches bit-identical to the hand-built metre chain") {
    // NAD83 / Texas Central (ftUS) — the EPSG:2277 parameterization in
    // the GDAL .prj spelling (linear parameters in ftUS, per WKT1)
    val u = 0.30480060960121924 // 1200/3937, the US survey foot
    val feFt = 2296583.333333333
    val fnFt = 9842500.0
    val prj =
      "PROJCS[\"NAD83 / Texas Central (ftUS)\",GEOGCS[\"NAD83\"," +
        "DATUM[\"North_American_Datum_1983\",SPHEROID[\"GRS 1980\",6378137,298.257222101]]," +
        "PRIMEM[\"Greenwich\",0],UNIT[\"degree\",0.0174532925199433]]," +
        "PROJECTION[\"Lambert_Conformal_Conic_2SP\"]," +
        "PARAMETER[\"standard_parallel_1\",31.88333333333333]," +
        "PARAMETER[\"standard_parallel_2\",30.11666666666667]," +
        "PARAMETER[\"latitude_of_origin\",29.66666666666667]," +
        "PARAMETER[\"central_meridian\",-100.3333333333333]," +
        s"PARAMETER[\"false_easting\",$feFt]," +
        s"PARAMETER[\"false_northing\",$fnFt]," +
        s"UNIT[\"Foot_US\",$u]]"
    val grs80 = Ellipsoid(6378137.0, 298.257222101)
    val expected = ComposedTransform(
      LambertConformalFromGeographic(LccParams(
        31.88333333333333, 30.11666666666667, 29.66666666666667,
        -100.3333333333333, feFt * u, fnFt * u, grs80.a, grs80.e2)),
      AffineTransform(1.0 / u, 0.0, 0.0, 0.0, 1.0 / u, 0.0))
    // structural case-class equality = the SAME doubles in every slot:
    // the dispatched transform IS the hand-built metre chain + unit wrap
    assert(CrsWkt.parseCrs(prj) == CrsWkt.Projected(
      CrsWkt.GeogCrs("NORTH_AMERICAN_DATUM_1983", grs80, (0.0, 0.0, 0.0)),
      expected))
    // sanity: the zone origin lands at (FE, FN) in feet, and a point a
    // degree east is ~60 statute miles of eastings away
    val crs = CrsWkt.parseCrs(prj).asInstanceOf[CrsWkt.Projected]
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (x, y) = crs.forward(col("lon"), col("lat"))
    val r = Seq((-100.3333333333333, 29.66666666666667), (-99.3333333333333, 30.0))
      .toDF("lon", "lat").select(x.as("x"), y.as("y")).collect()
    assert(math.abs(r(0).getDouble(0) - feFt) < 1e-6, r(0).toString)
    assert(math.abs(r(0).getDouble(1) - fnFt) < 1e-6, r(0).toString)
    val dxFt = r(1).getDouble(0) - r(0).getDouble(0)
    assert(dxFt > 300000 && dxFt < 330000, s"one degree east = $dxFt ft")
    // WKT2 spelling (per-parameter LENGTHUNITs + CS unit) dispatches to
    // the very same chain
    val wkt2 =
      "PROJCRS[\"NAD83 / Texas Central (ftUS)\"," +
        "BASEGEOGCRS[\"NAD83\",DATUM[\"North American Datum 1983\"," +
        "ELLIPSOID[\"GRS 1980\",6378137,298.257222101,LENGTHUNIT[\"metre\",1]]]]," +
        "CONVERSION[\"SPCS83 Texas Central zone (US survey foot)\"," +
        "METHOD[\"Lambert Conic Conformal (2SP)\",ID[\"EPSG\",9802]]," +
        "PARAMETER[\"Latitude of false origin\",29.66666666666667," +
        "ANGLEUNIT[\"degree\",0.0174532925199433]]," +
        "PARAMETER[\"Longitude of false origin\",-100.3333333333333," +
        "ANGLEUNIT[\"degree\",0.0174532925199433]]," +
        "PARAMETER[\"Latitude of 1st standard parallel\",31.88333333333333," +
        "ANGLEUNIT[\"degree\",0.0174532925199433]]," +
        "PARAMETER[\"Latitude of 2nd standard parallel\",30.11666666666667," +
        "ANGLEUNIT[\"degree\",0.0174532925199433]]," +
        s"PARAMETER[\"Easting at false origin\",$feFt," +
        s"LENGTHUNIT[\"US survey foot\",$u]]," +
        s"PARAMETER[\"Northing at false origin\",$fnFt," +
        s"LENGTHUNIT[\"US survey foot\",$u]]]," +
        "CS[Cartesian,2]," +
        s"AXIS[\"easting (X)\",east,LENGTHUNIT[\"US survey foot\",$u]]," +
        s"AXIS[\"northing (Y)\",north,LENGTHUNIT[\"US survey foot\",$u]]]"
    assert(CrsWkt.parseCrs(wkt2).asInstanceOf[CrsWkt.Projected].forward == expected)
    // the EPSG shorthand resolves to the identical chain — code table,
    // .prj, and WKT2 all dispatch the same doubles
    assert(CrsWkt.parseCrs("EPSG:2277").asInstanceOf[CrsWkt.Projected].forward == expected)
  }

  test("WKT2 (GDAL >= 3 default output): PROJCRS/GEOGCRS resolve to the same transforms") {
    // a faithful `gdalsrsinfo -o wkt2` shape for EPSG:32654 — ensemble
    // datum, METHOD EPSG id, spelled-out parameter names, bare keywords
    // (Cartesian/east/north), USAGE/ID decorations
    val utm54 =
      """PROJCRS["WGS 84 / UTM zone 54N",
        |    BASEGEOGCRS["WGS 84",
        |        ENSEMBLE["World Geodetic System 1984 ensemble",
        |            MEMBER["World Geodetic System 1984 (Transit)"],
        |            MEMBER["World Geodetic System 1984 (G2296)"],
        |            ELLIPSOID["WGS 84",6378137,298.257223563,
        |                LENGTHUNIT["metre",1]],
        |            ENSEMBLEACCURACY[2.0]],
        |        PRIMEM["Greenwich",0,
        |            ANGLEUNIT["degree",0.0174532925199433]],
        |        ID["EPSG",4326]],
        |    CONVERSION["UTM zone 54N",
        |        METHOD["Transverse Mercator",
        |            ID["EPSG",9807]],
        |        PARAMETER["Latitude of natural origin",0,
        |            ANGLEUNIT["degree",0.0174532925199433],
        |            ID["EPSG",8801]],
        |        PARAMETER["Longitude of natural origin",141,
        |            ANGLEUNIT["degree",0.0174532925199433],
        |            ID["EPSG",8802]],
        |        PARAMETER["Scale factor at natural origin",0.9996,
        |            SCALEUNIT["unity",1],
        |            ID["EPSG",8805]],
        |        PARAMETER["False easting",500000,
        |            LENGTHUNIT["metre",1],
        |            ID["EPSG",8806]],
        |        PARAMETER["False northing",0,
        |            LENGTHUNIT["metre",1],
        |            ID["EPSG",8807]]],
        |    CS[Cartesian,2],
        |        AXIS["(E)",east,
        |            ORDER[1],
        |            LENGTHUNIT["metre",1]],
        |        AXIS["(N)",north,
        |            ORDER[2],
        |            LENGTHUNIT["metre",1]],
        |    USAGE[
        |        SCOPE["Navigation and medium accuracy spatial referencing."],
        |        AREA["Between 138°E and 144°E, northern hemisphere."],
        |        BBOX[0,138,84,144]],
        |    ID["EPSG",32654]]""".stripMargin
    assert(CrsWkt.parseCrs(utm54).asInstanceOf[CrsWkt.Projected].forward ==
      UtmFromGeographic(54))
    val geogcrs =
      """GEOGCRS["WGS 84",
        |    ENSEMBLE["World Geodetic System 1984 ensemble",
        |        ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]],
        |        ENSEMBLEACCURACY[2.0]],
        |    PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]],
        |    CS[ellipsoidal,2],
        |        AXIS["geodetic latitude (Lat)",north,ANGLEUNIT["degree",0.0174532925199433]],
        |        AXIS["geodetic longitude (Lon)",east,ANGLEUNIT["degree",0.0174532925199433]],
        |    ID["EPSG",4326]]""".stripMargin
    assert(CrsWkt.parseCrs(geogcrs).isInstanceOf[CrsWkt.Geographic])
    // WKT2 -> WKT1 cross-dialect chain: identical transform either way
    assert(CrsWkt.transformBetween(utm54, geogcrs) == GeographicFromUtm(54))
    // WKT2 LCC with false-origin parameter spellings (EPSG 9802)
    val lcc2 =
      """PROJCRS["custom LCC",
        |  BASEGEOGCRS["WGS 84",DATUM["World Geodetic System 1984",
        |    ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],
        |    PRIMEM["Greenwich",0]],
        |  CONVERSION["lcc",METHOD["Lambert Conic Conformal (2SP)",ID["EPSG",9802]],
        |    PARAMETER["Latitude of false origin",23],
        |    PARAMETER["Longitude of false origin",-96],
        |    PARAMETER["Latitude of 1st standard parallel",33],
        |    PARAMETER["Latitude of 2nd standard parallel",45],
        |    PARAMETER["Easting at false origin",0],
        |    PARAMETER["Northing at false origin",0]],
        |  CS[Cartesian,2]]""".stripMargin
    assert(CrsWkt.parseCrs(lcc2).asInstanceOf[CrsWkt.Projected].forward ==
      LambertConformalFromGeographic(LccParams(33.0, 45.0, 23.0, -96.0)))
    // unknown METHOD EPSG id rejects loudly
    val bad = lcc2.replace("9802", "9801")
    assert(intercept[IllegalArgumentException](CrsWkt.parseCrs(bad))
      .getMessage.contains("EPSG:9801"))
  }

  test("EPSG:nnnn shorthand resolves the shipped table and rejects the rest") {
    assert(CrsWkt.parseCrs("EPSG:4326") ==
      CrsWkt.Geographic(CrsWkt.GeogCrs("WGS_1984", Ellipsoid.Wgs84, (0.0, 0.0, 0.0))))
    assert(CrsWkt.parseCrs("epsg:32654").asInstanceOf[CrsWkt.Projected].forward ==
      UtmFromGeographic(54))
    assert(CrsWkt.parseCrs("EPSG:32733").asInstanceOf[CrsWkt.Projected].forward ==
      UtmFromGeographic(33, southern = true))
    assert(CrsWkt.parseCrs("EPSG:3857").asInstanceOf[CrsWkt.Projected].forward ==
      WebMercatorFromGeographic)
    val albers = CrsWkt.parseCrs("EPSG:5070").asInstanceOf[CrsWkt.Projected]
    assert(albers.forward.isInstanceOf[AlbersFromGeographic])
    assert(CrsWkt.parseCrs("EPSG:4301") == CrsWkt.Geographic(CrsWkt.GeogCrs(
      "TOKYO", Ellipsoid.Bessel1841, (-146.414, 507.337, 680.507))))
    // EPSG shorthand composes with WKT through the same seam: 32654 -> Tokyo
    val tokyo = CrsWkt.parseCrs("EPSG:4301")
    assert(CrsWkt.transform(CrsWkt.parseCrs("EPSG:32654"), tokyo) ==
      ComposedTransform(GeographicFromUtm(54),
        AbridgedMolodensky(146.414, -507.337, -680.507,
          Ellipsoid.Wgs84, Ellipsoid.Bessel1841)))
    // the GRS80 UTM bands (NAD83 + ETRS89) dispatch the parameterized TM
    val grs80 = Ellipsoid(6378137.0, 298.257222101)
    assert(CrsWkt.parseCrs("EPSG:26915").asInstanceOf[CrsWkt.Projected].forward ==
      TransverseMercatorFromGeographic(TmParams(-93.0, a = grs80.a, e2 = grs80.e2)))
    assert(CrsWkt.parseCrs("EPSG:25832").asInstanceOf[CrsWkt.Projected].forward ==
      TransverseMercatorFromGeographic(TmParams(9.0, a = grs80.a, e2 = grs80.e2)))
    // NAD83/ETRS89/WGS84 coincide at the metre level: no datum shift in chains
    assert(CrsWkt.transform(CrsWkt.parseCrs("EPSG:4269"),
      CrsWkt.parseCrs("EPSG:26915")).isInstanceOf[TransverseMercatorFromGeographic])
    assert(intercept[IllegalArgumentException](CrsWkt.parseCrs("EPSG:27700"))
      .getMessage.contains("not in the shipped table"))
  }

  test("epsgWkt: canonical WKT1 round-trips to the exact table transform for every code") {
    // structural case-class equality = the SAME doubles in every slot —
    // the synthesized .prj text IS the table's parameterization, so
    // toProjjson(epsgWkt(code)) describes exactly what epsgCrs dispatches
    val codes = Seq(4326, 4269, 4267, 4301, 3857,
      32601, 32633, 32654, 32660, 32701, 32733, 32760,
      26901, 26915, 26923, 25828, 25832, 25838,
      5070, 2277, 3413, 3976, 3031, 5041, 5042)
    for (c <- codes)
      assert(CrsWkt.parseCrs(CrsWkt.epsgWkt(c)) == CrsWkt.epsgCrs(c),
        s"EPSG:$c text round-trip diverges from the table dispatch")
    // and the tree feeds toProjjson: a ProjectedCRS document with the
    // right method for a sample of each projection family
    def doc(c: Int) = CrsWkt.toProjjson(s"EPSG:$c")
    assert(doc(32633).contains("\"Transverse Mercator\"") &&
      doc(32633).contains("ProjectedCRS"))
    assert(doc(3857).contains("Pseudo Mercator"))
    assert(doc(5070).contains("Albers Equal Area"))
    assert(doc(2277).contains("Lambert Conic Conformal (2SP)") &&
      doc(2277).contains("US survey foot"))
    assert(doc(3413).contains("Polar Stereographic (variant B)"))
    assert(doc(5041).contains("Polar Stereographic (variant A)"))
    assert(doc(4326).contains("GeographicCRS"))
    assert(intercept[IllegalArgumentException](CrsWkt.epsgWkt(27700))
      .getMessage.contains("not in the shipped table"))
  }

  test("quoted-string escapes and whitespace are tolerated") {
    val wkt = "GEOGCS [ \"WGS \"\"84\"\"\" ,\n  DATUM[\"WGS_1984\"," +
      "SPHEROID[\"WGS 84\", 6378137, 298.257223563]],\n" +
      "PRIMEM[\"Greenwich\",0], UNIT[\"degree\",0.0174532925199433]]"
    assert(CrsWkt.parseCrs(wkt) == CrsWkt.Geographic(
      CrsWkt.GeogCrs("WGS_1984", Ellipsoid.Wgs84, (0.0, 0.0, 0.0))))
  }
}
