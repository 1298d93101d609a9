package graft.operators

import graft.operators.Regrid._

/** WKT1 CRS text → [[Regrid.Transform2D]] dispatch — the front door that
  * turns the four implemented projection families + datum shifts into a
  * working feature: a user holding the `.prj` sidecar WKT that
  * [[Shapefile.readFeatureFiles]] surfaces (or any GDAL/ESRI `PROJCS`/
  * `GEOGCS` string) gets the right transform without hand-building
  * `LccParams`/zone numbers. This is the reference's actual API shape —
  * `align_rasterio` is driven entirely by CRS objects read from file
  * metadata (feature_stacking.py:85-96: `src.crs` in, `master_crs` out),
  * never by hand-constructed projection constants.
  *
  * Grammar (OGC 01-009 WKT1, the dialect every GDAL/ESRI `.prj` uses):
  * nested `NAME[arg, ...]` nodes with `[]` or `()` brackets and
  * double-quoted strings (`""` escapes). Both the GDAL/OGC and ESRI
  * spellings are accepted (ESRI prefixes datums with `D_`, capitalizes
  * parameter keys, names LCC without the `_2SP` suffix).
  *
  * Fail-closed doctrine (the Tiff/Jpeg stance): anything outside the
  * implemented surface — an unknown projection method, a non-metre
  * projected unit, a rotated/scaled 7-parameter TOWGS84, an unknown
  * datum with no TOWGS84 — REJECTS loudly. No silent approximations:
  * a wrong CRS re-keys every pixel (g9 measured ≈360 m for the Tokyo
  * shift alone).
  *
  * Implemented surface (exactly what [[Regrid]] ships):
  *   - Transverse Mercator in its UTM parameterization → [[UtmFromGeographic]]
  *   - Mercator_1SP / Pseudo-Mercator → [[WebMercatorFromGeographic]]
  *   - Lambert_Conformal_Conic_2SP → [[LambertConformalFromGeographic]]
  *   - Albers_Conic_Equal_Area → [[AlbersFromGeographic]]
  *   - plain GEOGCS (geographic degrees — the identity "projection")
  *   - datum shifts via TOWGS84 3-param (or the published table for the
  *     named legacy datums) → [[AbridgedMolodensky]]
  */
object CrsWkt {

  // ---- WKT1 tokenizer / recursive-descent parser ----

  /** One parsed node: NAME[args...] where each arg is a String (quoted),
    * Double (bare number), or nested Node.
    */
  final case class Node(name: String, args: Vector[Any]) {
    def children(n: String): Vector[Node] =
      args.collect { case c: Node if c.name.equalsIgnoreCase(n) => c }
    def child(n: String): Option[Node] = children(n).headOption
    def str(i: Int): String = args(i) match {
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"WKT $name arg $i: expected a quoted string, got $other")
    }
    def num(i: Int): Double = args(i) match {
      case d: Double => d
      case s: String if s.nonEmpty && s.matches("[-+0-9.eE]+") => s.toDouble
      case other => throw new IllegalArgumentException(
        s"WKT $name arg $i: expected a number, got $other")
    }
  }

  def parseNode(wkt: String): Node = {
    val s = wkt
    var pos = 0
    def ws(): Unit = while (pos < s.length && s(pos).isWhitespace) pos += 1
    def fail(msg: String) = throw new IllegalArgumentException(
      s"WKT parse error at offset $pos: $msg (…${s.slice(math.max(0, pos - 10), pos + 10)}…)")
    def ident(): String = {
      ws()
      val start = pos
      while (pos < s.length && (s(pos).isLetterOrDigit || s(pos) == '_')) pos += 1
      if (pos == start) fail("expected an identifier")
      s.substring(start, pos)
    }
    def quoted(): String = {
      pos += 1 // opening "
      val sb = new StringBuilder
      var done = false
      while (!done) {
        if (pos >= s.length) fail("unterminated quoted string")
        s(pos) match {
          case '"' if pos + 1 < s.length && s(pos + 1) == '"' => sb += '"'; pos += 2
          case '"' => pos += 1; done = true
          case c => sb += c; pos += 1
        }
      }
      sb.toString
    }
    def number(): Double = {
      val start = pos
      while (pos < s.length && "+-0123456789.eE".indexOf(s(pos)) >= 0) pos += 1
      if (pos == start) fail("expected a number")
      s.substring(start, pos).toDouble
    }
    def node(): Node = {
      val name = ident()
      ws()
      if (pos >= s.length || (s(pos) != '[' && s(pos) != '(')) fail(s"expected [ after $name")
      val close = if (s(pos) == '[') ']' else ')'
      pos += 1
      val args = Vector.newBuilder[Any]
      var first = true
      var done = false
      while (!done) {
        ws()
        if (pos >= s.length) fail(s"unterminated $name node")
        if (s(pos) == close) { pos += 1; done = true }
        else {
          if (!first) {
            if (s(pos) != ',') fail("expected , or closing bracket")
            pos += 1; ws()
          }
          first = false
          if (pos >= s.length) fail("unterminated node")
          else if (s(pos) == '"') args += quoted()
          else if (s(pos).isLetter) args += node()
          else args += number()
        }
      }
      Node(name.toUpperCase, args.result())
    }
    val root = node()
    ws()
    require(pos == s.length, s"trailing characters after WKT root node: '${s.drop(pos).take(40)}'")
    root
  }

  // ---- datum / ellipsoid resolution ----

  /** A geographic CRS: ellipsoid + geocentric shift TO WGS84 in metres
    * (the TOWGS84 convention). `shift = (0,0,0)` + the WGS84 ellipsoid
    * IS WGS84.
    */
  final case class GeogCrs(datumName: String, ellipsoid: Ellipsoid,
      toWgs84: (Double, Double, Double))

  sealed trait Crs { def geog: GeogCrs }
  /** Plain lon/lat degrees on `geog`'s datum. */
  final case class Geographic(geog: GeogCrs) extends Crs
  /** Projected metres; `forward` maps geographic (lon°, lat°) on the SAME
    * datum → projected (x, y).
    */
  final case class Projected(geog: GeogCrs, forward: Transform2D) extends Crs

  /** Published geocentric →WGS84 shifts for the named legacy datums the
    * engine ships ellipsoids for (DMA TR 8350.2 / EPSG): used when the
    * WKT carries no TOWGS84 node. Keys are normalized datum names (upper,
    * ESRI `D_` prefix stripped).
    */
  private val NamedDatumShifts: Map[String, (Double, Double, Double)] = Map(
    "WGS_1984" -> (0.0, 0.0, 0.0),
    "TOKYO" -> (-146.414, 507.337, 680.507),
    "NORTH_AMERICAN_DATUM_1927" -> (-8.0, 160.0, 176.0),
    "NORTH_AMERICAN_1927" -> (-8.0, 160.0, 176.0))

  /** Snap spheroid (a, 1/f) to a shipped named ellipsoid when it matches
    * to printing precision, so datum-equality checks (and the oracles'
    * interpolated constants) compare the EXACT same doubles; otherwise
    * carry the literal values (LCC/Albers/Molodensky are fully
    * parameterized by them).
    */
  private def resolveEllipsoid(a: Double, invF: Double): Ellipsoid = {
    val named = Seq(Ellipsoid.Wgs84, Ellipsoid.Bessel1841, Ellipsoid.Clarke1866)
    named.find(e => math.abs(e.a - a) < 1e-3 && math.abs(e.invF - invF) < 1e-6)
      .getOrElse(Ellipsoid(a, invF))
  }

  private def normDatum(name: String): String = {
    val up = name.toUpperCase
    if (up.startsWith("D_")) up.drop(2) else up
  }

  private def parseGeogcs(n: Node): GeogCrs = {
    val datum = n.child("DATUM").getOrElse(
      throw new IllegalArgumentException("GEOGCS without DATUM"))
    val sph = datum.child("SPHEROID").orElse(datum.child("ELLIPSOID")).getOrElse(
      throw new IllegalArgumentException("DATUM without SPHEROID"))
    val ell = resolveEllipsoid(sph.num(1), sph.num(2))
    val dName = normDatum(datum.str(0))
    val shift = datum.child("TOWGS84") match {
      case Some(t) =>
        // 3-param geocentric translation; a 7-param node is accepted only
        // when its rotation/scale terms are zero (the abridged Molodensky
        // path implements translations, not rotations — fail closed)
        require(t.args.length == 3 || t.args.length == 7,
          s"TOWGS84 must have 3 or 7 parameters, got ${t.args.length}")
        if (t.args.length == 7)
          require((3 until 7).forall(i => t.num(i) == 0.0),
            "7-parameter TOWGS84 with nonzero rotation/scale is not supported " +
              "(only geocentric translations are implemented)")
        (t.num(0), t.num(1), t.num(2))
      case None => NamedDatumShifts.getOrElse(dName,
        throw new IllegalArgumentException(
          s"datum '$dName' has no TOWGS84 and is not a known named datum " +
            s"(${NamedDatumShifts.keys.toSeq.sorted.mkString(", ")}) — cannot " +
            "derive a datum shift; add a TOWGS84 node"))
    }
    // sanity: the angular unit must be degrees (all shipped transforms
    // take degrees); gradians etc. reject
    n.child("UNIT").foreach { u =>
      require(math.abs(u.num(1) - math.Pi / 180.0) < 1e-9,
        s"GEOGCS angular unit '${u.str(0)}' (${u.num(1)}) is not degrees")
    }
    GeogCrs(dName, ell, shift)
  }

  /** Case-insensitive PARAMETER lookup with a default for omitted keys
    * (GDAL omits parameters at their defaults).
    */
  private def param(n: Node, key: String, default: Double = Double.NaN): Double =
    n.args.collectFirst {
      case c: Node if c.name == "PARAMETER" && c.str(0).equalsIgnoreCase(key) => c.num(1)
    }.getOrElse {
      require(!default.isNaN, s"PROJCS missing required PARAMETER[$key]")
      default
    }

  private def parseProjcs(n: Node): Projected = {
    val geog = parseGeogcs(n.child("GEOGCS").getOrElse(
      throw new IllegalArgumentException("PROJCS without GEOGCS")))
    val projName = n.child("PROJECTION").getOrElse(
      throw new IllegalArgumentException("PROJCS without PROJECTION")).str(0)
    // linear unit must be metres (every shipped projection emits metres);
    // US feet etc. reject rather than silently mis-scale by 3.28
    n.children("UNIT").lastOption.foreach { u =>
      require(math.abs(u.num(1) - 1.0) < 1e-9,
        s"PROJCS linear unit '${u.str(0)}' (factor ${u.num(1)}) is not metres")
    }
    val cm = () => param(n, "central_meridian")
    val lat0 = () => param(n, "latitude_of_origin", 0.0)
    val fe = () => param(n, "false_easting", 0.0)
    val fn = () => param(n, "false_northing", 0.0)
    val fwd: Transform2D = projName.toUpperCase match {
      case "TRANSVERSE_MERCATOR" | "GAUSS_KRUGER" =>
        // only the UTM parameterization is implemented (the Utm constants
        // are baked into the Snyder series): k0=0.9996, FE=500km, lat0=0,
        // central meridian on a zone line, FN 0 (N) or 10000km (S)
        val k0 = param(n, "scale_factor", 1.0)
        require(k0 == 0.9996, s"Transverse Mercator with scale_factor $k0: only the " +
          "UTM parameterization (0.9996) is implemented")
        require(lat0() == 0.0, s"UTM latitude_of_origin must be 0, got ${lat0()}")
        require(fe() == 500000.0, s"UTM false_easting must be 500000, got ${fe()}")
        val southern = fn() match {
          case 0.0 => false
          case 10000000.0 => true
          case other => throw new IllegalArgumentException(
            s"UTM false_northing must be 0 or 10000000, got $other")
        }
        val zoneD = (cm() + 183.0) / 6.0
        val zone = math.round(zoneD).toInt
        require(zone >= 1 && zone <= 60 && Utm.centralMeridianDeg(zone) == cm(),
          s"central_meridian ${cm()} is not a UTM zone meridian")
        require(geog.ellipsoid == Ellipsoid.Wgs84,
          s"UTM is implemented on WGS84 only; got ellipsoid ${geog.ellipsoid}")
        UtmFromGeographic(zone, southern)
      case "MERCATOR_1SP" | "MERCATOR_AUXILIARY_SPHERE" |
          "POPULAR_VISUALISATION_PSEUDO_MERCATOR" | "PSEUDO_MERCATOR" =>
        // EPSG:3857 spherical Web-Mercator on the WGS84 semi-major sphere
        require(param(n, "central_meridian", 0.0) == 0.0 && fe() == 0.0 && fn() == 0.0 &&
          param(n, "scale_factor", 1.0) == 1.0 &&
          param(n, "standard_parallel_1", 0.0) == 0.0,
          "only the EPSG:3857 Web-Mercator parameterization is implemented " +
            "(central_meridian/false offsets 0, scale 1)")
        require(geog.ellipsoid == Ellipsoid.Wgs84,
          s"Web-Mercator is implemented on the WGS84 sphere only")
        WebMercatorFromGeographic
      case "LAMBERT_CONFORMAL_CONIC_2SP" | "LAMBERT_CONFORMAL_CONIC" =>
        // ESRI spells 2SP LCC without the suffix; both carry two
        // standard_parallel parameters
        LambertConformalFromGeographic(LccParams(
          param(n, "standard_parallel_1"), param(n, "standard_parallel_2"),
          lat0(), cm(), fe(), fn(), geog.ellipsoid.a, geog.ellipsoid.e2))
      case "ALBERS_CONIC_EQUAL_AREA" | "ALBERS" =>
        AlbersFromGeographic(AeaParams(
          param(n, "standard_parallel_1"), param(n, "standard_parallel_2"),
          lat0(), cm(), fe(), fn(), geog.ellipsoid.a, geog.ellipsoid.e2))
      case other => throw new IllegalArgumentException(
        s"PROJECTION '$other' is not implemented (Transverse_Mercator/UTM, " +
          "Mercator_1SP/Pseudo-Mercator, Lambert_Conformal_Conic_2SP, " +
          "Albers_Conic_Equal_Area)")
    }
    Projected(geog, fwd)
  }

  /** Parse one `.prj`-style WKT1 string into a [[Crs]]. */
  def parseCrs(wkt: String): Crs = {
    val root = parseNode(wkt.trim)
    root.name match {
      case "PROJCS" => parseProjcs(root)
      case "GEOGCS" => Geographic(parseGeogcs(root))
      case other => throw new IllegalArgumentException(
        s"root node $other unsupported (PROJCS or GEOGCS)")
    }
  }

  /** The transform mapping SRC-CRS coordinates → DST-CRS coordinates:
    * src projection inverse (→ src geographic) → datum shift (abridged
    * Molodensky on the combined TOWGS84 translations, skipped when the
    * datums coincide) → dst projection forward. This is the PROJ
    * "pipeline" chain through [[ComposedTransform]]; single-step chains
    * collapse so e.g. UTM→its own GEOGCS returns the bare
    * [[GeographicFromUtm]].
    */
  def transform(src: Crs, dst: Crs): Transform2D = {
    val srcInv: Option[Transform2D] = src match {
      case Geographic(_) => None
      case Projected(_, fwd) => Some(fwd.inverse)
    }
    val shift: Option[Transform2D] = {
      val sameDatum = src.geog.ellipsoid == dst.geog.ellipsoid &&
        src.geog.toWgs84 == dst.geog.toWgs84
      if (sameDatum) None
      else {
        val (sx, sy, sz) = src.geog.toWgs84
        val (dx, dy, dz) = dst.geog.toWgs84
        // src→WGS84 is +src.toWgs84; WGS84→dst is −dst.toWgs84; the
        // combined translation is their difference (standard PROJ chain)
        Some(AbridgedMolodensky(sx - dx, sy - dy, sz - dz,
          src.geog.ellipsoid, dst.geog.ellipsoid))
      }
    }
    val dstFwd: Option[Transform2D] = dst match {
      case Geographic(_) => None
      case Projected(_, fwd) => Some(fwd)
    }
    Seq(srcInv, shift, dstFwd).flatten match {
      case Seq() => IdentityTransform
      case Seq(one) => one
      case many => many.reduceLeft(ComposedTransform(_, _))
    }
  }

  /** WKT front door: `transformBetween(srcWkt, dstWkt)` for use with
    * [[Regrid.reproject]] — pass the MASTER grid's WKT as `srcWkt` and
    * the aux raster's as `dstWkt` (reproject maps master cell centers
    * into the aux plane).
    */
  def transformBetween(srcWkt: String, dstWkt: String): Transform2D =
    transform(parseCrs(srcWkt), parseCrs(dstWkt))
}
