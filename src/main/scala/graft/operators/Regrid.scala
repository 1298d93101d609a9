package graft.operators

import graft.functions.SpatialOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid alignment / resampling — the reference's `align_rasterio` step
  * (feature_stacking.py:72-102, called for every auxiliary raster before
  * stacking: DEM at :319 bilinear, scenes at :343 cubic, masks at :345
  * nearest). Every multi-source stack runs this FIRST: auxiliary rasters
  * live on their own grids and must be resampled onto the master grid
  * before the band-concat join.
  *
  * Relational form: a raster is a tall pixel table under a north-up affine
  * grid (world x = originX + col·pxW, y = originY − row·pxH — the
  * SpatialOps mapping). Resampling master ← aux is then a pure key
  * derivation + equi-join:
  *
  *   - nearest: each master cell's center falls in exactly ONE aux cell →
  *     derive (src_row, src_col) int keys, one equi-join. Uncovered cells
  *     come back NULL (= `dst_nodata` fill); compose with
  *     `ScalarOps.fillNoData` to materialize a sentinel.
  *   - bilinear: each master center reads its 4 surrounding aux pixel
  *     CENTERS with weights (1−fx)(1−fy) … fx·fy → explode 4 taps, one
  *     equi-join, re-aggregate by the master key. Taps that fall outside
  *     the aux raster (or on NULL values) drop out and the remaining
  *     weights renormalize — rasterio's masked-resampling behavior.
  *
  * Scale shape: no raster is ever on the driver. The join keys are ints,
  * so AQE broadcasts a small aux raster (DEM tiles) and shuffle-joins a
  * big one; bilinear's only extra cost is the 4× tap inflation between
  * the projection and the re-aggregation (map-side combinable). Cubic
  * (4×4 kernel) is the same shape with 16 taps and position-dependent
  * weights — the two implemented kernels bound the pattern.
  */
object Regrid {

  /** North-up affine grid: world x = originX + col·pxW, y = originY − row·pxH
    * (pixel (0,0)'s top-left corner sits at (originX, originY)).
    */
  case class GridDef(originX: Double, originY: Double, pxW: Double, pxH: Double)

  /** Pluggable DST-world → SRC-world coordinate mapping — the CRS-to-CRS
    * hook the reference's `align_rasterio` exercises for every auxiliary
    * raster (feature_stacking.py:85-96, reproject src_crs → master_crs at
    * :316-320 and :340-345). The engine stays relational: the transform is
    * pure closed-form Column algebra applied to each master cell center
    * BEFORE the shared world→pixel key derivation, so every kernel
    * (nearest / bilinear / cubic) reprojects for free and the plan shape
    * (explode → equi-join → re-agg) is unchanged — no raster on the
    * driver, no new shuffle.
    *
    * A true datum shift (e.g. WGS84 → UTM) is a smooth nonlinear map; over
    * a raster tile it is standard practice to approximate it with a
    * projective (or affine) fit — GDAL's warper does exactly this
    * per-block (its `approx_transformer` with error threshold). Affine
    * covers rotation/shear/scale; projective adds the perspective terms
    * that make tile-local CRS fits accurate.
    */
  sealed trait Transform2D {
    /** (dstX, dstY) → (srcX, srcY) as Column expressions. */
    def apply(x: Column, y: Column): (Column, Column)
    /** Exact closed-form inverse (SRC-world → DST-world). */
    def inverse: Transform2D
  }

  /** Identity — same CRS on both sides (the pre-round-5 behavior). */
  case object IdentityTransform extends Transform2D {
    def apply(x: Column, y: Column): (Column, Column) = (x, y)
    def inverse: Transform2D = this
  }

  /** x' = a·x + b·y + c ; y' = d·x + e·y + f. */
  final case class AffineTransform(
      a: Double, b: Double, c: Double,
      d: Double, e: Double, f: Double) extends Transform2D {
    def apply(x: Column, y: Column): (Column, Column) =
      (lit(a) * x + lit(b) * y + lit(c), lit(d) * x + lit(e) * y + lit(f))
    def inverse: AffineTransform = {
      val det = a * e - b * d
      require(det != 0.0, "affine transform is singular")
      AffineTransform(
        e / det, -b / det, (b * f - c * e) / det,
        -d / det, a / det, (c * d - a * f) / det)
    }
  }

  /** Projective (homography): x' = (m00·x + m01·y + m02) / w,
    * y' = (m10·x + m11·y + m12) / w, w = m20·x + m21·y + m22 — the
    * 8-dof tile-local CRS fit (row-major 3×3 matrix, m22 usually 1).
    */
  final case class ProjectiveTransform(
      m00: Double, m01: Double, m02: Double,
      m10: Double, m11: Double, m12: Double,
      m20: Double, m21: Double, m22: Double) extends Transform2D {
    def apply(x: Column, y: Column): (Column, Column) = {
      val w = lit(m20) * x + lit(m21) * y + lit(m22)
      ((lit(m00) * x + lit(m01) * y + lit(m02)) / w,
        (lit(m10) * x + lit(m11) * y + lit(m12)) / w)
    }
    /** Homography inverse = adjugate matrix (scale-free). */
    def inverse: ProjectiveTransform = {
      val det = m00 * (m11 * m22 - m12 * m21) -
        m01 * (m10 * m22 - m12 * m20) + m02 * (m10 * m21 - m11 * m20)
      require(det != 0.0, "projective transform is singular")
      ProjectiveTransform(
        m11 * m22 - m12 * m21, m02 * m21 - m01 * m22, m01 * m12 - m02 * m11,
        m12 * m20 - m10 * m22, m00 * m22 - m02 * m20, m02 * m10 - m00 * m12,
        m10 * m21 - m11 * m20, m01 * m20 - m00 * m21, m00 * m11 - m01 * m10)
    }
  }

  /** WGS84 transverse-Mercator constants shared by the UTM transform pair
    * (public USGS Snyder series, Map Projections — A Working Manual,
    * eqs. 8-9..8-25; the closed forms rasterio/PROJ evaluate for the
    * reference's geographic↔UTM case, feature_stacking.py:85-96).
    */
  private[graft] object Utm {
    val A = 6378137.0 // WGS84 semi-major axis
    val F = 1.0 / 298.257223563
    val E2: Double = F * (2 - F) // first eccentricity²
    val Ep2: Double = E2 / (1 - E2) // second eccentricity²
    val K0 = 0.9996
    val FalseEasting = 500000.0
    val FalseNorthing = 10000000.0 // southern hemisphere only
    def centralMeridianDeg(zone: Int): Double = (zone - 1) * 6 - 180 + 3
    val Deg2Rad: Double = math.Pi / 180.0
    // meridian-arc series coefficients (Snyder 3-21)
    val M0: Double = 1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256
    val M2: Double = 3 * E2 / 8 + 3 * E2 * E2 / 32 + 45 * E2 * E2 * E2 / 1024
    val M4: Double = 15 * E2 * E2 / 256 + 45 * E2 * E2 * E2 / 1024
    val M6: Double = 35 * E2 * E2 * E2 / 3072
    // footpoint-latitude series coefficients (Snyder 3-26)
    val E1: Double = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
    val P2: Double = 3 * E1 / 2 - 27 * E1 * E1 * E1 / 32
    val P4: Double = 21 * E1 * E1 / 16 - 55 * E1 * E1 * E1 * E1 / 32
    val P6: Double = 151 * E1 * E1 * E1 / 96
    val P8: Double = 1097 * E1 * E1 * E1 * E1 / 512
  }

  /** Geographic (lon°, lat°) → UTM (easting, northing) on WGS84 — the
    * named-CRS geodetic forward the reference's `align_rasterio` needs for
    * its DEM-vs-scene case. Pure Column algebra (Snyder 8-9..8-14), so
    * reprojection stays a join-key rewrite: no raster on the driver, no
    * new shuffle, and the oracle can evaluate the identical closed form.
    */
  final case class UtmFromGeographic(zone: Int, southern: Boolean = false) extends Transform2D {
    import Utm._
    require(zone >= 1 && zone <= 60, s"UTM zone must be 1..60, got $zone")
    def apply(lon: Column, lat: Column): (Column, Column) = {
      val phi = lat * lit(Deg2Rad)
      val dlam = (lon - lit(centralMeridianDeg(zone))) * lit(Deg2Rad)
      val sinPhi = sin(phi); val cosPhi = cos(phi); val tanPhi = tan(phi)
      val n = lit(A) / sqrt(lit(1.0) - lit(E2) * sinPhi * sinPhi)
      val t = tanPhi * tanPhi
      val c = lit(Ep2) * cosPhi * cosPhi
      val aa = dlam * cosPhi
      val m = lit(A) * (lit(M0) * phi - lit(M2) * sin(lit(2.0) * phi) +
        lit(M4) * sin(lit(4.0) * phi) - lit(M6) * sin(lit(6.0) * phi))
      val easting = lit(FalseEasting) + lit(K0) * n * (aa +
        (lit(1.0) - t + c) * aa * aa * aa / lit(6.0) +
        (lit(5.0) - lit(18.0) * t + t * t + lit(72.0) * c - lit(58.0) * Ep2) *
          aa * aa * aa * aa * aa / lit(120.0))
      val northing = lit(if (southern) FalseNorthing else 0.0) + lit(K0) * (m +
        n * tanPhi * (aa * aa / lit(2.0) +
          (lit(5.0) - t + lit(9.0) * c + lit(4.0) * c * c) *
            aa * aa * aa * aa / lit(24.0) +
          (lit(61.0) - lit(58.0) * t + t * t + lit(600.0) * c - lit(330.0) * Ep2) *
            aa * aa * aa * aa * aa * aa / lit(720.0)))
      (easting, northing)
    }
    def inverse: Transform2D = GeographicFromUtm(zone, southern)
  }

  /** UTM (easting, northing) → geographic (lon°, lat°) on WGS84
    * (Snyder 8-17..8-25 via the footpoint latitude). The direction the
    * reproject operator uses when the MASTER grid is UTM and the aux
    * raster (DEM) is geographic — the reference's exact configuration.
    */
  final case class GeographicFromUtm(zone: Int, southern: Boolean = false) extends Transform2D {
    import Utm._
    require(zone >= 1 && zone <= 60, s"UTM zone must be 1..60, got $zone")
    def apply(x: Column, y: Column): (Column, Column) = {
      val m = (y - lit(if (southern) FalseNorthing else 0.0)) / lit(K0)
      val mu = m / lit(A * M0)
      val phi1 = mu + lit(P2) * sin(lit(2.0) * mu) + lit(P4) * sin(lit(4.0) * mu) +
        lit(P6) * sin(lit(6.0) * mu) + lit(P8) * sin(lit(8.0) * mu)
      val sinP1 = sin(phi1); val cosP1 = cos(phi1); val tanP1 = tan(phi1)
      val c1 = lit(Ep2) * cosP1 * cosP1
      val t1 = tanP1 * tanP1
      val oneMinus = lit(1.0) - lit(E2) * sinP1 * sinP1
      val n1 = lit(A) / sqrt(oneMinus)
      val r1 = lit(A * (1 - E2)) / (oneMinus * sqrt(oneMinus))
      val d = (x - lit(FalseEasting)) / (n1 * lit(K0))
      val latRad = phi1 - (n1 * tanP1 / r1) * (d * d / lit(2.0) -
        (lit(5.0) + lit(3.0) * t1 + lit(10.0) * c1 - lit(4.0) * c1 * c1 -
          lit(9.0) * Ep2) * d * d * d * d / lit(24.0) +
        (lit(61.0) + lit(90.0) * t1 + lit(298.0) * c1 + lit(45.0) * t1 * t1 -
          lit(252.0) * Ep2 - lit(3.0) * c1 * c1) *
          d * d * d * d * d * d / lit(720.0))
      val lonRad = (d - (lit(1.0) + lit(2.0) * t1 + c1) * d * d * d / lit(6.0) +
        (lit(5.0) - lit(2.0) * c1 + lit(28.0) * t1 - lit(3.0) * c1 * c1 +
          lit(8.0) * Ep2 + lit(24.0) * t1 * t1) *
          d * d * d * d * d / lit(120.0)) / cosP1
      (lit(centralMeridianDeg(zone)) + lonRad / lit(Deg2Rad), latRad / lit(Deg2Rad))
    }
    def inverse: Transform2D = UtmFromGeographic(zone, southern)
  }

  /** Constants for a GENERAL ellipsoidal Transverse Mercator (Snyder
    * 8-9..8-25) — the parameterized superset of the WGS84-pinned UTM
    * pair: any ellipsoid (NAD83/GRS80 UTM — the most common US raster
    * CRS after State Plane — Gauss-Krüger, legacy national grids), any
    * central meridian/scale/false offsets, and a nonzero latitude of
    * origin via the meridian-arc offset M(φ0). Same driver-double-
    * constants discipline as [[LccParams]]; on the exact UTM
    * parameterization the algebra reproduces [[UtmFromGeographic]]'s
    * values bit-for-bit (RegridSpec proves it).
    */
  final case class TmParams(
      lon0Deg: Double, lat0Deg: Double = 0.0, k0: Double = 0.9996,
      falseEasting: Double = 500000.0, falseNorthing: Double = 0.0,
      a: Double = Utm.A, e2: Double = Utm.E2) {
    import Utm.Deg2Rad
    require(k0 > 0, s"scale factor $k0 must be positive")
    val ep2: Double = e2 / (1 - e2)
    // meridian-arc series coefficients (Snyder 3-21)
    val m0c: Double = 1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256
    val m2c: Double = 3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024
    val m4c: Double = 15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024
    val m6c: Double = 35 * e2 * e2 * e2 / 3072
    /** Meridian arc length M(φ) as a plain double (for the φ0 offset). */
    def arc(phiDeg: Double): Double = {
      val p = phiDeg * Deg2Rad
      a * (m0c * p - m2c * math.sin(2 * p) + m4c * math.sin(4 * p) -
        m6c * math.sin(6 * p))
    }
    val m0Arc: Double = arc(lat0Deg)
    // footpoint-latitude series coefficients (Snyder 3-26)
    val e1: Double = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    val p2: Double = 3 * e1 / 2 - 27 * e1 * e1 * e1 / 32
    val p4: Double = 21 * e1 * e1 / 16 - 55 * e1 * e1 * e1 * e1 / 32
    val p6: Double = 151 * e1 * e1 * e1 / 96
    val p8: Double = 1097 * e1 * e1 * e1 * e1 / 512
  }

  /** Geographic (lon°, lat°) → general Transverse Mercator (x, y) —
    * [[UtmFromGeographic]]'s algebra with every constant drawn from
    * [[TmParams]] (plus the M(φ0) northing offset, an exact zero on the
    * UTM parameterization).
    */
  final case class TransverseMercatorFromGeographic(p: TmParams) extends Transform2D {
    import Utm.Deg2Rad
    def apply(lon: Column, lat: Column): (Column, Column) = {
      val phi = lat * lit(Deg2Rad)
      val dlam = (lon - lit(p.lon0Deg)) * lit(Deg2Rad)
      val sinPhi = sin(phi); val cosPhi = cos(phi); val tanPhi = tan(phi)
      val n = lit(p.a) / sqrt(lit(1.0) - lit(p.e2) * sinPhi * sinPhi)
      val t = tanPhi * tanPhi
      val c = lit(p.ep2) * cosPhi * cosPhi
      val aa = dlam * cosPhi
      val m = lit(p.a) * (lit(p.m0c) * phi - lit(p.m2c) * sin(lit(2.0) * phi) +
        lit(p.m4c) * sin(lit(4.0) * phi) - lit(p.m6c) * sin(lit(6.0) * phi))
      val easting = lit(p.falseEasting) + lit(p.k0) * n * (aa +
        (lit(1.0) - t + c) * aa * aa * aa / lit(6.0) +
        (lit(5.0) - lit(18.0) * t + t * t + lit(72.0) * c - lit(58.0) * p.ep2) *
          aa * aa * aa * aa * aa / lit(120.0))
      val northing = lit(p.falseNorthing) + lit(p.k0) * (m - lit(p.m0Arc) +
        n * tanPhi * (aa * aa / lit(2.0) +
          (lit(5.0) - t + lit(9.0) * c + lit(4.0) * c * c) *
            aa * aa * aa * aa / lit(24.0) +
          (lit(61.0) - lit(58.0) * t + t * t + lit(600.0) * c - lit(330.0) * p.ep2) *
            aa * aa * aa * aa * aa * aa / lit(720.0)))
      (easting, northing)
    }
    def inverse: Transform2D = GeographicFromTransverseMercator(p)
  }

  /** General Transverse Mercator (x, y) → geographic (lon°, lat°) —
    * [[GeographicFromUtm]]'s footpoint algebra parameterized by
    * [[TmParams]].
    */
  final case class GeographicFromTransverseMercator(p: TmParams) extends Transform2D {
    import Utm.Deg2Rad
    def apply(x: Column, y: Column): (Column, Column) = {
      val m = (y - lit(p.falseNorthing)) / lit(p.k0) + lit(p.m0Arc)
      val mu = m / lit(p.a * p.m0c)
      val phi1 = mu + lit(p.p2) * sin(lit(2.0) * mu) + lit(p.p4) * sin(lit(4.0) * mu) +
        lit(p.p6) * sin(lit(6.0) * mu) + lit(p.p8) * sin(lit(8.0) * mu)
      val sinP1 = sin(phi1); val cosP1 = cos(phi1); val tanP1 = tan(phi1)
      val c1 = lit(p.ep2) * cosP1 * cosP1
      val t1 = tanP1 * tanP1
      val oneMinus = lit(1.0) - lit(p.e2) * sinP1 * sinP1
      val n1 = lit(p.a) / sqrt(oneMinus)
      val r1 = lit(p.a * (1 - p.e2)) / (oneMinus * sqrt(oneMinus))
      val d = (x - lit(p.falseEasting)) / (n1 * lit(p.k0))
      val latRad = phi1 - (n1 * tanP1 / r1) * (d * d / lit(2.0) -
        (lit(5.0) + lit(3.0) * t1 + lit(10.0) * c1 - lit(4.0) * c1 * c1 -
          lit(9.0) * p.ep2) * d * d * d * d / lit(24.0) +
        (lit(61.0) + lit(90.0) * t1 + lit(298.0) * c1 + lit(45.0) * t1 * t1 -
          lit(252.0) * p.ep2 - lit(3.0) * c1 * c1) *
          d * d * d * d * d * d / lit(720.0))
      val lonRad = (d - (lit(1.0) + lit(2.0) * t1 + c1) * d * d * d / lit(6.0) +
        (lit(5.0) - lit(2.0) * c1 + lit(28.0) * t1 - lit(3.0) * c1 * c1 +
          lit(8.0) * p.ep2 + lit(24.0) * t1 * t1) *
          d * d * d * d * d / lit(120.0)) / cosP1
      (lit(p.lon0Deg) + lonRad / lit(Deg2Rad), latRad / lit(Deg2Rad))
    }
    def inverse: Transform2D = TransverseMercatorFromGeographic(p)
  }

  /** Geographic (lon°, lat°) → spherical Web-Mercator (EPSG:3857) meters —
    * the second named-CRS family through the same [[Transform2D]] seam as
    * UTM (proving the pattern generalizes): x = R·λ, y = R·ln(tan(π/4 +
    * φ/2)) on the WGS84 semi-major sphere (Snyder ch. 7 sphere case — the
    * published EPSG:3857 definition every web-tile corpus uses). Pure
    * Column algebra; reprojection stays a join-key rewrite.
    */
  case object WebMercatorFromGeographic extends Transform2D {
    import Utm.{A, Deg2Rad}
    def apply(lon: Column, lat: Column): (Column, Column) = {
      val x = lit(A) * lon * lit(Deg2Rad)
      val y = lit(A) * log(tan(lit(math.Pi / 4.0) + lat * lit(Deg2Rad) / lit(2.0)))
      (x, y)
    }
    def inverse: Transform2D = GeographicFromWebMercator
  }

  /** Web-Mercator (x, y) meters → geographic (lon°, lat°):
    * λ = x/R, φ = 2·atan(exp(y/R)) − π/2. The direction the reproject
    * operator uses when the MASTER grid is Web-Mercator and the aux
    * raster is geographic.
    */
  case object GeographicFromWebMercator extends Transform2D {
    import Utm.{A, Deg2Rad}
    def apply(x: Column, y: Column): (Column, Column) = {
      val lon = x / lit(A) / lit(Deg2Rad)
      val lat = (lit(2.0) * atan(exp(y / lit(A))) - lit(math.Pi / 2.0)) / lit(Deg2Rad)
      (lon, lat)
    }
    def inverse: Transform2D = WebMercatorFromGeographic
  }

  /** Reference ellipsoid (semi-major axis + inverse flattening). */
  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = 1.0 / invF
    val e2: Double = f * (2 - f)
  }
  object Ellipsoid {
    val Wgs84 = Ellipsoid(6378137.0, 298.257223563)
    /** Bessel 1841 — the Tokyo Datum's ellipsoid (the reference's Tokyo
      * scenes predate JGD2000; legacy Japanese rasters arrive on it).
      */
    val Bessel1841 = Ellipsoid(6377397.155, 299.1528128)
    val Clarke1866 = Ellipsoid(6378206.4, 294.9786982)
  }

  /** Geographic→geographic DATUM SHIFT by the abridged Molodensky
    * formulas (DMA TR 8350.2, closed form, h = 0) — what PROJ runs when
    * the reference's `src_crs → master_crs` pair crosses datums
    * (feature_stacking.py:85-96). (dx, dy, dz) are the published
    * geocentric translation src→dst in metres; `src`/`dst` the two
    * ellipsoids. Pure Column algebra:
    *   Δφ = (−dx·sinφ·cosλ − dy·sinφ·sinλ + dz·cosφ + (a·Δf + f·Δa)·sin2φ) / M
    *   Δλ = (−dx·sinλ + dy·cosλ) / (N·cosφ)
    * with M, N the source meridian/prime-vertical radii. The inverse is
    * the negated shift with the ellipsoids swapped (the standard abridged
    * reciprocal — sub-centimetre closure, proven in RegridSpec).
    */
  final case class AbridgedMolodensky(
      dx: Double, dy: Double, dz: Double,
      src: Ellipsoid, dst: Ellipsoid) extends Transform2D {
    import Utm.Deg2Rad
    def apply(lon: Column, lat: Column): (Column, Column) = {
      val phi = lat * lit(Deg2Rad)
      val lam = lon * lit(Deg2Rad)
      val sinP = sin(phi); val cosP = cos(phi)
      val sinL = sin(lam); val cosL = cos(lam)
      val w2 = lit(1.0) - lit(src.e2) * sinP * sinP
      val m = lit(src.a * (1 - src.e2)) / (w2 * sqrt(w2))
      val n = lit(src.a) / sqrt(w2)
      val dF = dst.f - src.f
      val dA = dst.a - src.a
      val dphi = (lit(-dx) * sinP * cosL - lit(dy) * sinP * sinL +
        lit(dz) * cosP + lit(src.a * dF + src.f * dA) * sin(lit(2.0) * phi)) / m
      val dlam = (lit(-dx) * sinL + lit(dy) * cosL) / (n * cosP)
      (lon + dlam / lit(Deg2Rad), lat + dphi / lit(Deg2Rad))
    }
    def inverse: Transform2D = AbridgedMolodensky(-dx, -dy, -dz, dst, src)
  }

  /** Geographic→geographic datum shift through GEOCENTRIC coordinates
    * with a general affine XYZ map — the execution shape of the
    * 7-parameter Helmert (Bursa–Wolf) transform European legacy `.prj`
    * files carry in their TOWGS84 node (DHDN, MGI, …). Chain (all
    * closed-form Column algebra, no per-row iteration):
    *
    *   (λ, φ) on src → geocentric XYZ at h = 0
    *     (X = N·cosφ·cosλ, Y = N·cosφ·sinλ, Z = N·(1−e²)·sinφ)
    *   → XYZ' = T + M·XYZ (T, M driver-side constants)
    *   → (λ', φ') on dst by Bowring's closed-form inverse (1976):
    *     θ  = atan2(Z'·a, p·b),  p = √(X'²+Y'²),  b = a·(1−f)
    *     φ' = atan2(Z' + e′²·b·sin³θ, p − e²·a·cos³θ),  λ' = atan2(Y', X')
    *
    * Bowring's single-step form is exact to well under a millimetre at
    * h = 0 — the standard non-iterative geodetic inverse. Because the
    * XYZ map is affine with CONSTANT coefficients, the exact inverse is
    * the driver-side inverted matrix (no small-angle reciprocal
    * approximation): fwd ∘ inv closes to machine precision (RegridSpec).
    * Construct via [[HelmertDatumShift]] for TOWGS84 semantics.
    */
  final case class GeocentricAffineShift(
      tx: Double, ty: Double, tz: Double,
      m00: Double, m01: Double, m02: Double,
      m10: Double, m11: Double, m12: Double,
      m20: Double, m21: Double, m22: Double,
      src: Ellipsoid, dst: Ellipsoid) extends Transform2D {
    import Utm.Deg2Rad
    def apply(lon: Column, lat: Column): (Column, Column) = {
      val phi = lat * lit(Deg2Rad)
      val lam = lon * lit(Deg2Rad)
      val sinP = sin(phi); val cosP = cos(phi)
      val sinL = sin(lam); val cosL = cos(lam)
      val n = lit(src.a) / sqrt(lit(1.0) - lit(src.e2) * sinP * sinP)
      val x = n * cosP * cosL
      val y = n * cosP * sinL
      val z = n * lit(1.0 - src.e2) * sinP
      val xp = lit(tx) + lit(m00) * x + lit(m01) * y + lit(m02) * z
      val yp = lit(ty) + lit(m10) * x + lit(m11) * y + lit(m12) * z
      val zp = lit(tz) + lit(m20) * x + lit(m21) * y + lit(m22) * z
      val b = dst.a * (1 - dst.f)
      val ep2 = dst.e2 / (1 - dst.e2)
      val p = sqrt(xp * xp + yp * yp)
      val theta = atan2(zp * lit(dst.a), p * lit(b))
      val sinT = sin(theta); val cosT = cos(theta)
      val phiD = atan2(zp + lit(ep2 * b) * sinT * sinT * sinT,
        p - lit(dst.e2 * dst.a) * cosT * cosT * cosT)
      (atan2(yp, xp) / lit(Deg2Rad), phiD / lit(Deg2Rad))
    }
    def inverse: Transform2D = {
      val det = m00 * (m11 * m22 - m12 * m21) -
        m01 * (m10 * m22 - m12 * m20) + m02 * (m10 * m21 - m11 * m20)
      require(det != 0.0, "geocentric affine is singular")
      val (i00, i01, i02) = ((m11 * m22 - m12 * m21) / det,
        (m02 * m21 - m01 * m22) / det, (m01 * m12 - m02 * m11) / det)
      val (i10, i11, i12) = ((m12 * m20 - m10 * m22) / det,
        (m00 * m22 - m02 * m20) / det, (m02 * m10 - m00 * m12) / det)
      val (i20, i21, i22) = ((m10 * m21 - m11 * m20) / det,
        (m01 * m20 - m00 * m21) / det, (m00 * m11 - m01 * m10) / det)
      GeocentricAffineShift(
        -(i00 * tx + i01 * ty + i02 * tz),
        -(i10 * tx + i11 * ty + i12 * tz),
        -(i20 * tx + i21 * ty + i22 * tz),
        i00, i01, i02, i10, i11, i12, i20, i21, i22, dst, src)
    }
  }

  /** 7-parameter Helmert (Bursa–Wolf) datum shift with TOWGS84 semantics:
    * EPSG 9606 POSITION-VECTOR rotation convention (what GDAL/PROJ apply
    * to a TOWGS84 node — the coordinate-frame convention flips the
    * rotation signs), rotations in ARC-SECONDS, scale in PPM:
    *
    *   ⎡X'⎤   ⎡tx⎤         ⎡  1  −rz   ry⎤ ⎡X⎤
    *   ⎢Y'⎥ = ⎢ty⎥ + (1+s)·⎢ rz    1  −rx⎥·⎢Y⎥
    *   ⎣Z'⎦   ⎣tz⎦         ⎣−ry   rx    1⎦ ⎣Z⎦
    *
    * Returns the [[GeocentricAffineShift]] carrying the expanded matrix;
    * rx = ry = rz = s = 0 degenerates to the pure translation (the
    * 3-parameter case on the geocentric path).
    */
  object HelmertDatumShift {
    private val Sec2Rad = math.Pi / (180.0 * 3600.0)
    def apply(
        dx: Double, dy: Double, dz: Double,
        rxSec: Double, rySec: Double, rzSec: Double, dsPpm: Double,
        src: Ellipsoid, dst: Ellipsoid): GeocentricAffineShift = {
      val s = 1.0 + dsPpm * 1e-6
      val rx = rxSec * Sec2Rad; val ry = rySec * Sec2Rad; val rz = rzSec * Sec2Rad
      GeocentricAffineShift(dx, dy, dz,
        s, -s * rz, s * ry,
        s * rz, s, -s * rx,
        -s * ry, s * rx, s,
        src, dst)
    }
  }

  /** Function composition over the Transform2D seam — the PROJ "pipeline"
    * shape (e.g. UTM inverse → datum shift → LCC forward chains through
    * two of these). Applies `first`, then `second`.
    */
  final case class ComposedTransform(first: Transform2D, second: Transform2D)
      extends Transform2D {
    def apply(x: Column, y: Column): (Column, Column) = {
      val (mx, my) = first(x, y)
      second(mx, my)
    }
    def inverse: Transform2D = ComposedTransform(second.inverse, first.inverse)
  }

  /** Shared constants for one parameterization of the ellipsoidal
    * two-standard-parallel Lambert conformal conic on WGS84 (Snyder,
    * Map Projections — A Working Manual, eqs. 14-15, 15-1..15-11, 3-5 —
    * the `lcc` projection PROJ evaluates when the reference passes an
    * LCC `master_crs` to `reproject`, feature_stacking.py:85-96). All
    * derived constants are plain doubles computed once on the driver, so
    * both the Column algebra and a SQL oracle can interpolate the exact
    * same values (Java's shortest-round-trip double printing re-parses to
    * the identical bits in DuckDB — the g6/g7 recipe).
    */
  final case class LccParams(
      phi1Deg: Double, phi2Deg: Double,
      phi0Deg: Double, lon0Deg: Double,
      falseEasting: Double = 0.0, falseNorthing: Double = 0.0,
      a: Double = Utm.A, e2: Double = Utm.E2) {
    import Utm.Deg2Rad
    private val A = a
    private val E2 = e2
    require(phi1Deg != -phi2Deg,
      s"LCC standard parallels must not be opposite ($phi1Deg, $phi2Deg)")
    val e: Double = math.sqrt(E2)
    private def tOf(phiDeg: Double): Double = {
      val phi = phiDeg * Deg2Rad
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2)
    }
    private def mOf(phiDeg: Double): Double = {
      val phi = phiDeg * Deg2Rad
      math.cos(phi) / math.sqrt(1 - E2 * math.sin(phi) * math.sin(phi))
    }
    /** Scale factor k(φ) = ρ·n/(a·m) (Snyder 15-4) — 1.0 exactly at both
      * standard parallels (the defining property of the secant cone,
      * exercised by RegridSpec), < 1 between them, > 1 outside.
      */
    def scaleAt(phiDeg: Double): Double =
      n * aF * math.pow(tOf(phiDeg), n) / (A * mOf(phiDeg))
    /** cone constant (Snyder 15-8); sign(n) = sign of the parallels' mean */
    val n: Double =
      if (phi1Deg == phi2Deg) math.sin(phi1Deg * Deg2Rad)
      else (math.log(mOf(phi1Deg)) - math.log(mOf(phi2Deg))) /
        (math.log(tOf(phi1Deg)) - math.log(tOf(phi2Deg)))
    val aF: Double = A * mOf(phi1Deg) / (n * math.pow(tOf(phi1Deg), n)) // a·F (15-10)
    val rho0: Double = aF * math.pow(tOf(phi0Deg), n) // (15-7a)
    // conformal-latitude → geodetic-latitude series coefficients (3-5)
    val C2: Double = E2 / 2 + 5 * E2 * E2 / 24 + E2 * E2 * E2 / 12 +
      13 * E2 * E2 * E2 * E2 / 360
    val C4: Double = 7 * E2 * E2 / 48 + 29 * E2 * E2 * E2 / 240 +
      811 * E2 * E2 * E2 * E2 / 11520
    val C6: Double = 7 * E2 * E2 * E2 / 120 + 81 * E2 * E2 * E2 * E2 / 1120
    val C8: Double = 4279 * E2 * E2 * E2 * E2 / 161280
  }

  /** Geographic (lon°, lat°) → Lambert conformal conic (x, y) meters
    * (Snyder 15-1..15-4): t(φ) = tan(π/4−φ/2)/((1−e·sinφ)/(1+e·sinφ))^(e/2),
    * ρ = aF·t^n, θ = n(λ−λ0); x = ρ·sinθ, y = ρ0 − ρ·cosθ. Third named-CRS
    * family through the [[Transform2D]] seam — conic, where UTM is
    * cylindrical-transverse and Web-Mercator cylindrical-normal.
    */
  final case class LambertConformalFromGeographic(p: LccParams) extends Transform2D {
    import Utm.Deg2Rad
    def apply(lon: Column, lat: Column): (Column, Column) = {
      val phi = lat * lit(Deg2Rad)
      val esin = lit(p.e) * sin(phi)
      val t = tan(lit(math.Pi / 4.0) - phi / lit(2.0)) /
        pow((lit(1.0) - esin) / (lit(1.0) + esin), lit(p.e / 2.0))
      val rho = lit(p.aF) * pow(t, lit(p.n))
      val theta = lit(p.n) * (lon - lit(p.lon0Deg)) * lit(Deg2Rad)
      (lit(p.falseEasting) + rho * sin(theta),
        lit(p.falseNorthing) + lit(p.rho0) - rho * cos(theta))
    }
    def inverse: Transform2D = GeographicFromLambertConformal(p)
  }

  /** Lambert conformal conic (x, y) meters → geographic (lon°, lat°)
    * (Snyder 15-9..15-11 + the closed-form conformal-latitude series 3-5,
    * so no per-row iteration): ρ = sign(n)·√(x′² + (ρ0−y′)²),
    * t = (ρ/aF)^(1/n), χ = π/2 − 2·atan(t), φ = χ + C2·sin2χ + C4·sin4χ +
    * C6·sin6χ + C8·sin8χ, λ = θ/n + λ0. The direction `reproject` uses
    * when the MASTER grid is LCC and the aux raster is geographic.
    */
  final case class GeographicFromLambertConformal(p: LccParams) extends Transform2D {
    import Utm.Deg2Rad
    def apply(x: Column, y: Column): (Column, Column) = {
      val xp = x - lit(p.falseEasting)
      val yp = lit(p.rho0) - (y - lit(p.falseNorthing))
      val sgn = if (p.n >= 0) 1.0 else -1.0
      val rho = lit(sgn) * sqrt(xp * xp + yp * yp)
      val theta = atan2(lit(sgn) * xp, lit(sgn) * yp)
      val t = pow(rho / lit(p.aF), lit(1.0 / p.n))
      val chi = lit(math.Pi / 2.0) - lit(2.0) * atan(t)
      val phi = chi + lit(p.C2) * sin(lit(2.0) * chi) + lit(p.C4) * sin(lit(4.0) * chi) +
        lit(p.C6) * sin(lit(6.0) * chi) + lit(p.C8) * sin(lit(8.0) * chi)
      (lit(p.lon0Deg) + theta / lit(p.n) / lit(Deg2Rad), phi / lit(Deg2Rad))
    }
    def inverse: Transform2D = LambertConformalFromGeographic(p)
  }

  /** Constants for one parameterization of the ellipsoidal two-parallel
    * ALBERS EQUAL-AREA conic (Snyder 14-1..14-11 + the authalic-latitude
    * series 3-18) — the projection every CONUS-wide statistics product
    * ships in (the conic that preserves AREA where Lambert preserves
    * shape). Same driver-double-constants discipline as [[LccParams]].
    */
  final case class AeaParams(
      phi1Deg: Double, phi2Deg: Double,
      phi0Deg: Double, lon0Deg: Double,
      falseEasting: Double = 0.0, falseNorthing: Double = 0.0,
      a: Double = Utm.A, e2: Double = Utm.E2) {
    import Utm.Deg2Rad
    require(phi1Deg != -phi2Deg,
      s"Albers standard parallels must not be opposite ($phi1Deg, $phi2Deg)")
    val e: Double = math.sqrt(e2)
    /** Snyder 3-12: q(φ), the authalic-latitude kernel. */
    def qOf(phiDeg: Double): Double = {
      val s = math.sin(phiDeg * Deg2Rad)
      (1 - e2) * (s / (1 - e2 * s * s) -
        (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    private def mOf(phiDeg: Double): Double = {
      val phi = phiDeg * Deg2Rad
      math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    }
    val n: Double =
      if (phi1Deg == phi2Deg) math.sin(phi1Deg * Deg2Rad)
      else {
        val m1 = mOf(phi1Deg); val m2 = mOf(phi2Deg)
        (m1 * m1 - m2 * m2) / (qOf(phi2Deg) - qOf(phi1Deg))
      }
    val bigC: Double = { val m1 = mOf(phi1Deg); m1 * m1 + n * qOf(phi1Deg) }
    val rho0: Double = a * math.sqrt(bigC - n * qOf(phi0Deg)) / n
    /** q at the pole (Snyder 3-13 limit) — the asin normalizer. */
    val qPole: Double = 1 - ((1 - e2) / (2 * e)) * math.log((1 - e) / (1 + e))
    // authalic → geodetic latitude series coefficients (Snyder 3-18)
    val B2: Double = e2 / 3 + 31 * e2 * e2 / 180 + 517 * e2 * e2 * e2 / 5040
    val B4: Double = 23 * e2 * e2 / 360 + 251 * e2 * e2 * e2 / 3780
    val B6: Double = 761 * e2 * e2 * e2 / 45360
    /** scale along the parallel, k = ρ·n/(a·m) — 1 exactly at φ1, φ2. */
    def scaleAt(phiDeg: Double): Double =
      math.sqrt(bigC - n * qOf(phiDeg)) / mOf(phiDeg)
  }

  /** Geographic (lon°, lat°) → Albers equal-area (x, y) meters (Snyder
    * 14-1..14-4): ρ = a√(C−nq)/n, θ = n(λ−λ0). FOURTH named-CRS family
    * through the Transform2D seam.
    */
  final case class AlbersFromGeographic(p: AeaParams) extends Transform2D {
    import Utm.Deg2Rad
    def apply(lon: Column, lat: Column): (Column, Column) = {
      val s = sin(lat * lit(Deg2Rad))
      val q = lit(1 - p.e2) * (s / (lit(1.0) - lit(p.e2) * s * s) -
        lit(1 / (2 * p.e)) * log((lit(1.0) - lit(p.e) * s) / (lit(1.0) + lit(p.e) * s)))
      val rho = lit(p.a) * sqrt(lit(p.bigC) - lit(p.n) * q) / lit(p.n)
      val theta = lit(p.n) * (lon - lit(p.lon0Deg)) * lit(Deg2Rad)
      (lit(p.falseEasting) + rho * sin(theta),
        lit(p.falseNorthing) + lit(p.rho0) - rho * cos(theta))
    }
    def inverse: Transform2D = GeographicFromAlbers(p)
  }

  /** Albers (x, y) meters → geographic (Snyder 14-8..14-11 + series
    * 3-18, closed form — no iteration): q = (C − ρ²n²/a²)/n,
    * β = asin(q/q_p), φ = β + B2·sin2β + B4·sin4β + B6·sin6β.
    */
  final case class GeographicFromAlbers(p: AeaParams) extends Transform2D {
    import Utm.Deg2Rad
    def apply(x: Column, y: Column): (Column, Column) = {
      val xp = x - lit(p.falseEasting)
      val yp = lit(p.rho0) - (y - lit(p.falseNorthing))
      val sgn = if (p.n >= 0) 1.0 else -1.0
      val rho = lit(sgn) * sqrt(xp * xp + yp * yp)
      val theta = atan2(lit(sgn) * xp, lit(sgn) * yp)
      val q = (lit(p.bigC) - rho * rho * lit(p.n) * lit(p.n) / lit(p.a * p.a)) / lit(p.n)
      val beta = asin(q / lit(p.qPole))
      val phi = beta + lit(p.B2) * sin(lit(2.0) * beta) +
        lit(p.B4) * sin(lit(4.0) * beta) + lit(p.B6) * sin(lit(6.0) * beta)
      (lit(p.lon0Deg) + theta / lit(p.n) / lit(Deg2Rad), phi / lit(Deg2Rad))
    }
    def inverse: Transform2D = AlbersFromGeographic(p)
  }

  /** Constants for one parameterization of the ellipsoidal POLAR
    * STEREOGRAPHIC in its standard-parallel form (EPSG variant B; Snyder
    * 21-30..21-41 + the conformal-latitude series 3-5, closed form — no
    * per-row iteration) — the projection every polar sea-ice / DEM
    * corpus ships in (EPSG:3413 north, EPSG:3976/3031 south). The SIGN
    * of `latTsDeg` picks the aspect: positive → north-pole, negative →
    * south-pole. Same driver-double-constants discipline as
    * [[LccParams]].
    */
  final case class PsParams(
      latTsDeg: Double, lon0Deg: Double,
      falseEasting: Double = 0.0, falseNorthing: Double = 0.0,
      a: Double = Utm.A, e2: Double = Utm.E2,
      /** Variant A (EPSG 9810 — scale factor AT the pole, latitude of
        * origin ±90; the UPS parameterization): Some(k0). None is the
        * standard-parallel variant B (EPSG 9829). Both share the t/ρ
        * kernel — only the ρ scale constant differs (Snyder 21-33 vs
        * 21-34), so the forward/inverse transforms are identical code.
        */
      k0Pole: Option[Double] = None) {
    import Utm.Deg2Rad
    k0Pole match {
      case None =>
        require(math.abs(latTsDeg) > 0.0 && math.abs(latTsDeg) < 90.0,
          s"polar stereographic standard parallel must lie strictly between a " +
            s"pole and the equator, got $latTsDeg (variant A — true scale at " +
            "the pole — passes k0Pole = Some(k0) with latTsDeg = ±90)")
      case Some(k0) =>
        require(math.abs(latTsDeg) == 90.0,
          s"variant A's latitude of origin is the pole (±90), got $latTsDeg")
        require(k0 > 0.0 && k0 <= 1.0, s"pole scale factor $k0 out of (0, 1]")
    }
    val north: Boolean = latTsDeg > 0
    val e: Double = math.sqrt(e2)
    /** Snyder 15-9: the conformal pole-distance kernel t(φ). */
    private def tOf(phiDeg: Double): Double = {
      val phi = phiDeg * Deg2Rad
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2)
    }
    private def mOf(phiDeg: Double): Double = {
      val phi = phiDeg * Deg2Rad
      math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    }
    private val absTs = math.abs(latTsDeg)
    /** ρ(φ) = rhoF · t(φ′): Snyder 21-34 (variant B, a·m(ts)/t(ts)) or
      * 21-33 (variant A, 2·a·k0/√((1+e)^(1+e)·(1−e)^(1−e))).
      */
    val rhoF: Double = k0Pole match {
      case None => a * mOf(absTs) / tOf(absTs)
      case Some(k0) => 2.0 * a * k0 /
        math.sqrt(math.pow(1 + e, 1 + e) * math.pow(1 - e, 1 - e))
    }
    /** Scale factor k(φ) = ρ/(a·m) — 1.0 exactly at the standard
      * parallel (the defining property, exercised by RegridSpec).
      */
    def scaleAt(phiDeg: Double): Double = {
      val ad = math.abs(phiDeg)
      rhoF * tOf(ad) / (a * mOf(ad))
    }
    // conformal → geodetic latitude series coefficients (Snyder 3-5)
    val C2: Double = e2 / 2 + 5 * e2 * e2 / 24 + e2 * e2 * e2 / 12 +
      13 * e2 * e2 * e2 * e2 / 360
    val C4: Double = 7 * e2 * e2 / 48 + 29 * e2 * e2 * e2 / 240 +
      811 * e2 * e2 * e2 * e2 / 11520
    val C6: Double = 7 * e2 * e2 * e2 / 120 + 81 * e2 * e2 * e2 * e2 / 1120
    val C8: Double = 4279 * e2 * e2 * e2 * e2 / 161280
  }

  /** Geographic (lon°, lat°) → polar stereographic (x, y) meters (Snyder
    * 21-30..21-34): t from the aspect-mirrored latitude, ρ = rhoF·t,
    * x = FE + ρ·sin(λ−λ0), y = FN ∓ ρ·cos(λ−λ0) (− north, + south —
    * the PROJ `stere` aspect convention). FIFTH named-CRS family through
    * the Transform2D seam — azimuthal, where UTM/Web-Mercator are
    * cylindrical and LCC/Albers conic.
    */
  final case class PolarStereographicFromGeographic(p: PsParams) extends Transform2D {
    import Utm.Deg2Rad
    def apply(lon: Column, lat: Column): (Column, Column) = {
      // the south aspect is the north formulas on the mirrored latitude
      val phi = lat * lit(if (p.north) Deg2Rad else -Deg2Rad)
      val esin = lit(p.e) * sin(phi)
      val t = tan(lit(math.Pi / 4.0) - phi / lit(2.0)) /
        pow((lit(1.0) - esin) / (lit(1.0) + esin), lit(p.e / 2.0))
      val rho = lit(p.rhoF) * t
      val dlam = (lon - lit(p.lon0Deg)) * lit(Deg2Rad)
      (lit(p.falseEasting) + rho * sin(dlam),
        lit(p.falseNorthing) + lit(if (p.north) -1.0 else 1.0) * rho * cos(dlam))
    }
    def inverse: Transform2D = GeographicFromPolarStereographic(p)
  }

  /** Polar stereographic (x, y) meters → geographic (Snyder 21-39/7-9 +
    * series 3-5, closed form): ρ = √(x′² + y′²), t = ρ/rhoF,
    * χ = π/2 − 2·atan(t), φ = ±(χ + C2·sin2χ + …),
    * λ = λ0 + atan2(x′, ∓y′).
    */
  final case class GeographicFromPolarStereographic(p: PsParams) extends Transform2D {
    import Utm.Deg2Rad
    def apply(x: Column, y: Column): (Column, Column) = {
      val xp = x - lit(p.falseEasting)
      val yp = (y - lit(p.falseNorthing)) * lit(if (p.north) -1.0 else 1.0)
      val rho = sqrt(xp * xp + yp * yp)
      val t = rho / lit(p.rhoF)
      val chi = lit(math.Pi / 2.0) - lit(2.0) * atan(t)
      val phi = chi + lit(p.C2) * sin(lit(2.0) * chi) + lit(p.C4) * sin(lit(4.0) * chi) +
        lit(p.C6) * sin(lit(6.0) * chi) + lit(p.C8) * sin(lit(8.0) * chi)
      (lit(p.lon0Deg) + atan2(xp, yp) / lit(Deg2Rad),
        phi * lit(if (p.north) 1.0 else -1.0) / lit(Deg2Rad))
    }
    def inverse: Transform2D = PolarStereographicFromGeographic(p)
  }

  /** Apply `t` to (x, y) over `df`, STAGING each composition step's
    * output as real columns behind a Generate barrier
    * (`inline(array(struct(...)))` — the rep1 lesson: plain aliases
    * re-inline under CollapseProject). Without staging, a composed
    * transform's second stage references its input expression 3-8× per
    * formula, duplicating the ENTIRE first-stage series tree each time —
    * a UTM∘Molodensky chain built ~16 copies of the Snyder series and
    * spent seconds in the analyzer/codegen (g11 measured 6.2 s vs ~1 s
    * staged). Returns (staged df, sx, sy, temp columns to drop).
    */
  private[graft] def stageTransform(df: DataFrame, t: Transform2D,
      x: Column, y: Column, tag: Int = 0): (DataFrame, Column, Column, Seq[String]) =
    t match {
      case ComposedTransform(first, second) =>
        val (d1, mx, my, tmp1) = stageTransform(df, first, x, y, tag * 2 + 1)
        val xc = s"__crs_x$tag"; val yc = s"__crs_y$tag"
        val d2 = d1.select(col("*"), inline(array(struct(mx.as(xc), my.as(yc)))))
        val (d3, ox, oy, tmp2) = stageTransform(d2, second, col(xc), col(yc), tag * 2 + 2)
        (d3, ox, oy, (tmp1 :+ xc :+ yc) ++ tmp2)
      case tm: GeographicFromTransverseMercator =>
        // The footpoint series references d ~21× and n1/r1/φ1 almost as
        // often; unstaged, every copy re-inlines the whole μ-series tree
        // (g19's 5.6 s warm was THIS stage, not the Helmert tail). Stage
        // φ1 then (c1, t1, n1, r1, d) as real columns; formulas are
        // `apply`'s verbatim, so every double is identical.
        import Utm.Deg2Rad
        val p = tm.p
        val m = (y - lit(p.falseNorthing)) / lit(p.k0) + lit(p.m0Arc)
        val mu = m / lit(p.a * p.m0c)
        val phi1 = mu + lit(p.p2) * sin(lit(2.0) * mu) + lit(p.p4) * sin(lit(4.0) * mu) +
          lit(p.p6) * sin(lit(6.0) * mu) + lit(p.p8) * sin(lit(8.0) * mu)
        val phic = s"__tm_phi$tag"
        val d1 = df.select(col("*"), inline(array(struct(phi1.as(phic)))))
        val sinP1 = sin(col(phic)); val cosP1 = cos(col(phic))
        val tanP1 = tan(col(phic))
        val oneMinus = lit(1.0) - lit(p.e2) * sinP1 * sinP1
        val n1e = lit(p.a) / sqrt(oneMinus)
        val (c1c, t1c, n1c, r1c, ddc) = (s"__tm_c$tag", s"__tm_t$tag",
          s"__tm_n$tag", s"__tm_r$tag", s"__tm_d$tag")
        val d2 = d1.select(col("*"), inline(array(struct(
          (lit(p.ep2) * cosP1 * cosP1).as(c1c),
          (tanP1 * tanP1).as(t1c),
          n1e.as(n1c),
          (lit(p.a * (1 - p.e2)) / (oneMinus * sqrt(oneMinus))).as(r1c),
          ((x - lit(p.falseEasting)) / (n1e * lit(p.k0))).as(ddc)))))
        val (c1, t1, n1, r1, d) = (col(c1c), col(t1c), col(n1c), col(r1c), col(ddc))
        val latRad = col(phic) - (n1 * tan(col(phic)) / r1) * (d * d / lit(2.0) -
          (lit(5.0) + lit(3.0) * t1 + lit(10.0) * c1 - lit(4.0) * c1 * c1 -
            lit(9.0) * p.ep2) * d * d * d * d / lit(24.0) +
          (lit(61.0) + lit(90.0) * t1 + lit(298.0) * c1 + lit(45.0) * t1 * t1 -
            lit(252.0) * p.ep2 - lit(3.0) * c1 * c1) *
            d * d * d * d * d * d / lit(720.0))
        val lonRad = (d - (lit(1.0) + lit(2.0) * t1 + c1) * d * d * d / lit(6.0) +
          (lit(5.0) - lit(2.0) * c1 + lit(28.0) * t1 - lit(3.0) * c1 * c1 +
            lit(8.0) * p.ep2 + lit(24.0) * t1 * t1) *
            d * d * d * d * d / lit(120.0)) / cos(col(phic))
        (d2, lit(p.lon0Deg) + lonRad / lit(Deg2Rad), latRad / lit(Deg2Rad),
          Seq(phic, c1c, t1c, n1c, r1c, ddc))
      case g: GeocentricAffineShift =>
        // The geocentric chain references its intermediates heavily
        // (theta 6× in the Bowring tail, each copy containing p with two
        // copies of xp…), so the unstaged Column tree grows to thousands
        // of nodes and dominates runtime (g19 measured 5.6 s warm
        // unstaged vs ~1 s staged at sf0.1). Stage XYZ → X'Y'Z' →
        // (p, θ) as real columns behind Generate barriers; the algebra —
        // and therefore every double — is exactly `apply`'s.
        import Utm.Deg2Rad
        val phi = y * lit(Deg2Rad)
        val lam = x * lit(Deg2Rad)
        val sinP = sin(phi); val cosP = cos(phi)
        val n = lit(g.src.a) / sqrt(lit(1.0) - lit(g.src.e2) * sinP * sinP)
        val (xc, yc, zc) = (s"__geo_x$tag", s"__geo_y$tag", s"__geo_z$tag")
        val d1 = df.select(col("*"), inline(array(struct(
          (n * cosP * cos(lam)).as(xc),
          (n * cosP * sin(lam)).as(yc),
          (n * lit(1.0 - g.src.e2) * sinP).as(zc)))))
        val (xpc, ypc, zpc) = (s"__aff_x$tag", s"__aff_y$tag", s"__aff_z$tag")
        val d2 = d1.select(col("*"), inline(array(struct(
          (lit(g.tx) + lit(g.m00) * col(xc) + lit(g.m01) * col(yc) + lit(g.m02) * col(zc)).as(xpc),
          (lit(g.ty) + lit(g.m10) * col(xc) + lit(g.m11) * col(yc) + lit(g.m12) * col(zc)).as(ypc),
          (lit(g.tz) + lit(g.m20) * col(xc) + lit(g.m21) * col(yc) + lit(g.m22) * col(zc)).as(zpc)))))
        val b = g.dst.a * (1 - g.dst.f)
        val ep2 = g.dst.e2 / (1 - g.dst.e2)
        val p = sqrt(col(xpc) * col(xpc) + col(ypc) * col(ypc))
        val (pc, thc) = (s"__pol_p$tag", s"__pol_t$tag")
        val d3 = d2.select(col("*"), inline(array(struct(
          p.as(pc), atan2(col(zpc) * lit(g.dst.a), p * lit(b)).as(thc)))))
        val sinT = sin(col(thc)); val cosT = cos(col(thc))
        val phiD = atan2(col(zpc) + lit(ep2 * b) * sinT * sinT * sinT,
          col(pc) - lit(g.dst.e2 * g.dst.a) * cosT * cosT * cosT)
        (d3, atan2(col(ypc), col(xpc)) / lit(Deg2Rad), phiD / lit(Deg2Rad),
          Seq(xc, yc, zc, xpc, ypc, zpc, pc, thc))
      case simple =>
        val (ox, oy) = simple(x, y)
        (df, ox, oy, Nil)
    }

  /** Nearest-neighbor resample of `aux` onto the master grid: for every
    * master pixel row, attach `valueCols` from the aux cell containing the
    * master cell's center. Left join — cells outside aux coverage get NULL.
    */
  def regridNearest(
      master: DataFrame,
      aux: DataFrame,
      masterGrid: GridDef,
      auxGrid: GridDef,
      valueCols: Seq[String],
      rowCol: String = "px_row",
      colCol: String = "px_col",
      transform: Transform2D = IdentityTransform): DataFrame = {
    val clash = valueCols.filter(master.columns.contains)
    require(clash.isEmpty,
      s"master columns and valueCols must be disjoint; shared: ${clash.mkString(", ")}")
    val cx = SpatialOps.cellCenterX(col(colCol), lit(masterGrid.originX), lit(masterGrid.pxW))
    val cy = SpatialOps.cellCenterY(col(rowCol), lit(masterGrid.originY), lit(masterGrid.pxH))
    val (staged, sx, sy, tmps) = stageTransform(master, transform, cx, cy)
    val keyed = staged
      .withColumn("__src_row", SpatialOps.pixelRowOf(sy, lit(auxGrid.originY), lit(auxGrid.pxH)))
      .withColumn("__src_col", SpatialOps.pixelColOf(sx, lit(auxGrid.originX), lit(auxGrid.pxW)))
      .drop(tmps: _*)
    val src = aux.select(
      col(rowCol).as("__src_row") +: col(colCol).as("__src_col") +: valueCols.map(col): _*)
    keyed.join(src, Seq("__src_row", "__src_col"), "left")
      .drop("__src_row", "__src_col")
  }

  /** Shared kernel-tap resample: derive fractional aux-pixel-CENTER
    * coordinates of each master center, explode the kernel's taps (each a
    * (src_row, src_col, weight) struct), equi-join the aux raster, and
    * re-aggregate per master pixel with renormalization over the taps
    * whose value is present (GDAL's masked-resampling behavior; every tap
    * missing → NULL). One explode, one equi-join (AQE broadcasts a small
    * aux), one hash re-aggregation — the map-side partial collapses the
    * tap inflation before the shuffle.
    *
    * Contract: the re-aggregation groups by ALL master columns, so
    * (1) master rows must be unique per (rowCol, colCol) — duplicate
    * master pixel rows would silently collapse to one output row — and
    * (2) master's columns must be disjoint from `valueCols` (enforced
    * below; a shared name would yield ambiguous duplicate outputs).
    */
  private def tapRegrid(
      master: DataFrame,
      aux: DataFrame,
      masterGrid: GridDef,
      auxGrid: GridDef,
      valueCols: Seq[String],
      rowCol: String,
      colCol: String,
      transform: Transform2D = IdentityTransform)(
      mkTaps: (Column, Column, Column, Column) => Seq[Column]): DataFrame = {
    val cx = SpatialOps.cellCenterX(col(colCol), lit(masterGrid.originX), lit(masterGrid.pxW))
    val cy = SpatialOps.cellCenterY(col(rowCol), lit(masterGrid.originY), lit(masterGrid.pxH))
    val (stagedIn, sx, sy, tmps) = stageTransform(master, transform, cx, cy)
    // u = (x − originX)/pxW − 0.5 so that u = c exactly at aux center c
    val u = (sx - lit(auxGrid.originX)) / lit(auxGrid.pxW) - lit(0.5)
    val v = (lit(auxGrid.originY) - sy) / lit(auxGrid.pxH) - lit(0.5)

    val masterCols = master.columns.toSeq
    val clash = valueCols.filter(masterCols.contains)
    require(clash.isEmpty,
      s"master columns and valueCols must be disjoint; shared: ${clash.mkString(", ")}")
    // STAGE the shared affine subexpressions as real columns before the
    // tap array: expression trees inside explode(array(...)) get no
    // common-subexpression elimination, so an unstaged 16-tap kernel
    // inlines the whole world→pixel derivation 32+ times — a Janino
    // compile tax and per-row recompute (see the g1 staging note).
    val staged = stagedIn
      .withColumn("__u", u).withColumn("__v", v)
      .drop(tmps: _*)
      .withColumn("__c0", floor(col("__u")).cast("int"))
      .withColumn("__r0", floor(col("__v")).cast("int"))
      .withColumn("__fx", col("__u") - col("__c0"))
      .withColumn("__fy", col("__v") - col("__r0"))
    val exploded = staged
      .withColumn("__t", explode(array(
        mkTaps(col("__r0"), col("__c0"), col("__fx"), col("__fy")): _*)))
      .select(masterCols.map(col) :+ col("__t.__src_row") :+ col("__t.__src_col") :+ col("__t.__w"): _*)
    val src = aux.select(
      col(rowCol).as("__src_row") +: col(colCol).as("__src_col") +:
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    val aggs = valueCols.map { c =>
      // weight mass only over taps whose value is present → renormalize
      val wsum = sum(when(col(s"__v_$c").isNotNull, col("__w")))
      (sum(col(s"__v_$c") * col("__w")) / when(wsum > 0, wsum)).as(c)
    }
    exploded.join(src, Seq("__src_row", "__src_col"), "left")
      .groupBy(masterCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Bilinear resample (the Resampling.bilinear DEM path): each master
    * cell center interpolates the 4 surrounding aux pixel centers.
    */
  private val bilinearTaps: (Column, Column, Column, Column) => Seq[Column] =
    (r0, c0, fx, fy) =>
      for { dr <- 0 to 1; dc <- 0 to 1 } yield {
        val w = (if (dc == 0) lit(1.0) - fx else fx) *
          (if (dr == 0) lit(1.0) - fy else fy)
        struct((r0 + dr).as("__src_row"), (c0 + dc).as("__src_col"), w.as("__w"))
      }

  def regridBilinear(
      master: DataFrame,
      aux: DataFrame,
      masterGrid: GridDef,
      auxGrid: GridDef,
      valueCols: Seq[String],
      rowCol: String = "px_row",
      colCol: String = "px_col"): DataFrame =
    tapRegrid(master, aux, masterGrid, auxGrid, valueCols, rowCol, colCol)(bilinearTaps)

  /** Catmull-Rom weight (cubic convolution, a = −0.5 — the GDAL/rasterio
    * `Resampling.cubic` kernel) for a tap at absolute distance `t` < 2.
    */
  private def cubicW(t: Column): Column =
    when(t <= 1.0, (lit(1.5) * t - lit(2.5)) * t * t + lit(1.0))
      .otherwise(((lit(-0.5) * t + lit(2.5)) * t - lit(4.0)) * t + lit(2.0))

  /** Cubic-convolution resample (the Resampling.cubic imagery path,
    * feature_stacking.py:343): 16 taps over the 4×4 aux-center
    * neighborhood, separable Catmull-Rom weights. Same single
    * explode→join→re-agg shape as bilinear, 4× the tap inflation. Note
    * cubic weights go negative, so edge renormalization divides by the
    * (possibly small) present-weight mass — prefer bilinear/nearest near
    * sparse coverage, exactly as the reference reserves cubic for dense
    * imagery and nearest for masks.
    */
  private val cubicTaps: (Column, Column, Column, Column) => Seq[Column] =
    (r0, c0, fx, fy) =>
      for { dr <- -1 to 2; dc <- -1 to 2 } yield {
        val w = cubicW(abs(fx - lit(dc))) * cubicW(abs(fy - lit(dr)))
        struct((r0 + dr).as("__src_row"), (c0 + dc).as("__src_col"), w.as("__w"))
      }

  def regridCubic(
      master: DataFrame,
      aux: DataFrame,
      masterGrid: GridDef,
      auxGrid: GridDef,
      valueCols: Seq[String],
      rowCol: String = "px_row",
      colCol: String = "px_col"): DataFrame =
    tapRegrid(master, aux, masterGrid, auxGrid, valueCols, rowCol, colCol)(cubicTaps)

  /** CRS-to-CRS reprojection — `align_rasterio`'s general case
    * (feature_stacking.py:85-96: reproject + resample in one pass, DEM in
    * EPSG:4326 vs scenes in UTM). Each master (dst-CRS) cell center is
    * mapped through `transform` into the aux raster's src-CRS world plane,
    * then resampled with the chosen kernel. Same relational shape as the
    * plain regrids — the transform only rewrites the join-key derivation,
    * so the plan (and its 100 TB behavior) is identical to g2/g3/g4.
    */
  def reproject(
      master: DataFrame,
      aux: DataFrame,
      masterGrid: GridDef,
      auxGrid: GridDef,
      transform: Transform2D,
      valueCols: Seq[String],
      kernel: String = "nearest",
      rowCol: String = "px_row",
      colCol: String = "px_col"): DataFrame = kernel match {
    case "nearest" =>
      regridNearest(master, aux, masterGrid, auxGrid, valueCols, rowCol, colCol, transform)
    case "bilinear" =>
      tapRegrid(master, aux, masterGrid, auxGrid, valueCols, rowCol, colCol, transform)(bilinearTaps)
    case "cubic" =>
      tapRegrid(master, aux, masterGrid, auxGrid, valueCols, rowCol, colCol, transform)(cubicTaps)
    case other =>
      throw new IllegalArgumentException(
        s"unknown kernel '$other' (expected nearest | bilinear | cubic)")
  }

  /** WKT front door for [[reproject]] — the reference's actual API shape
    * (feature_stacking.py:85-96: CRS objects read from file metadata, not
    * hand-built constants): `masterWkt`/`auxWkt` are the two grids'
    * `.prj`-style WKT1 strings (e.g. the `crs` column
    * [[Shapefile.readFeatureFiles]] surfaces); [[CrsWkt]] parses them and
    * chains projection inverse → datum shift → projection forward.
    * Unsupported CRSs reject loudly — see the CrsWkt scope doc.
    */
  def reproject(
      master: DataFrame,
      aux: DataFrame,
      masterGrid: GridDef,
      auxGrid: GridDef,
      masterWkt: String,
      auxWkt: String,
      valueCols: Seq[String],
      kernel: String): DataFrame =
    reproject(master, aux, masterGrid, auxGrid,
      CrsWkt.transformBetween(masterWkt, auxWkt), valueCols, kernel)
}
