package graft

import graft.operators._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial robustness sweep over every byte-level codec: a corrupt
  * or truncated file in a 100 TB corpus must fail CLOSED — decode either
  * succeeds or throws the codec's own IllegalArgumentException (or a
  * zlib DataFormatException from an inner inflate) — never an
  * ArrayIndexOutOfBounds / NullPointer / NegativeArraySize / Arithmetic
  * escape that would kill a whole task with an unattributable error.
  * Deterministic seed; every failure prints the codec, mutation, and
  * offset so a regression names itself.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private val AcceptableFailures: Set[Class[_]] = Set(
    classOf[IllegalArgumentException], // require(...) — the codec contract
    classOf[java.util.zip.DataFormatException]) // corrupt zlib inner stream

  private def check(codec: String, what: String)(body: => Any): Unit =
    try { body; () } catch {
      case e: Throwable =>
        assert(AcceptableFailures.exists(_.isAssignableFrom(e.getClass)),
          s"$codec / $what escaped with ${e.getClass.getName}: ${e.getMessage}")
    }

  /** Truncation sweep + seeded single/multi-byte flips + random garbage. */
  private def fuzz(codec: String, payloads: Seq[Array[Byte]])(
      decode: Array[Byte] => Any): Unit = {
    val rnd = new scala.util.Random(42)
    payloads.zipWithIndex.foreach { case (p, pi) =>
      // every short prefix, then a spread of longer cuts
      val cuts = (0 until math.min(p.length, 80)) ++
        (0 until 40).map(_ => rnd.nextInt(p.length))
      cuts.foreach(k => check(codec, s"payload $pi truncated to $k")(
        decode(java.util.Arrays.copyOfRange(p, 0, k))))
      // single-byte flips across the file (headers AND data)
      (0 until 400).foreach { _ =>
        val at = rnd.nextInt(p.length)
        val m = p.clone(); m(at) = rnd.nextInt(256).toByte
        check(codec, s"payload $pi byte $at -> ${m(at)}")(decode(m))
      }
      // burst corruption: 8 random bytes at once
      (0 until 60).foreach { i =>
        val m = p.clone()
        (0 until 8).foreach(_ => m(rnd.nextInt(p.length)) = rnd.nextInt(256).toByte)
        check(codec, s"payload $pi burst $i")(decode(m))
      }
    }
    // pure garbage of assorted lengths
    (0 until 60).foreach { i =>
      val g = new Array[Byte](rnd.nextInt(600))
      rnd.nextBytes(g)
      check(codec, s"garbage $i (${g.length} bytes)")(decode(g))
    }
  }

  test("PNG pixel decode never escapes fail-closed") {
    fuzz("png", Seq(
      MultimodalOps.synthPng(9, 7, 3)((r, c, k) => r * 31 + c * 7 + k),
      MultimodalOps.synthPng(8, 8, 1, depth = 16, interlaced = true)(
        (r, c, _) => r * 999 + c),
      MultimodalOps.synthPngPalette(6, 5, Seq((1, 2, 3), (4, 5, 6)),
        alpha = Seq(9))((r, c) => (r + c) % 2)))(MultimodalOps.decodePngPixels)
  }

  test("JPEG pixel decode + EXIF walk never escape fail-closed") {
    val q = Array.fill(64)(16)
    val payloads = Seq(
      Jpeg.synthJpeg(16, 8, 1, Seq(q), exifOrientation = 6) { (_, _, bx) =>
        val nat = new Array[Int](64); nat(0) = bx * 5 - 2; nat(1) = 3; nat
      },
      Jpeg.synthJpeg(16, 16, 3, Seq(q, Array.fill(64)(8)), restartInterval = 2,
        sampling = Seq((2, 2), (1, 1), (1, 1))) { (c, by, bx) =>
        val nat = new Array[Int](64); nat(0) = c * 7 + by - bx; nat
      })
    fuzz("jpeg", payloads)(Jpeg.decodeJpegPixels)
    fuzz("exif", payloads)(Jpeg.exifOrientation)
  }

  test("GIF frame decode never escapes fail-closed") {
    fuzz("gif", Seq(
      Gif.synthGif(10, 8,
        globalPalette = (0 until 4).map(i => (i * 60, i * 50, i * 40)),
        frames = Seq(Gif.FrameSpec(0, 0, 10, 8, transparentIdx = Some(1))(
          (r, c) => (r + c) % 4))),
      // r10: interlaced seed — the deinterlace scatter is a new decode
      // path and gets the same mutation sweep the day it lands
      Gif.synthGif(9, 7,
        globalPalette = (0 until 4).map(i => (i * 55, i * 45, i * 35)),
        frames = Seq(Gif.FrameSpec(0, 0, 9, 7, interlaced = true)(
          (r, c) => (r * 2 + c) % 4)))))(Gif.decodeGifFrames)
  }

  test("BMP pixel decode never escapes fail-closed") {
    fuzz("bmp", Seq(
      MultimodalOps.synthBmp(9, 6, 3)((r, c, ch) => r + c + ch),
      MultimodalOps.synthBmp(5, 4, 1,
        palette = Seq((1, 2, 3), (4, 5, 6)))((r, c, _) => (r + c) % 2)))(
      MultimodalOps.decodeBmpPixels)
  }

  test("WebP VP8L decode never escapes fail-closed") {
    def pix(r: Int, c: Int): Int =
      (((r * 5 + c + 9) % 256) << 24) | (((r * 31 + c * 7) % 256) << 16) |
        (((r * 13 + c * 17) % 256) << 8) | ((r + c * 29) % 256)
    fuzz("webp", Seq(
      Webp.synthWebpLossless(9, 7, pix),
      Webp.synthWebpLossless(12, 8, pix, subtractGreen = true,
        predictorMode = Some(7), cacheBits = 4, metaBits = Some(2),
        lz77Rows = true),
      Webp.synthWebpPalette(11, 5,
        (0 until 7).map(i => (255 << 24) | (i * 40 << 8) | (i * 30)),
        (r, c) => (r + c) % 7)))(Webp.decodeWebpPixels)
    fuzz("webp-anim", Seq(Webp.synthWebpAnim(12, 8, Seq(
      (0, 0, 12, 8, 30, (r, c) => pix(r, c)),
      (4, 2, 5, 4, 45, (r, c) => pix(r + 1, c + 2))))))(Webp.decodeWebpFrames)
  }

  test("WebP VP8 (lossy keyframe) decode never escapes fail-closed") {
    // one in-repo fixture (rich token mix) + one real-encoder fixture
    // (prob updates, segmentation, loop filter) — the bool decoder feeds
    // zeros past the partition end by spec, so rejects come from the
    // structural bounds, never an array escape
    def y2 = { val a = new Array[Int](16); a(0) = 40; a(5) = -11; a }
    def yb = Array.tabulate(16) { i =>
      val a = new Array[Int](16); a(1) = 9 + i; a(7) = -3; a
    }
    val synth = Vp8.encodeKeyframe(35, 19, 12, 20, Seq.fill(6)(
      Vp8.MbSpec(yMode = 0, uvMode = 3, y2 = y2, y = yb)))
    val real = {
      val in = getClass.getResourceAsStream("/vp8/edges_80x64_q25.webp")
      try in.readAllBytes() finally in.close()
    }
    // alpha-bearing layouts: a synth raw-filtered plane + a real
    // method-1 (VP8L-compressed) plane from the reference encoder
    val alphaSynth = Webp.synthWebpLossyAlpha(
      Vp8.encodeKeyframe(19, 13, 8, 10,
        Seq(Vp8.MbSpec(0, 0, y2 = y2), Vp8.MbSpec(1, 1))),
      (r, c) => (r * 7 + c * 3) % 256, filterM = 3)
    val alphaReal = {
      val in = getClass.getResourceAsStream("/vp8alpha/blocky_40x24_q60.webp")
      try in.readAllBytes() finally in.close()
    }
    fuzz("vp8", Seq(synth, real, alphaSynth, alphaReal))(Webp.decodeWebpPixels)
  }

  test("WAV decoders never escape fail-closed") {
    val pcm = MultimodalOps.synthWavPcm(8000, 2, 16, 12)((f, ch) => f * 100 + ch)
    val flt = MultimodalOps.synthWavFloat(8000, 1, 10)((f, _) => f * 0.25f)
    fuzz("wav-meta", Seq(pcm, flt))(MultimodalOps.decodeWavMeta)
    fuzz("wav-pcm", Seq(pcm))(MultimodalOps.decodeWavSamples)
    fuzz("wav-float", Seq(flt))(MultimodalOps.decodeWavFloatSamples)
  }

  test("TIFF block decode never escapes fail-closed") {
    fuzz("tiff", Seq(
      Tiff.synthTiff(20, 12, 8, 8, littleEndian = true, tile = true,
        lzw = true)((r, c) => r * 10f + c),
      Tiff.synthMultibandTiff(12, 10, 8, 8, littleEndian = false, tile = true,
        bands = 2, bigTiff = true, compressionCode = 8, predictor = 3)(
        (b, r, c) => b + r + c * 0.5f)))(Tiff.bandBlocksOf)
  }

  test("tar walk never escapes fail-closed") {
    fuzz("tar", Seq(Tar.synthTar(Seq(
      "a/b.png" -> Array.tabulate(700)(_.toByte),
      "c.txt" -> "hello".getBytes))))(Tar.tarEntries)
  }

  test("zip walk never escapes fail-closed") {
    fuzz("zip", Seq(Zip.synthZip(Seq(
      "a/b.npy" -> Array.tabulate(700)(_.toByte),
      "c.txt" -> "hello zip".getBytes), deflate = _.endsWith(".npy"))))(Zip.zipEntries)
  }

  test("npy/npz parse never escapes fail-closed") {
    val npys = Seq(
      Npy.synthNpy("<f4", Seq(5, 3), doubles = Array.tabulate(15)(_ * 0.25)),
      Npy.synthNpy("<i8", Seq(7), longs = Array.tabulate(7)(_ * 1000000007L)),
      Npy.synthNpy("|u1", Seq(2, 2, 2), longs = Array.tabulate(8)(_.toLong)))
    fuzz("npy", npys)(Npy.npyTensor)
    fuzz("npz", Seq(Zip.synthZip(npys.zipWithIndex.map {
      case (b, i) => s"t$i.npy" -> b
    })))(b => Zip.zipEntries(b).map { case (_, d) => Npy.npyTensor(d) })
  }

  test("AVI walk never escapes fail-closed") {
    val q = Array.fill(64)(16)
    val frames = (0 until 2).map { f =>
      Jpeg.synthJpeg(8, 8, 1, Seq(q)) { (_, _, _) =>
        val nat = new Array[Int](64); nat(0) = f; nat
      }
    }
    fuzz("avi", Seq(MultimodalOps.synthAviMjpeg(8, 8, 40000, frames)))(
      MultimodalOps.aviMjpegFrames)
  }

  test("shapefile + dbf + shx walks never escape fail-closed") {
    val shp = Shapefile.synthShp(Seq(
      "POINT (1.0 2.0)", "POLYGON ((0.0 0.0, 2.0 0.0, 2.0 2.0, 0.0 0.0))", null))
    val dbf = Shapefile.synthDbf(Seq(("DN", 'N', 8, 0), ("name", 'C', 10, 0)),
      Seq(Seq[Any](1L, "a"), Seq[Any](2L, "b"), Seq[Any](null, null)))
    fuzz("shp", Seq(shp))(Shapefile.shpRecords)
    fuzz("dbf", Seq(dbf))(Shapefile.dbfRows)
    fuzz("shx", Seq(Shapefile.synthShx(shp)))(Shapefile.shxEntries)
  }

  test("GPKG b-tree walk never escapes fail-closed") {
    val gpkg = GeoPackage.synthGpkg("seg", (0 until 6).map { i =>
      val x = i.toDouble
      (i.toLong + 1, GeoPackage.gpkgPolygonBlob(
        Seq((x, 0.0), (x + 1.0, 0.0), (x + 1.0, 1.0), (x, 0.0))), s"n$i", i * 0.5)
    })
    fuzz("gpkg", Seq(gpkg))(GeoPackage.layersOf)
  }

  test("CRS text parser never escapes fail-closed") {
    val rnd = new scala.util.Random(7)
    val base =
      "PROJCS[\"WGS 84 / UTM zone 33\",GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\"," +
        "SPHEROID[\"WGS 84\",6378137,298.257223563]],PRIMEM[\"Greenwich\",0]," +
        "UNIT[\"degree\",0.0174532925199433]],PROJECTION[\"Transverse_Mercator\"]," +
        "PARAMETER[\"latitude_of_origin\",0],PARAMETER[\"central_meridian\",15]," +
        "PARAMETER[\"scale_factor\",0.9996],PARAMETER[\"false_easting\",500000]," +
        "PARAMETER[\"false_northing\",0],UNIT[\"metre\",1]]"
    def mutate(): String = rnd.nextInt(3) match {
      case 0 => base.take(rnd.nextInt(base.length)) // truncate
      case 1 => // flip one char
        val at = rnd.nextInt(base.length)
        base.updated(at, (32 + rnd.nextInt(95)).toChar)
      case _ => // splice a structural character
        val at = rnd.nextInt(base.length)
        base.take(at) + "[]\",0".charAt(rnd.nextInt(5)) + base.drop(at)
    }
    (0 until 800).foreach { i =>
      try { CrsWkt.parseCrs(mutate()); () } catch {
        case _: IllegalArgumentException => // the contract
        case _: NumberFormatException => // bare-number parse of a mangled literal
        case e: Throwable =>
          fail(s"crs mutation $i escaped with ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }
}
