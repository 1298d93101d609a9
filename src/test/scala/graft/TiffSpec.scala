package graft

import graft.operators.{RasterBridge, Regrid, Tiff}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TIFF codec invariants (feature_stacking.py:75-98 ingest shape): the
  * synth writer and the IFD parser must agree in both byte orders and
  * both block layouts, and the block bridge must reproduce the raster
  * exactly through explodeBlocks.
  */
class TiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def meta(bytes: Array[Byte]) = Tiff.decodeMeta(bytes)
  private def fi(name: String) = Tiff.metaSchema.fieldIndex(name)

  test("tiled LE round trip recovers geometry") {
    val b = Tiff.synthTiff(40, 24, 16, 16, littleEndian = true, tile = true)((r, c) => r + c)
    val m = meta(b)
    assert(m.getInt(fi("width")) == 40 && m.getInt(fi("height")) == 24)
    assert(m.getInt(fi("bits_per_sample")) == 32 && m.getInt(fi("sample_format")) == 3
      && m.getInt(fi("compression")) == 1)
    assert(m.getInt(fi("n_bands")) == 1 && m.getInt(fi("planar_config")) == 1)
    assert(m.getBoolean(fi("tiled")))
    assert(m.getInt(fi("block_w")) == 16 && m.getInt(fi("block_h")) == 16)
    assert(m.getInt(fi("n_blocks")) == 3 * 2) // ceil(40/16) * ceil(24/16)
    assert(m.getString(fi("byte_order")) == "LE")
    assert(!m.getBoolean(fi("is_big"))) // classic, not BigTIFF
    assert(m.isNullAt(fi("px_w")) && m.isNullAt(fi("origin_x"))) // no geo tags
  }

  test("stripped BE round trip recovers geometry") {
    val b = Tiff.synthTiff(20, 30, 20, 8, littleEndian = false, tile = false)((r, c) => r - c)
    val m = meta(b)
    assert(m.getInt(fi("width")) == 20 && m.getInt(fi("height")) == 30)
    assert(!m.getBoolean(fi("tiled")))
    assert(m.getInt(fi("block_w")) == 20 && m.getInt(fi("block_h")) == 8)
    assert(m.getInt(fi("n_blocks")) == 4) // ceil(30/8)
    assert(m.getString(fi("byte_order")) == "BE")
  }

  test("GeoTIFF scale/tiepoint surface as a GridDef") {
    val g = Regrid.GridDef(-17.25, 48.5, 0.125, 0.25)
    val b = Tiff.synthTiff(8, 8, 8, 8, littleEndian = true, tile = true,
      grid = Some(g))((r, c) => 0f)
    assert(Tiff.gridDefOf(b).contains(g))
    val noGeo = Tiff.synthTiff(8, 8, 8, 8, littleEndian = true, tile = true)((r, c) => 0f)
    assert(Tiff.gridDefOf(noGeo).isEmpty)
  }

  test("non-TIFF payloads fail closed (null meta)") {
    assert(meta(null) == null)
    assert(meta(Array[Byte]()) == null)
    assert(meta("not a tiff at all".getBytes("UTF-8")) == null)
    assert(meta(operators.MultimodalOps.synthPngHeader(4, 4, alpha = false)) == null)
    // valid order bytes but wrong magic
    val junk = "II".getBytes("US-ASCII") ++ Array[Byte](41, 0, 8, 0, 0, 0)
    assert(meta(junk) == null)
  }

  test("blocksOf rejects unsupported compressions but reports them in meta") {
    val b = Tiff.synthTiff(8, 8, 8, 8, littleEndian = true, tile = true)((r, c) => 0f)
    // patch Compression (tag 259, third entry's value) to 6 — OLD-style
    // TIFF-6.0 JPEG, deprecated and rejected (new-style 7 decodes, r13)
    val patched = b.clone()
    // IFD at 8; entries at 10; 259 is the 4th entry (256,257,258,259)
    val valOff = 10 + 3 * 12 + 8
    patched(valOff) = 6
    val m = meta(patched)
    assert(m.getInt(fi("compression")) == 6) // header still parses, compression reported
    val e = intercept[IllegalArgumentException](Tiff.blocksOf(patched))
    assert(e.getMessage.contains("LZW"))
    // new-style JPEG (7) on a float32 file rejects on sample type instead
    val p7 = b.clone(); p7(valOff) = 7
    val e7 = intercept[IllegalArgumentException](Tiff.blocksOf(p7))
    assert(e7.getMessage.contains("8-bit unsigned"), e7.getMessage)
  }

  test("Deflate (8) and PackBits (32773) blocks round-trip; deflate pairs with predictors") {
    def v(r: Int, c: Int): Float = if ((r + c) % 9 == 0) -9999f else ((r * 31 + c) % 103).toFloat
    for (le <- Seq(true, false)) {
      // deflate float32 tiled, with and without the TechNote-3 predictor
      for (pred <- Seq(1, 3)) {
        val t = Tiff.synthMultibandTiff(20, 14, 8, 8, littleEndian = le, tile = true,
          bands = 1, pad = -9999f, predictor = pred, compressionCode = 8)((_, r, c) => v(r, c))
        val blocks = Tiff.blocksOf(t)
        assert(blocks.nonEmpty)
        val px = blocks.map { case (ty, tx, bh, bw, blob) =>
          val bb = java.nio.ByteBuffer.wrap(blob)
          (0 until bh * bw).map(i => (ty * 8 + i / bw, tx * 8 + i % bw) -> bb.getFloat(i * 4))
        }.flatten.toMap
        for (r <- 0 until 14; c <- 0 until 20)
          assert(px((r, c)) == v(r, c), s"deflate le=$le pred=$pred ($r,$c)")
      }
      // PackBits uint8 strips (run-heavy values exercise both packet kinds)
      val t2 = Tiff.synthMultibandTiff(20, 10, 20, 4, littleEndian = le, tile = false,
        bands = 1, sampleBits = 8, sampleFormat = 1, compressionCode = 32773,
        intValues = (_, r, c) => if (c < 12) (r * 3) % 250 else (r * 7 + c) % 250,
        intPad = 0L)((_, _, _) => 0f)
      val blocks2 = Tiff.blocksOf(t2)
      val px2 = blocks2.map { case (ty, tx, bh, bw, blob) =>
        val bb = java.nio.ByteBuffer.wrap(blob)
        (0 until bh * bw).map(i => (ty * 4 + i / bw, tx * 20 + i % bw) -> bb.getFloat(i * 4))
      }.flatten.toMap
      for (r <- 0 until 10; c <- 0 until 20) {
        val want = if (c < 12) (r * 3) % 250 else (r * 7 + c) % 250
        assert(px2((r, c)) == want.toFloat, s"packbits le=$le ($r,$c)")
      }
    }
    // packbits codec inverse on adversarial byte patterns
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 2, 127, 128, 129, 300)) {
      val data = Array.tabulate(n)(i =>
        if (i % 11 < 7) 42.toByte else rnd.nextInt(256).toByte)
      assert(Tiff.packBitsDecode(Tiff.packBitsEncode(data), n).sameElements(data), s"n=$n")
    }
  }

  test("tiled round trip through explodeBlocks reproduces the raster (both orders)") {
    for (le <- Seq(true, false)) {
      val tiff = Tiff.synthTiff(24, 16, 16, 16, littleEndian = le, tile = true,
        pad = -1f)((r, c) => (r * 24 + c).toFloat)
      val media = Seq((1L, tiff)).toDF("id", "bytes")
      val blocks = Tiff.tiffToBlocks(media)
      val px = RasterBridge.explodeBlocks(blocks, blockH = 16, blockW = 16, nodata = -1f)
        .select("px_row", "px_col", "value").as[(Int, Int, Float)].collect()
      assert(px.length == 24 * 16, s"le=$le")
      px.foreach { case (r, c, v) =>
        assert(r < 16 && c < 24 && v == r * 24 + c, s"le=$le ($r,$c)=$v")
      }
    }
  }

  test("stripped round trip clips the last strip instead of padding") {
    // 6 rows, 4 per strip: strips of 4 and 2 rows
    val tiff = Tiff.synthTiff(5, 6, 5, 4, littleEndian = true, tile = false)(
      (r, c) => (10 * r + c).toFloat)
    val blocks = Tiff.blocksOf(tiff)
    assert(blocks.map(b => (b._1, b._3)) == Seq((0, 4), (1, 2)))
    val media = Seq((1L, tiff)).toDF("id", "bytes")
    val px = RasterBridge.explodeBlocks(Tiff.tiffToBlocks(media),
        blockH = 4, blockW = 5, nodata = Float.NaN)
      .select("px_row", "px_col", "value").as[(Int, Int, Float)].collect()
    assert(px.length == 30)
    px.foreach { case (r, c, v) => assert(v == 10 * r + c, s"($r,$c)") }
  }

  test("writer geometry contracts are enforced") {
    intercept[IllegalArgumentException] {
      Tiff.synthTiff(0, 4, 4, 4, littleEndian = true, tile = true)((_, _) => 0f)
    }
    intercept[IllegalArgumentException] { // strips must span the width
      Tiff.synthTiff(8, 8, 4, 4, littleEndian = true, tile = false)((_, _) => 0f)
    }
  }

  // ---- TIFF-6 LZW (the reference's compress='lzw' profile) ----

  /** MSB-first bit packer for hand-building code streams in tests. */
  private def packCodes(codes: Seq[(Int, Int)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var n = 0
    codes.foreach { case (code, width) =>
      acc = (acc << width) | code; n += width
      while (n >= 8) { out.write(((acc >> (n - 8)) & 0xff).toInt); n -= 8 }
    }
    if (n > 0) out.write(((acc << (8 - n)) & 0xff).toInt)
    out.toByteArray
  }

  test("LZW decoder matches a hand-derived TIFF-6 code stream") {
    // input 7,7,7,8,8,7,7,6 encodes (by hand, per the spec's pseudo-code)
    // as: Clear, 7, 258("77"), 8, 8, 258, 6, EOI — all 9-bit codes.
    val codes = Seq(256, 7, 258, 8, 8, 258, 6, 257).map((_, 9))
    val decoded = Tiff.lzwDecode(packCodes(codes), 8)
    assert(decoded.toSeq == Seq[Byte](7, 7, 7, 8, 8, 7, 7, 6))
    // and the encoder emits exactly those bytes — widths proven against
    // the hand derivation, not just mirror-consistent with the decoder
    assert(Tiff.lzwEncode(Array[Byte](7, 7, 7, 8, 8, 7, 7, 6)).toSeq ==
      packCodes(codes).toSeq)
  }

  test("LZW round trip survives width changes and a table clear") {
    // ~20k pseudo-random bytes add >4093 table entries: crosses the
    // 9→10→11→12-bit early changes AND forces a mid-stream Clear.
    val rnd = new scala.util.Random(42)
    val noisy = Array.fill[Byte](20000)(rnd.nextInt(256).toByte)
    assert(Tiff.lzwDecode(Tiff.lzwEncode(noisy), noisy.length).toSeq == noisy.toSeq)
    // degenerate repetition exercises the KwKwK (code == next free) path
    val runs = Array.fill[Byte](8192)(0)
    val enc = Tiff.lzwEncode(runs)
    assert(enc.length < runs.length / 8) // and it actually compresses
    assert(Tiff.lzwDecode(enc, runs.length).toSeq == runs.toSeq)
    // truncated stream fails loudly, not with a short buffer
    intercept[IllegalArgumentException] {
      Tiff.lzwDecode(enc.take(enc.length / 2), runs.length)
    }
  }

  test("LZW tiled file reproduces the raster bit-exactly (both orders)") {
    for (le <- Seq(true, false)) {
      val tiff = Tiff.synthTiff(24, 16, 16, 16, littleEndian = le, tile = true,
        pad = -1f, lzw = true)((r, c) => (r * 24 + c).toFloat)
      assert(meta(tiff).getInt(fi("compression")) == 5)
      val media = Seq((1L, tiff)).toDF("id", "bytes")
      val px = RasterBridge.explodeBlocks(Tiff.tiffToBlocks(media),
          blockH = 16, blockW = 16, nodata = -1f)
        .select("px_row", "px_col", "value").as[(Int, Int, Float)].collect()
      assert(px.length == 24 * 16, s"le=$le")
      px.foreach { case (r, c, v) => assert(v == r * 24 + c, s"le=$le ($r,$c)=$v") }
    }
  }

  // ---- BigTIFF (magic 43 — the reference's bigtiff='YES') ----

  test("BigTIFF round trip recovers geometry and flags is_big") {
    val g = Regrid.GridDef(-3.5, 12.0, 0.5, 0.25)
    val b = Tiff.synthTiff(40, 24, 16, 16, littleEndian = true, tile = true,
      grid = Some(g), bigTiff = true)((r, c) => r + c)
    val m = meta(b)
    assert(m.getInt(0) == 40 && m.getInt(1) == 24)
    assert(m.getBoolean(fi("tiled")) && m.getBoolean(fi("is_big")))
    assert(m.getInt(fi("n_blocks")) == 6)
    assert(Tiff.gridDefOf(b).contains(g))
    // malformed BigTIFF headers fail closed
    val badOffsetSize = b.clone(); badOffsetSize(4) = 4
    assert(meta(badOffsetSize) == null)
  }

  test("GeoTIFF grid round-trips across the full endianness×container×codec matrix") {
    // Regression (r5 mm5 hash fail): BE+BigTIFF+grid wrote the DOUBLE
    // arrays' external offset as a left-justified 4-byte int, which the
    // u64 decode turned into offset<<32 → garbage ModelPixelScale.
    val g = Regrid.GridDef(-17.25, 48.5, 0.125, 0.25)
    for (le <- Seq(true, false); big <- Seq(false, true); lzw <- Seq(false, true)) {
      val b = Tiff.synthTiff(40, 24, 16, 16, littleEndian = le, tile = true,
        grid = Some(g), bigTiff = big, lzw = lzw)((r, c) => r + c)
      assert(Tiff.gridDefOf(b).contains(g), s"le=$le big=$big lzw=$lzw")
      val m = meta(b)
      assert(m.getInt(0) == 40 && m.getInt(1) == 24, s"le=$le big=$big lzw=$lzw")
    }
  }

  test("BigTIFF LZW stripped file decodes identically to its classic raw twin") {
    def fill(r: Int, c: Int): Float = (r * 31 + c * 7 % 13).toFloat
    val variants = Seq(
      Tiff.synthTiff(20, 30, 20, 8, littleEndian = false, tile = false,
        bigTiff = true, lzw = true)(fill),
      Tiff.synthTiff(20, 30, 20, 8, littleEndian = true, tile = false,
        bigTiff = true)(fill),
      Tiff.synthTiff(20, 30, 20, 8, littleEndian = true, tile = false)(fill))
    val expected = Tiff.blocksOf(variants.last).map(b => (b._1, b._2, b._3, b._4, b._5.toSeq))
    variants.dropRight(1).foreach { v =>
      assert(Tiff.blocksOf(v).map(b => (b._1, b._2, b._3, b._4, b._5.toSeq)) == expected)
    }
  }

  test("floating-point predictor (317=3) round-trips across layouts and byte orders") {
    // GDAL's PREDICTOR=3 profile for float32 rasters: byte-plane split +
    // row differencing before LZW. Values chosen to have distinct bytes in
    // every significance plane.
    def fill(r: Int, c: Int): Float = (r * 24 + c).toFloat * 1.25f - 100.5f
    for (le <- Seq(true, false); tile <- Seq(true, false); big <- Seq(false, true)) {
      val tag = s"le=$le tile=$tile big=$big"
      val tiff = Tiff.synthTiff(24, 16, if (tile) 16 else 24, if (tile) 16 else 8,
        littleEndian = le, tile = tile, lzw = true, bigTiff = big,
        predictor = 3, pad = -1f)(fill)
      val media = Seq((1L, tiff)).toDF("id", "bytes")
      val px = RasterBridge.explodeBlocks(Tiff.tiffToBlocks(media),
          blockH = if (tile) 16 else 8, blockW = if (tile) 16 else 24, nodata = -1f)
        .select("px_row", "px_col", "value").as[(Int, Int, Float)].collect()
      assert(px.length == 24 * 16, tag)
      px.foreach { case (r, c, v) => assert(v == fill(r, c), s"$tag ($r,$c)=$v") }
    }
    // multi-band chunky AND planar under the predictor
    def mv(b: Int, r: Int, c: Int): Float = (b * 977 + r * 20 + c).toFloat * 0.75f
    for (planar <- Seq(1, 2)) {
      val tiff = Tiff.synthMultibandTiff(20, 8, 20, 4, littleEndian = true,
        tile = false, bands = 2, planarConfig = planar, lzw = true, predictor = 3)(mv)
      for ((band, sy, _, bh, bw, blob) <- Tiff.bandBlocksOf(tiff)) {
        val bb = java.nio.ByteBuffer.wrap(blob)
        for (lr <- 0 until bh; lc <- 0 until bw)
          assert(bb.getFloat(4 * (lr * bw + lc)) == mv(band, sy * 4 + lr, lc),
            s"planar=$planar band=$band strip=$sy ($lr,$lc)")
      }
    }
    // predictor without LZW, and predictor 2, fail closed on both halves
    intercept[IllegalArgumentException] {
      Tiff.synthTiff(8, 8, 8, 8, littleEndian = true, tile = true,
        predictor = 3)((r, c) => 0f)
    }
    val p2 = Tiff.synthTiff(8, 8, 8, 8, littleEndian = true, tile = true,
      lzw = true, predictor = 3)((r, c) => (r + c).toFloat)
    val patched = p2.clone()
    // tag 317 value: entries at 10, find the 317 entry and set value to 2
    val n = (patched(8) & 0xff) | ((patched(9) & 0xff) << 8)
    val entryOff = (0 until n).map(10 + _ * 12)
      .find(o => ((patched(o) & 0xff) | ((patched(o + 1) & 0xff) << 8)) == 317).get
    patched(entryOff + 8) = 2
    val e = intercept[IllegalArgumentException](Tiff.blocksOf(patched))
    assert(e.getMessage.contains("Predictor"))
  }

  // ---- multi-band (the reference's 7-band stack, feature_stacking.py:219-251) ----

  test("multi-band files round-trip through bandBlocksOf in both planar configs") {
    def v(b: Int, r: Int, c: Int): Float = (b * 1000 + r * 24 + c).toFloat
    for (planar <- Seq(1, 2); le <- Seq(true, false); big <- Seq(false, true);
         lzw <- Seq(false, true)) {
      val tag = s"planar=$planar le=$le big=$big lzw=$lzw"
      val tiff = Tiff.synthMultibandTiff(24, 16, 16, 16, littleEndian = le,
        tile = true, bands = 3, planarConfig = planar, pad = -1f, lzw = lzw,
        bigTiff = big)(v)
      val m = meta(tiff)
      assert(m.getInt(fi("n_bands")) == 3, tag)
      assert(m.getInt(fi("planar_config")) == planar, tag)
      val blocks = Tiff.bandBlocksOf(tiff)
      assert(blocks.length == 3 * 2, tag) // 3 bands x 2 tiles
      for ((band, ty, tx, bh, bw, blob) <- blocks) {
        val bb = java.nio.ByteBuffer.wrap(blob)
        for (lr <- 0 until bh; lc <- 0 until bw) {
          val gr = ty * 16 + lr; val gc = tx * 16 + lc
          val expect = if (gr < 16 && gc < 24) v(band, gr, gc) else -1f
          assert(bb.getFloat(4 * (lr * bw + lc)) == expect, s"$tag band=$band ($gr,$gc)")
        }
      }
    }
  }

  test("multi-band strips with a clipped last strip decode per band") {
    def v(b: Int, r: Int, c: Int): Float = (b * 500 + r * 10 + c).toFloat
    for (planar <- Seq(1, 2)) {
      val tiff = Tiff.synthMultibandTiff(10, 11, 10, 4, littleEndian = true,
        tile = false, bands = 2, planarConfig = planar)(v)
      val blocks = Tiff.bandBlocksOf(tiff)
      assert(blocks.length == 2 * 3, s"planar=$planar") // 2 bands x ceil(11/4) strips
      for ((band, sy, _, bh, bw, blob) <- blocks) {
        assert(bh == (if (sy == 2) 3 else 4), s"planar=$planar strip $sy")
        val bb = java.nio.ByteBuffer.wrap(blob)
        for (lr <- 0 until bh; lc <- 0 until bw)
          assert(bb.getFloat(4 * (lr * bw + lc)) == v(band, sy * 4 + lr, lc),
            s"planar=$planar band=$band strip=$sy ($lr,$lc)")
      }
    }
  }

  test("single-band blocksOf fails closed on a multi-band file") {
    val tiff = Tiff.synthMultibandTiff(8, 8, 8, 8, littleEndian = true,
      tile = true, bands = 2)((b, r, c) => (b + r + c).toFloat)
    val e = intercept[IllegalArgumentException](Tiff.blocksOf(tiff))
    assert(e.getMessage.contains("SamplesPerPixel"))
    // band-aware DataFrame path decodes it fine
    val media = Seq((1L, tiff)).toDF("id", "bytes")
    assert(Tiff.tiffToBandBlocks(media).count() == 2)
  }

  test("single-band synthMultibandTiff output is byte-identical to synthTiff") {
    val a = Tiff.synthTiff(20, 12, 20, 4, littleEndian = false, tile = false,
      lzw = true)((r, c) => (r * 20 + c).toFloat)
    val b = Tiff.synthMultibandTiff(20, 12, 20, 4, littleEndian = false,
      tile = false, bands = 1, lzw = true)((_, r, c) => (r * 20 + c).toFloat)
    assert(java.util.Arrays.equals(a, b))
  }

  test("integer predictor (317=2) round-trips int8/16/32 across layouts and byte orders") {
    // GDAL's PREDICTOR=2 profile for integer rasters — the reference's
    // stage-1 OUTPUT (int32 labels + LZW, pixel_classifier_stream.py:77-83).
    // Signed int32 with negatives (incl. the -1 nodata convention):
    def fill(r: Int, c: Int): Long = r * 31L + c * 7L - 200L
    for (le <- Seq(true, false); big <- Seq(false, true); tile <- Seq(true, false)) {
      val tag = s"le=$le big=$big tile=$tile"
      val tiff = Tiff.synthMultibandTiff(24, 10, if (tile) 16 else 24,
        if (tile) 8 else 4, littleEndian = le, tile = tile, bands = 1,
        lzw = true, bigTiff = big, predictor = 2,
        sampleBits = 32, sampleFormat = 2,
        intValues = (_, r, c) => fill(r, c), intPad = -1L)((_, _, _) => 0f)
      val px = RasterBridge.explodeBlocks(
          Tiff.tiffToBlocks(Seq((1L, tiff)).toDF("id", "bytes")),
          blockH = if (tile) 8 else 4, blockW = if (tile) 16 else 24, nodata = -1f)
        .select("px_row", "px_col", "value").as[(Int, Int, Float)].collect()
      assert(px.length == 24 * 10, tag)
      px.foreach { case (r, c, v) => assert(v == fill(r, c).toFloat, s"$tag ($r,$c)=$v") }
    }
    // uint16 with wraparound-heavy deltas (mod-2^16 differencing must hold)
    val u16vals = Array(0L, 65535L, 1L, 65534L, 32768L, 5L, 65000L, 7L)
    val u16 = Tiff.synthMultibandTiff(8, 4, 8, 2, littleEndian = true,
      tile = false, bands = 1, lzw = true, predictor = 2,
      sampleBits = 16, sampleFormat = 1,
      intValues = (_, r, c) => u16vals((r * 8 + c) % 8), intPad = 0L)((_, _, _) => 0f)
    for ((_, sy, _, bh, bw, blob) <- Tiff.bandBlocksOf(u16)) {
      val bb = java.nio.ByteBuffer.wrap(blob)
      for (lr <- 0 until bh; lc <- 0 until bw) {
        val gr = sy * 2 + lr
        assert(bb.getFloat(4 * (lr * bw + lc)) == u16vals((gr * 8 + lc) % 8).toFloat,
          s"u16 ($gr,$lc)")
      }
    }
    // int8 signed, multi-band chunky AND planar (per-CHANNEL differencing)
    def i8(b: Int, r: Int, c: Int): Long = ((b * 53 + r * 11 + c * 3) % 256) - 128
    for (planar <- Seq(1, 2)) {
      val tiff = Tiff.synthMultibandTiff(12, 6, 12, 3, littleEndian = false,
        tile = false, bands = 3, planarConfig = planar, lzw = true,
        predictor = 2, sampleBits = 8, sampleFormat = 2,
        intValues = i8, intPad = 0L)((_, _, _) => 0f)
      for ((band, sy, _, bh, bw, blob) <- Tiff.bandBlocksOf(tiff)) {
        val bb = java.nio.ByteBuffer.wrap(blob)
        for (lr <- 0 until bh; lc <- 0 until bw)
          assert(bb.getFloat(4 * (lr * bw + lc)) == i8(band, sy * 3 + lr, lc).toFloat,
            s"planar=$planar band=$band ($lr,$lc)")
      }
    }
    // uncompressed integer samples (predictor 1) decode through the same path
    val raw32 = Tiff.synthMultibandTiff(6, 4, 6, 2, littleEndian = true,
      tile = false, bands = 1, sampleBits = 32, sampleFormat = 1,
      intValues = (_, r, c) => r * 6L + c, intPad = 0L)((_, _, _) => 0f)
    val got = Tiff.blocksOf(raw32).flatMap { case (sy, _, bh, bw, blob) =>
      val bb = java.nio.ByteBuffer.wrap(blob)
      for (lr <- 0 until bh; lc <- 0 until bw)
        yield ((sy * 2 + lr) * 6 + lc, bb.getFloat(4 * (lr * bw + lc)))
    }
    got.foreach { case (i, v) => assert(v == i.toFloat, s"raw32 px$i") }
    // fail closed: predictor 2 needs LZW + integer; predictor 3 rejects ints
    intercept[IllegalArgumentException] {
      Tiff.synthMultibandTiff(8, 8, 8, 8, littleEndian = true, tile = true,
        bands = 1, predictor = 2, sampleBits = 32, sampleFormat = 2,
        intValues = (_, _, _) => 0L)((_, _, _) => 0f)
    }
    intercept[IllegalArgumentException] {
      Tiff.synthMultibandTiff(8, 8, 8, 8, littleEndian = true, tile = true,
        bands = 1, lzw = true, predictor = 3, sampleBits = 32,
        sampleFormat = 2, intValues = (_, _, _) => 0L)((_, _, _) => 0f)
    }
    // reader side: an int LZW file patched to claim predictor 3 must refuse
    val okInt = Tiff.synthMultibandTiff(8, 8, 8, 8, littleEndian = true,
      tile = true, bands = 1, lzw = true, predictor = 2, sampleBits = 32,
      sampleFormat = 2, intValues = (_, r, c) => (r + c).toLong)((_, _, _) => 0f)
    val n = (okInt(8) & 0xff) | ((okInt(9) & 0xff) << 8)
    val off317 = (0 until n).map(10 + _ * 12)
      .find(o => ((okInt(o) & 0xff) | ((okInt(o + 1) & 0xff) << 8)) == 317).get
    val patched = okInt.clone(); patched(off317 + 8) = 3
    val e = intercept[IllegalArgumentException](Tiff.blocksOf(patched))
    assert(e.getMessage.contains("Predictor"))
  }

  // ---- the GeoTIFF raster SINK (write half of the stage-0/1 contract) ----

  /** Deterministic pixel fixture: 2 scenes × 2 bands over a 37×29 raster
    * (non-multiples of the 16-px block → edge padding on both axes),
    * every cell integral so float32 carries it exactly.
    */
  private def sinkPixels = (for {
    scene <- Seq("sceneA", "sceneB")
    band <- 0 until 2
    r <- 0 until 29; c <- 0 until 37
  } yield (scene, band, r, c,
    ((r * 31 + c * 7 + band * 3 + scene.length) % 1000).toFloat))
    .toDF("scene", "band", "px_row", "px_col", "value")

  test("writeGeoTiffFiles: packBlocks -> write -> re-ingest is the identity across the profile matrix") {
    val px = sinkPixels
    val blocks = RasterBridge.packBlocks(px, 16, 16, Float.NaN,
        keyCols = Seq("scene", "band"))
      .withColumn("origin_x", lit(500000.0)).withColumn("origin_y", lit(4100000.0))
      .withColumn("px_w", lit(30.0)).withColumn("px_h", lit(30.0))
      .withColumn("width", lit(37)).withColumn("height", lit(29))
    val profiles = Seq(
      ("lzw_bigtiff", 5, true, 1, 1, true), // the reference's write profile
      ("deflate_pred3", 8, false, 1, 3, true),
      ("packbits_planar", 32773, true, 2, 1, false),
      ("raw_be", 1, false, 1, 1, false))
    val want = px.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getFloat(4))).toSet
    for ((tag, comp, big, planar, pred, le) <- profiles) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_gtiff_$tag").toString
      Tiff.writeGeoTiffFiles(blocks, dir, sceneCol = "scene", littleEndian = le,
        compressionCode = comp, bigTiff = big, planarConfig = planar, predictor = pred)
      val files = new java.io.File(dir).listFiles().map(_.getName).sorted
      assert(files.toSeq == Seq("sceneA.tif", "sceneB.tif"), s"$tag: $files")
      // container metadata carries the full profile + the grid tags
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "sceneA.tif"))
      val m = meta(bytes)
      assert(m.getInt(fi("width")) == 37 && m.getInt(fi("height")) == 29, tag)
      assert(m.getInt(fi("compression")) == comp && m.getBoolean(fi("is_big")) == big, tag)
      assert(m.getInt(fi("n_bands")) == 2, tag)
      assert(m.getDouble(fi("origin_x")) == 500000.0 &&
        m.getDouble(fi("origin_y")) == 4100000.0 &&
        m.getDouble(fi("px_w")) == 30.0, tag)
      // re-ingest through the real source path; the container must be
      // invisible: exactly the input pixels, bit-for-bit
      val back = RasterBridge.explodeBlocks(
        Tiff.readGeoTiffFiles(spark, dir), 16, 16, Float.NaN)
      val got = back.collect().map(r => (r.getString(0), r.getInt(1),
        r.getInt(2), r.getInt(3), r.getFloat(4))).toSet
      assert(got == want, s"$tag: ${got.size} vs ${want.size} pixels")
    }
  }

  test("writeGeoTiffFiles: int32 label profile (the pixel_classifier shape, nodata -1)") {
    // sparse labels: only some cells carry a segment id; nodata -1
    val px = (for {
      r <- 0 until 20; c <- 0 until 20
      if (r + c) % 3 == 0
    } yield ("labels", r, c, (r * 1000 + c).toFloat)).toDF("scene", "px_row", "px_col", "value")
    val blocks = RasterBridge.packBlocks(px, 16, 16, -1f, keyCols = Seq("scene"))
      .withColumn("width", lit(20)).withColumn("height", lit(20))
    val dir = java.nio.file.Files.createTempDirectory("graft_gtiff_int").toString
    Tiff.writeGeoTiffFiles(blocks, dir, sceneCol = "scene",
      compressionCode = 5, bigTiff = true, predictor = 2,
      sampleBits = 32, sampleFormat = 2, nodata = -1f)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "labels.tif"))
    val m = meta(bytes)
    assert(m.getInt(fi("sample_format")) == 2 && m.getInt(fi("bits_per_sample")) == 32)
    val back = RasterBridge.explodeBlocks(
      Tiff.readGeoTiffFiles(spark, dir), 16, 16, -1f)
    // back = (scene, band, px_row, px_col, value); single-band → band 0
    val got = back.collect().map(r => (r.getInt(2), r.getInt(3), r.getFloat(4))).toSet
    val want = px.collect().map(r => (r.getInt(1), r.getInt(2), r.getFloat(3))).toSet
    assert(got == want)
    // integral nodata is enforced for integer formats
    val e = intercept[IllegalArgumentException] {
      Tiff.writeGeoTiffFiles(blocks, dir, sceneCol = "scene",
        sampleFormat = 2, nodata = Float.NaN)
    }
    assert(e.getMessage.contains("integral nodata"))
  }

  test("writeGeoTiffFiles fails loudly on inconsistent scenes") {
    def write(blocks: org.apache.spark.sql.DataFrame): Unit = {
      val dir = java.nio.file.Files.createTempDirectory("graft_gtiff_bad").toString
      Tiff.writeGeoTiffFiles(blocks, dir, sceneCol = "scene")
    }
    def mentions(t: Throwable, s: String): Boolean =
      t != null && (String.valueOf(t.getMessage).contains(s) || mentions(t.getCause, s))
    val base = RasterBridge.packBlocks(sinkPixels, 16, 16, Float.NaN,
      keyCols = Seq("scene", "band"))
    // duplicate block (same band/tile twice)
    val dup = base.union(base.limit(1))
    assert(mentions(intercept[Exception](write(dup)), "duplicate block"))
    // negative tile index (raster origin is (0,0))
    val neg = RasterBridge.packBlocks(
      Seq(("s", -1, 2, 1.0f)).toDF("scene", "px_row", "px_col", "value"),
      16, 16, Float.NaN, keyCols = Seq("scene"))
    assert(mentions(intercept[Exception](write(neg)), "negative tile"))
    // per-scene varying georeferencing
    val geo = base.withColumn("origin_x",
        when(col("tile_x") === 0, 1.0).otherwise(2.0))
      .withColumn("origin_y", lit(0.0)).withColumn("px_w", lit(1.0))
      .withColumn("px_h", lit(1.0))
    assert(mentions(intercept[Exception](write(geo)), "origin_x varies"))
  }

  test("single-block files keep offsets/counts inline (both containers)") {
    // one 8x8 tile: the offset/count arrays fit the value field, so the
    // spec's inline rule applies — a pointer there would misdecode.
    for (big <- Seq(false, true); lzw <- Seq(false, true)) {
      val tiff = Tiff.synthTiff(8, 8, 8, 8, littleEndian = true, tile = true,
        bigTiff = big, lzw = lzw)((r, c) => (r * 8 + c).toFloat)
      val blocks = Tiff.blocksOf(tiff)
      assert(blocks.length == 1, s"big=$big lzw=$lzw")
      val buf = java.nio.ByteBuffer.wrap(blocks.head._5)
      for (i <- 0 until 64) assert(buf.getFloat(4 * i) == i, s"big=$big lzw=$lzw px$i")
    }
  }

  test("IFD entry with wrapped/huge count rejects descriptively (classic + BigTIFF)") {
    // classic: entry count is a raw u32 — patch entry 0's count to
    // 0xFFFFFFFF (4 GiB of elements in a 300-byte file)
    val b = Tiff.synthTiff(8, 8, 8, 8, littleEndian = true, tile = true)((r, c) => 0f)
    val p = b.clone()
    // IFD at 8, entries at 10: tag(2) typ(2) count(4) val(4) → entry0 count at 14
    for (i <- 14 until 18) p(i) = -1
    val e = intercept[IllegalArgumentException](Tiff.blocksOf(p))
    assert(e.getMessage.contains("count"), e.getMessage)
    // BigTIFF: count is a raw u64 read as SIGNED Long — all-ones is -1,
    // which the pre-fix size test (typeSize*count <= 8) silently passed
    val bb = Tiff.synthTiff(8, 8, 8, 8, littleEndian = true, tile = true,
      bigTiff = true)((r, c) => 0f)
    val pb = bb.clone()
    val ifd = java.nio.ByteBuffer.wrap(pb, 8, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong.toInt
    // entries at ifd+8, 20 bytes each: tag(2) typ(2) count(8) val(8)
    for (i <- ifd + 12 until ifd + 20) pb(i) = -1
    val e2 = intercept[IllegalArgumentException](Tiff.blocksOf(pb))
    assert(e2.getMessage.contains("count"), e2.getMessage)
  }

  test("writeGeoTiffFiles normalizes numeric type drift; non-numeric rejects descriptively") {
    val base = RasterBridge.packBlocks(sinkPixels, 16, 16, Float.NaN,
      keyCols = Seq("scene", "band"))
    // integer georeferencing + long extents: cast up front, identical output
    val drift = base
      .withColumn("origin_x", lit(500000)).withColumn("origin_y", lit(4100000))
      .withColumn("px_w", lit(30)).withColumn("px_h", lit(30))
      .withColumn("width", lit(37L)).withColumn("height", lit(29L))
    val dir = java.nio.file.Files.createTempDirectory("graft_gtiff_drift").toString
    Tiff.writeGeoTiffFiles(drift, dir, sceneCol = "scene")
    val m = meta(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "sceneA.tif")))
    assert(m.getDouble(fi("origin_x")) == 500000.0 && m.getInt(fi("width")) == 37)
    // a STRING width is not castable type drift — reject loudly up front
    val e = intercept[IllegalArgumentException] {
      Tiff.writeGeoTiffFiles(base.withColumn("width", lit("37")),
        java.nio.file.Files.createTempDirectory("graft_gtiff_bad2").toString,
        sceneCol = "scene")
    }
    assert(e.getMessage.contains("must be numeric"), e.getMessage)
  }

  test("JPEG-in-TIFF: shared JPEGTables == inline tables == standalone JPEG; edge strip crops (r13)") {
    import graft.operators.Jpeg
    val qG = Array.fill(64)(16)
    def strip(si: Int) = Jpeg.synthJpeg(20, 8, 1, Seq(qG)) { (_, _, bx) =>
      val nat = new Array[Int](64)
      nat(0) = ((si * 5 + bx) * 7) % 40 - 20
      nat
    }
    val shared = Tiff.synthJpegTiff(20, 20, 1, 8)(strip)
    val inline = Tiff.synthJpegTiff(20, 20, 1, 8, useJpegTables = false)(strip)
    val a = Tiff.bandBlocksOf(shared)
    val b = Tiff.bandBlocksOf(inline)
    // geometry: 3 strips, last clipped to 4 rows (its JPEG is 8 tall - crop)
    assert(a.map(t => (t._1, t._2, t._3, t._4, t._5)) ==
      Seq((0, 0, 0, 8, 20), (0, 1, 0, 8, 20), (0, 2, 0, 4, 20)))
    // the two table spellings decode identically
    assert(a.size == b.size && a.zip(b).forall { case (x, y) =>
      (x._1, x._2, x._3, x._4, x._5) == (y._1, y._2, y._3, y._4, y._5) &&
        java.util.Arrays.equals(x._6, y._6)
    })
    // blob floats equal the standalone full-stream decode (cropped rows)
    for (((_, _, _, bh, bw, blob), si) <- a.zipWithIndex) {
      val (jw, jh, ch, px) = Jpeg.decodeJpegPixels(strip(si))
      assert((jw, jh, ch) == ((20, 8, 1)))
      for (r <- 0 until bh; c <- 0 until bw) {
        val o = 4 * (r * bw + c)
        val bits = ((blob(o) & 0xff) << 24) | ((blob(o + 1) & 0xff) << 16) |
          ((blob(o + 2) & 0xff) << 8) | (blob(o + 3) & 0xff)
        assert(java.lang.Float.intBitsToFloat(bits) == (px(r * jw + c) & 0xff).toFloat,
          s"strip $si ($r,$c)")
      }
    }
    // the shared file really holds abbreviated strips (one DQT total, in
    // JPEGTables); the inline file repeats tables per strip. Marker scans
    // are safe: entropy data byte-stuffs 0xff, and every other byte here
    // is deterministic.
    def countMarker(bytes: Array[Byte], m: Int): Int =
      (0 until bytes.length - 1).count(i =>
        (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == m)
    assert(countMarker(shared, 0xdb) == 1 && countMarker(inline, 0xdb) == 3)
    // 3-channel YCbCr with inline tables: three band planes per strip
    val color = Tiff.synthJpegTiff(16, 16, 3, 16, useJpegTables = false)(_ =>
      Jpeg.synthJpeg(16, 16, 3, Seq(Array.fill(64)(10), Array.fill(64)(12))) {
        (ch, by, bx) =>
          val nat = new Array[Int](64)
          nat(0) = (ch * 11 + by + bx * 5) % 30 - 15
          nat
      })
    val cb = Tiff.bandBlocksOf(color)
    assert(cb.map(_._1) == Seq(0, 1, 2) &&
      cb.forall(t => (t._4, t._5) == ((16, 16))))
    // channel mismatch fails closed (file declares 3 samples, stream has 1)
    val bad = Tiff.synthJpegTiff(16, 8, 3, 8, useJpegTables = false)(_ =>
      Jpeg.synthJpeg(16, 8, 1, Seq(qG))((_, _, _) => new Array[Int](64)))
    val e1 = intercept[Exception](Tiff.bandBlocksOf(bad))
    assert(e1.getMessage.contains("components"), e1.getMessage)
    // T.81 B.1.1.2 fill bytes before a marker are skipped, not misread
    // as a marker code (a fill before DQT must not shift the split)
    locally {
      val full = strip(0)
      val at = full.indexOfSlice(Array(0xff.toByte, 0xdb.toByte))
      assert(at > 0, "no DQT in the fixture stream")
      val filled = full.take(at) ++ Array(0xff.toByte) ++ full.drop(at)
      val (t1, r1) = Jpeg.splitTables(full)
      val (t2, r2) = Jpeg.splitTables(filled)
      assert(java.util.Arrays.equals(t1, t2) && java.util.Arrays.equals(r1, r2))
    }
    // corrupted JPEGTables (EOI clobbered) fails closed descriptively
    val tables = Jpeg.splitTables(strip(0))._1
    val at = shared.indexOfSlice(tables)
    assert(at > 0, "tables payload not found in container")
    val corrupt = shared.clone()
    corrupt(at + tables.length - 1) = 0x00
    val e2 = intercept[Exception](Tiff.bandBlocksOf(corrupt))
    assert(e2.getMessage.contains("JPEGTables"), e2.getMessage)
  }
}
