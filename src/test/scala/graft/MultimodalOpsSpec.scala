package graft

import graft.operators.{MultimodalOps, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media = Seq(
    (1L, "payload-one", "img"),
    (2L, "payload-two", "img"),
    (3L, "payload-one", "img") // identical bytes to 1
  ).toDF("media_id", "payload", "format")
    .withColumn("bytes", col("payload").cast("binary"))
    .drop("payload")

  test("withDecodedMeta attaches deterministic typed metadata (decode plumbing)") {
    val out = MultimodalOps.withDecodedMeta(media).select("media_id", "meta.*")
    val rows = out.orderBy("media_id").collect()
    assert(rows.length == 3)
    // identical bytes → identical meta; different bytes → (a.s.) different
    assert(rows(0).toSeq.tail == rows(2).toSeq.tail)
    assert(rows(0).getInt(1) != rows(1).getInt(1) || rows(0).getInt(2) != rows(1).getInt(2))
    // schema contract
    rows.foreach { r =>
      assert(r.getInt(1) >= 16 && r.getInt(1) < 16 + 2048) // width
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 4)         // channels
      assert(r.getInt(4) >= 1 && r.getInt(4) <= 240)       // n_frames
      assert(r.getString(5) == "img")
    }
  }

  test("decodeHeaderMeta parses real PNG/BMP headers and stubs the rest") {
    // PNG RGBA 640×480 — big-endian IHDR fields
    val png = MultimodalOps.decodeHeaderMeta(
      MultimodalOps.synthPngHeader(640, 480, alpha = true), "x")
    assert(png.toSeq == Seq(640, 480, 4, 1, "png"))
    // PNG RGB without alpha
    assert(MultimodalOps.decodeHeaderMeta(
      MultimodalOps.synthPngHeader(7, 9, alpha = false), "x").toSeq == Seq(7, 9, 3, 1, "png"))
    // BMP 24-bit 1920×1080 — little-endian DIB fields
    val bmp = MultimodalOps.decodeHeaderMeta(
      MultimodalOps.synthBmpHeader(1920, 1080, bpp = 24), "x")
    assert(bmp.toSeq == Seq(1920, 1080, 3, 1, "bmp"))
    // top-down BMP stores negative height; dims come back positive
    val neg = MultimodalOps.synthBmpHeader(32, -64, bpp = 32)
    assert(MultimodalOps.decodeHeaderMeta(neg, "x").toSeq == Seq(32, 64, 4, 1, "bmp"))
    // text that merely starts with "BM" must NOT sniff as BMP
    val text = "BM is a prefix of this perfectly ordinary sentence padded out".getBytes("UTF-8")
    assert(MultimodalOps.decodeHeaderMeta(text, "img").getString(4) == "img")
    // truncated PNG signature falls back too
    assert(MultimodalOps.decodeHeaderMeta(Array[Byte](0x89.toByte, 'P'), "img").getString(4) == "img")
  }

  test("withResizedMeta preserves aspect ratio and caps the long side") {
    val out = MultimodalOps.withResizedMeta(MultimodalOps.withDecodedMeta(media), maxSide = 64)
      .select("meta.width", "meta.height", "resized_meta.width", "resized_meta.height")
    out.collect().foreach { r =>
      val (w, h, rw, rh) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(math.max(rw, rh) <= 64)
      // aspect preserved within integer truncation
      if (w >= h) assert(math.abs(rh.toDouble / rw - h.toDouble / w) < 0.1)
    }
  }

  test("sampleFrames explodes every stride-th frame (generator shape)") {
    val decoded = MultimodalOps.withDecodedMeta(media)
    val frames = MultimodalOps.sampleFrames(decoded, stride = 4)
    val counts = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nFrames = decoded.select("media_id", "meta.n_frames")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    nFrames.foreach { case (id, n) =>
      assert(counts(id) == (n - 1) / 4 + 1, s"media $id: $n frames")
    }
    // frame indices are the arithmetic sequence
    val idx1 = frames.filter(col("media_id") === 1).select("frame_idx")
      .as[Int].collect().sorted
    assert(idx1.toSeq == (0 until nFrames(1L) by 4).toSeq)
  }

  test("decodeWavMeta round-trips canonical PCM WAV and fails closed otherwise") {
    val b = MultimodalOps.synthWavHeader(44100, 2, 16, 44100L)
    val m = MultimodalOps.decodeWavMeta(b)
    assert(m.getInt(0) == 44100 && m.getInt(1) == 2 && m.getInt(2) == 16)
    assert(m.getLong(3) == 44100L && m.getLong(4) == 1000000L)
    // mono 8-bit, non-integer duration floors
    val m2 = MultimodalOps.decodeWavMeta(MultimodalOps.synthWavHeader(8000, 1, 8, 12345L))
    assert(m2.getLong(3) == 12345L && m2.getLong(4) == 12345L * 1000000L / 8000L)
    // not WAV → null (no stub fabrication on the audio path)
    assert(MultimodalOps.decodeWavMeta("RIFFxxxxTEXT".getBytes ++ new Array[Byte](40)) == null)
    assert(MultimodalOps.decodeWavMeta(MultimodalOps.synthPngHeader(4, 4, alpha = true)) == null)
    // truncated header → null
    assert(MultimodalOps.decodeWavMeta(b.take(40)) == null)
    // withAudioMeta: NULL struct for unparseable rows, values for good ones
    val df = Seq((1L, b), (2L, Array[Byte](1, 2, 3))).toDF("media_id", "bytes")
    val out = MultimodalOps.withAudioMeta(df).orderBy("media_id").collect()
    assert(out(0).getAs[org.apache.spark.sql.Row]("audio_meta").getInt(0) == 44100)
    assert(out(1).isNullAt(out(1).fieldIndex("audio_meta")))
  }

  test("PNG pixel decode: every row filter round-trips in every color layout") {
    def v(r: Int, c: Int, ch: Int): Int = (r * 37 + c * 11 + ch * 71 + 13) % 256
    for (ch <- Seq(1, 2, 3, 4); ft <- 0 to 4) {
      val png = MultimodalOps.synthPng(9, 7, ch, _ => ft)(v)
      val (w, h, nch, px) = MultimodalOps.decodePngPixels(png)
      assert((w, h, nch) == ((9, 7, ch)), s"ch=$ch ft=$ft")
      for (r <- 0 until 7; c <- 0 until 9; k <- 0 until ch)
        assert((px((r * 9 + c) * ch + k) & 0xff) == v(r, c, k), s"ch=$ch ft=$ft ($r,$c,$k)")
    }
    // mixed filters per row (the realistic encoder output)
    val png = MultimodalOps.synthPng(16, 10, 3, r => (r * 3 + 1) % 5)(v)
    val (_, _, _, px) = MultimodalOps.decodePngPixels(png)
    for (r <- 0 until 10; c <- 0 until 16; k <- 0 until 3)
      assert((px((r * 16 + c) * 3 + k) & 0xff) == v(r, c, k), s"mixed ($r,$c,$k)")
  }

  test("PNG 16-bit decode: big-endian samples round-trip through every filter") {
    def v(r: Int, c: Int, ch: Int): Int = (r * 9173 + c * 517 + ch * 31 + 260) % 65536
    for (ch <- Seq(1, 3); ft <- 0 to 4) {
      val png = MultimodalOps.synthPng(7, 5, ch, _ => ft, depth = 16)(v)
      val (w, h, nch, px) = MultimodalOps.decodePngPixels(png)
      assert((w, h, nch) == ((7, 5, ch)), s"ch=$ch ft=$ft")
      for (r <- 0 until 5; c <- 0 until 7; k <- 0 until ch)
        assert(px((r * 7 + c) * ch + k) == v(r, c, k), s"16-bit ch=$ch ft=$ft ($r,$c,$k)")
    }
  }

  test("PNG palette decode: PLTE indices expand to RGB") {
    val palette = (0 until 17).map(i => ((i * 13) % 256, (i * 29) % 256, (i * 47) % 256))
    val png = MultimodalOps.synthPngPalette(11, 6, palette)((r, c) => (r * 11 + c) % 17)
    val (w, h, nch, px) = MultimodalOps.decodePngPixels(png)
    assert((w, h, nch) == ((11, 6, 3)))
    for (r <- 0 until 6; c <- 0 until 11) {
      val (pr, pg, pb) = palette((r * 11 + c) % 17)
      assert((px((r * 11 + c) * 3), px((r * 11 + c) * 3 + 1), px((r * 11 + c) * 3 + 2))
        == ((pr, pg, pb)), s"($r,$c)")
    }
  }

  test("PNG palette + tRNS: per-entry alpha expands to RGBA, short tables pad opaque") {
    val palette = Seq((10, 20, 30), (40, 50, 60), (70, 80, 90))
    val alpha = Seq(0, 128) // entry 2 beyond the table -> 255
    val png = MultimodalOps.synthPngPalette(3, 2, palette, alpha = alpha)(
      (r, c) => (r * 3 + c) % 3)
    val (w, h, nch, px) = MultimodalOps.decodePngPixels(png)
    assert((w, h, nch) == ((3, 2, 4)))
    for (r <- 0 until 2; c <- 0 until 3) {
      val i = (r * 3 + c) % 3
      val (pr, pg, pb) = palette(i)
      val pa = if (i < alpha.length) alpha(i) else 255
      val base = (r * 3 + c) * 4
      assert((px(base), px(base + 1), px(base + 2), px(base + 3)) == ((pr, pg, pb, pa)),
        s"($r,$c)")
    }
  }

  test("PNG packed 1/2/4-bit depths round-trip through every filter (r12)") {
    // gray: all depths, widths that don't byte-align, all five filters
    for (depth <- Seq(1, 2, 4); (w, h) <- Seq((1, 1), (13, 7), (8, 3), (17, 5))) {
      val maxV = (1 << depth) - 1
      def v(r: Int, c: Int) = (r * 3 + c * 5) % (maxV + 1)
      val bytes = MultimodalOps.synthPngPacked(w, h, depth)(v)
      val (dw, dh, ch, px) = MultimodalOps.decodePngPixels(bytes)
      assert((dw, dh, ch) == ((w, h, 1)), s"d$depth ${w}x$h")
      for (r <- 0 until h; c <- 0 until w)
        assert(px(r * w + c) == v(r, c), s"d$depth ($r,$c)")
    }
    // packed palette + per-entry alpha → RGBA
    val pal = Seq((10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120))
    val pp = MultimodalOps.synthPngPacked(9, 4, 2, palette = Some(pal),
      alpha = Seq(7, 250))((r, c) => (r + c) % 4)
    val (_, _, pch, ppx) = MultimodalOps.decodePngPixels(pp)
    assert(pch == 4)
    for (r <- 0 until 4; c <- 0 until 9) {
      val i = (r + c) % 4
      val at = (r * 9 + c) * 4
      assert(ppx(at) == pal(i)._1 && ppx(at + 1) == pal(i)._2 &&
        ppx(at + 2) == pal(i)._3)
      assert(ppx(at + 3) == (i match { case 0 => 7; case 1 => 250; case _ => 255 }))
    }
    // gray transparent color: matching pixels get alpha 0, max otherwise
    val gt = MultimodalOps.synthPngPacked(6, 3, 2, transparentGray = Some(2))(
      (r, c) => (r + c) % 4)
    val (_, _, gch, gpx) = MultimodalOps.decodePngPixels(gt)
    assert(gch == 2)
    for (r <- 0 until 3; c <- 0 until 6) {
      val v = (r + c) % 4
      assert(gpx((r * 6 + c) * 2) == v)
      assert(gpx((r * 6 + c) * 2 + 1) == (if (v == 2) 0 else 3))
    }
    // truecolor transparent color at depth 8 and 16
    for (depth <- Seq(8, 16)) {
      val m = if (depth == 8) 256 else 65536
      def v(r: Int, c: Int, k: Int) = (r * 1031 + c * 517 + k * 89) % m
      val t = Seq(v(1, 1, 0), v(1, 1, 1), v(1, 1, 2))
      val bytes = MultimodalOps.synthPng(5, 4, 3, depth = depth,
        transparent = Some(t))(v)
      val (_, _, ch, px) = MultimodalOps.decodePngPixels(bytes)
      assert(ch == 4)
      for (r <- 0 until 4; c <- 0 until 5) {
        val isT = (0 until 3).forall(k => v(r, c, k) == t(k))
        assert(px((r * 5 + c) * 4 + 3) == (if (isT) 0 else m - 1),
          s"d$depth ($r,$c)")
        for (k <- 0 until 3) assert(px((r * 5 + c) * 4 + k) == v(r, c, k))
      }
      assert((0 until 4).exists(r => (0 until 5).exists(c =>
        (0 until 3).forall(k => v(r, c, k) == t(k)))), "fixture has no match")
    }
  }

  test("PNG pixel decode fails closed on bad interlace, packed depths, tRNS palettes, truncation") {
    val good = MultimodalOps.synthPng(6, 4, 3)((r, c, ch) => r + c + ch)
    // interlace byte lives at offset 28 (sig 8 + len 4 + type 4 + 13-1).
    // Flipping a sequential stream to Adam7 changes the expected scanline
    // layout → the inflate-length check rejects (never half-decodes);
    // an undefined method id rejects by name.
    val inter = good.clone(); inter(28) = 1
    intercept[IllegalArgumentException](MultimodalOps.decodePngPixels(inter))
    val badI = good.clone(); badI(28) = 2
    assert(intercept[IllegalArgumentException](
      MultimodalOps.decodePngPixels(badI)).getMessage.contains("interlace"))
    // flipping an RGB stream's color type to palette: no PLTE chunk → reject
    val pal = good.clone(); pal(25) = 3 // color type byte
    assert(intercept[IllegalArgumentException](
      MultimodalOps.decodePngPixels(pal)).getMessage.contains("PLTE"))
    // packed sub-byte depth fails closed
    val packed = good.clone(); packed(24) = 4 // bit depth byte
    assert(intercept[IllegalArgumentException](
      MultimodalOps.decodePngPixels(packed)).getMessage.contains("bit depth"))
    // flipping depth to 16 on an 8-bit stream: the inflate length no
    // longer matches — rejected, never half-decoded
    val deep = good.clone(); deep(24) = 16
    intercept[IllegalArgumentException](MultimodalOps.decodePngPixels(deep))
    // tRNS on GRAYSCALE decodes with transparent-COLOR semantics since
    // r12 (splice a 2-byte tRNS before IDAT of a gray file): a non-
    // matching color leaves every pixel opaque but ADDS the alpha channel
    val baseGray = MultimodalOps.synthPng(4, 3, 1)((r, c, _) => r + c)
    val idatAt = {
      var off = 8
      while (new String(baseGray, off + 4, 4, "US-ASCII") != "IDAT")
        off += 12 + ((baseGray(off) & 0xff) << 24 | (baseGray(off + 1) & 0xff) << 16 |
          (baseGray(off + 2) & 0xff) << 8 | (baseGray(off + 3) & 0xff))
      off
    }
    val trns = baseGray.take(idatAt) ++
      Array[Byte](0, 0, 0, 2) ++ "tRNS".getBytes("US-ASCII") ++
      Array[Byte](0, 7, 0, 0, 0, 0) ++
      baseGray.drop(idatAt)
    val (_, _, trnsCh, trnsPx) = MultimodalOps.decodePngPixels(trns)
    assert(trnsCh == 2 && trnsPx.grouped(2).forall(_(1) == 255))
    // ...but a WRONG-LENGTH tRNS and tRNS on an alpha-bearing type reject
    val badLen = baseGray.take(idatAt) ++
      Array[Byte](0, 0, 0, 3) ++ "tRNS".getBytes("US-ASCII") ++
      Array[Byte](0, 7, 1, 0, 0, 0, 0) ++ baseGray.drop(idatAt)
    assert(intercept[IllegalArgumentException](
      MultimodalOps.decodePngPixels(badLen)).getMessage.contains("tRNS"))
    // out-of-range palette index fails closed
    val oneEntry = MultimodalOps.synthPngPalette(2, 1, Seq((9, 9, 9), (5, 5, 5)))((_, c) => c)
    val (_, _, _, ok) = MultimodalOps.decodePngPixels(oneEntry)
    assert(ok.toSeq == Seq(9, 9, 9, 5, 5, 5))
    intercept[IllegalArgumentException] {
      // shrink the PLTE to one entry while the pixels still index entry 1
      val p = MultimodalOps.synthPngPalette(2, 1, Seq((9, 9, 9)))((_, _) => 0)
      // splice pixel index 1 in by re-synthesizing with an out-of-range byte:
      // easier — decode a hand-built file whose PLTE has 1 entry but whose
      // index stream holds 1 (reuse oneEntry's IDAT with p's PLTE)
      val idat1 = {
        var off = 8
        while (new String(oneEntry, off + 4, 4, "US-ASCII") != "IDAT")
          off += 12 + ((oneEntry(off) & 0xff) << 24 | (oneEntry(off + 1) & 0xff) << 16 |
            (oneEntry(off + 2) & 0xff) << 8 | (oneEntry(off + 3) & 0xff))
        off
      }
      val plteEnd = {
        var off = 8
        while (new String(p, off + 4, 4, "US-ASCII") != "IDAT")
          off += 12 + ((p(off) & 0xff) << 24 | (p(off + 1) & 0xff) << 16 |
            (p(off + 2) & 0xff) << 8 | (p(off + 3) & 0xff))
        off
      }
      MultimodalOps.decodePngPixels(p.take(plteEnd) ++ oneEntry.drop(idat1))
    }
    intercept[IllegalArgumentException](
      MultimodalOps.decodePngPixels(good.take(good.length - 20)))
    // header-only synth (no IDAT) is rejected, not fabricated
    intercept[IllegalArgumentException](
      MultimodalOps.decodePngPixels(MultimodalOps.synthPngHeader(4, 4, alpha = false)))
  }

  test("WAV PCM sample decode: every width round-trips with exact sign rules") {
    for (bits <- Seq(8, 16, 24, 32); ch <- Seq(1, 2)) {
      def v(f: Int, c: Int): Int = bits match {
        case 8 => (f * 31 + c * 7) % 256
        case 16 => ((f * 9173 + c * 517) % 65536) - 32768
        case 24 => ((f * 1048573 + c * 99991) % 16777216) - 8388608
        case 32 => (f * 715827883 + c * 12345) ^ (f << 17) // any int
      }
      val wav = MultimodalOps.synthWavPcm(16000, ch, bits, 13)(v)
      val (rate, nch, b2, samples) = MultimodalOps.decodeWavSamples(wav)
      assert((rate, nch, b2) == ((16000, ch, bits)))
      assert(samples.length == 13 * ch)
      for (f <- 0 until 13; c <- 0 until ch)
        assert(samples(f * ch + c) == v(f, c), s"bits=$bits ch=$ch ($f,$c)")
    }
    // truncated payload fails closed
    val wav = MultimodalOps.synthWavPcm(8000, 1, 16, 10)((f, _) => f)
    intercept[IllegalArgumentException](
      MultimodalOps.decodeWavSamples(wav.take(wav.length - 4)))
    // non-WAV fails closed
    intercept[IllegalArgumentException](
      MultimodalOps.decodeWavSamples(Array[Byte](1, 2, 3)))
  }

  test("BMP pixel decode: 8/24/32-bit, both row orders, padding invisible; fails closed") {
    def v(r: Int, c: Int, ch: Int): Int = (r * 41 + c * 13 + ch * 67 + 5) % 256
    for (ch <- Seq(3, 4); td <- Seq(false, true)) {
      // widths chosen so rowBytes padding kicks in (9*3=27 -> 28 etc.)
      val bmp = MultimodalOps.synthBmp(9, 5, ch, topDown = td)(v)
      val (w, h, nch, px) = MultimodalOps.decodeBmpPixels(bmp)
      assert((w, h, nch) == ((9, 5, ch)), s"ch=$ch td=$td")
      for (r <- 0 until 5; c <- 0 until 9; k <- 0 until ch)
        assert(px((r * 9 + c) * ch + k) == v(r, c, k), s"ch=$ch td=$td ($r,$c,$k)")
    }
    val pal = Seq((250, 1, 2), (3, 240, 5), (6, 7, 230))
    val bmp8 = MultimodalOps.synthBmp(6, 4, 1, palette = pal)((r, c, _) => (r + c) % 3)
    val (_, _, n8, p8) = MultimodalOps.decodeBmpPixels(bmp8)
    assert(n8 == 3)
    for (r <- 0 until 4; c <- 0 until 6) {
      val (pr, pg, pb) = pal((r + c) % 3)
      assert((p8((r * 6 + c) * 3), p8((r * 6 + c) * 3 + 1), p8((r * 6 + c) * 3 + 2))
        == ((pr, pg, pb)), s"($r,$c)")
    }
    // fail closed: RLE compression, 16-bit depth, truncation
    val ok = MultimodalOps.synthBmp(4, 3, 3)((r, c, ch) => r + c + ch)
    val rle = ok.clone(); rle(30) = 1 // biCompression = BI_RLE8
    assert(intercept[IllegalArgumentException](
      MultimodalOps.decodeBmpPixels(rle)).getMessage.contains("BI_RGB"))
    val b16 = ok.clone(); b16(28) = 16
    assert(intercept[IllegalArgumentException](
      MultimodalOps.decodeBmpPixels(b16)).getMessage.contains("bits per pixel"))
    intercept[IllegalArgumentException](
      MultimodalOps.decodeBmpPixels(ok.take(ok.length - 8)))
  }

  test("IEEE-float WAV: fact-chunk walk, bit-exact samples, cross-format fail-closed") {
    val f32 = MultimodalOps.synthWavFloat(48000, 2, 20)(
      (f, ch) => (f * 0.125f + ch * 0.5f) - 1.0f)
    // meta surfaces through the same schema (rate/ch/bits/frames/µs)
    val m = MultimodalOps.decodeWavMeta(f32)
    assert(m.getInt(0) == 48000 && m.getInt(1) == 2 && m.getInt(2) == 32)
    assert(m.getLong(3) == 20L)
    // bit-exact payload round trip (incl. negative and fractional values)
    val (rate, ch, samples) = MultimodalOps.decodeWavFloatSamples(f32)
    assert(rate == 48000 && ch == 2 && samples.length == 40)
    for (f <- 0 until 20; c <- 0 until 2)
      assert(samples(f * 2 + c) == (f * 0.125f + c * 0.5f) - 1.0f, s"($f,$c)")
    // special values survive the bit reassembly
    val weird = MultimodalOps.synthWavFloat(8000, 1, 4)((f, _) => f match {
      case 0 => Float.NaN; case 1 => Float.PositiveInfinity
      case 2 => -0.0f; case _ => Float.MinPositiveValue
    })
    val (_, _, w) = MultimodalOps.decodeWavFloatSamples(weird)
    assert(w(0).isNaN && w(1).isPosInfinity)
    assert(java.lang.Float.floatToIntBits(w(2)) == java.lang.Float.floatToIntBits(-0.0f))
    assert(w(3) == Float.MinPositiveValue)
    // cross-format routing fails closed both directions
    val pcm = MultimodalOps.synthWavPcm(8000, 1, 16, 4)((f, _) => f)
    assert(intercept[IllegalArgumentException](
      MultimodalOps.decodeWavFloatSamples(pcm)).getMessage.contains("not IEEE float"))
    assert(intercept[IllegalArgumentException](
      MultimodalOps.decodeWavSamples(f32)).getMessage.contains("not integer PCM"))
    // the canonical 44-byte PCM layout still parses through the new walk
    val pm = MultimodalOps.decodeWavMeta(pcm)
    assert(pm.getInt(0) == 8000 && pm.getLong(3) == 4L)
  }

  test("PNG Adam7 interlace decodes identically to the sequential twin across shapes and depths") {
    // every (depth, channels) the decoder supports, on dimensions that
    // exercise empty and partial passes (1x1 has FOUR empty passes;
    // 9x5 clips every stride; 16x16 fills all seven)
    for {
      (w, h) <- Seq((1, 1), (2, 2), (9, 5), (8, 8), (16, 16), (13, 3))
      (depth, ch) <- Seq((8, 1), (8, 3), (8, 4), (16, 1), (16, 3))
    } {
      def v(r: Int, c: Int, k: Int): Int =
        if (depth == 8) (r * 31 + c * 7 + k * 11) % 256
        else (r * 4099 + c * 769 + k * 131) % 65536
      val seq0 = MultimodalOps.synthPng(w, h, ch, depth = depth)(v)
      val adam = MultimodalOps.synthPng(w, h, ch, depth = depth, interlaced = true)(v)
      val (w1, h1, c1, p1) = MultimodalOps.decodePngPixels(seq0)
      val (w2, h2, c2, p2) = MultimodalOps.decodePngPixels(adam)
      assert((w1, h1, c1) == (w2, h2, c2), s"${w}x$h d$depth ch$ch")
      assert(p1.sameElements(p2), s"${w}x$h d$depth ch$ch: interlace not invisible")
    }
    // a truncated Adam7 stream still fails closed
    val adam = MultimodalOps.synthPng(16, 16, 3, interlaced = true)((r, c, k) => r + c + k)
    val cut = adam.take(adam.length - 24) ++ adam.takeRight(12) // keep IEND
    intercept[IllegalArgumentException](MultimodalOps.decodePngPixels(cut))
  }

  test("AVI MJPEG: container round-trips frames; fails closed on foreign codecs and truncation") {
    import graft.operators.Jpeg
    val q = Array.fill(64)(16)
    val frames = (0 until 3).map { f =>
      Jpeg.synthJpeg(16, 8, 1, Seq(q)) { (_, _, bx) =>
        val nat = new Array[Int](64); nat(0) = f * 5 + bx - 3; nat
      }
    }
    val avi = MultimodalOps.synthAviMjpeg(16, 8, 40000, frames)
    val (w, h, usec, got) = MultimodalOps.aviMjpegFrames(avi)
    assert(w == 16 && h == 8 && usec == 40000 && got.length == 3)
    // the container is byte-invisible: payloads round-trip exactly (the
    // odd/even RIFF padding must not leak into the frames)
    got.zip(frames).foreach { case (g, f) => assert(g.sameElements(f)) }
    // each extracted frame decodes through the engine's own JPEG codec
    val (fw, fh, ch, _) = Jpeg.decodeJpegPixels(got(1))
    assert(fw == 16 && fh == 8 && ch == 1)
    // fail-closed: a foreign codec handler must not fabricate frames
    val cinepak = avi.clone()
    val idx = avi.indexOfSlice("MJPG".getBytes("US-ASCII"))
    System.arraycopy("cvid".getBytes("US-ASCII"), 0, cinepak, idx, 4)
    val e1 = intercept[IllegalArgumentException](MultimodalOps.aviMjpegFrames(cinepak))
    assert(e1.getMessage.contains("codec"))
    // truncation inside movi rejects descriptively
    val e2 = intercept[IllegalArgumentException](
      MultimodalOps.aviMjpegFrames(java.util.Arrays.copyOfRange(avi, 0, avi.length - 40)))
    assert(e2.getMessage.contains("overruns"))
    intercept[IllegalArgumentException](MultimodalOps.aviMjpegFrames("RIFFjunk".getBytes))
    // aviToFrames: generator shape with pass-through + presentation times
    import spark.implicits._
    val df = MultimodalOps.aviToFrames(Seq((7L, avi)).toDF("media_id", "bytes"))
    val rows = df.orderBy("frame_idx").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(0)).toSeq == Seq(7L, 7L, 7L))
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 40000L, 80000L))
    assert(rows(2).getAs[Array[Byte]](3).sameElements(frames(2)))
  }

  test("pngToPixels emits one row per sample with pass-through columns") {
    val png = MultimodalOps.synthPng(5, 3, 2)((r, c, ch) => (r * 5 + c) * 2 + ch)
    val df = Seq((42L, png)).toDF("img_id", "bytes")
    val out = MultimodalOps.pngToPixels(df)
    assert(out.columns.toSeq == Seq("img_id", "px_row", "px_col", "channel", "value"))
    assert(out.count() == 5 * 3 * 2)
    val bad = out.filter(col("value") =!=
      (col("px_row") * 5 + col("px_col")) * 2 + col("channel"))
    assert(bad.count() == 0)
    assert(out.select("img_id").distinct().head().getLong(0) == 42L)
  }

  test("withEmbedding feeds Similarity: identical payloads are nearest neighbors") {
    val emb = MultimodalOps.withEmbedding(media, dim = 8)
      .select(col("media_id").as("vec_id"), col("embedding"))
    val top = Similarity.bruteForceTopK(emb.filter(col("vec_id") === 1), emb, k = 2)
      .orderBy("rank").collect()
    assert(top(0).getAs[Long]("neighbor_id") == 3L) // identical bytes → cosine 1
    assert(math.abs(top(0).getAs[Double]("score") - 1.0) < 1e-9)
  }

  test("mediaCensusWithRejects: rejects are countable rows with descriptive reasons") {
    import spark.implicits._
    val png = MultimodalOps.synthPng(4, 3, 3, _ => 0)((r, c, ch) => (r + c + ch) % 256)
    val webp = "RIFF".getBytes("US-ASCII") ++ Array[Byte](20, 0, 0, 0) ++
      "WEBPVP8 ".getBytes("US-ASCII") ++ Array.fill[Byte](12)(7)
    // a truncated GIF (interlace decodes since r10, so the reject
    // exemplar is stream truncation — the crawl's most common corruption)
    val gifT = operators.Gif.synthGif(6, 4,
      (0 until 4).map(i => (i * 50, i * 60, i * 70)),
      Seq(operators.Gif.FrameSpec(0, 0, 6, 4)((r, c) => (r + c) % 4)))
      .dropRight(10)
    val bmpRle = MultimodalOps.synthBmp(5, 4, 3)((r, c, ch) => r + c + ch)
    bmpRle(30) = 1 // BI_RLE8
    val tiffJpeg = {
      val t = operators.Tiff.synthTiff(8, 8, 8, 8, littleEndian = true,
        tile = true)((r, c) => 1f)
      t(10 + 3 * 12 + 8) = 7 // Compression -> JPEG-in-TIFF
      t
    }
    val wav = MultimodalOps.synthWavPcm(8000, 1, 16, 5)((f, _) => f * 3)
    val junk = Array[Byte](1, 2, 3, 4, 5)
    val bag = Seq(
      (1L, png), (2L, webp), (3L, gifT), (4L, bmpRle), (5L, tiffJpeg),
      (6L, wav), (7L, junk)).toDF("media_id", "bytes")
    val out = MultimodalOps.mediaCensusWithRejects(bag)
      .orderBy("media_id").collect()
    def row(i: Int) = out(i - 1)
    assert(out.length == 7)
    // ok files carry the closed-form census
    assert(row(1).getString(1) == "png" && row(1).getBoolean(4))
    assert(row(1).getLong(2) == 4 * 3 * 3)
    assert(row(6).getString(1) == "wav" && row(6).getBoolean(4) &&
      row(6).getLong(2) == 5 && row(6).getLong(3) == (0 + 3 + 6 + 9 + 12))
    // rejects: right format sniffed, ok=false, reason descriptive
    def rej(i: Int, fmt: String, needle: String): Unit = {
      assert(row(i).getString(1) == fmt, s"row $i: ${row(i)}")
      assert(!row(i).getBoolean(4) && row(i).isNullAt(2), s"row $i: ${row(i)}")
      assert(row(i).getString(5).toLowerCase.contains(needle), s"row $i: ${row(i).getString(5)}")
    }
    rej(2, "webp", "webp")
    rej(3, "gif", "overrun")
    rej(4, "bmp", "bi_rgb")
    rej(5, "tiff", "")
    rej(7, "unknown", "magic")
    // the skip-count report a crawl wants: one groupBy away
    val counts = MultimodalOps.mediaCensusWithRejects(bag)
      .groupBy("format", "ok").count()
      .collect().map(r => (r.getString(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(counts(("webp", false)) == 1 && counts(("png", true)) == 1)
  }

  test("APNG sniffs by name (acTL before IDAT) and rejects countably (r13)") {
    import spark.implicits._
    // No reference encoder exists in this environment (no PIL/ffmpeg/
    // magick; the JDK cannot write APNG), so per the conformance law the
    // container is recognized-but-undecoded — the mp3 stance.
    val base = MultimodalOps.synthPng(6, 4, 1, _ => 0)((r, c, _) => (r + c) % 256)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      val v = crc.getValue
      Array[Byte](
        (data.length >>> 24).toByte, (data.length >>> 16).toByte,
        (data.length >>> 8).toByte, data.length.toByte) ++
        typ.getBytes("US-ASCII") ++ data ++
        Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    }
    val acTl = chunk("acTL", Array[Byte](0, 0, 0, 1, 0, 0, 0, 0))
    val apng = base.take(33) ++ acTl ++ base.drop(33) // after IHDR: valid APNG shape
    assert(MultimodalOps.sniffFormat(apng) == "apng")
    assert(MultimodalOps.sniffFormat(base) == "png")
    // acTL AFTER the first IDAT is not valid APNG — stays plain png
    val late = base.dropRight(12) ++ acTl ++ base.takeRight(12)
    assert(MultimodalOps.sniffFormat(late) == "png")
    // a malformed chunk length ends the walk safely (still png)
    val mal = base.clone(); mal(8) = 0x7f
    assert(MultimodalOps.sniffFormat(mal) == "png")
    // the census counts it by name instead of decoding or "unknown"
    val out = MultimodalOps.mediaCensusWithRejects(
      Seq((1L, apng)).toDF("media_id", "bytes")).collect()(0)
    assert(out.getString(1) == "apng" && !out.getBoolean(4) &&
      out.getString(5).contains("APNG"), out.toString)
  }

  test("resizePixels: identity at ratio 1, exact 2x box average, clamped edges, kernel reject") {
    import spark.implicits._
    def v(r: Int, c: Int): Int = (r * 17 + c * 5 + 3) % 256
    val px = (for (r <- 0 until 6; c <- 0 until 8)
      yield (1L, r, c, 0, v(r, c))).toDF("img_id", "px_row", "px_col", "channel", "value")
    // ratio 1: bilinear is the identity (fx = fy = 0 exactly)
    val id = MultimodalOps.resizePixels(px, 8, 6, 8, 6, "bilinear")
      .collect().map(r => ((r.getInt(1), r.getInt(2)), r.getDouble(4))).toMap
    for (r <- 0 until 6; c <- 0 until 8) assert(id((r, c)) == v(r, c).toDouble, s"($r,$c)")
    // 2x downscale: u = 2c + 0.5 → the exact 4-pixel box average
    val half = MultimodalOps.resizePixels(px, 8, 6, 4, 3, "bilinear")
      .collect().map(r => ((r.getInt(1), r.getInt(2)), r.getDouble(4))).toMap
    for (r <- 0 until 3; c <- 0 until 4) {
      val want = (v(2 * r, 2 * c) + v(2 * r, 2 * c + 1) +
        v(2 * r + 1, 2 * c) + v(2 * r + 1, 2 * c + 1)) / 4.0
      assert(math.abs(half((r, c)) - want) < 1e-12, s"($r,$c)")
    }
    // upscale: every dst pixel exists, corners replicate the src corners
    val up = MultimodalOps.resizePixels(px, 8, 6, 16, 12, "bilinear").collect()
    assert(up.length == 16 * 12)
    val upMap = up.map(r => ((r.getInt(1), r.getInt(2)), r.getDouble(4))).toMap
    assert(upMap((0, 0)) == v(0, 0).toDouble) // clamped corner
    assert(upMap((11, 15)) == v(5, 7).toDouble)
    // nearest passes source values through untouched
    val nn = MultimodalOps.resizePixels(px, 8, 6, 4, 3, "nearest")
      .collect().map(r => ((r.getInt(1), r.getInt(2)), r.getInt(4))).toMap
    assert(nn.size == 12 && nn.values.forall(x => (0 until 6).exists(r =>
      (0 until 8).exists(c => v(r, c) == x))))
    val e = intercept[IllegalArgumentException](
      MultimodalOps.resizePixels(px, 8, 6, 4, 3, "lanczos").collect())
    assert(e.getMessage.contains("kernel"), e.getMessage)
  }

  test("stftBandEnergy: DC band recovers the frame sum; pure tone peaks in its band") {
    import spark.implicits._
    // constant signal: band 0 (DC) energy = (frameSize * x)^2, all
    // higher bands ~0 (fixed-point floor leaves sub-integer residue)
    val const = (0 until 34).flatMap(i => Seq((1L, i, 0, 50)))
      .toDF("media_id", "frame_idx", "channel", "value")
    val dc = MultimodalOps.stftBandEnergy(const, 17, 17, 3)
      .collect().map(r => ((r.getLong(2), r.getInt(3)),
        (r.getLong(4), r.getLong(5), r.getDouble(7)))).toMap
    // two non-overlapping full frames
    for (f <- Seq(0L, 1L)) {
      val (n, sc, e) = dc((f, 0))
      assert(n == 17 && sc == 17L * 50 * 1048576)
      assert(math.abs(e - math.pow(17.0 * 50, 2)) < 1e-3, s"frame $f: $e")
      val (_, _, e1) = dc((f, 1))
      assert(e1 < 1.0, s"frame $f band 1 leak: $e1") // orthogonality
    }
    // a cos tone at band 2 concentrates there (real DFT splits energy
    // between the +/- frequencies; band 2 of a k=2 cosine = (A*F/2)^2)
    val tone = (0 until 17).map { i =>
      (1L, i, 0, math.rint(80 * math.cos(2 * math.Pi * 2 * i / 17)).toInt)
    }.toDF("media_id", "frame_idx", "channel", "value")
    val tb = MultimodalOps.stftBandEnergy(tone, 17, 17, 4)
      .collect().map(r => (r.getInt(3), r.getDouble(7))).toMap
    assert(tb(2) > 100 * tb(1) && tb(2) > 100 * tb(3),
      s"tone energies: $tb") // peak at its own band
    // bad geometry rejects
    intercept[IllegalArgumentException](
      MultimodalOps.stftBandEnergy(const, 8, 9, 2))
  }

  test("perceptualHash + phashNearDupPairs: banding == brute force, knobs reject") {
    import spark.implicits._
    // 10 images: pairs (2k, 2k+1) differ by one noised pixel; distinct k
    // have different block patterns
    val px = (for {
      i <- 0 until 10; r <- 0 until 12; c <- 0 until 16; ch <- 0 until 3
    } yield {
      val k = i / 2
      val high = (r / 3 + c / 4 + k) % 3 == 0
      val v = ch match {
        case 0 => if (high) 220 else 15
        case 1 => if (high) 240 else 25
        case _ => if (i % 2 == 1 && r == (k * 3) % 12 && c == (k * 5) % 16) 180 else 40
      }
      (i.toLong, r, c, ch, v)
    }).toDF("img_id", "px_row", "px_col", "channel", "value")
    val hashes = MultimodalOps.perceptualHash(px, 16, 12)
    val hs = hashes.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(hs.size == 10)
    hs.values.foreach { case (lo, hi) =>
      assert(lo >= 0 && lo < (1L << 32) && hi >= 0 && hi < (1L << 32))
    }
    // banding returns EXACTLY the brute-force pair set (zero false
    // negatives is the pigeonhole guarantee; distinct() kills dups)
    for (mh <- Seq(1, 3, 7)) {
      val got = MultimodalOps.phashNearDupPairs(hashes, maxHamming = mh)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        a <- 0 until 10; b <- a + 1 until 10
        d = java.lang.Long.bitCount(hs(a)._1 ^ hs(b)._1) +
          java.lang.Long.bitCount(hs(a)._2 ^ hs(b)._2)
        if d <= mh
      } yield (a.toLong, b.toLong, d.toLong)).toSet
      assert(got == want, s"maxHamming=$mh: ${got.size} vs ${want.size}")
    }
    // twin images pair at a tight radius; distinct patterns don't
    val p3 = MultimodalOps.phashNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0 until 5).forall(k => p3.contains((2L * k, 2L * k + 1))), p3)
    // non-2^k-1 radius rejects
    intercept[IllegalArgumentException](
      MultimodalOps.phashNearDupPairs(hashes, maxHamming = 2))
  }

  test("WAV blockAlign disagreeing with channels x bytes/sample fails closed") {
    // frame count divides by the DECLARED blockAlign but decode reads at
    // channels·bps stride — a mismatch must reject, not silently decode
    // the wrong sample count. blockAlign sits at byte 32 in both layouts.
    val wav = MultimodalOps.synthWavPcm(8000, 2, 16, 10)((f, c) => f + c)
    val p = wav.clone()
    p(32) = 6 // declared 6 != 2 ch * 2 B = 4
    val e = intercept[IllegalArgumentException](MultimodalOps.decodeWavSamples(p))
    assert(e.getMessage.contains("blockAlign"), e.getMessage)
    val fw = MultimodalOps.synthWavFloat(8000, 2, 10)((f, c) => f + c * 0.5f)
    val pf = fw.clone()
    pf(32) = 12 // declared 12 != 2 ch * 4 B = 8
    val e2 = intercept[IllegalArgumentException](
      MultimodalOps.decodeWavFloatSamples(pf))
    assert(e2.getMessage.contains("blockAlign"), e2.getMessage)
  }
}
