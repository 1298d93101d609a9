package graft

import graft.operators.Jpeg
import org.scalatest.funsuite.AnyFunSuite

class JpegSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent IDCT reference — same formula, written as the plain
    * spec sum so the decoder's skip-zeros/loop-order must agree.
    */
  private def refIdct(coefNat: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8) {
        val cu = if (u == 0) Jpeg.C0 else 1.0
        val cv = if (v == 0) Jpeg.C0 else 1.0
        s += cu * cv * coefNat(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      }
      val p = Math.round(s * 0.25 + 128.0).toInt
      out(y * 8 + x) = math.max(0, math.min(255, p))
    }
    out
  }

  private def dequant(quantZig: Array[Int], coefNat: Array[Int]): Array[Int] =
    Array.tabulate(64) { nat =>
      val zig = Jpeg.Zigzag.indexOf(nat)
      coefNat(nat) * quantZig(zig)
    }

  test("full AC round trip: encode quantized coefficients, decode, match the reference IDCT") {
    val q = Array.tabulate(64)(i => 8 + (i % 5)) // non-uniform zigzag table
    // a dense block exercising positive/negative ACs across categories,
    // plus a high-frequency tail that forces ZRL runs
    val block0 = new Array[Int](64)
    block0(0) = 37; block0(1) = -21; block0(8) = 13; block0(9) = -5
    block0(2) = 3; block0(16) = -1; block0(63) = 2 // long zero run then tail
    val block1 = new Array[Int](64)
    block1(0) = -44; block1(10) = 7; block1(33) = -9
    val blocks = Map((0, 0) -> block0, (0, 1) -> block1)
    val jpg = Jpeg.synthJpeg(16, 8, 1, Seq(q)) { (_, by, bx) => blocks((by, bx)) }
    val (w, h, ch, px) = Jpeg.decodeJpegPixels(jpg)
    assert((w, h, ch) == (16, 8, 1))
    for ((bx, blk) <- Seq(0 -> block0, 1 -> block1)) {
      val want = refIdct(dequant(q, blk))
      for (y <- 0 until 8; x <- 0 until 8)
        assert((px((y * 16 + bx * 8 + x)) & 0xff) == want(y * 8 + x),
          s"block $bx pixel ($y,$x)")
    }
  }

  test("byte stuffing: DC values whose entropy bytes hit 0xFF survive") {
    // scan many DC values so some produce 0xFF entropy bytes (the
    // stuffed-byte path must round-trip every one)
    val q = Array.fill(64)(1)
    for (dc <- -255 to 255 by 13) {
      val nat = new Array[Int](64); nat(0) = dc
      val jpg = Jpeg.synthJpeg(8, 8, 1, Seq(q)) { (_, _, _) => nat }
      val (_, _, _, px) = Jpeg.decodeJpegPixels(jpg)
      val want = math.max(0, math.min(255,
        Math.round((Jpeg.C0 * Jpeg.C0 * dc.toDouble) * 0.25 + 128.0).toInt))
      assert((px(0) & 0xff) == want, s"dc=$dc")
    }
  }

  test("restart markers reset DC predictors at each interval") {
    val q = Array.fill(64)(4)
    // 4 blocks wide, interval 2: predictors must reset between MCUs 1|2;
    // values chosen so a stale predictor would visibly corrupt block 2
    val dcs = Array(100, -100, 90, -90)
    val jpg = Jpeg.synthJpeg(32, 8, 1, Seq(q), restartInterval = 2) { (_, _, bx) =>
      val nat = new Array[Int](64); nat(0) = dcs(bx); nat
    }
    val (_, _, _, px) = Jpeg.decodeJpegPixels(jpg)
    for (bx <- 0 until 4) {
      val want = math.max(0, math.min(255,
        Math.round((Jpeg.C0 * Jpeg.C0 * (dcs(bx) * 4).toDouble) * 0.25 + 128.0).toInt))
      assert((px(bx * 8) & 0xff) == want, s"block $bx")
    }
  }

  test("color 4:4:4: three raw component planes decode independently") {
    val jpg = Jpeg.synthJpeg(8, 8, 3, Seq(Array.fill(64)(2), Array.fill(64)(3))) {
      (c, _, _) => val nat = new Array[Int](64); nat(0) = 10 * (c + 1); nat
    }
    val (w, h, ch, px) = Jpeg.decodeJpegPixels(jpg)
    assert((w, h, ch) == (8, 8, 3))
    for (c <- 0 until 3) {
      val qv = if (c == 0) 2 else 3
      val want = Math.round((Jpeg.C0 * Jpeg.C0 * (10 * (c + 1) * qv).toDouble) * 0.25 + 128.0).toInt
      assert((px(c) & 0xff) == want, s"component $c")
    }
  }

  test("4:2:0 with dense AC blocks: MCU interleave + box upsample match the reference") {
    val qY = Array.tabulate(64)(i => 6 + (i % 4))
    val qC = Array.tabulate(64)(i => 9 + (i % 3))
    // deterministic dense coefficients per (comp, blockRow, blockCol)
    def coef(c: Int, by: Int, bx: Int): Array[Int] = {
      val nat = new Array[Int](64)
      nat(0) = ((c * 31 + by * 17 + bx * 7) % 90) - 45
      nat(1) = ((c + by + bx) % 7) - 3
      nat(8) = ((c * 5 + bx) % 9) - 4
      nat(27) = if ((c + by) % 2 == 0) 6 else -6
      nat
    }
    // 20×12, 4:2:0 (Y 2×2): 2×1 MCUs of 16×16; Y plane 32×16 padded,
    // chroma planes 16×8; restart interval to mix RST into interleaving
    val jpg = Jpeg.synthJpeg(20, 12, 3, Seq(qY, qC),
      restartInterval = 1, sampling = Seq((2, 2), (1, 1), (1, 1)))(coef)
    val (w, h, ch, px) = Jpeg.decodeJpegPixels(jpg)
    assert((w, h, ch) == (20, 12, 3))
    // reference: decode each plane independently, then replicate
    def planeVal(c: Int, pr: Int, pc: Int): Int = {
      val q = if (c == 0) qY else qC
      refIdct(dequant(q, coef(c, pr / 8, pc / 8)))((pr % 8) * 8 + (pc % 8))
    }
    for (r <- 0 until 12; cl <- 0 until 20) {
      assert((px((r * 20 + cl) * 3) & 0xff) == planeVal(0, r, cl), s"Y ($r,$cl)")
      assert((px((r * 20 + cl) * 3 + 1) & 0xff) == planeVal(1, r / 2, cl / 2), s"Cb ($r,$cl)")
      assert((px((r * 20 + cl) * 3 + 2) & 0xff) == planeVal(2, r / 2, cl / 2), s"Cr ($r,$cl)")
    }
  }

  test("4:2:2 (Y 2x1): horizontal-only chroma halving") {
    val qY = Array.fill(64)(4); val qC = Array.fill(64)(5)
    def coef(c: Int, by: Int, bx: Int): Array[Int] = {
      val nat = new Array[Int](64)
      nat(0) = ((c * 13 + by * 9 + bx * 5) % 60) - 30
      nat(9) = ((c + bx) % 5) - 2
      nat
    }
    val jpg = Jpeg.synthJpeg(18, 10, 3, Seq(qY, qC),
      sampling = Seq((2, 1), (1, 1), (1, 1)))(coef)
    val (w, h, ch, px) = Jpeg.decodeJpegPixels(jpg)
    assert((w, h, ch) == (18, 10, 3))
    def planeVal(c: Int, pr: Int, pc: Int): Int = {
      val q = if (c == 0) qY else qC
      refIdct(dequant(q, coef(c, pr / 8, pc / 8)))((pr % 8) * 8 + (pc % 8))
    }
    for (r <- 0 until 10; cl <- 0 until 18) {
      assert((px((r * 18 + cl) * 3) & 0xff) == planeVal(0, r, cl), s"Y ($r,$cl)")
      // vertical resolution full, horizontal halved
      assert((px((r * 18 + cl) * 3 + 1) & 0xff) == planeVal(1, r, cl / 2), s"Cb ($r,$cl)")
      assert((px((r * 18 + cl) * 3 + 2) & 0xff) == planeVal(2, r, cl / 2), s"Cr ($r,$cl)")
    }
  }

  test("3x sampling factors and 2x2 grayscale fail closed") {
    val q = Array.fill(64)(16)
    val ok3 = Jpeg.synthJpeg(8, 8, 3, Seq(q, q)) { (_, _, _) => new Array[Int](64) }
    val sofAt = (0 until ok3.length - 1).find(i =>
      (ok3(i) & 0xff) == 0xff && (ok3(i + 1) & 0xff) == 0xc0).get
    val bad = ok3.clone()
    bad(sofAt + 11) = 0x31.toByte // Y 3x1
    assert(intercept[IllegalArgumentException](
      Jpeg.decodeJpegPixels(bad)).getMessage.contains("sampling factor"))
  }

  test("progressive == baseline: same coefficients, bit-identical pixels (grayscale, full SA script)") {
    val q = Array.tabulate(64)(i => 5 + (i % 7))
    def coef(c: Int, by: Int, bx: Int): Array[Int] = {
      val nat = new Array[Int](64)
      nat(0) = ((by * 13 + bx * 7) % 70) - 35
      nat(1) = ((by + bx) % 9) - 4
      nat(8) = ((by * 3 + bx) % 11) - 5
      nat(18) = ((bx * 5) % 7) - 3
      nat(63) = if ((by + bx) % 3 == 0) 3 else 0 // band-tail coef
      nat
    }
    val base = Jpeg.synthJpeg(24, 16, 1, Seq(q))(coef)
    // DC first at Al=1, DC refinement; AC split into two spectral bands,
    // each first at Al=1 then correction-bit refined to Al=0
    val prog = Jpeg.synthJpegProgressive(24, 16, 1, Seq(q), Seq(
      Jpeg.ScanSpec(Seq(0), 0, 0, 0, 1),
      Jpeg.ScanSpec(Seq(0), 1, 5, 0, 1),
      Jpeg.ScanSpec(Seq(0), 6, 63, 0, 1),
      Jpeg.ScanSpec(Seq(0), 0, 0, 1, 0),
      Jpeg.ScanSpec(Seq(0), 1, 5, 1, 0),
      Jpeg.ScanSpec(Seq(0), 6, 63, 1, 0)))(coef)
    val (w1, h1, c1, p1) = Jpeg.decodeJpegPixels(base)
    val (w2, h2, c2, p2) = Jpeg.decodeJpegPixels(prog)
    assert((w1, h1, c1) == ((24, 16, 1)) && (w2, h2, c2) == ((24, 16, 1)))
    assert(p1.sameElements(p2), "progressive decode diverged from baseline")
  }

  test("progressive == baseline: 4:2:0 color with interleaved DC, restarts, deep SA") {
    val qY = Array.fill(64)(4); val qC = Array.fill(64)(6)
    def coef(c: Int, by: Int, bx: Int): Array[Int] = {
      val nat = new Array[Int](64)
      nat(0) = ((c * 19 + by * 11 + bx * 5) % 80) - 40
      nat(2) = ((c + by * 2 + bx) % 13) - 6
      nat(9) = ((c * 3 + bx) % 9) - 4
      nat(35) = ((by + bx + c) % 5) - 2
      nat
    }
    val base = Jpeg.synthJpeg(20, 12, 3, Seq(qY, qC),
      sampling = Seq((2, 2), (1, 1), (1, 1)))(coef)
    // two-step successive approximation (Al 2 -> 1 -> 0) + restart markers
    val prog = Jpeg.synthJpegProgressive(20, 12, 3, Seq(qY, qC), Seq(
      Jpeg.ScanSpec(Seq(0, 1, 2), 0, 0, 0, 2), // interleaved DC first
      Jpeg.ScanSpec(Seq(0), 1, 63, 0, 2),
      Jpeg.ScanSpec(Seq(1), 1, 63, 0, 2),
      Jpeg.ScanSpec(Seq(2), 1, 63, 0, 2),
      Jpeg.ScanSpec(Seq(0, 1, 2), 0, 0, 2, 1), // DC refine 2->1
      Jpeg.ScanSpec(Seq(0), 1, 63, 2, 1),
      Jpeg.ScanSpec(Seq(1), 1, 63, 2, 1),
      Jpeg.ScanSpec(Seq(2), 1, 63, 2, 1),
      Jpeg.ScanSpec(Seq(0, 1, 2), 0, 0, 1, 0), // DC refine 1->0
      Jpeg.ScanSpec(Seq(0), 1, 63, 1, 0),
      Jpeg.ScanSpec(Seq(1), 1, 63, 1, 0),
      Jpeg.ScanSpec(Seq(2), 1, 63, 1, 0)),
      restartInterval = 2, sampling = Seq((2, 2), (1, 1), (1, 1)))(coef)
    val (_, _, _, p1) = Jpeg.decodeJpegPixels(base)
    val (_, _, _, p2) = Jpeg.decodeJpegPixels(prog)
    assert(p1.sameElements(p2), "subsampled progressive decode diverged")
  }

  test("progressive spectral-selection-only (no SA) and EOB-run-heavy streams decode") {
    val q = Array.fill(64)(8)
    // mostly-zero blocks: long EOB runs across blocks
    def coef(c: Int, by: Int, bx: Int): Array[Int] = {
      val nat = new Array[Int](64)
      nat(0) = by + bx
      if ((by * 7 + bx) % 11 == 0) nat(5) = 4
      nat
    }
    val base = Jpeg.synthJpeg(64, 24, 1, Seq(q))(coef)
    val prog = Jpeg.synthJpegProgressive(64, 24, 1, Seq(q), Seq(
      Jpeg.ScanSpec(Seq(0), 0, 0, 0, 0),
      Jpeg.ScanSpec(Seq(0), 1, 4, 0, 0),
      Jpeg.ScanSpec(Seq(0), 5, 63, 0, 0)))(coef)
    val (_, _, _, p1) = Jpeg.decodeJpegPixels(base)
    val (_, _, _, p2) = Jpeg.decodeJpegPixels(prog)
    assert(p1.sameElements(p2))
  }

  test("partial edge blocks clip to the image rectangle") {
    val q = Array.fill(64)(16)
    val jpg = Jpeg.synthJpeg(10, 5, 1, Seq(q)) { (_, _, bx) =>
      val nat = new Array[Int](64); nat(0) = if (bx == 0) 8 else -8; nat
    }
    val (w, h, ch, px) = Jpeg.decodeJpegPixels(jpg)
    assert((w, h, ch) == (10, 5, 1) && px.length == 50)
    val hi = Math.round((Jpeg.C0 * Jpeg.C0 * 128.0) * 0.25 + 128.0).toInt
    val lo = Math.round((Jpeg.C0 * Jpeg.C0 * -128.0) * 0.25 + 128.0).toInt
    assert((px(0) & 0xff) == hi && (px(9) & 0xff) == lo)
  }

  test("fail closed: SOF1/bad progressive scans, subsampling, 16-bit DQT, truncation") {
    val q = Array.fill(64)(16)
    val ok = Jpeg.synthJpeg(8, 8, 1, Seq(q)) { (_, _, _) => new Array[Int](64) }
    // SOF1 (extended sequential) is outside the surface
    val sof1 = ok.clone()
    val sofAt = (0 until sof1.length - 1).find(i =>
      (sof1(i) & 0xff) == 0xff && (sof1(i + 1) & 0xff) == 0xc0).get
    sof1(sofAt + 1) = 0xc1.toByte
    assert(intercept[IllegalArgumentException](
      Jpeg.decodeJpegPixels(sof1)).getMessage.contains("unsupported"))
    // flipping a BASELINE stream's marker to SOF2 yields an invalid
    // progressive scan script (full-band DC scan) — rejected, not
    // misdecoded
    val prog = ok.clone()
    prog(sofAt + 1) = 0xc2.toByte
    intercept[IllegalArgumentException](Jpeg.decodeJpegPixels(prog))
    // flip the sampling byte to 2x2
    val sub = ok.clone()
    sub(sofAt + 11) = 0x22.toByte
    intercept[IllegalArgumentException](Jpeg.decodeJpegPixels(sub))
    // 16-bit quant table precision
    val dqtAt = (0 until ok.length - 1).find(i =>
      (ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xdb).get
    val wq = ok.clone()
    wq(dqtAt + 4) = 0x10.toByte
    intercept[IllegalArgumentException](Jpeg.decodeJpegPixels(wq))
    // truncated entropy stream
    intercept[IllegalArgumentException](
      Jpeg.decodeJpegPixels(ok.take(ok.length - 6)))
    // not a JPEG at all
    intercept[IllegalArgumentException](Jpeg.decodeJpegPixels(Array[Byte](1, 2, 3)))
  }

  test("EXIF orientation: APP1 parses, remaps are exact, malformed Exif fails closed") {
    val q = Array.fill(64)(16)
    // dense asymmetric image so every remap error is visible
    def img(o: Int): Array[Byte] =
      Jpeg.synthJpeg(16, 8, 1, Seq(q), exifOrientation = o) { (_, _, bx) =>
        val nat = new Array[Int](64)
        nat(0) = bx * 9 - 4; nat(1) = 3; nat(8) = -2
        nat
      }
    val (w0, h0, _, base) = Jpeg.decodeJpegPixels(img(0)) // no APP1
    assert(w0 == 16 && h0 == 8)
    assert(Jpeg.exifOrientation(img(0)) == 1) // absent Exif → upright
    for (o <- 1 to 8) {
      val bytes = img(o)
      assert(Jpeg.exifOrientation(bytes) == o)
      // the APP1 segment is invisible to the pixel decode itself
      val (w, h, _, raw) = Jpeg.decodeJpegPixels(bytes)
      assert(w == 16 && h == 8 && raw.sameElements(base), s"o=$o")
      // index remap against the spec transform, checked pointwise
      val (ow, oh, up) = Jpeg.applyOrientation(w, h, 1, raw, o)
      assert((ow, oh) == (if (o >= 5) (8, 16) else (16, 8)), s"o=$o")
      for (rp <- 0 until oh; cp <- 0 until ow) {
        val (r, c) = o match {
          case 1 => (rp, cp); case 2 => (rp, 15 - cp)
          case 3 => (7 - rp, 15 - cp); case 4 => (7 - rp, cp)
          case 5 => (cp, rp); case 6 => (7 - cp, rp)
          case 7 => (7 - cp, 15 - rp); case _ => (cp, 15 - rp)
        }
        assert(up(rp * ow + cp) == raw(r * 16 + c), s"o=$o ($rp,$cp)")
      }
    }
    // involution invariants: the mirror/rotation pairs compose to identity
    val (_, _, _, raw) = Jpeg.decodeJpegPixels(img(0))
    for ((a, b) <- Seq((2, 2), (3, 3), (4, 4), (5, 5), (7, 7), (6, 8), (8, 6))) {
      val (w1, h1, p1) = Jpeg.applyOrientation(16, 8, 1, raw, a)
      val (w2, h2, p2) = Jpeg.applyOrientation(w1, h1, 1, p1, b)
      assert(w2 == 16 && h2 == 8 && p2.sameElements(raw), s"$a then $b")
    }
    // malformed Exif body (declared Exif, not TIFF-shaped) rejects
    val bad = img(6)
    val tiffOff = 2 + 4 + 6 // SOI + APP1 marker/len + "Exif\0\0"
    bad(tiffOff) = 'X'.toByte
    val e = intercept[IllegalArgumentException](Jpeg.exifOrientation(bad))
    assert(e.getMessage.contains("TIFF structure"))
    // out-of-range orientation value rejects
    val range = img(6)
    // the SHORT value sits 8 (hdr) + 2 (count) + 8 (entry tag/typ/cnt) past the TIFF start
    range(tiffOff + 18) = 9.toByte
    val e2 = intercept[IllegalArgumentException](Jpeg.exifOrientation(range))
    assert(e2.getMessage.contains("out of range"))
    intercept[IllegalArgumentException](Jpeg.applyOrientation(2, 2, 1, new Array[Byte](4), 9))
    // upright DataFrame surface: portrait (o=6) swaps the emitted axes
    val df = Jpeg.jpegToPixelsUpright(Seq((1L, img(6))).toDF("img_id", "bytes"))
    val rows = df.collect()
    assert(rows.length == 128)
    assert(rows.forall(_.getInt(1) == 6)) // orientation column
    assert(rows.map(_.getInt(2)).max == 15 && rows.map(_.getInt(3)).max == 7)
  }

  test("jpegToPixels: DataFrame surface preserves pass-through columns") {
    val q = Array.fill(64)(16)
    val jpg = Jpeg.synthJpeg(8, 8, 1, Seq(q)) { (_, _, _) =>
      val nat = new Array[Int](64); nat(0) = 4; nat
    }
    val out = Jpeg.jpegToPixels(Seq((7L, "a", jpg)).toDF("media_id", "tag", "bytes"))
      .collect()
    assert(out.length == 64)
    assert(out.forall(r => r.getLong(0) == 7L && r.getString(1) == "a"))
    val want = Math.round((Jpeg.C0 * Jpeg.C0 * 64.0) * 0.25 + 128.0).toInt
    assert(out.forall(_.getInt(5) == want))
  }
}
