package graft

import graft.operators.{MultimodalOps, Webp}
import org.scalatest.funsuite.AnyFunSuite

class WebpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def px(r: Int, c: Int): Int = {
    val a = (r * 5 + c * 3 + 9) % 256
    val red = (r * 31 + c * 7) % 256
    val g = (r * 13 + c * 17 + 5) % 256
    val b = (r * 3 + c * 29 + 11) % 256
    (a << 24) | (red << 16) | (g << 8) | b
  }

  private def assertIdentity(bytes: Array[Byte], w: Int, h: Int,
      want: (Int, Int) => Int, tag: String): Unit = {
    val (dw, dh, out) = Webp.decodeWebpPixels(bytes)
    assert((dw, dh) == ((w, h)), tag)
    for (r <- 0 until h; c <- 0 until w)
      assert(out(r * w + c) == want(r, c),
        f"$tag ($r,$c): ${out(r * w + c)}%08x vs ${want(r, c)}%08x")
  }

  test("plain round trip is the identity (odd dims, 1x1, full ARGB range)") {
    for ((w, h) <- Seq((1, 1), (7, 5), (16, 16), (23, 9)))
      assertIdentity(Webp.synthWebpLossless(w, h, px), w, h, px, s"${w}x$h")
  }

  test("every encode feature decodes to the identity (the progressive-JPEG proof shape)") {
    val (w, h) = (21, 13)
    // subtract-green
    assertIdentity(Webp.synthWebpLossless(w, h, px, subtractGreen = true),
      w, h, px, "sg")
    // all 14 predictor modes, alone and stacked on subtract-green
    for (m <- 0 to 13) {
      assertIdentity(Webp.synthWebpLossless(w, h, px, predictorMode = Some(m)),
        w, h, px, s"pred$m")
      assertIdentity(Webp.synthWebpLossless(w, h, px,
        subtractGreen = true, predictorMode = Some(m)), w, h, px, s"sg+pred$m")
    }
    // wider-than-one-block so block lookups and the x = w-1 top-right
    // edge rule both run
    assertIdentity(Webp.synthWebpLossless(37, 19, px, predictorMode = Some(11)),
      37, 19, px, "pred11-multiblock")
    // color cache
    for (bits <- Seq(1, 4, 11))
      assertIdentity(Webp.synthWebpLossless(w, h, px, cacheBits = bits),
        w, h, px, s"cache$bits")
    // LZ77 full-row copies (rows repeat with period 3)
    def stripes(r: Int, c: Int): Int = px(r % 3, c)
    assertIdentity(Webp.synthWebpLossless(w, 12, stripes, lz77Rows = true),
      w, 12, stripes, "lz77")
    // meta prefix image (two groups selected per 4x4 block)
    assertIdentity(Webp.synthWebpLossless(w, h, px, metaBits = Some(2)),
      w, h, px, "meta")
    // everything at once
    assertIdentity(Webp.synthWebpLossless(33, 18, stripes,
      subtractGreen = true, cacheBits = 6, lz77Rows = true,
      metaBits = Some(3)), 33, 18, stripes, "all")
  }

  test("2-D distance neighborhood codes: dist = dy*xsize + dx (spec 5.2.3)") {
    // The in-repo encoder only emits dist+120 codes, so round trips never
    // touch the neighborhood map — this hand-built stream pins the sign
    // convention. A mirrored formula (dy*xsize - dx) rejects code 4
    // ((-1,1): dist 3 ≤ pos, mirrored 5 > pos) and collapses the
    // pure-horizontal code 6 ((2,0): dist 2) to 1.
    val A = 0xff102030; val B = 0xff405060; val C = 0xff708090; val D = 0xffa0b0c0
    val bytes = Webp.synthWebpLz77Demo(4, 4,
      literals = Seq(A, B, C, D),
      copies = Seq(
        (4, 4), // (-1,1) → dist 3: row1 = B C D B
        (2, 6), // (2,0)  → dist 2: D B
        (2, 2), // (1,0)  → dist 1: B B   (row2 = D B B B)
        (4, 3))) // (1,1) → dist 5: row3 = B D B B
    val want = Seq(
      A, B, C, D,
      B, C, D, B,
      D, B, B, B,
      B, D, B, B)
    val (w, h, out) = Webp.decodeWebpPixels(bytes)
    assert((w, h) == ((4, 4)))
    for (i <- 0 until 16)
      assert(out(i) == want(i), f"pixel $i: ${out(i)}%08x vs ${want(i)}%08x")
    // code 1 ((0,1) → dist = xsize) is the dx-symmetric full-row copy
    val rowCopy = Webp.synthWebpLz77Demo(4, 2, Seq(A, B, C, D), Seq((4, 1)))
    assert(Webp.decodeWebpPixels(rowCopy)._3.toSeq ==
      Seq(A, B, C, D, A, B, C, D))
  }

  test("conformance: real libwebp lossless encodes decode to the exact source RGBA") {
    // tools/vp8l_fixtures.py: the REAL encoder's output uses decode
    // paths the in-repo synth writer never emits (2-D LZ77 distance
    // codes, per-tile meta prefix groups, chosen transform stacks) —
    // round trips alone missed the r11 planeCodeToDistance sign bug
    val mf = {
      val in = getClass.getResourceAsStream("/vp8l/manifest.txt")
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    for (line <- mf.trim.split("\n")) {
      val Array(name, ws, hs) = line.trim.split(" ")
      val w = ws.toInt; val h = hs.toInt
      def res(ext: String) = {
        val in = getClass.getResourceAsStream(s"/vp8l/$name.$ext")
        try in.readAllBytes() finally in.close()
      }
      val (dw, dh, px) = Webp.decodeWebpPixels(res("webp"))
      assert((dw, dh) == ((w, h)), name)
      val want = res("rgba")
      var bad = 0
      for (i <- 0 until w * h) {
        val p = px(i)
        if (((p >> 16) & 0xff) != (want(i * 4) & 0xff) ||
            ((p >> 8) & 0xff) != (want(i * 4 + 1) & 0xff) ||
            (p & 0xff) != (want(i * 4 + 2) & 0xff) ||
            ((p >>> 24) & 0xff) != (want(i * 4 + 3) & 0xff)) bad += 1
      }
      assert(bad == 0, s"$name: $bad mismatched pixels of ${w * h}")
    }
  }

  test("ALPH conformance: real lossy+alpha encodes decode to the reference alpha + YUV") {
    // tools/vp8_alpha_fixtures.py: WebPEncodeRGBA(quality<100) output
    // (VP8X + ALPH method-1/VP8L + VP8) with the reference decoder's own
    // alpha channel and YUV planes as expected values
    val mf = {
      val in = getClass.getResourceAsStream("/vp8alpha/manifest.txt")
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    for (line <- mf.trim.split("\n")) {
      val Array(name, ws, hs) = line.trim.split(" ")
      val w = ws.toInt; val h = hs.toInt
      def res(ext: String) = {
        val in = getClass.getResourceAsStream(s"/vp8alpha/$name.$ext")
        try in.readAllBytes() finally in.close()
      }
      val webp = res("webp")
      val (dw, dh, px) = Webp.decodeWebpPixels(webp)
      assert((dw, dh) == ((w, h)), name)
      val wantA = res("alpha")
      var badA = 0
      for (i <- 0 until w * h)
        if (((px(i) >>> 24) & 0xff) != (wantA(i) & 0xff)) badA += 1
      assert(badA == 0, s"$name: $badA mismatched alpha samples")
      // the paired VP8 keyframe still matches the reference YUV
      val vp8At = {
        var p = 12; var found = -1
        while (found < 0 && p + 8 <= webp.length) {
          val tag = new String(webp, p, 4, "US-ASCII")
          val sz = (webp(p + 4) & 0xff) | ((webp(p + 5) & 0xff) << 8) |
            ((webp(p + 6) & 0xff) << 16) | ((webp(p + 7) & 0xff) << 24)
          if (tag == "VP8 ") found = p else p += 8 + sz + (sz & 1)
        }
        found
      }
      assert(vp8At > 0, name)
      val sz = (webp(vp8At + 4) & 0xff) | ((webp(vp8At + 5) & 0xff) << 8) |
        ((webp(vp8At + 6) & 0xff) << 16) | ((webp(vp8At + 7) & 0xff) << 24)
      val f = operators.Vp8.decodeFrame(webp, vp8At + 8, sz)
      val yuv = res("yuv")
      var badY = 0
      for (r <- 0 until h; c <- 0 until w)
        if (f.y(r * f.yStride + c) != (yuv(r * w + c) & 0xff)) badY += 1
      assert(badY == 0, s"$name: $badY mismatched Y samples")
    }
  }

  test("synthWebpLossyAlpha: every ALPH filter round-trips; alpha merges into pixels") {
    def af(r: Int, c: Int): Int = (r * 11 + c * 29 + 3) % 256
    val lossy = operators.Vp8.encodeKeyframe(20, 18, 0, 0, Seq(
      operators.Vp8.MbSpec(yMode = 0, uvMode = 0,
        y2 = { val a = new Array[Int](16); a(0) = 16; a }),
      operators.Vp8.MbSpec(yMode = 2, uvMode = 2,
        y2 = { val a = new Array[Int](16); a(0) = -8; a }),
      operators.Vp8.MbSpec(yMode = 1, uvMode = 1),
      operators.Vp8.MbSpec(yMode = 1, uvMode = 1,
        y2 = { val a = new Array[Int](16); a(0) = 24; a })))
    for (filterM <- 0 to 3) {
      val file = Webp.synthWebpLossyAlpha(lossy, af, filterM)
      val (w, h, px) = Webp.decodeWebpPixels(file)
      assert((w, h) == ((20, 18)), s"filter $filterM")
      for (r <- 0 until h; c <- 0 until w)
        assert(((px(r * w + c) >>> 24) & 0xff) == af(r, c),
          s"filter $filterM alpha ($r,$c)")
    }
    // the RGB under the alpha is the plain lossy decode
    val plain = Webp.decodeWebpPixels(lossy)._3
    val merged = Webp.decodeWebpPixels(Webp.synthWebpLossyAlpha(lossy, af))._3
    assert(plain.zip(merged).forall { case (p, m) =>
      (p & 0xffffff) == (m & 0xffffff) })
  }

  test("palette (color-indexing) round trips incl. sub-byte bundling") {
    // sizes straddling every bundling width: 2 -> 8px/byte, 3..4 ->
    // 4px/byte, 5..16 -> 2px/byte, 17+ -> unpacked
    for (n <- Seq(2, 3, 4, 11, 16, 17, 200)) {
      val pal = (0 until n).map(i =>
        ((i * 37 + 100) % 256 << 24) | ((i * 59) % 256 << 16) |
          ((i * 83 + 7) % 256 << 8) | ((i * 29 + 3) % 256))
      def idx(r: Int, c: Int) = (r * 7 + c * 5) % n
      val bytes = Webp.synthWebpPalette(19, 7, pal, idx)
      assertIdentity(bytes, 19, 7, (r, c) => pal(idx(r, c)), s"pal$n")
    }
  }

  test("animated WebP: ANMF frames round-trip with offsets and durations") {
    def f1(r: Int, c: Int) = px(r, c)
    def f2(r: Int, c: Int) = px(r + 3, c + 1)
    def f3(r: Int, c: Int) = px(r, c + 5)
    val anim = Webp.synthWebpAnim(20, 16, Seq(
      (0, 0, 20, 16, 33, f1), (4, 2, 9, 7, 40, f2), (10, 8, 5, 4, 50, f3)))
    val (cw, ch, frames) = Webp.decodeWebpFrames(anim)
    assert((cw, ch) == ((20, 16)))
    assert(frames.map(f => (f.left, f.top, f.w, f.h, f.durationMs)) ==
      Seq((0, 0, 20, 16, 33), (4, 2, 9, 7, 40), (10, 8, 5, 4, 50)))
    for ((f, want) <- frames.zip(Seq(f1 _, f2 _, f3 _)); r <- 0 until f.h; c <- 0 until f.w)
      assert(f.argb(r * f.w + c) == want(r, c), s"(${f.left},${f.top}) ($r,$c)")
    // a plain single-image file decodes as one frame at the origin
    val (pw, ph, one) = Webp.decodeWebpFrames(Webp.synthWebpLossless(6, 4, px))
    assert((pw, ph) == ((6, 4)) && one.length == 1 &&
      one.head.durationMs == 0 && one.head.left == 0)
    // odd offsets reject at encode (ANMF halves them)
    intercept[IllegalArgumentException](
      Webp.synthWebpAnim(8, 8, Seq((1, 0, 4, 4, 10, f1))))
    // the frame explosion surface
    import spark.implicits._
    val rows = Webp.webpToFrames(Seq((5L, anim)).toDF("media_id", "bytes"))
      .collect()
    assert(rows.length == (20 * 16 + 9 * 7 + 5 * 4) * 4)
    // and the census decodes animated files whole
    val census = MultimodalOps.mediaCensusWithRejects(
      Seq((1L, anim)).toDF("media_id", "bytes")).collect()(0)
    assert(census.getBoolean(4) && census.getLong(2) == (20 * 16 + 9 * 7 + 5 * 4) * 4)
  }

  test("composition: ANMF blend/dispose flags round-trip and compose (r12)") {
    import graft.operators.Canvas
    // flags survive the container round trip
    val base = Webp.synthWebpLossless(6, 4, (r, c) => 0xff000000 | px(r, c) & 0xffffff)
    val patch = Webp.synthWebpLossless(2, 2, (r, c) =>
      ((if (r == 0) 255 else 0) << 24) | (px(r, c) & 0xffffff))
    val anim = Webp.synthWebpAnimComposed(6, 4, Seq(
      Webp.AnmfSpec(0, 0, 10, base, blend = false),
      Webp.AnmfSpec(2, 2, 20, patch, blend = true),
      Webp.AnmfSpec(4, 0, 30, patch, blend = false, disposeBg = true),
      Webp.AnmfSpec(0, 0, 40, patch)))
    val (cw, ch, frames) = Webp.decodeWebpFrames(anim)
    assert((cw, ch) == ((6, 4)))
    assert(frames.map(f => (f.blend, f.disposeBg)) ==
      Seq((false, false), (true, false), (false, true), (true, false)))
    val composed = Webp.composeFrames(cw, ch, frames)
    assert(composed.forall(f => f.w == 6 && f.h == 4 && f.left == 0 && f.top == 0))
    assert(composed.map(_.durationMs) == Seq(10, 20, 30, 40))
    def at(fi: Int, r: Int, c: Int) = composed(fi).argb(r * 6 + c)
    def baseAt(r: Int, c: Int) = 0xff000000 | px(r, c) & 0xffffff
    def patchAt(r: Int, c: Int) =
      ((if (r == 0) 255 else 0) << 24) | (px(r, c) & 0xffffff)
    // frame 0: base everywhere
    for (r <- 0 until 4; c <- 0 until 6) assert(at(0, r, c) == baseAt(r, c))
    // frame 1: BLEND — opaque patch row lands, transparent row keeps base
    assert(at(1, 2, 2) == patchAt(0, 0) && at(1, 2, 3) == patchAt(0, 1))
    assert(at(1, 3, 2) == baseAt(3, 2) && at(1, 3, 3) == baseAt(3, 3))
    // frame 2: NO-blend at (4,0) — the transparent row OVERWRITES
    // (punches a hole: alpha 0, patch RGB preserved verbatim)
    assert(at(2, 0, 4) == patchAt(0, 0) && at(2, 1, 4) == patchAt(1, 0))
    assert((at(2, 1, 4) >>> 24) == 0)
    // frame 3: frame 2's rect was disposed to transparent, patch redrawn
    // at the origin over the frame-1 state
    assert(at(3, 0, 4) == 0 && at(3, 1, 5) == 0)
    assert(at(3, 0, 0) == patchAt(0, 0))
    assert(at(3, 1, 0) == baseAt(1, 0)) // transparent patch row blends away
    assert(at(3, 2, 2) == patchAt(0, 0)) // frame-1 state survives
    // fractional alpha: the EXACT integer rule, verified against an
    // independent evaluation of the spec's real-number formula
    val src = (128 << 24) | (200 << 16) | (40 << 8) | 90
    val dst = (180 << 24) | (10 << 16) | (250 << 8) | 33
    val got = Canvas.over(src, dst)
    val aNum = 128 * 255 + 180 * (255 - 128)
    def want(shift: Int): Int = {
      val cS = (src >> shift) & 0xff; val cD = (dst >> shift) & 0xff
      (cS * 128 * 255 + cD * 180 * (255 - 128) + aNum / 2) / aNum
    }
    assert((got >>> 24) == (aNum + 127) / 255)
    assert(((got >> 16) & 0xff) == want(16) &&
      ((got >> 8) & 0xff) == want(8) && (got & 0xff) == want(0))
    // and the degenerate alphas are exact selections
    assert(Canvas.over(src & 0xffffff, dst) == dst)
    assert(Canvas.over(src | 0xff000000, dst) == (src | 0xff000000))
    // blending onto a fully transparent canvas keeps the source pixel
    assert(Canvas.over(src, 0) == src)
    // out-of-canvas rects fail closed
    intercept[IllegalArgumentException](Canvas.compose(4, 4, Seq(
      Canvas.Layer(3, 0, 2, 2, new Array[Int](4), blend = true,
        disposeBg = false, restorePrev = false))))
  }

  test("inter-frame VP8 in animations rejects countably — documented out of scope (r12)") {
    // Decision (r12, verdict stretch-10): real-encoder animated lossy
    // WebP MAY emit non-keyframe ANMF frames; golden-frame inter decode
    // is out of scope until fixture evidence shows it is common in crawl
    // content. The contract is a COUNTABLE reject (named reason), never
    // a silent drop or a dead task.
    import graft.operators.Vp8
    val key = Vp8.encodeKeyframe(16, 16, 0, 0, Seq(
      Vp8.MbSpec(yMode = 0, uvMode = 0,
        y2 = { val a = new Array[Int](16); a(0) = 24; a })))
    val inter = key.clone(); inter(20) = (inter(20) | 1).toByte // frame-type bit
    val e = intercept[IllegalArgumentException](Webp.decodeWebpFrames(inter))
    assert(e.getMessage.contains("inter"), e.getMessage)
    val anim = Webp.synthWebpAnimFiles(16, 16, Seq((0, 0, 10, key), (0, 0, 20, inter)))
    val e2 = intercept[IllegalArgumentException](Webp.decodeWebpFrames(anim))
    assert(e2.getMessage.contains("inter"), e2.getMessage)
    import spark.implicits._
    val rows = MultimodalOps.mediaCensusWithRejects(
      Seq((1L, anim), (2L, key)).toDF("media_id", "bytes")).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(!byId(1L).getBoolean(4) && byId(1L).getString(5).contains("inter"))
    assert(byId(2L).getBoolean(4))
  }

  test("webpToPixels: RGBA rows; lossy and non-VP8L containers fail closed") {
    val bytes = Webp.synthWebpLossless(4, 3, px)
    val out = Webp.webpToPixels(Seq((9L, bytes)).toDF("img_id", "bytes"))
      .orderBy("px_row", "px_col", "channel").collect()
    assert(out.length == 4 * 3 * 4)
    val first = out.take(4).map(_.getInt(4)).toSeq
    val p0 = px(0, 0)
    assert(first == Seq((p0 >> 16) & 0xff, (p0 >> 8) & 0xff, p0 & 0xff, p0 >>> 24))
    // corrupt lossy VP8 rejects from the keyframe parser (r11: lossy
    // DECODES now; this garbage payload has no keyframe start code)
    val lossy = "RIFF".getBytes("US-ASCII") ++ Array[Byte](24, 0, 0, 0) ++
      "WEBPVP8 ".getBytes("US-ASCII") ++ Array[Byte](12, 0, 0, 0) ++
      Array.fill[Byte](12)(7)
    val e = intercept[IllegalArgumentException](Webp.decodeWebpPixels(lossy))
    assert(e.getMessage.contains("VP8"), e.getMessage) // inter-frame/start-code reject
    // imageless extended container rejects descriptively
    val vp8x = "RIFF".getBytes("US-ASCII") ++ Array[Byte](14, 0, 0, 0) ++
      "WEBPVP8X".getBytes("US-ASCII") ++ Array[Byte](10, 0, 0, 0) ++
      Array.fill[Byte](10)(0)
    val e2 = intercept[IllegalArgumentException](Webp.decodeWebpPixels(vp8x))
    assert(e2.getMessage.contains("no VP8L or VP8"), e2.getMessage)
    // a REAL lossy still (from the reference encoder) decodes to ARGB
    val in = getClass.getResourceAsStream("/vp8/gradient_16x16_q80.webp")
    val realLossy = try in.readAllBytes() finally in.close()
    val (lw, lh, lpx) = Webp.decodeWebpPixels(realLossy)
    assert((lw, lh) == ((16, 16)) && lpx.forall(p => (p >>> 24) == 0xff))
    // ALPH-bearing lossy layouts reject descriptively
    val withAlph = {
      val vp8Chunk = realLossy.drop(12) // "VP8 " chunk verbatim
      val alph = "ALPH".getBytes("US-ASCII") ++ Array[Byte](2, 0, 0, 0, 0, 0)
      val body = alph ++ vp8Chunk
      "RIFF".getBytes("US-ASCII") ++ Array[Byte](
        ((body.length + 4) & 0xff).toByte, (((body.length + 4) >> 8) & 0xff).toByte, 0, 0) ++
        "WEBP".getBytes("US-ASCII") ++ body
    }
    val e3 = intercept[IllegalArgumentException](Webp.decodeWebpPixels(withAlph))
    assert(e3.getMessage.contains("ALPH"), e3.getMessage)
    // and the rejects census now DECODES lossless webp
    val census = MultimodalOps.mediaCensusWithRejects(
      Seq((1L, bytes)).toDF("media_id", "bytes")).collect()(0)
    assert(census.getString(1) == "webp" && census.getBoolean(4))
    assert(census.getLong(2) == 4 * 3 * 4)
    val wantSum = (for (r <- 0 until 3; c <- 0 until 4) yield {
      val p = px(r, c)
      ((p >>> 24) & 0xff) + ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
    }).sum.toLong
    assert(census.getLong(3) == wantSum)
  }
}
