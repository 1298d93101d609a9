package graft

import graft.operators.Vp8
import org.scalatest.funsuite.AnyFunSuite

class Vp8Spec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream("/vp8/" + name)
    require(in != null, s"missing test resource vp8/$name")
    try in.readAllBytes() finally in.close()
  }

  test("conformance: libwebp-encoded fixtures decode to libwebp's own YUV planes, bit-exact") {
    // Fixtures from tools/vp8_fixtures.py: real encoder output (4
    // segments, loop filter, dynamic token probability updates) paired
    // with the reference decoder's YUV420 planes. Bit-equality here
    // verifies the constant tables, bool decoder, trees, dequant,
    // transforms, all intra predictors, and the loop filter at once.
    val manifest = new String(resource("manifest.txt"), "UTF-8").trim
      .split("\n").map(_.trim).filter(_.nonEmpty)
    assert(manifest.length >= 6)
    for (line <- manifest) {
      val Array(name, ws, hs) = line.split(" ")
      val w = ws.toInt; val h = hs.toInt
      val webp = resource(name + ".webp")
      val expected = resource(name + ".yuv")
      // VP8 payload sits after the 20-byte RIFF/WEBP/VP8 header
      val frame = Vp8.decodeFrame(webp, 20, webp.length - 20)
      assert(frame.width == w && frame.height == h, name)
      val uvw = (w + 1) / 2; val uvh = (h + 1) / 2
      assert(expected.length == w * h + 2 * uvw * uvh, name)
      var bad = 0
      var firstBad = ""
      for (r <- 0 until h; c <- 0 until w) {
        val got = frame.y(r * frame.yStride + c)
        val want = expected(r * w + c) & 0xff
        if (got != want) {
          bad += 1
          if (firstBad.isEmpty) firstBad = s"Y($r,$c): got $got want $want"
        }
      }
      for (pl <- 0 until 2; r <- 0 until uvh; c <- 0 until uvw) {
        val plane = if (pl == 0) frame.u else frame.v
        val got = plane(r * frame.uvStride + c)
        val want = expected(w * h + pl * uvw * uvh + r * uvw + c) & 0xff
        if (got != want) {
          bad += 1
          if (firstBad.isEmpty)
            firstBad = s"${if (pl == 0) "U" else "V"}($r,$c): got $got want $want"
        }
      }
      assert(bad == 0, s"$name: $bad mismatched samples; first: $firstBad")
    }
  }

  test("fixture encoder round-trips through the decoder (flat DC frame)") {
    // one 16x16 MB, DC_PRED (no neighbors -> 128), Y2 DC v: every luma
    // pixel = 128 + (((v*y2dcQ + 3) >> 3) + 4 >> 3); chroma analogous
    val v = 24
    val vu = -9; val vv = 13
    val qi = 0 // y2dc quant = dcQ[0]*2 = 8, uv dc quant = 4
    val spec = Vp8.MbSpec(yMode = 0, uvMode = 0,
      y2 = { val a = new Array[Int](16); a(0) = v; a },
      u = Array.tabulate(4)(_ => { val a = new Array[Int](16); a(0) = vu; a }),
      v = Array.tabulate(4)(_ => { val a = new Array[Int](16); a(0) = vv; a }))
    val bytes = Vp8.encodeKeyframe(16, 16, qi, 0, Seq(spec))
    val f = Vp8.decodeFrame(bytes, 20, bytes.length - 20)
    val dY = ((((v * 8) + 3) >> 3) + 4) >> 3
    val dU = (((vu * 4)) + 4) >> 3
    val dV = (((vv * 4)) + 4) >> 3
    assert(f.y.take(16).forall(_ == 128 + dY), s"y ${f.y(0)} vs ${128 + dY}")
    assert(f.u(0) == 128 + dU, s"u ${f.u(0)} vs ${128 + dU}")
    assert(f.v(0) == 128 + dV, s"v ${f.v(0)} vs ${128 + dV}")
  }

  test("fixture encoder: V/H propagation, skip, AC stripes, B_PRED constancy") {
    // 3x2 MBs at 48x32: MB(0,0) DC with Y2 dc, row 0 H_PRED, row 1
    // V_PRED; MB(1,1) skipped (pure V copy); MB(1,2) B_PRED all-B_DC
    // with zero residual (stays the constant)
    val qi = 0
    def y2dc(vv: Int) = { val a = new Array[Int](16); a(0) = vv; a }
    def delta(vv: Int) = ((((vv * 8) + 3) >> 3) + 4) >> 3
    val d00 = 16; val d01 = 8; val d02 = -8; val d10 = 24
    val specs = Seq(
      Vp8.MbSpec(yMode = 0, uvMode = 0, y2 = y2dc(d00)),
      Vp8.MbSpec(yMode = 2, uvMode = 2, y2 = y2dc(d01)), // H
      Vp8.MbSpec(yMode = 2, uvMode = 2, y2 = y2dc(d02)), // H
      Vp8.MbSpec(yMode = 1, uvMode = 1, y2 = y2dc(d10)), // V
      Vp8.MbSpec(yMode = 1, uvMode = 1, skip = true),    // V, skipped
      Vp8.MbSpec(yMode = 4, uvMode = 0,
        bModes = Array.fill(16)(0))) // B_PRED all B_DC, no residual
    val bytes = Vp8.encodeKeyframe(48, 32, qi, 0, specs)
    val f = Vp8.decodeFrame(bytes, 20, bytes.length - 20)
    val c00 = 128 + delta(d00)
    val c01 = c00 + delta(d01)
    val c02 = c01 + delta(d02)
    val c10 = c00 + delta(d10)
    val c11 = c01 // skip under V_PRED = copy above
    def yAt(r: Int, c: Int) = f.y(r * f.yStride + c)
    assert(yAt(0, 0) == c00 && yAt(15, 15) == c00)
    assert(yAt(0, 16) == c01 && yAt(8, 31) == c01)
    assert(yAt(3, 40) == c02)
    assert(yAt(16, 3) == c10 && yAt(31, 15) == c10)
    assert(yAt(20, 20) == c11)
    // B_DC of unequal flat neighbors: (4*above + 4*left + 4) >> 3 for the
    // first subblock, and the whole MB settles on that value here
    val cB = (4 * c02 + 4 * c11 + 4) >> 3
    assert(yAt(16, 40) == cB && yAt(31, 47) == cB, "B_DC constant mix")
  }

  test("AC-stripe closed form: one coefficient at position 1 makes column stripes") {
    // the mm19 oracle's formula: with Y2 DC w and per-block AC a (both
    // quantizer-level, qi=0 so y2dcQ=8, yacQ=4), every row of a DC_PRED
    // first MB is 128 + stripe(col%4)
    val w = 10; val a = 6
    val spec = Vp8.MbSpec(yMode = 0, uvMode = 0,
      y2 = { val t = new Array[Int](16); t(0) = w; t },
      y = Array.fill(16) { val t = new Array[Int](16); t(1) = a; t })
    val bytes = Vp8.encodeKeyframe(16, 16, 0, 0, Seq(spec))
    val f = Vp8.decodeFrame(bytes, 20, bytes.length - 20)
    val d = (w * 8 + 3) >> 3
    val bigA = a * 4
    val t20 = (bigA * 20091) >> 16
    val t35 = (bigA * 35468) >> 16
    val s = Array(
      (d + bigA + t20 + 4) >> 3, (d + t35 + 4) >> 3,
      (d - t35 + 4) >> 3, (d - bigA - t20 + 4) >> 3)
    for (r <- 0 until 16; c <- 0 until 16)
      assert(f.y(r * f.yStride + c) == 128 + s(c % 4), s"($r,$c)")
  }

  test("corrupt payloads reject with IllegalArgumentException") {
    val good = Vp8.encodeKeyframe(16, 16, 10, 0, Seq(Vp8.MbSpec(0, 0)))
    intercept[IllegalArgumentException] { // bad start code
      val b = good.clone(); b(23) = 0x77; Vp8.decodeFrame(b, 20, b.length - 20)
    }
    intercept[IllegalArgumentException] { // inter frame flag
      val b = good.clone(); b(20) = (b(20) | 1).toByte
      Vp8.decodeFrame(b, 20, b.length - 20)
    }
    intercept[IllegalArgumentException] { // truncated to under the header
      Vp8.decodeFrame(good, 20, 6)
    }
  }
}
