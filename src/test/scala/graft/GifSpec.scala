package graft

import graft.operators.Gif
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GifSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("GIF LZW: encode/decode round-trips adversarial streams incl. width growth and 4096 reset") {
    val rnd = new scala.util.Random(11)
    val cases: Seq[(Array[Byte], Int)] = Seq(
      // KwKwK torture: aaa...a produces the classic just-defined-code reads
      (Array.fill(500)(7.toByte), 4),
      // ababab... (period-2 repeats defining chains)
      (Array.tabulate(400)(i => (if (i % 2 == 0) 3 else 9).toByte), 4),
      // high-diversity stream long enough to push width 9->12 and force
      // the 4096-entry clear/reset (random over a 256-symbol alphabet)
      (Array.fill(20000)(rnd.nextInt(256).toByte), 8),
      // runs + noise mix over a small alphabet
      (Array.tabulate(6000)(i =>
        (if (i % 37 < 25) (i / 37) % 4 else rnd.nextInt(4)).toByte), 2),
      (Array.empty[Byte], 2),
      (Array[Byte](0), 2))
    for (((data, mcs), i) <- cases.zipWithIndex) {
      val enc = Gif.lzwEncodeGif(data, mcs)
      val dec = Gif.lzwDecodeGif(enc, mcs, data.length)
      assert(dec.sameElements(data), s"case $i (n=${data.length}, mcs=$mcs)")
    }
  }

  test("GIF LZW fails closed: truncation, missing EOI, code beyond dictionary") {
    val data = Array.tabulate(100)(i => (i % 4).toByte)
    val enc = Gif.lzwEncodeGif(data, 2)
    intercept[IllegalArgumentException](Gif.lzwDecodeGif(enc.take(enc.length / 2), 2, 100))
    // ask for more pixels than encoded: hits EOI early or runs out
    intercept[IllegalArgumentException](Gif.lzwDecodeGif(enc, 2, 101))
  }

  test("multi-frame GIF: rectangles, local palette, transparency round-trip") {
    val global = Seq((10, 20, 30), (200, 100, 50), (0, 0, 0), (255, 255, 255))
    val local = Seq((1, 2, 3), (4, 5, 6), (7, 8, 9), (250, 251, 252),
      (40, 41, 42), (50, 51, 52), (60, 61, 62), (70, 71, 72))
    val gif = Gif.synthGif(40, 30, global, Seq(
      Gif.FrameSpec(0, 0, 40, 30)((r, c) => (r + c) % 4),
      Gif.FrameSpec(5, 7, 12, 9, localPalette = Some(local),
        transparentIdx = Some(3))((r, c) => (r * 3 + c) % 8)))
    val (sw, sh, frames) = Gif.decodeGifFrames(gif)
    assert((sw, sh) == ((40, 30)) && frames.length == 2)
    val f0 = frames(0)
    assert((f0.left, f0.top, f0.w, f0.h) == ((0, 0, 40, 30)))
    for (r <- 0 until 30; c <- 0 until 40) {
      val (pr, pg, pb) = global((r + c) % 4)
      val base = (r * 40 + c) * 4
      assert((f0.rgba(base), f0.rgba(base + 1), f0.rgba(base + 2), f0.rgba(base + 3))
        == ((pr, pg, pb, 255)), s"f0 ($r,$c)")
    }
    val f1 = frames(1)
    assert((f1.left, f1.top, f1.w, f1.h) == ((5, 7, 12, 9)))
    for (r <- 0 until 9; c <- 0 until 12) {
      val i = (r * 3 + c) % 8
      val (pr, pg, pb) = local(i)
      val a = if (i == 3) 0 else 255
      val base = (r * 12 + c) * 4
      assert((f1.rgba(base), f1.rgba(base + 1), f1.rgba(base + 2), f1.rgba(base + 3))
        == ((pr, pg, pb, a)), s"f1 ($r,$c)")
    }
  }

  test("container fails closed: bad signature, unknown block, truncation") {
    val ok = Gif.synthGif(8, 8, Seq((0, 0, 0), (1, 1, 1)),
      Seq(Gif.FrameSpec(0, 0, 8, 8)((r, c) => (r + c) % 2)))
    val badSig = ok.clone(); badSig(3) = 'X'.toByte
    assert(intercept[IllegalArgumentException](
      Gif.decodeGifFrames(badSig)).getMessage.contains("signature"))
    val descAt = (13 + 6) // header+LSD (13) + 2-entry global table (6)
    assert((ok(descAt) & 0xff) == 0x2c)
    val unknown = ok.clone(); unknown(descAt) = 0x7e.toByte
    assert(intercept[IllegalArgumentException](
      Gif.decodeGifFrames(unknown)).getMessage.contains("unknown GIF block"))
    intercept[IllegalArgumentException](Gif.decodeGifFrames(ok.take(ok.length - 3)))
  }

  test("gifToFrames: one row per frame sample with pass-through columns") {
    val gif = Gif.synthGif(6, 4, Seq((9, 8, 7), (6, 5, 4)), Seq(
      Gif.FrameSpec(0, 0, 6, 4)((r, c) => (r * 6 + c) % 2),
      Gif.FrameSpec(2, 1, 3, 2)((_, c) => c % 2)))
    val df = Seq((77L, gif)).toDF("media_id", "bytes")
    val out = Gif.gifToFrames(df)
    assert(out.columns.toSeq == Seq("media_id", "frame_idx", "frame_left", "frame_top",
      "duration_ms", "px_row", "px_col", "channel", "value"))
    // no GCE -> duration 0; a delayed frame surfaces centiseconds x 10
    assert(out.select("duration_ms").distinct().head().getInt(0) == 0)
    val delayed = Gif.gifToFrames(Seq((1L, Gif.synthGif(4, 2, Seq((1, 2, 3), (4, 5, 6)),
      Seq(Gif.FrameSpec(0, 0, 4, 2, delayCs = 25)((r, c) => (r + c) % 2))))).toDF("media_id", "bytes"))
    assert(delayed.select("duration_ms").distinct().head().getInt(0) == 250)
    assert(out.count() == (6 * 4 + 3 * 2) * 4)
    assert(out.filter(col("frame_idx") === 1).select("frame_left").head().getInt(0) == 2)
    // spot-check one pixel of frame 0: idx (0*6+1)%2 = 1 -> (6,5,4,255)
    val px = out.filter(col("frame_idx") === 0 && col("px_row") === 0 && col("px_col") === 1)
      .orderBy("channel").collect().map(_.getInt(8))
    assert(px.toSeq == Seq(6, 5, 4, 255))
  }

  test("interlaced frame decodes pixel-identical to its sequential twin") {
    // the strongest equivalence shape (the progressive-JPEG precedent):
    // same idxOf, interlaced vs not — the 4-pass scatter must be
    // invisible. Heights cover every pass-boundary case: 1 and 2 (only
    // late passes populated), 4 (no pass-2 row beyond start), 8 (one row
    // per stride), 9 and 16 (multi-row passes).
    val pal = (0 until 5).map(i => (i * 47 % 256, i * 31 % 256, i * 61 % 256))
    for (h <- Seq(1, 2, 4, 8, 9, 16)) {
      def frame(i: Boolean) = Gif.synthGif(7, h, pal,
        Seq(Gif.FrameSpec(0, 0, 7, h, interlaced = i)((r, c) => (r * 3 + c) % 5)))
      val (_, _, seqF) = Gif.decodeGifFrames(frame(false))
      val (_, _, intF) = Gif.decodeGifFrames(frame(true))
      assert(seqF.length == 1 && intF.length == 1, s"h=$h")
      assert(java.util.Arrays.equals(seqF.head.rgba, intF.head.rgba), s"h=$h")
    }
    // and the interlace bit really is set in the interlaced spelling
    val b = Gif.synthGif(7, 9, pal,
      Seq(Gif.FrameSpec(0, 0, 7, 9, interlaced = true)((r, c) => 0)))
    val p = (13 until b.length).find(i => b(i) == 0x2c).get
    assert((b(p + 9) & 0x40) != 0)
  }

  test("disposal methods round-trip and compose full-canvas frames (r12)") {
    val pal = (0 until 6).map(i => (i * 40, i * 30, i * 20))
    // f0 full screen; f1 partial with transparent holes, restore-previous;
    // f2 partial, restore-background; f3 partial opaque
    val bytes = Gif.synthGif(6, 4, pal, Seq(
      Gif.FrameSpec(0, 0, 6, 4)((r, c) => (r + c) % 6),
      Gif.FrameSpec(2, 1, 3, 2, transparentIdx = Some(0), delayCs = 7,
        disposal = 3)((r, c) => (r * 2 + c) % 3),
      Gif.FrameSpec(0, 0, 2, 2, disposal = 2)((r, c) => 5 - (r + c) % 2),
      Gif.FrameSpec(4, 2, 2, 2)((r, c) => (r + c) % 4 + 1)))
    val (sw, sh, frames) = Gif.decodeGifFrames(bytes)
    assert((sw, sh) == ((6, 4)))
    assert(frames.map(_.disposal) == Seq(0, 3, 2, 0))
    assert(frames.map(_.delayMs) == Seq(0, 70, 0, 0))
    val composed = Gif.composeFrames(sw, sh, frames)
    assert(composed.forall(f => f.w == 6 && f.h == 4))
    def rgbaAt(fi: Int, r: Int, c: Int): (Int, Int, Int, Int) = {
      val a = composed(fi).rgba
      val i = (r * 6 + c) * 4
      (a(i), a(i + 1), a(i + 2), a(i + 3))
    }
    def palAt(i: Int) = (pal(i)._1, pal(i)._2, pal(i)._3, 255)
    // frame 0: the base everywhere
    for (r <- 0 until 4; c <- 0 until 6)
      assert(rgbaAt(0, r, c) == palAt((r + c) % 6), s"f0 ($r,$c)")
    // frame 1: opaque cells of f1 land; transparent (idx 0) keep the base
    assert(rgbaAt(1, 1, 2) == palAt((1 + 2) % 6)) // f1 idx (0,0)=0 -> hole keeps base
    assert(rgbaAt(1, 1, 3) == palAt(1)) // f1 idx (0,1)=1
    assert(rgbaAt(1, 2, 2) == palAt(2)) // f1 idx (1,0)=2
    // frame 2: f1 was RESTORED TO PREVIOUS — only f2's rect differs
    for (r <- 0 until 4; c <- 0 until 6)
      if (r < 2 && c < 2) assert(rgbaAt(2, r, c) == palAt(5 - (r + c) % 2))
      else assert(rgbaAt(2, r, c) == palAt((r + c) % 6), s"f2 ($r,$c)")
    // frame 3: f2's rect restored to background (transparent), f3 drawn
    assert(rgbaAt(3, 0, 0) == ((0, 0, 0, 0)) && rgbaAt(3, 1, 1) == ((0, 0, 0, 0)))
    assert(rgbaAt(3, 2, 4) == palAt(1) && rgbaAt(3, 3, 5) == palAt(3))
    assert(rgbaAt(3, 3, 2) == palAt((3 + 2) % 6)) // untouched base
    // the DataFrame surface matches (full canvas per frame)
    import spark.implicits._
    val rows = Gif.gifToComposedFrames(Seq((9L, bytes)).toDF("media_id", "bytes"))
      .collect()
    assert(rows.length == 4 * 6 * 4 * 4)
    val m = rows.map(r => (r.getInt(1), r.getInt(3), r.getInt(4), r.getInt(5)) ->
      r.getInt(6)).toMap
    assert(m((3, 0, 0, 3)) == 0 && m((1, 1, 3, 0)) == pal(1)._1)
  }

  test("composeFrames rejects undefined disposal methods 4-7 (fail closed)") {
    val f = Gif.Frame(0, 0, 1, 1, Array(1, 2, 3, 255), 0, disposal = 4)
    val e = intercept[IllegalArgumentException] { Gif.composeFrames(1, 1, Seq(f)) }
    assert(e.getMessage.contains("undefined GIF disposal"), e.getMessage)
  }
}
