package graft

import graft.operators.{Gif, Jpeg, MultimodalOps}
import org.scalatest.funsuite.AnyFunSuite

/** Reference-implementation conformance for the byte codecs, using the
  * JDK's OWN encoders as the independent implementation (javax.imageio
  * for PNG/GIF/BMP/JPEG, javax.sound for WAV) — the r11 VP8L lesson made
  * law: a self-consistent encoder/decoder pair round-trips forever while
  * being wrong about the FORMAT; only decoding another implementation's
  * real output catches convention bugs (bit order, table order, sign
  * maps). Lossless formats must match exactly; JPEG (whose inverse DCT
  * is implementation-defined within tolerance) must match the JDK's own
  * decode within ±1 per sample.
  */
class ImageIoConformanceSpec extends AnyFunSuite {
  import java.awt.image.BufferedImage
  import javax.imageio.ImageIO

  private def argb(r: Int, c: Int): Int = {
    val a = 255 // PNG ARGB path tests alpha separately
    (a << 24) | ((r * 31 + c * 7 & 0xff) << 16) |
      ((r * 13 + c * 17 + 5 & 0xff) << 8) | (r * 3 + c * 29 + 11 & 0xff)
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK has no $fmt writer")
    bos.toByteArray
  }

  test("PNG: JDK-encoded RGB, RGBA, and gray images decode exactly") {
    // RGB
    val w = 23; val h = 11
    val rgb = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) rgb.setRGB(x, y, argb(y, x))
    val (pw, ph, ch, px) = MultimodalOps.decodePngPixels(encode(rgb, "png"))
    assert((pw, ph, ch) == ((w, h, 3)))
    for (y <- 0 until h; x <- 0 until w) {
      val want = argb(y, x)
      val at = (y * w + x) * 3
      assert(px(at) == ((want >> 16) & 0xff) && px(at + 1) == ((want >> 8) & 0xff) &&
        px(at + 2) == (want & 0xff), s"png rgb ($y,$x)")
    }
    // RGBA (alpha varies)
    val rgba = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w)
      rgba.setRGB(x, y, (((y * 5 + x * 3 + 9) & 0xff) << 24) | (argb(y, x) & 0xffffff))
    val (_, _, ch2, px2) = MultimodalOps.decodePngPixels(encode(rgba, "png"))
    assert(ch2 == 4)
    for (y <- 0 until h; x <- 0 until w) {
      val want = (((y * 5 + x * 3 + 9) & 0xff) << 24) | (argb(y, x) & 0xffffff)
      val at = (y * w + x) * 4
      assert(px2(at) == ((want >> 16) & 0xff) && px2(at + 1) == ((want >> 8) & 0xff) &&
        px2(at + 2) == (want & 0xff) && px2(at + 3) == ((want >>> 24) & 0xff),
        s"png rgba ($y,$x)")
    }
    // gray
    val gray = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val g = (y * 19 + x * 11 + 4) & 0xff
      gray.setRGB(x, y, (0xff << 24) | (g << 16) | (g << 8) | g)
    }
    val (_, _, ch3, px3) = MultimodalOps.decodePngPixels(encode(gray, "png"))
    assert(ch3 == 1)
    // compare the stored RASTER (TYPE_BYTE_GRAY's getRGB runs a
    // color-managed conversion; the PNG holds the raw samples)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(encode(gray, "png")))
    for (y <- 0 until h; x <- 0 until w)
      assert(px3(y * w + x) == ref.getRaster.getSample(x, y, 0), s"png gray ($y,$x)")
  }

  test("GIF: JDK-encoded palette image decodes exactly") {
    val w = 19; val h = 13
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, argb(y, x))
    val bytes = encode(img, "gif")
    val (_, _, frames) = Gif.decodeGifFrames(bytes)
    assert(frames.length == 1 && frames.head.w == w && frames.head.h == h)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until h; x <- 0 until w) {
      val want = ref.getRGB(x, y)
      val at = (y * w + x) * 4
      val rgba = frames.head.rgba
      assert(rgba(at) == ((want >> 16) & 0xff) && rgba(at + 1) == ((want >> 8) & 0xff) &&
        rgba(at + 2) == (want & 0xff), s"gif ($y,$x)")
    }
  }

  test("BMP: JDK-encoded 24-bit image decodes exactly") {
    val w = 17; val h = 9
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, argb(y, x))
    val (bw, bh, ch, px) = MultimodalOps.decodeBmpPixels(encode(img, "bmp"))
    assert((bw, bh, ch) == ((w, h, 3)))
    for (y <- 0 until h; x <- 0 until w) {
      val want = argb(y, x)
      val at = (y * w + x) * 3
      assert(px(at) == ((want >> 16) & 0xff) && px(at + 1) == ((want >> 8) & 0xff) &&
        px(at + 2) == (want & 0xff), s"bmp ($y,$x)")
    }
  }

  test("JPEG: JDK-encoded baseline decodes within ±1 of the JDK's own decode") {
    // smooth content (JPEG is lossy; the IDCT is implementation-defined
    // within tolerance — structural bugs show up as gross mismatches)
    val w = 48; val h = 32
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      // genuinely smooth gradients (no modular wraps: a wrap is a sharp
      // edge, where two conforming IDCT/upsampler pairs legitimately ring
      // differently)
      val r = 40 + x * 3; val g = 60 + y * 4; val b = 80 + (x + y) * 2
      img.setRGB(x, y, (0xff << 24) | (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.85f)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    val bytes = bos.toByteArray
    // decodeJpegPixels returns YCbCr COMPONENT bytes by documented census
    // design (upsampled to full resolution) — convert with the JFIF
    // matrix here and compare against the JDK's own RGB decode. The two
    // implementations' IDCTs and chroma upsamplers (replicated vs fancy)
    // are each spec-conforming, so smooth content must agree tightly;
    // a swapped plane / wrong table / zigzag-tail bug shows up as
    // double-digit divergence (the r11 VP8L lesson).
    val (jw, jh, comps, px) = Jpeg.decodeJpegPixels(bytes)
    assert((jw, jh, comps) == ((w, h, 3)))
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    def clamp(v: Double): Int = math.max(0, math.min(255, math.round(v).toInt))
    var maxDiff = 0
    var over3 = 0
    for (y <- 0 until h; x <- 0 until w) {
      val yy = px((y * w + x) * 3) & 0xff
      val cb = (px((y * w + x) * 3 + 1) & 0xff) - 128
      val cr = (px((y * w + x) * 3 + 2) & 0xff) - 128
      val got = Seq(clamp(yy + 1.402 * cr),
        clamp(yy - 0.344136 * cb - 0.714136 * cr), clamp(yy + 1.772 * cb))
      for (k <- 0 until 3) {
        val want = (ref.getRGB(x, y) >> ((2 - k) * 8)) & 0xff
        val d = math.abs(got(k) - want)
        maxDiff = math.max(maxDiff, d)
        if (d > 3) over3 += 1
      }
    }
    assert(over3 <= (w * h * 3) / 100,
      s"jpeg: $over3 samples differ by >3 (max $maxDiff) — structural divergence")
    assert(maxDiff <= 8, s"jpeg: max per-sample difference $maxDiff")
  }

  test("TIFF: JDK-encoded uint16 LZW strips decode exactly") {
    val w = 37; val h = 21
    val img = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 1733 + y * 977 + 101) % 65536)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("LZW")
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    val bytes = bos.toByteArray
    // bandBlocksOf normalizes every blob to a float32 BIG-ENDIAN plane
    // (uint16 ≤ 65535 is float32-exact); strips reassemble by strip row
    val blocks = operators.Tiff.bandBlocksOf(bytes)
    val rps = blocks.head._4
    val samples = new Array[Int](w * h)
    for ((_, ty, _, bh, bw, blob) <- blocks) {
      val rows = math.min(bh, h - ty * rps)
      for (r <- 0 until rows; x <- 0 until math.min(bw, w)) {
        val at = (r * bw + x) * 4
        val bits = ((blob(at) & 0xff) << 24) | ((blob(at + 1) & 0xff) << 16) |
          ((blob(at + 2) & 0xff) << 8) | (blob(at + 3) & 0xff)
        samples((ty * rps + r) * w + x) = java.lang.Float.intBitsToFloat(bits).toInt
      }
    }
    for (y <- 0 until h; x <- 0 until w)
      assert(samples(y * w + x) == (x * 1733 + y * 977 + 101) % 65536,
        s"tiff ($y,$x)")
  }

  test("TIFF reverse: the JDK decodes the in-repo LZW writer's output exactly") {
    // the direction that caught the r11 width bug: a self-consistent
    // encoder/decoder pair must ALSO produce files real readers accept
    val w = 33; val h = 17
    def v(r: Int, c: Int): Float = ((r * 31 + c * 7) % 97).toFloat
    val bytes = operators.Tiff.synthTiff(w, h, w, h,
      littleEndian = false, tile = false, lzw = true)(v)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK cannot decode the in-repo LZW TIFF")
    for (r <- 0 until h; c <- 0 until w)
      assert(img.getRaster.getSampleFloat(c, r, 0) == v(r, c), s"($r,$c)")
  }

  test("WAV: JDK-encoded PCM decodes exactly") {
    import javax.sound.sampled._
    val n = 200
    val raw = new Array[Byte](n * 2 * 2) // 16-bit stereo LE
    for (f <- 0 until n; c <- 0 until 2) {
      val v = ((f * 523 + c * 117) % 65536) - 32768
      raw((f * 2 + c) * 2) = (v & 0xff).toByte
      raw((f * 2 + c) * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 2, 4, 8000f, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(raw), fmt, n)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val (rate, chans, bits, samples) = MultimodalOps.decodeWavSamples(bos.toByteArray)
    assert((rate, chans, bits) == ((8000, 2, 16)))
    assert(samples.length == n * 2)
    for (f <- 0 until n; c <- 0 until 2)
      assert(samples(f * 2 + c) == ((f * 523 + c * 117) % 65536) - 32768, s"wav ($f,$c)")
  }
}
