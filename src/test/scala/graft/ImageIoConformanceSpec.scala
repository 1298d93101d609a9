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

  test("PNG: JDK-encoded PACKED palette depths (1/2/4-bit) decode exactly (r12)") {
    for (bits <- Seq(1, 2, 4)) {
      val n = 1 << bits
      val cols = Array.tabulate(n)(i =>
        0xff000000 | ((i * 37 % 256) << 16) | ((i * 59 % 256) << 8) | (i * 83 % 256))
      val icm = new java.awt.image.IndexColorModel(bits, n,
        cols.map(v => ((v >> 16) & 0xff).toByte),
        cols.map(v => ((v >> 8) & 0xff).toByte),
        cols.map(v => (v & 0xff).toByte))
      val w = 13; val h = 7
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY, icm)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, (y * 3 + x) % n)
      val bytes = encode(img, "png")
      // the JDK really wrote a PACKED stream (IHDR depth byte at 24)
      assert(bytes(24) == bits, s"JDK wrote depth ${bytes(24)}, wanted $bits")
      val (dw, dh, ch, px) = MultimodalOps.decodePngPixels(bytes)
      assert((dw, dh, ch) == ((w, h, 3)), s"b$bits")
      for (y <- 0 until h; x <- 0 until w) {
        val i = (y * 3 + x) % n
        val at = (y * w + x) * 3
        assert(px(at) == ((cols(i) >> 16) & 0xff) &&
          px(at + 1) == ((cols(i) >> 8) & 0xff) && px(at + 2) == (cols(i) & 0xff),
          s"b$bits ($y,$x)")
      }
    }
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

  test("GIF animation: JDK-WRITTEN offsets/disposal/delays parse and compose (r12)") {
    import javax.imageio.{IIOImage, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    // a fixed 4-entry palette, explicit IndexColorModel so the JDK writes
    // EXACTLY these colors (no quantizer in the loop)
    val cols = Array(0xff204060, 0xff80a0c0, 0xffe01030, 0xff10e070)
    val icm = new java.awt.image.IndexColorModel(2, 4,
      cols.map(v => ((v >> 16) & 0xff).toByte),
      cols.map(v => ((v >> 8) & 0xff).toByte),
      cols.map(v => (v & 0xff).toByte))
    def frame(w: Int, h: Int, idxOf: (Int, Int) => Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, idxOf(y, x))
      img
    }
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    def write(img: BufferedImage, left: Int, top: Int,
        disposal: String, delayCs: Int): Unit = {
      val meta = writer.getDefaultImageMetadata(
        new ImageTypeSpecifier(img), writer.getDefaultWriteParam)
      val fmt = meta.getNativeMetadataFormatName // javax_imageio_gif_image_1.0
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      def node(name: String): IIOMetadataNode = {
        val found = root.getElementsByTagName(name)
        if (found.getLength > 0) found.item(0).asInstanceOf[IIOMetadataNode]
        else { val n = new IIOMetadataNode(name); root.appendChild(n); n }
      }
      val gce = node("GraphicControlExtension")
      gce.setAttribute("disposalMethod", disposal)
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", delayCs.toString)
      gce.setAttribute("transparentColorIndex", "0")
      val desc = node("ImageDescriptor")
      desc.setAttribute("imageLeftPosition", left.toString)
      desc.setAttribute("imageTopPosition", top.toString)
      desc.setAttribute("imageWidth", img.getWidth.toString)
      desc.setAttribute("imageHeight", img.getHeight.toString)
      desc.setAttribute("interlaceFlag", "FALSE")
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, meta),
        writer.getDefaultWriteParam)
    }
    // f0 full 8x6; f1 3x2 at (4,2) restore-to-background; f2 2x2 at (1,1)
    write(frame(8, 6, (y, x) => (y + x) % 4), 0, 0, "doNotDispose", 11)
    write(frame(3, 2, (y, x) => (y * 2 + x) % 4), 4, 2, "restoreToBackgroundColor", 7)
    write(frame(2, 2, (y, x) => 3 - (y + x) % 2), 1, 1, "none", 0)
    writer.endWriteSequence(); ios.close()
    val bytes = bos.toByteArray
    // the engine parses the JDK's spelling of the metadata...
    val (sw, sh, frames) = Gif.decodeGifFrames(bytes)
    assert((sw, sh) == ((8, 6)), s"screen ${sw}x$sh")
    assert(frames.map(f => (f.left, f.top, f.w, f.h)) ==
      Seq((0, 0, 8, 6), (4, 2, 3, 2), (1, 1, 2, 2)))
    assert(frames.map(_.disposal) == Seq(1, 2, 0))
    assert(frames.map(_.delayMs) == Seq(110, 70, 0))
    // ...and the composition matches an INDEPENDENT hand-rolled replay
    // (binary-alpha paint + disposal, straight loops — not Canvas)
    val canvas = Array.fill(8 * 6)(0) // packed ARGB, 0 = transparent
    val specs = Seq(
      (0, 0, 8, 6, (y: Int, x: Int) => (y + x) % 4, false),
      (4, 2, 3, 2, (y: Int, x: Int) => (y * 2 + x) % 4, true),
      (1, 1, 2, 2, (y: Int, x: Int) => 3 - (y + x) % 2, false))
    val composed = Gif.composeFrames(sw, sh, frames)
    for (((left, top, w, h, idxOf, disposeBg), fi) <- specs.zipWithIndex) {
      for (y <- 0 until h; x <- 0 until w)
        canvas((top + y) * 8 + left + x) = cols(idxOf(y, x))
      for (y <- 0 until 6; x <- 0 until 8) {
        val want = canvas(y * 8 + x)
        val at = (y * 8 + x) * 4
        val rgba = composed(fi).rgba
        val got = (rgba(at + 3) << 24) | (rgba(at) << 16) |
          (rgba(at + 1) << 8) | rgba(at + 2)
        assert(got == want, f"frame $fi ($y,$x): $got%08x vs $want%08x")
      }
      if (disposeBg)
        for (y <- 0 until h; x <- 0 until w)
          canvas((top + y) * 8 + left + x) = 0
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

  test("JPEG-in-TIFF: JDK-written compression-7 TIFF decodes within JPEG tolerance (r13)") {
    // smooth gradients (the JPEG tolerance argument from the plain-JPEG
    // test above); h not MCU-aligned so padded/clipped strip handling runs
    val w = 48; val h = 33
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 40 + x * 3; val g = 60 + y * 4; val b = 80 + (x + y) * 2
      img.setRGB(x, y, (0xff << 24) | (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("JPEG")
    param.setCompressionQuality(0.9f)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    val bytes = bos.toByteArray
    // it really wrote new-style JPEG compression
    val meta = operators.Tiff.decodeMeta(bytes)
    assert(meta.getInt(operators.Tiff.metaSchema.fieldIndex("compression")) == 7,
      "JDK did not write compression 7")
    // reassemble our per-band planes (bandBlocksOf surfaces the STORED
    // sample space — raw Y/Cb/Cr for photometric 6)
    val blocks = operators.Tiff.bandBlocksOf(bytes)
    val rps = blocks.head._4
    val comp = Array.ofDim[Int](3, w * h)
    for ((band, ty, _, bh, bw, blob) <- blocks) {
      val rows = math.min(bh, h - ty * rps)
      for (r <- 0 until rows; x <- 0 until math.min(bw, w)) {
        val at = (r * bw + x) * 4
        val bits = ((blob(at) & 0xff) << 24) | ((blob(at + 1) & 0xff) << 16) |
          ((blob(at + 2) & 0xff) << 8) | (blob(at + 3) & 0xff)
        comp(band)((ty * rps + r) * w + x) = java.lang.Float.intBitsToFloat(bits).toInt
      }
    }
    // JFIF conversion, then the plain-JPEG tolerance contract vs the
    // JDK's own decode of the same file
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null, "JDK cannot read back its own JPEG-in-TIFF")
    def clamp(v: Double): Int = math.max(0, math.min(255, math.round(v).toInt))
    var maxDiff = 0
    var over3 = 0
    for (y <- 0 until h; x <- 0 until w) {
      val yy = comp(0)(y * w + x)
      val cb = comp(1)(y * w + x) - 128
      val cr = comp(2)(y * w + x) - 128
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
      s"jpeg-in-tiff: $over3 samples differ by >3 (max $maxDiff) — structural divergence")
    assert(maxDiff <= 8, s"jpeg-in-tiff: max per-sample difference $maxDiff")
  }

  test("JPEG-in-TIFF TILED: JDK-written 32x32 tiles decode within tolerance (r13)") {
    // the layout real aerial GeoTIFF archives ship: tiled + JPEG; edge
    // tiles are padded to full tile size, each tile its own JPEG stream
    val w = 70; val h = 45 // deliberately not tile-aligned
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 30 + x * 2; val g = 50 + y * 3; val b = 70 + (x + y)
      img.setRGB(x, y, (0xff << 24) | (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("JPEG")
    param.setCompressionQuality(0.9f)
    param.setTilingMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setTiling(32, 32, 0, 0)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    val bytes = bos.toByteArray
    val meta = operators.Tiff.decodeMeta(bytes)
    assert(meta.getInt(operators.Tiff.metaSchema.fieldIndex("compression")) == 7)
    assert(meta.getBoolean(operators.Tiff.metaSchema.fieldIndex("tiled")),
      "JDK did not write a tiled layout")
    val blocks = operators.Tiff.bandBlocksOf(bytes)
    val th = blocks.head._4; val tw = blocks.head._5
    assert(th == 32 && tw == 32, s"tile geometry ${tw}x$th")
    val comp = Array.ofDim[Int](3, w * h)
    for ((band, ty, tx, bh, bw, blob) <- blocks) {
      val rows = math.min(bh, h - ty * th)
      val cols = math.min(bw, w - tx * tw)
      for (r <- 0 until rows; x <- 0 until cols) {
        val at = (r * bw + x) * 4
        val bits = ((blob(at) & 0xff) << 24) | ((blob(at + 1) & 0xff) << 16) |
          ((blob(at + 2) & 0xff) << 8) | (blob(at + 3) & 0xff)
        comp(band)((ty * th + r) * w + tx * tw + x) =
          java.lang.Float.intBitsToFloat(bits).toInt
      }
    }
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    def clamp(v: Double): Int = math.max(0, math.min(255, math.round(v).toInt))
    // Two-zone contract: pixels in FULLY-INTERIOR tiles see only smooth
    // content and get the plain-JPEG tolerance; pixels in EDGE tiles sit
    // next to the writer's pad fill (a sharp transition inside that
    // tile's own JPEG), where two conforming IDCT/upsampler pairs
    // legitimately ring differently — bounded, but looser.
    var maxIn = 0; var over3In = 0; var nIn = 0
    var maxEdge = 0
    for (y <- 0 until h; x <- 0 until w) {
      val yy = comp(0)(y * w + x)
      val cb = comp(1)(y * w + x) - 128
      val cr = comp(2)(y * w + x) - 128
      val got = Seq(clamp(yy + 1.402 * cr),
        clamp(yy - 0.344136 * cb - 0.714136 * cr), clamp(yy + 1.772 * cb))
      val edgeTile = (x / tw) == (w - 1) / tw || (y / th) == (h - 1) / th
      for (k <- 0 until 3) {
        val want = (ref.getRGB(x, y) >> ((2 - k) * 8)) & 0xff
        val d = math.abs(got(k) - want)
        if (edgeTile) maxEdge = math.max(maxEdge, d)
        else {
          maxIn = math.max(maxIn, d); if (d > 3) over3In += 1; nIn += 1
        }
      }
    }
    assert(nIn > 0 && over3In <= nIn / 100,
      s"tiled jpeg-in-tiff interior: $over3In/$nIn samples differ by >3 (max $maxIn)")
    assert(maxIn <= 8, s"tiled jpeg-in-tiff interior: max difference $maxIn")
    assert(maxEdge <= 32,
      s"tiled jpeg-in-tiff edge tiles: max difference $maxEdge — beyond pad ringing")
  }

  test("PNG/GIF/BMP reverse: the JDK decodes the in-repo writers' output exactly") {
    // PNG truecolor (all five filters exercised by content variety)
    val w = 21; val h = 14
    val png = MultimodalOps.synthPng(w, h, 3)(
      (r, c, k) => (r * 23 + c * 31 + k * 41 + 7) % 256)
    val pimg = ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(pimg != null, "JDK cannot decode the in-repo PNG")
    for (r <- 0 until h; c <- 0 until w) {
      val want = ((0xff << 24) | (((r * 23 + c * 31 + 7) % 256) << 16) |
        (((r * 23 + c * 31 + 48) % 256) << 8) | ((r * 23 + c * 31 + 89) % 256))
      assert(pimg.getRGB(c, r) == want, s"png reverse ($r,$c)")
    }
    // PNG palette + 16-bit gray
    val pal = Seq((10, 200, 30), (250, 40, 90), (5, 5, 5))
    val palPng = MultimodalOps.synthPngPalette(9, 6, pal)((r, c) => (r + c) % 3)
    val palImg = ImageIO.read(new java.io.ByteArrayInputStream(palPng))
    assert(palImg != null)
    for (r <- 0 until 6; c <- 0 until 9) {
      val (pr, pg, pb) = pal((r + c) % 3)
      assert(palImg.getRGB(c, r) == ((0xff << 24) | (pr << 16) | (pg << 8) | pb),
        s"png palette reverse ($r,$c)")
    }
    // GIF (the LZW dialect + table layout must satisfy a real reader)
    val gpal = (0 until 6).map(i => ((i * 41) % 256, (i * 73) % 256, (i * 97) % 256))
    val gif = Gif.synthGif(14, 10, gpal,
      Seq(Gif.FrameSpec(0, 0, 14, 10)((r, c) => (r * 7 + c * 3) % 6)))
    val gimg = ImageIO.read(new java.io.ByteArrayInputStream(gif))
    assert(gimg != null, "JDK cannot decode the in-repo GIF")
    for (r <- 0 until 10; c <- 0 until 14) {
      val k = (r * 7 + c * 3) % 6
      val want = (0xff << 24) | (((k * 41) % 256) << 16) |
        (((k * 73) % 256) << 8) | ((k * 97) % 256)
      assert(gimg.getRGB(c, r) == want, s"gif reverse ($r,$c)")
    }
    // BMP 24-bit
    val bmp = MultimodalOps.synthBmp(9, 6, 3)(
      (r, c, k) => (r * 37 + c * 11 + k * 71 + 3) % 256)
    val bimg = ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(bimg != null, "JDK cannot decode the in-repo BMP")
    for (r <- 0 until 6; c <- 0 until 9) {
      val want = (0xff << 24) | (((r * 37 + c * 11 + 3) % 256) << 16) |
        (((r * 37 + c * 11 + 74) % 256) << 8) | ((r * 37 + c * 11 + 145) % 256)
      assert(bimg.getRGB(c, r) == want, s"bmp reverse ($r,$c)")
    }
  }

  test("JPEG reverse: the JDK decodes the in-repo baseline encoder within tolerance") {
    // DC-only blocks have a closed-form constant per block — the JDK's
    // IDCT must land within ±1 of it
    val q = Array.fill(64)(16)
    val bytes = Jpeg.synthJpeg(32, 16, 1, Seq(q)) { (_, by, bx) =>
      val nat = new Array[Int](64); nat(0) = ((by * 3 + bx) * 7) % 40 - 20; nat
    }
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK cannot decode the in-repo JPEG")
    val c0sq = Jpeg.C0 * Jpeg.C0
    var maxd = 0
    for (r <- 0 until 16; c <- 0 until 32) {
      val dc = ((r / 8 * 3 + c / 8) * 7) % 40 - 20
      val want = math.max(0, math.min(255,
        math.floor(c0sq * (dc * 16).toDouble * 0.25 + 128.0 + 0.5).toInt))
      val got = img.getRaster.getSample(c, r, 0)
      maxd = math.max(maxd, math.abs(got - want))
    }
    assert(maxd <= 1, s"jpeg reverse: max diff $maxd from the closed form")
  }

  test("ZIP interop: java.util.zip reads the in-repo writer and vice versa") {
    import java.util.zip._
    val members = Seq(
      "a/b.txt" -> "zip interop".getBytes("UTF-8"),
      "c.bin" -> Array.tabulate(3000)(i => (i * 7 % 251).toByte))
    // reverse: ZipInputStream over my synthZip (both methods)
    for (deflate <- Seq(true, false)) {
      val zin = new ZipInputStream(new java.io.ByteArrayInputStream(
        operators.Zip.synthZip(members, _ => deflate)))
      for ((name, data) <- members) {
        val e = zin.getNextEntry
        assert(e != null && e.getName == name, s"jdk zip entry $name (deflate=$deflate)")
        assert(zin.readAllBytes().sameElements(data), s"jdk zip payload $name")
      }
      assert(zin.getNextEntry == null)
    }
    // and zip64: the JDK reads the forced-marker layout too
    val zin64 = new ZipInputStream(new java.io.ByteArrayInputStream(
      operators.Zip.synthZip(members, _ => true, forceZip64 = true)))
    for ((name, data) <- members) {
      val e = zin64.getNextEntry
      assert(e != null && e.getName == name, s"jdk zip64 entry $name")
      assert(zin64.readAllBytes().sameElements(data), s"jdk zip64 payload $name")
    }
    // forward: my reader over ZipOutputStream output
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new ZipOutputStream(bos)
    for ((name, data) <- members) {
      zout.putNextEntry(new ZipEntry(name)); zout.write(data); zout.closeEntry()
    }
    zout.close()
    val got = operators.Zip.zipEntries(bos.toByteArray)
    assert(got.map(_._1) == members.map(_._1))
    got.zip(members).foreach { case ((_, g), (_, w)) => assert(g.sameElements(w)) }
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
    // reverse: javax.sound reads the in-repo writer's output exactly
    val mine = MultimodalOps.synthWavPcm(8000, 2, 16, n)(
      (f, c) => ((f * 523 + c * 117) % 65536) - 32768)
    val ais2 = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(mine))
    assert(ais2.getFormat.getSampleRate == 8000f &&
      ais2.getFormat.getChannels == 2 && ais2.getFormat.getSampleSizeInBits == 16)
    val back = ais2.readAllBytes()
    assert(back.length == n * 4)
    for (f <- 0 until n; c <- 0 until 2) {
      val v = ((back((f * 2 + c) * 2) & 0xff) |
        (back((f * 2 + c) * 2 + 1) << 8)).toShort.toInt
      assert(v == ((f * 523 + c * 117) % 65536) - 32768, s"wav reverse ($f,$c)")
    }
  }
}
