package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructField

/** WebP codec front door — LOSSLESS (VP8L, this file) and LOSSY (VP8
  * intra keyframes, [[Vp8]], r11) for the crawl-side image modality next
  * to PNG/JPEG/GIF/BMP (WebP is the second most common image format in
  * web crawls after JPEG). Built from the public "WebP Lossless
  * Bitstream Specification" and RFC 6386 (plus the container spec for
  * the RIFF framing); no third-party code.
  *
  * Decode surface (the full lossless feature set):
  *   - RIFF walk: `VP8L` payloads decode losslessly; `VP8 ` (lossy)
  *     stills and animation frames decode through the [[Vp8]] keyframe
  *     decoder (r11 — conformance-tested bit-exact against the reference
  *     decoder's YUV output); ALPH alpha planes decode too (r11: raw and
  *     VP8L-compressed methods, all four prediction filters) and merge
  *     into the ARGB output — the transparent-crawl-WebP layout is fully
  *     first-class.
  *   - LSB-first bitstream, 14-bit dimensions, version 0.
  *   - Prefix codes: simple (1-2 symbol) AND full canonical
  *     code-length-coded alphabets (19-symbol length code, repeats
  *     16/17/18, optional max-symbol cap), per-group 5 codes
  *     (green+length+cache, red, blue, alpha, distance).
  *   - Meta prefix (huffman image), color cache (1..11 bits), LZ77
  *     back-references with the 120-entry 2-D distance neighborhood map.
  *   - All four transforms, inverse-applied in reverse read order:
  *     PREDICTOR (14 modes, libwebp's contiguous-buffer edge semantics),
  *     COLOR (cross-color deltas, signed >> 5), SUBTRACT_GREEN,
  *     COLOR_INDEXING (delta-coded palette incl. sub-byte pixel
  *     bundling for palettes ≤ 16).
  *
  * Encode half (`synthWebpLossless`, for fixtures/oracles): version-0
  * stream with flat two-length canonical alphabets (232×8 + 48×9 bits
  * for the 280-symbol green code — complete by Kraft), optional
  * SUBTRACT_GREEN and COLOR_INDEXING (packed) transforms. Fail-closed
  * doctrine throughout: corrupt streams reject with
  * IllegalArgumentException, never an array escape (CodecFuzzSpec).
  */
object Webp {

  /** VP8L decode allocation ceiling in pixels: 2^26 by default (matches
    * the VP8 path), raiseable per JVM via -Dgraft.webp.maxPixels but
    * hard-clamped to the spec's 14-bit-dims geometry bound of 2^28.
    * Read once per executor JVM — a per-task lookup would be free too,
    * but the guard is doctrine, not tuning.
    */
  private val maxWebpPixels: Long = {
    val spec = 1L << 28
    math.min(spec, math.max(1L,
      sys.props.get("graft.webp.maxPixels").flatMap(s =>
        scala.util.Try(s.toLong).toOption).getOrElse(1L << 26)))
  }

  // ---- LSB-first bit reader over untrusted bytes ----

  private final class BitReader(bytes: Array[Byte], start: Int) {
    private var bytePos = start
    private var bitPos = 0
    def read(n: Int): Int = {
      require(n >= 0 && n <= 24, s"bad bit read $n")
      var v = 0; var got = 0
      while (got < n) {
        require(bytePos < bytes.length, "VP8L stream truncated")
        val avail = 8 - bitPos
        val take = math.min(avail, n - got)
        val bits = ((bytes(bytePos) & 0xff) >> bitPos) & ((1 << take) - 1)
        v |= bits << got
        got += take; bitPos += take
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      }
      v
    }
  }

  // ---- canonical prefix codes ----

  /** Decode table: canonical code from symbol lengths (0 = absent).
    * `zeroBitSym >= 0` marks the degenerate single-symbol code that
    * consumes no bits.
    */
  private final class PrefixCode(lengths: Array[Int]) {
    private val present = lengths.zipWithIndex.filter(_._1 > 0)
    require(present.nonEmpty, "prefix code with no symbols")
    val zeroBitSym: Int = if (present.length == 1) present.head._2 else -1
    // canonical assignment: by (length, symbol); codes stored MSB-first,
    // the bitstream delivers them bit by bit
    private val bySym = new java.util.HashMap[Long, Integer]()
    val maxLen: Int = if (present.length == 1) 0 else {
      var code = 0; var prevLen = 0
      // Kraft completeness check (single-symbol codes exempt)
      val kraft = present.map { case (l, _) => 1.0 / (1L << l) }.sum
      require(math.abs(kraft - 1.0) < 1e-12,
        f"prefix code is not complete (Kraft sum $kraft%.6f)")
      var ml = 0
      present.sortBy { case (l, s) => (l, s) }.foreach { case (l, s) =>
        code <<= (l - prevLen); prevLen = l
        bySym.put((l.toLong << 32) | code.toLong, s)
        code += 1
        ml = math.max(ml, l)
      }
      ml
    }
    def decode(br: BitReader): Int = {
      if (zeroBitSym >= 0) return zeroBitSym
      var code = 0; var len = 0
      while (len <= maxLen) {
        code = (code << 1) | br.read(1)
        len += 1
        val hit = bySym.get((len.toLong << 32) | code.toLong)
        if (hit != null) return hit
      }
      throw new IllegalArgumentException("invalid prefix code in VP8L stream")
    }
  }

  // Code-length-code slot order (spec 6.2.2): NOT deflate's — symbol 16
  // (repeat-previous) sits BETWEEN 5 and 6. Round 10 had 16 at the END
  // (the deflate habit): self-consistent round trips hid it, but every
  // real encoder stream whose table transmits ≥9 slots misparsed (the
  // r11 conformance fixtures caught it — see NOTES_BUILDER r11).
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** One prefix code off the stream (spec 6.2.x): simple or length-coded. */
  private def readCode(br: BitReader, alphabetSize: Int): PrefixCode = {
    if (br.read(1) == 1) { // simple
      val numSyms = br.read(1) + 1
      val first = if (br.read(1) == 1) br.read(8) else br.read(1)
      val lengths = new Array[Int](alphabetSize)
      require(first < alphabetSize, s"simple-code symbol $first outside alphabet")
      if (numSyms == 2) {
        val second = br.read(8)
        require(second < alphabetSize, s"simple-code symbol $second outside alphabet")
        require(second != first, "simple code repeats a symbol")
        lengths(first) = 1; lengths(second) = 1
      } else lengths(first) = 1 // single symbol: zero-bit code
      new PrefixCode(lengths)
    } else {
      val numCl = 4 + br.read(4)
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(ClOrder(i)) = br.read(3); i += 1 }
      val clCode = new PrefixCode(clLens)
      var maxSymbol =
        if (br.read(1) == 1) {
          val lengthNBits = 2 + 2 * br.read(3)
          2 + br.read(lengthNBits)
        } else alphabetSize
      val lengths = new Array[Int](alphabetSize)
      var sym = 0; var prevLen = 8
      while (sym < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clCode.decode(br)
        cl match {
          case l if l < 16 =>
            lengths(sym) = l; sym += 1
            if (l != 0) prevLen = l
          case 16 =>
            val n = 3 + br.read(2)
            require(sym + n <= alphabetSize, "code-length repeat overruns alphabet")
            var k = 0; while (k < n) { lengths(sym) = prevLen; sym += 1; k += 1 }
          case 17 =>
            val n = 3 + br.read(3)
            require(sym + n <= alphabetSize, "zero-run overruns alphabet")
            sym += n
          case 18 =>
            val n = 11 + br.read(7)
            require(sym + n <= alphabetSize, "zero-run overruns alphabet")
            sym += n
          case other =>
            throw new IllegalArgumentException(s"code-length symbol $other")
        }
      }
      new PrefixCode(lengths)
    }
  }

  // ---- LZ77 prefix-coded values + distance neighborhood map ----

  private def readLz77Value(code: Int, br: BitReader): Int = {
    require(code >= 0 && code < 40, s"LZ77 prefix code $code out of range")
    if (code < 4) code + 1
    else {
      val nBits = (code - 2) >> 1
      val offset = (2 + (code & 1)) << nBits
      offset + br.read(nBits) + 1
    }
  }

  /** The 120-entry (dx, dy) close-neighborhood distance codes (spec
    * 5.2.3; (dx, dy) = (8 - (code & 0xf), code >> 4) over the spec's
    * byte table). Round 10's hand-typed copy was THREE ENTRIES SHORT
    * with a fabricated dy=8 tail — decode-only territory the in-repo
    * encoder (dist+120 codes only) never exercised; the r11 real-encoder
    * conformance fixtures crashed on code 118 and forced the re-derive.
    */
  private val DistMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  private def planeCodeToDistance(xsize: Int, planeCode: Int): Int =
    if (planeCode > 120) planeCode - 120
    else {
      // dist = yoffset*xsize + xoffset (spec 5.2.3; libwebp's
      // PlaneCodeToDistance with xoffset = 8 - (code & 0xf)) — positive
      // dx points LEFT of the current pixel, so it ADDS to the distance.
      // Sub-1 results (e.g. code 2 = (1,0) on any width) clamp to 1.
      val (dx, dy) = DistMap(planeCode - 1)
      math.max(1, dy * xsize + dx)
    }

  // ---- entropy-coded ARGB image ----

  private final case class Group(
      green: PrefixCode, red: PrefixCode, blue: PrefixCode,
      alpha: PrefixCode, dist: PrefixCode)

  /** Decode one entropy-coded image stream (spec "decoding of image
    * data"). `level0` enables the huffman image; transforms are handled
    * by the caller. Returns packed ARGB ints.
    */
  private def readEntropyImage(
      br: BitReader, xsize: Int, ysize: Int, level0: Boolean): Array[Int] = {
    // color cache (all levels, per the reference decoder)
    val cacheBits = if (br.read(1) == 1) {
      val b = br.read(4)
      require(b >= 1 && b <= 11, s"color cache bits $b out of 1..11")
      b
    } else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    // huffman image (level 0 only)
    var metaBits = 0
    var meta: Array[Int] = null
    var metaW = 0
    var nGroups = 1
    if (level0 && br.read(1) == 1) {
      metaBits = br.read(3) + 2
      metaW = (xsize + (1 << metaBits) - 1) >> metaBits
      val metaH = (ysize + (1 << metaBits) - 1) >> metaBits
      meta = readEntropyImage(br, metaW, metaH, level0 = false)
      var mx = 0
      meta.foreach { px =>
        val idx = ((px >> 8) & 0xffff) // (red << 8) | green
        mx = math.max(mx, idx)
      }
      nGroups = mx + 1
      require(nGroups <= 1 + meta.length, s"implausible meta group count $nGroups")
    }
    val groups = Array.fill(nGroups) {
      Group(
        readCode(br, 256 + 24 + cacheSize),
        readCode(br, 256), readCode(br, 256), readCode(br, 256),
        readCode(br, 40))
    }
    val n = xsize * ysize
    val out = new Array[Int](n)
    def cacheInsert(argb: Int): Unit =
      if (cache != null)
        cache(((0x1e35a7bd * argb) >>> (32 - cacheBits)).toInt) = argb
    var pos = 0
    while (pos < n) {
      val x = pos % xsize; val y = pos / xsize
      val g =
        if (meta == null) groups(0)
        else {
          val m = meta((y >> metaBits) * metaW + (x >> metaBits))
          val idx = (m >> 8) & 0xffff
          require(idx < nGroups, s"meta group $idx out of range")
          groups(idx)
        }
      val s = g.green.decode(br)
      if (s < 256) {
        val r = g.red.decode(br)
        val b = g.blue.decode(br)
        val a = g.alpha.decode(br)
        val px = (a << 24) | (r << 16) | (s << 8) | b
        out(pos) = px; cacheInsert(px); pos += 1
      } else if (s < 256 + 24) {
        val len = readLz77Value(s - 256, br)
        val distCode = readLz77Value(g.dist.decode(br), br)
        val dist = planeCodeToDistance(xsize, distCode)
        require(dist >= 1 && dist <= pos, "LZ77 reference before image start")
        require(pos + len <= n, "LZ77 copy overruns the image")
        var k = 0
        while (k < len) {
          val px = out(pos - dist)
          out(pos) = px; cacheInsert(px); pos += 1; k += 1
        }
      } else {
        require(cache != null, "cache symbol without a color cache")
        val idx = s - 256 - 24
        require(idx < cacheSize, s"cache index $idx out of range")
        val px = cache(idx)
        out(pos) = px; pos += 1
      }
    }
    out
  }

  // ---- inverse transforms ----

  private def avg2(a: Int, b: Int): Int = {
    // per-channel average of two ARGB pixels
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def addPixels(a: Int, b: Int): Int = {
    // per-channel mod-256 sum
    val ag = (a & 0xff00ff00L) + (b & 0xff00ff00L)
    val rb = (a & 0x00ff00ff) + (b & 0x00ff00ff)
    ((ag & 0xff00ff00L) | (rb & 0x00ff00ff)).toInt
  }

  private def predict(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int =
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => // Select: smaller Manhattan distance to l+t-tl
        def comp(p: Int, i: Int) = (p >>> (8 * i)) & 0xff
        var pl = 0; var pt = 0
        var i = 0
        while (i < 4) {
          val pred = comp(l, i) + comp(t, i) - comp(tl, i)
          pl += math.abs(pred - comp(l, i))
          pt += math.abs(pred - comp(t, i))
          i += 1
        }
        if (pl <= pt) l else t
      case 12 => // ClampAddSubtractFull
        def comp(p: Int, i: Int) = (p >>> (8 * i)) & 0xff
        var out = 0
        var i = 0
        while (i < 4) {
          out |= clamp255(comp(l, i) + comp(t, i) - comp(tl, i)) << (8 * i)
          i += 1
        }
        out
      case 13 => // ClampAddSubtractHalf
        def comp(p: Int, i: Int) = (p >>> (8 * i)) & 0xff
        val a = avg2(l, t)
        var out = 0
        var i = 0
        while (i < 4) {
          val av = comp(a, i)
          out |= clamp255(av + (av - comp(tl, i)) / 2) << (8 * i)
          i += 1
        }
        out
      case other =>
        throw new IllegalArgumentException(s"predictor mode $other")
    }

  private def inversePredictor(
      px: Array[Int], w: Int, h: Int, bits: Int, modes: Array[Int], modesW: Int): Unit = {
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pos = y * w + x
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(pos - 1) // top row: L
          else if (x == 0) px(pos - w) // left edge: T
          else {
            val mode = (modes((y >> bits) * modesW + (x >> bits)) >> 8) & 0xff
            val l = px(pos - 1)
            val t = px(pos - w)
            val tl = px(pos - w - 1)
            // contiguous-buffer top-right (the reference decoder's edge
            // semantics): at x = w-1 this reads the CURRENT row's x = 0
            val tr = px(pos - w + 1)
            predict(mode, l, t, tl, tr)
          }
        px(pos) = addPixels(px(pos), pred)
        x += 1
      }
      y += 1
    }
  }

  private def inverseColorTransform(
      px: Array[Int], w: Int, h: Int, bits: Int, els: Array[Int], elsW: Int): Unit = {
    def ctd(t: Int, c: Int): Int = ((t.toByte.toInt * c.toByte.toInt) >> 5)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val e = els((y >> bits) * elsW + (x >> bits))
        val g2r = e & 0xff // blue channel of the element
        val g2b = (e >> 8) & 0xff
        val r2b = (e >> 16) & 0xff
        val pos = y * w + x
        val p = px(pos)
        val green = (p >> 8) & 0xff
        var red = (p >> 16) & 0xff
        var blue = p & 0xff
        red = (red + ctd(g2r, green)) & 0xff
        blue = (blue + ctd(g2b, green) + ctd(r2b, red)) & 0xff
        px(pos) = (p & 0xff00ff00) | (red << 16) | blue
        x += 1
      }
      y += 1
    }
  }

  private def inverseSubtractGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >> 8) & 0xff
      val r = (((p >> 16) & 0xff) + g) & 0xff
      val b = ((p & 0xff) + g) & 0xff
      px(i) = (p & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  // ---- container + top-level decode ----

  /** Locate the image payload inside the RIFF/WEBP container: returns
    * (start, end, lossy?, alph) for the first VP8L (lossless) or VP8
    * (lossy) chunk, with the preceding ALPH chunk's (start, size) when
    * the lossy layout carries an alpha plane (r11 — decodable now).
    */
  private def imagePayload(bytes: Array[Byte]): (Int, Int, Boolean, Option[(Int, Int)]) = {
    def ascii(off: Int, s: String) = bytes.length >= off + s.length &&
      s.indices.forall(i => bytes(off + i) == s(i).toByte)
    require(ascii(0, "RIFF") && ascii(8, "WEBP"), "not a RIFF/WEBP container")
    var alph: Option[(Int, Int)] = None
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val tag = new String(bytes, pos, 4, "US-ASCII")
      val size = (bytes(pos + 4) & 0xffL) | ((bytes(pos + 5) & 0xffL) << 8) |
        ((bytes(pos + 6) & 0xffL) << 16) | ((bytes(pos + 7) & 0xffL) << 24)
      require(size >= 0 && pos + 8 + size <= bytes.length,
        s"WEBP chunk '$tag' overruns the file")
      tag match {
        case "VP8L" => return (pos + 8, (pos + 8 + size).toInt, false, None)
        case "VP8 " => return (pos + 8, (pos + 8 + size).toInt, true, alph)
        case "ALPH" => alph = Some((pos + 8, size.toInt))
        case _ => // VP8X/EXIF/ICCP/ANIM...: keep walking for the image chunk
      }
      pos += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
    }
    throw new IllegalArgumentException(
      "WEBP container carries no VP8L or VP8 image chunk")
  }

  /** Full still-image decode, lossless (VP8L) or lossy (VP8 keyframe via
    * [[Vp8]], with the ALPH alpha plane merged when present — r11):
    * (width, height, ARGB pixels row-major). Lossy pixels are the
    * reference decoder's YUV420 reconstruction through the exact integer
    * BT.601 transform (nearest chroma); alpha 255 when no plane ships.
    */
  def decodeWebpPixels(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val (from, end, lossy, alph) = imagePayload(bytes)
    if (lossy) {
      val (w, h, px) = Vp8.decodeToArgb(bytes, from, end - from)
      alph match {
        case Some((a0, asz)) =>
          (w, h, withAlpha(px, decodeAlphaPlane(bytes, a0, asz, w, h)))
        case None => (w, h, px)
      }
    } else decodeVp8l(bytes, from)
  }

  /** One VP8L payload starting at `from` (signature byte first). */
  private def decodeVp8l(bytes: Array[Byte], from: Int): (Int, Int, Array[Int]) = {
    require(from < bytes.length && (bytes(from) & 0xff) == 0x2f,
      "VP8L signature byte missing")
    val br = new BitReader(bytes, from + 1)
    val width = br.read(14) + 1
    val height = br.read(14) + 1
    br.read(1) // alpha hint
    val version = br.read(3)
    require(version == 0, s"VP8L version $version unsupported")
    // Allocation guard, DEFAULT 2^26 pixels (the VP8 path's bound — a
    // few-hundred-byte hostile header at the spec's full 14-bit geometry
    // of 2^28 pixels would force ~1 GiB of int allocations PER TASK, and
    // 32 concurrent tasks would OOM the executor; ADVICE r11). Raiseable
    // per deployment up to the spec ceiling via -Dgraft.webp.maxPixels
    // when a lake genuinely holds >8k×8k lossless WebP.
    require(width.toLong * height <= maxWebpPixels,
      s"WebP geometry ${width}x$height exceeds the $maxWebpPixels-pixel " +
        "allocation guard (-Dgraft.webp.maxPixels raises it, max 2^28)")
    (width, height, decodeVp8lBody(br, width, height))
  }

  /** The VP8L image stream AFTER the 5-byte header — also the exact
    * layout an ALPH chunk's lossless payload uses (headerless, dims
    * supplied by the caller — the r11 alpha-plane path).
    */
  private def decodeVp8lBody(br: BitReader, width: Int, height: Int): Array[Int] = {
    // transforms, in read order
    var packedW = width
    var palette: Array[Int] = null
    var paletteBits = 0
    var predictor: (Int, Array[Int], Int) = null
    var colorTf: (Int, Array[Int], Int) = null
    var subtractGreen = false
    val seen = scala.collection.mutable.Set.empty[Int]
    val order = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (br.read(1) == 1) {
      val t = br.read(2)
      require(seen.add(t), s"transform $t appears twice")
      order += t
      t match {
        case 0 => // predictor
          val bits = br.read(3) + 2
          val tw = (packedW + (1 << bits) - 1) >> bits
          val th = (height + (1 << bits) - 1) >> bits
          predictor = (bits, readEntropyImage(br, tw, th, level0 = false), tw)
        case 1 => // color transform
          val bits = br.read(3) + 2
          val tw = (packedW + (1 << bits) - 1) >> bits
          val th = (height + (1 << bits) - 1) >> bits
          colorTf = (bits, readEntropyImage(br, tw, th, level0 = false), tw)
        case 2 => subtractGreen = true
        case 3 => // color indexing
          val size = br.read(8) + 1
          val raw = readEntropyImage(br, size, 1, level0 = false)
          // palette entries are DELTA-coded per channel
          palette = new Array[Int](size)
          var prev = 0
          var i = 0
          while (i < size) {
            prev = addPixels(prev, raw(i)); palette(i) = prev; i += 1
          }
          paletteBits =
            if (size <= 2) 3 else if (size <= 4) 2 else if (size <= 16) 1 else 0
          packedW = (width + (1 << paletteBits) - 1) >> paletteBits
      }
    }
    val packed = readEntropyImage(br, packedW, height, level0 = true)
    // inverse transforms in REVERSE read order
    var px = packed
    var curW = packedW
    order.reverseIterator.foreach {
      case 3 =>
        val out = new Array[Int](width * height)
        val perByte = 1 << paletteBits
        val idxBits = 8 >> paletteBits
        val mask = (1 << idxBits) - 1
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val cell = px(y * curW + (x >> paletteBits))
            val sub = x & (perByte - 1)
            val idx = ((cell >> 8) & 0xff) >> (sub * idxBits) & mask
            require(idx < palette.length,
              s"palette index $idx outside the ${palette.length}-entry palette")
            out(y * width + x) = palette(idx)
            x += 1
          }
          y += 1
        }
        px = out; curW = width
      case 2 => inverseSubtractGreen(px)
      case 1 =>
        val (bits, els, elsW) = colorTf
        inverseColorTransform(px, curW, height, bits, els, elsW)
      case 0 =>
        val (bits, modes, modesW) = predictor
        inversePredictor(px, curW, height, bits, modes, modesW)
    }
    require(curW == width, "color-indexing transform missing for packed stream")
    px
  }

  /** Decode one ALPH chunk's alpha plane (r11 — the lossy-with-alpha
    * layout every transparent crawl WebP ships): header byte = 2-bit
    * compression method (0 raw, 1 headerless VP8L with alpha in GREEN),
    * 2-bit prediction filter (none/horizontal/vertical/gradient,
    * unfiltered with the reference decoder's exact left/top/gradient
    * semantics), 2-bit pre-processing (quantized levels pass through —
    * the reference only smooths them under its opt-in dithering flag).
    * Returns w*h alpha values 0..255, row-major.
    */
  private[operators] def decodeAlphaPlane(
      bytes: Array[Byte], from: Int, size: Int, w: Int, h: Int): Array[Int] = {
    require(size >= 1, "ALPH chunk empty")
    val hdr = bytes(from) & 0xff
    val method = hdr & 3
    val filterM = (hdr >> 2) & 3
    val pre = (hdr >> 4) & 3
    require(method <= 1, s"ALPH compression method $method unsupported (raw/lossless only)")
    require(pre <= 1, s"ALPH pre-processing $pre out of spec")
    val plane: Array[Int] =
      if (method == 0) {
        require(1L + w.toLong * h <= size,
          s"raw ALPH plane ${w}x$h overruns the ${size}-byte chunk")
        Array.tabulate(w * h)(i => bytes(from + 1 + i) & 0xff)
      } else {
        val br = new BitReader(bytes, from + 1)
        val px = decodeVp8lBody(br, w, h)
        px.map(p => (p >> 8) & 0xff) // alpha rides the GREEN channel
      }
    // prediction filters (reference semantics: row 0 of every filter is
    // the horizontal chain seeded 0; later rows seed from the row above)
    filterM match {
      case 0 => // none
      case 1 => // horizontal
        var y = 0
        while (y < h) {
          var pred = if (y == 0) 0 else plane((y - 1) * w)
          var x = 0
          while (x < w) {
            val v = (plane(y * w + x) + pred) & 0xff
            plane(y * w + x) = v; pred = v
            x += 1
          }
          y += 1
        }
      case 2 => // vertical
        var pred = 0
        var x = 0
        while (x < w) { // row 0 = horizontal chain
          val v = (plane(x) + pred) & 0xff
          plane(x) = v; pred = v
          x += 1
        }
        var y = 1
        while (y < h) {
          x = 0
          while (x < w) {
            plane(y * w + x) = (plane(y * w + x) + plane((y - 1) * w + x)) & 0xff
            x += 1
          }
          y += 1
        }
      case _ => // gradient
        var pred = 0
        var x = 0
        while (x < w) {
          val v = (plane(x) + pred) & 0xff
          plane(x) = v; pred = v
          x += 1
        }
        var y = 1
        while (y < h) {
          var left = plane((y - 1) * w)
          var topLeft = left
          x = 0
          while (x < w) {
            val top = plane((y - 1) * w + x)
            val g = clamp255(left + top - topLeft)
            left = (plane(y * w + x) + g) & 0xff
            plane(y * w + x) = left
            topLeft = top
            x += 1
          }
          y += 1
        }
    }
    plane
  }

  /** Merge a decoded alpha plane into packed ARGB pixels. */
  private def withAlpha(px: Array[Int], alpha: Array[Int]): Array[Int] = {
    require(px.length == alpha.length,
      s"alpha plane ${alpha.length} px vs image ${px.length} px")
    var i = 0
    while (i < px.length) {
      px(i) = (px(i) & 0x00ffffff) | (alpha(i) << 24)
      i += 1
    }
    px
  }

  /** One decoded animation frame: canvas offset, duration, dims, ARGB,
    * plus the ANMF composition flags (r12): `blend` false = the spec's
    * "do not blend" bit (overwrite the rect), `disposeBg` = clear the
    * rect to transparent after display. Stills default to the bits a
    * single full-canvas image implies.
    */
  final case class AnimFrame(left: Int, top: Int, w: Int, h: Int,
      durationMs: Int, argb: Array[Int],
      blend: Boolean = true, disposeBg: Boolean = false)

  /** Animated WebP decode (VP8X + ANIM + ANMF, lossless frames): the
    * container walk for the ANIMATION-flagged extended layout, each ANMF
    * frame's payload through the matching decoder — VP8L lossless, VP8
    * lossy keyframes, and ALPH alpha planes all decode (r11). Frames
    * decode to their own rectangles WITH their blend/dispose flags
    * (r12) — [[composeFrames]] turns them into full-canvas snapshots;
    * a plain single-image file decodes as one frame at (0,0) duration
    * 0 — callers get ONE surface for both layouts.
    */
  def decodeWebpFrames(bytes: Array[Byte]): (Int, Int, Seq[AnimFrame]) = {
    def ascii(off: Int, s: String) = bytes.length >= off + s.length &&
      s.indices.forall(i => bytes(off + i) == s(i).toByte)
    require(ascii(0, "RIFF") && ascii(8, "WEBP"), "not a RIFF/WEBP container")
    def u24(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
      ((bytes(off + 2) & 0xff) << 16)
    var canvasW = 0; var canvasH = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[AnimFrame]
    var sawAnim = false
    var stillAlph: Option[(Int, Int)] = None
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val tag = new String(bytes, pos, 4, "US-ASCII")
      val size = (bytes(pos + 4) & 0xffL) | ((bytes(pos + 5) & 0xffL) << 8) |
        ((bytes(pos + 6) & 0xffL) << 16) | ((bytes(pos + 7) & 0xffL) << 24)
      require(size >= 0 && pos + 8 + size <= bytes.length,
        s"WEBP chunk '$tag' overruns the file")
      val body = pos + 8
      tag match {
        case "VP8X" =>
          require(size >= 10, "VP8X chunk too short")
          canvasW = u24(body + 4) + 1
          canvasH = u24(body + 7) + 1
        case "ANIM" => sawAnim = true
        case "ANMF" =>
          require(size >= 16, "ANMF chunk too short")
          val left = u24(body) * 2
          val top = u24(body + 3) * 2
          val w = u24(body + 6) + 1
          val h = u24(body + 9) + 1
          val dur = u24(body + 12)
          // the frame's image chunk follows the 16-byte ANMF header
          val sub = body + 16
          require(sub + 8 <= body + size, "ANMF carries no image chunk")
          val subTag = new String(bytes, sub, 4, "US-ASCII")
          val subSize = (bytes(sub + 4) & 0xffL) | ((bytes(sub + 5) & 0xffL) << 8) |
            ((bytes(sub + 6) & 0xffL) << 16) | ((bytes(sub + 7) & 0xffL) << 24)
          require(subSize >= 0 && sub + 8 + subSize <= body + size,
            "ANMF image chunk overruns the frame")
          // frame layout: optional ALPH sub-chunk, then the image chunk
          var imgAt = sub
          var imgTag = subTag
          var imgSize = subSize
          var frameAlph: Option[(Int, Int)] = None
          if (subTag == "ALPH") {
            frameAlph = Some((sub + 8, subSize.toInt))
            imgAt = sub + 8 + subSize.toInt + (subSize.toInt & 1)
            require(imgAt + 8 <= body + size, "ANMF carries no image chunk after ALPH")
            imgTag = new String(bytes, imgAt, 4, "US-ASCII")
            imgSize = (bytes(imgAt + 4) & 0xffL) | ((bytes(imgAt + 5) & 0xffL) << 8) |
              ((bytes(imgAt + 6) & 0xffL) << 16) | ((bytes(imgAt + 7) & 0xffL) << 24)
            require(imgSize >= 0 && imgAt + 8 + imgSize <= body + size,
              "ANMF image chunk overruns the frame")
          }
          val (fw, fh, px) = imgTag match {
            case "VP8L" => decodeVp8l(bytes, imgAt + 8)
            case "VP8 " =>
              val (pw, ph, p) = Vp8.decodeToArgb(bytes, imgAt + 8, imgSize.toInt)
              frameAlph match {
                case Some((a0, asz)) =>
                  (pw, ph, withAlpha(p, decodeAlphaPlane(bytes, a0, asz, pw, ph)))
                case None => (pw, ph, p)
              }
            case other => throw new IllegalArgumentException(
              s"ANMF image chunk '$other' unsupported (VP8L/VP8 only)")
          }
          require(fw == w && fh == h,
            s"ANMF declares ${w}x$h but the ${imgTag.trim} payload is ${fw}x$fh")
          // flags byte (last of the 16-byte ANMF header): bit 1 = do NOT
          // blend, bit 0 = dispose to background (r12 — composition)
          val flags = bytes(body + 15) & 0xff
          frames += AnimFrame(left, top, w, h, dur, px,
            blend = (flags & 2) == 0, disposeBg = (flags & 1) != 0)
        case "VP8L" =>
          val (w, h, px) = decodeVp8l(bytes, body)
          return (w, h, Seq(AnimFrame(0, 0, w, h, 0, px)))
        case "VP8 " =>
          val (w, h, px0) = Vp8.decodeToArgb(bytes, body, size.toInt)
          val px = stillAlph match {
            case Some((a0, asz)) => withAlpha(px0, decodeAlphaPlane(bytes, a0, asz, w, h))
            case None => px0
          }
          return (w, h, Seq(AnimFrame(0, 0, w, h, 0, px)))
        case "ALPH" => stillAlph = Some((body, size.toInt))
        case _ => // ICCP/EXIF/XMP: skip
      }
      pos += 8 + size.toInt + (size.toInt & 1)
    }
    require(sawAnim && frames.nonEmpty,
      "WEBP container carries neither a VP8L image nor an animation")
    ((if (canvasW > 0) canvasW else frames.map(f => f.left + f.w).max),
      (if (canvasH > 0) canvasH else frames.map(f => f.top + f.h).max),
      frames.toSeq)
  }

  /** Animated-WebP binary column → per-frame RGBA pixel rows with the
    * frame's canvas offset and duration (the gifToFrames shape — the
    * video-modality frame explosion for WebP).
    */
  def webpToFrames(media: DataFrame, bytesCol: String = "bytes"): DataFrame =
    MediaExplode.explode(media, bytesCol, Seq(
      StructField("frame_idx", org.apache.spark.sql.types.IntegerType, nullable = false),
      StructField("frame_left", org.apache.spark.sql.types.IntegerType, nullable = false),
      StructField("frame_top", org.apache.spark.sql.types.IntegerType, nullable = false),
      StructField("duration_ms", org.apache.spark.sql.types.IntegerType, nullable = false)) ++
        MultimodalOps.PixelFields) { payload =>
      val (_, _, frames) = decodeWebpFrames(payload)
      for {
        (f, fi) <- frames.iterator.zipWithIndex
        r <- 0 until f.h
        c <- 0 until f.w
        k <- 0 until 4
      } yield {
        val p = f.argb(r * f.w + c)
        val v = k match {
          case 0 => (p >> 16) & 0xff
          case 1 => (p >> 8) & 0xff
          case 2 => p & 0xff
          case _ => (p >>> 24) & 0xff
        }
        Seq[Any](fi, f.left, f.top, f.durationMs, r, c, k, v)
      }
    }

  /** Animated lossless WebP (VP8X + ANIM + per-frame ANMF/VP8L) — the
    * encode half: each frame from [[synthWebpLossless]]'s plain profile.
    * Offsets must be even (ANMF stores them halved, per spec).
    */
  def synthWebpAnim(
      canvasW: Int, canvasH: Int,
      frames: Seq[(Int, Int, Int, Int, Int, (Int, Int) => Int)]): Array[Byte] = {
    // (left, top, w, h, durationMs, argb)
    require(frames.nonEmpty, "an animation needs at least one frame")
    val riff = new RiffBuilder
    riff.chunk("VP8X", vp8xPayload(0x02, canvasW, canvasH)) // animation flag
    riff.chunk("ANIM", Array[Byte](0, 0, 0, 0, 0, 0)) // bg color + loop count 0
    frames.foreach { case (left, top, w, h, dur, argb) =>
      writeAnmf(riff.chunk, left, top, w, h, dur, synthWebpLossless(w, h, argb))
    }
    riff.build()
  }


  /** RIFF/WEBP container assembly: sub-chunks pad to even sizes; the
    * RIFF size covers "WEBP" + the padded body (ONE writer for the
    * animated/alpha/lossless wrap sites).
    */
  private final class RiffBuilder {
    private val body = new java.io.ByteArrayOutputStream()
    def chunk(t: String, payload: Array[Byte]): Unit = {
      body.write(t.getBytes("US-ASCII"))
      val s = payload.length
      body.write(s & 0xff); body.write((s >> 8) & 0xff)
      body.write((s >> 16) & 0xff); body.write((s >> 24) & 0xff)
      body.write(payload)
      if ((s & 1) == 1) body.write(0)
    }
    def chunkRaw(bytes: Array[Byte], off: Int, len: Int): Unit =
      body.write(bytes, off, len)
    def build(): Array[Byte] = {
      val payload = body.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII"))
      val v = 4 + payload.length
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
      out.write("WEBP".getBytes("US-ASCII"))
      out.write(payload)
      out.toByteArray
    }
  }

  /** VP8X payload: flags byte + 24-bit canvas minus-one dims. */
  private def vp8xPayload(flags: Int, canvasW: Int, canvasH: Int): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    b.write(flags); b.write(0); b.write(0); b.write(0)
    def w24(v: Int): Unit = {
      b.write(v & 0xff); b.write((v >> 8) & 0xff); b.write((v >> 16) & 0xff)
    }
    w24(canvasW - 1); w24(canvasH - 1)
    b.toByteArray
  }

  /** Dimensions straight from a single-image container's image-chunk
    * header (offset 12: VP8L's 14-bit fields or the VP8 keyframe's
    * 16-bit fields) — O(1), no pixel decode.
    */
  private def imageChunkDims(file: Array[Byte]): (Int, Int) = {
    val tag = new String(file, 12, 4, "US-ASCII")
    if (tag == "VP8L") {
      require(file.length > 25 && (file(20) & 0xff) == 0x2f, "bad VP8L header")
      val br = new BitReader(file, 21)
      (br.read(14) + 1, br.read(14) + 1)
    } else {
      require(tag == "VP8 " && file.length > 30, "bad VP8 header")
      ((((file(26) & 0xff) | ((file(27) & 0xff) << 8)) & 0x3fff),
        (((file(28) & 0xff) | ((file(29) & 0xff) << 8)) & 0x3fff))
    }
  }

  /** One ANMF chunk from a COMPLETE single-image WebP file's bytes (a
    * `synthWebpLossless` or `Vp8.encodeKeyframe` container): the image
    * chunk (VP8L or VP8) is lifted verbatim into the frame body — so
    * animations mix LOSSLESS and LOSSY frames, exactly like real
    * encoders emit (r11).
    */
  private def writeAnmf(chunk: (String, Array[Byte]) => Unit,
      left: Int, top: Int, w: Int, h: Int, dur: Int,
      full: Array[Byte],
      blend: Boolean = false, disposeBg: Boolean = false): Unit = {
    require(left % 2 == 0 && top % 2 == 0,
      s"ANMF offsets must be even, got ($left, $top)")
    // the image chunk starts at offset 12 of the standalone RIFF wrap
    val imgSize = (full(16) & 0xff) | ((full(17) & 0xff) << 8) |
      ((full(18) & 0xff) << 16) | ((full(19) & 0xff) << 24)
    val b = new java.io.ByteArrayOutputStream()
    def w24(v: Int): Unit = {
      b.write(v & 0xff); b.write((v >> 8) & 0xff); b.write((v >> 16) & 0xff)
    }
    w24(left / 2); w24(top / 2); w24(w - 1); w24(h - 1)
    // flags: bit 1 = do NOT blend, bit 0 = dispose to background
    w24(dur); b.write((if (blend) 0 else 2) | (if (disposeBg) 1 else 0))
    b.write(full, 12, 8 + imgSize) // the image chunk verbatim
    // RIFF sub-chunks pad to even size: an odd payload inside the ANMF
    // body needs the pad byte too (strict demuxers walk padded
    // sub-chunks; the chunk() helper applies the same rule)
    if ((imgSize & 1) == 1) b.write(0)
    chunk("ANMF", b.toByteArray)
  }

  /** Animated WebP from COMPLETE single-image containers (lossless or
    * lossy stills, mixed freely): each becomes one ANMF frame at
    * (left, top) with `durationMs`.
    */
  def synthWebpAnimFiles(
      canvasW: Int, canvasH: Int,
      frames: Seq[(Int, Int, Int, Array[Byte])]): Array[Byte] = {
    // (left, top, durationMs, file) — dims read from the file itself
    require(frames.nonEmpty, "an animation needs at least one frame")
    val riff = new RiffBuilder
    riff.chunk("VP8X", vp8xPayload(0x02, canvasW, canvasH))
    riff.chunk("ANIM", Array[Byte](0, 0, 0, 0, 0, 0))
    frames.foreach { case (left, top, dur, file) =>
      require(file.length > 20 && {
        val t = new String(file, 12, 4, "US-ASCII"); t == "VP8L" || t == "VP8 "
      }, "animation frames must be plain single-image containers (VP8L or " +
        "'VP8 ' at offset 12) — extended VP8X layouts would embed a broken frame")
      val (w, h) = imageChunkDims(file) // dims from the image-chunk header
      writeAnmf(riff.chunk, left, top, w, h, dur, file)
    }
    riff.build()
  }

  /** One frame spec for [[synthWebpAnimComposed]]: placement, duration,
    * the complete single-image container, and the ANMF composition
    * flags (the encode half of the r12 blend/dispose surface).
    */
  final case class AnmfSpec(left: Int, top: Int, durationMs: Int,
      file: Array[Byte], blend: Boolean = true, disposeBg: Boolean = false)

  /** Animated WebP with PER-FRAME blend/dispose flags — what real
    * encoders emit for partial-rect updates (the fixture shape
    * [[composeFrames]]' oracles need; `synthWebpAnimFiles` pins
    * no-blend/none for the census fixtures).
    */
  def synthWebpAnimComposed(canvasW: Int, canvasH: Int,
      frames: Seq[AnmfSpec]): Array[Byte] = {
    require(frames.nonEmpty, "an animation needs at least one frame")
    val riff = new RiffBuilder
    riff.chunk("VP8X", vp8xPayload(0x02, canvasW, canvasH))
    riff.chunk("ANIM", Array[Byte](0, 0, 0, 0, 0, 0))
    frames.foreach { f =>
      require(f.file.length > 20 && {
        val t = new String(f.file, 12, 4, "US-ASCII"); t == "VP8L" || t == "VP8 "
      }, "animation frames must be plain single-image containers")
      val (w, h) = imageChunkDims(f.file)
      writeAnmf(riff.chunk, f.left, f.top, w, h, f.durationMs, f.file,
        blend = f.blend, disposeBg = f.disposeBg)
    }
    riff.build()
  }

  /** Decoded animation → full-canvas composed snapshots (r12): honors
    * each frame's blend/dispose flags via the shared [[Canvas]] kernel;
    * returns one (0,0,canvasW,canvasH) [[AnimFrame]] per input frame,
    * durations preserved. This is the surface a frame-sampling training
    * pipeline reads — a real animation with partial-rect updates decodes
    * to what a renderer would SHOW, not to fragments.
    */
  def composeFrames(canvasW: Int, canvasH: Int,
      frames: Seq[AnimFrame]): Seq[AnimFrame] = {
    val shown = Canvas.compose(canvasW, canvasH, frames.map(f =>
      Canvas.Layer(f.left, f.top, f.w, f.h, f.argb,
        blend = f.blend, disposeBg = f.disposeBg, restorePrev = false)))
    frames.zip(shown).map { case (f, px) =>
      AnimFrame(0, 0, canvasW, canvasH, f.durationMs, px)
    }
  }

  /** Animated-WebP binary column → per-frame COMPOSED full-canvas RGBA
    * pixel rows ([[webpToFrames]]' sibling; same one-file-one-task
    * generator shape, zero shuffle — composition is pure CPU inside the
    * decode task).
    */
  def webpToComposedFrames(media: DataFrame, bytesCol: String = "bytes"): DataFrame =
    MediaExplode.explode(media, bytesCol, Seq(
      StructField("frame_idx", org.apache.spark.sql.types.IntegerType, nullable = false),
      StructField("duration_ms", org.apache.spark.sql.types.IntegerType, nullable = false)) ++
        MultimodalOps.PixelFields) { payload =>
      val (cw, ch, frames) = decodeWebpFrames(payload)
      for {
        (f, fi) <- composeFrames(cw, ch, frames).iterator.zipWithIndex
        r <- 0 until f.h
        c <- 0 until f.w
        k <- 0 until 4
      } yield {
        val p = f.argb(r * f.w + c)
        val v = k match {
          case 0 => (p >> 16) & 0xff
          case 1 => (p >> 8) & 0xff
          case 2 => p & 0xff
          case _ => (p >>> 24) & 0xff
        }
        Seq[Any](fi, f.durationMs, r, c, k, v)
      }
    }


  /** Lossy still WITH an alpha plane (VP8X + ALPH + VP8) from a complete
    * lossy container (`Vp8.encodeKeyframe` output) and a per-pixel alpha
    * formula — the encode half for the alpha-bearing layout. The plane
    * ships RAW (method 0), optionally forward-FILTERED (1 horizontal /
    * 2 vertical / 3 gradient — the decoder's unfilter must invert it
    * exactly), so decoded alpha has the closed form `alphaOf` itself.
    */
  def synthWebpLossyAlpha(lossyFile: Array[Byte], alphaOf: (Int, Int) => Int,
      filterM: Int = 0): Array[Byte] = {
    require(filterM >= 0 && filterM <= 3, s"ALPH filter $filterM")
    // the input must be a PLAIN lossy still ("VP8 " chunk at offset 12):
    // a VP8L or VP8X-led container would win the image walk over the
    // ALPH we are about to add, silently dropping the requested alpha
    require(lossyFile.length > 20 &&
      new String(lossyFile, 12, 4, "US-ASCII") == "VP8 ",
      "synthWebpLossyAlpha needs a plain lossy still (a 'VP8 ' chunk at " +
        "offset 12) — VP8L/VP8X inputs would silently drop the alpha plane")
    val (w, h) = imageChunkDims(lossyFile)
    val a = Array.tabulate(h * w) { i =>
      val v = alphaOf(i / w, i % w)
      require(v >= 0 && v <= 255, s"alpha $v out of range"); v
    }
    val res = new Array[Int](h * w)
    filterM match {
      case 0 => System.arraycopy(a, 0, res, 0, a.length)
      case 1 =>
        for (y <- 0 until h) {
          var pred = if (y == 0) 0 else a((y - 1) * w)
          for (x <- 0 until w) {
            res(y * w + x) = (a(y * w + x) - pred) & 0xff
            pred = a(y * w + x)
          }
        }
      case 2 =>
        var pred = 0
        for (x <- 0 until w) { res(x) = (a(x) - pred) & 0xff; pred = a(x) }
        for (y <- 1 until h; x <- 0 until w)
          res(y * w + x) = (a(y * w + x) - a((y - 1) * w + x)) & 0xff
      case _ =>
        var pred = 0
        for (x <- 0 until w) { res(x) = (a(x) - pred) & 0xff; pred = a(x) }
        for (y <- 1 until h) {
          var left = a((y - 1) * w); var topLeft = left
          for (x <- 0 until w) {
            val top = a((y - 1) * w + x)
            val g = math.max(0, math.min(255, left + top - topLeft))
            res(y * w + x) = (a(y * w + x) - g) & 0xff
            left = a(y * w + x); topLeft = top
          }
        }
    }
    val vp8Size = (lossyFile(16) & 0xff) | ((lossyFile(17) & 0xff) << 8) |
      ((lossyFile(18) & 0xff) << 16) | ((lossyFile(19) & 0xff) << 24)
    val riff = new RiffBuilder
    riff.chunk("VP8X", vp8xPayload(0x10, w, h)) // alpha flag
    val alphPayload = new Array[Byte](1 + res.length)
    alphPayload(0) = (filterM << 2).toByte // method 0, no pre-processing
    var i = 0
    while (i < res.length) { alphPayload(1 + i) = res(i).toByte; i += 1 }
    riff.chunk("ALPH", alphPayload)
    riff.chunkRaw(lossyFile, 12, 8 + vp8Size + (vp8Size & 1)) // VP8 chunk verbatim
    riff.build()
  }


  /** WebP binary column → RGBA pixel rows (the pngToPixels shape). */
  def webpToPixels(media: DataFrame, bytesCol: String = "bytes"): DataFrame =
    MediaExplode.explode(media, bytesCol, MultimodalOps.PixelFields) { payload =>
      val (w, h, px) = decodeWebpPixels(payload)
      for (row <- (0 until h).iterator; c <- 0 until w; k <- 0 until 4)
        yield {
          val p = px(row * w + c)
          val v = k match {
            case 0 => (p >> 16) & 0xff // R
            case 1 => (p >> 8) & 0xff // G
            case 2 => p & 0xff // B
            case _ => (p >>> 24) & 0xff // A
          }
          Seq[Any](row, c, k, v)
        }
    }

  // ---- encode half (fixtures/oracles) ----

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nBits = 0
    def write(v: Int, n: Int): Unit = {
      require(n >= 0 && n <= 24 && (v >> n) == 0, s"bad bit write $v/$n")
      acc |= v << nBits
      nBits += n
      while (nBits >= 8) {
        out.write(acc & 0xff); acc >>>= 8; nBits -= 8
      }
    }
    def toBytes: Array[Byte] = {
      if (nBits > 0) { out.write(acc & 0xff); acc = 0; nBits = 0 }
      out.toByteArray
    }
  }

  /** Canonical two-length flat code over `n` symbols: `n8` symbols at the
    * short length, the rest one bit longer, chosen complete by Kraft.
    * Returns (lengths, codes) in canonical assignment.
    */
  private def flatCode(n: Int): (Array[Int], Array[Int]) = {
    // find L with 2^L < n <= 2^(L+1); x symbols at L, n-x at L+1 where
    // x = 2^(L+1) - n
    var l = 1
    while ((1 << (l + 1)) < n) l += 1
    val x = (1 << (l + 1)) - n
    val lengths = Array.tabulate(n)(i => if (i < x) l else l + 1)
    val codes = new Array[Int](n)
    var code = 0; var prevLen = 0
    lengths.zipWithIndex.sortBy { case (len, s) => (len, s) }.foreach {
      case (len, s) =>
        code <<= (len - prevLen); prevLen = len
        codes(s) = code; code += 1
    }
    (lengths, codes)
  }

  private def writeFlatCode(bw: BitWriter, lengths: Array[Int]): Unit = {
    // non-simple code; transmit lengths via a 1- or 2-symbol code-length
    // code over the length values in use (a single-length alphabet — all
    // 256 at 8 bits — degenerates to the zero-bit CL code: no data bits)
    val used = lengths.distinct.sorted
    require(used.length <= 2 && used.forall(l => l > 0 && l <= 15),
      s"flat code lengths out of the writer's envelope: ${used.mkString(",")}")
    bw.write(0, 1) // not simple
    bw.write(19 - 4, 4) // all 19 code-length slots
    ClOrder.foreach { s =>
      bw.write(if (used.contains(s)) 1 else 0, 3)
    }
    bw.write(0, 1) // no max-symbol cap
    if (used.length == 2) {
      val shortL = used(0)
      // canonical 1-bit CL code: smaller symbol gets 0
      lengths.foreach { l => bw.write(if (l == shortL) 0 else 1, 1) }
    } // single length: the zero-bit CL code repeats it with no data bits
  }

  private def writeRev(bw: BitWriter, code: Int, len: Int): Unit = {
    // prefix codes are read MSB-first off the LSB-first stream: emit the
    // code bits in MSB→LSB order, one at a time
    var i = len - 1
    while (i >= 0) { bw.write((code >> i) & 1, 1); i -= 1 }
  }

  /** Inverse of [[readLz77Value]]: value → (prefix code, extra bits,
    * extra value).
    */
  private def lz77Prefix(v: Int): (Int, Int, Int) = {
    require(v >= 1, s"LZ77 value $v")
    if (v <= 4) (v - 1, 0, 0)
    else {
      var code = 4
      while (code < 40) {
        val nBits = (code - 2) >> 1
        val offset = (2 + (code & 1)) << nBits
        if (v <= offset + (1 << nBits)) return (code, nBits, v - 1 - offset)
        code += 1
      }
      throw new IllegalArgumentException(s"LZ77 value $v out of range")
    }
  }

  /** One entropy-coded subimage (transform data / palette / meta): no
    * color cache, flat codes, literal pixels.
    */
  private def writeEntropyPixels(bw: BitWriter, px: Iterator[Int]): Unit = {
    bw.write(0, 1) // no color cache
    val (gl, gc) = flatCode(256 + 24)
    val (cl, cc) = flatCode(256)
    val (dl, _) = flatCode(40)
    writeFlatCode(bw, gl)
    writeFlatCode(bw, cl); writeFlatCode(bw, cl); writeFlatCode(bw, cl)
    writeFlatCode(bw, dl)
    px.foreach { p =>
      writeRev(bw, gc((p >> 8) & 0xff), gl((p >> 8) & 0xff))
      writeRev(bw, cc((p >> 16) & 0xff), cl((p >> 16) & 0xff))
      writeRev(bw, cc(p & 0xff), cl(p & 0xff))
      writeRev(bw, cc((p >>> 24) & 0xff), cl((p >>> 24) & 0xff))
    }
  }

  /** Real VP8L encoder (fixtures/oracles/round-trip proofs): version 0,
    * flat canonical alphabets, with every DECODE feature optionally
    * exercised — SUBTRACT_GREEN, a constant-mode PREDICTOR transform
    * (residuals computed exactly as the inverse reconstructs), a color
    * cache (`cacheBits` 1..11), LZ77 back-references (identical rows
    * collapse to one full-row copy), and a meta prefix image
    * (`metaBits`: blocks alternate between two identical code groups —
    * the group-selection path runs; the bits don't change).
    */
  def synthWebpLossless(
      w: Int, h: Int,
      argb: (Int, Int) => Int,
      subtractGreen: Boolean = false,
      predictorMode: Option[Int] = None,
      cacheBits: Int = 0,
      lz77Rows: Boolean = false,
      metaBits: Option[Int] = None): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 16383 && h <= 16383, s"bad dims ${w}x$h")
    require(cacheBits >= 0 && cacheBits <= 11, s"cache bits $cacheBits")
    predictorMode.foreach(m => require(m >= 0 && m <= 13, s"predictor mode $m"))
    metaBits.foreach(b => require(b >= 2 && b <= 9, s"meta bits $b"))
    val bw = new BitWriter
    bw.write(0x2f, 8)
    bw.write(w - 1, 14); bw.write(h - 1, 14)
    bw.write(0, 1) // alpha hint
    bw.write(0, 3) // version
    // source pixels, then the forward transform pipeline in READ order
    // (the decoder inverts in reverse): subtract-green first, predictor
    // residuals second
    val base = Array.tabulate(h * w)(i => argb(i / w, i % w))
    if (subtractGreen) {
      bw.write(1, 1); bw.write(2, 2)
      var i = 0
      while (i < base.length) {
        val p = base(i); val g = (p >> 8) & 0xff
        base(i) = (p & 0xff00ff00) |
          (((((p >> 16) & 0xff) - g) & 0xff) << 16) | (((p & 0xff) - g) & 0xff)
        i += 1
      }
    }
    val stored = predictorMode match {
      case None => base
      case Some(mode) =>
        val bits = 4 // 16x16 blocks
        bw.write(1, 1); bw.write(0, 2)
        bw.write(bits - 2, 3)
        val tw = (w + (1 << bits) - 1) >> bits
        val th = (h + (1 << bits) - 1) >> bits
        writeEntropyPixels(bw,
          Iterator.fill(tw * th)(0xff000000 | (mode << 8)))
        // residual = pixel − predicted, where prediction reads the
        // RECONSTRUCTED (= original transformed-domain) neighbors and
        // the decoder's exact edge rules
        val res = new Array[Int](h * w)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val pos = y * w + x
            val pred =
              if (x == 0 && y == 0) 0xff000000
              else if (y == 0) base(pos - 1)
              else if (x == 0) base(pos - w)
              else predict(mode, base(pos - 1), base(pos - w),
                base(pos - w - 1), base(pos - w + 1))
            res(pos) = subPixels(base(pos), pred)
            x += 1
          }
          y += 1
        }
        res
    }
    bw.write(0, 1) // no more transforms
    // main stream: optional color cache + optional meta prefix image
    if (cacheBits > 0) { bw.write(1, 1); bw.write(cacheBits, 4) }
    else bw.write(0, 1)
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    val nGroups = metaBits match {
      case Some(mb) =>
        bw.write(1, 1)
        bw.write(mb - 2, 3)
        val tw = (w + (1 << mb) - 1) >> mb
        val th = (h + (1 << mb) - 1) >> mb
        // block (bx, by) → group (bx + by) % 2, in the GREEN channel
        writeEntropyPixels(bw, (0 until th).iterator.flatMap(by =>
          (0 until tw).iterator.map(bx =>
            0xff000000 | (((bx + by) % 2) << 8))))
        2
      case None => bw.write(0, 1); 1
    }
    val (gl, gc) = flatCode(256 + 24 + cacheSize)
    val (cl, cc) = flatCode(256)
    val (dl, dc) = flatCode(40)
    for (_ <- 0 until nGroups) {
      writeFlatCode(bw, gl)
      writeFlatCode(bw, cl); writeFlatCode(bw, cl); writeFlatCode(bw, cl)
      writeFlatCode(bw, dl)
    }
    def cacheKey(p: Int): Int = ((0x1e35a7bd * p) >>> (32 - cacheBits)).toInt
    def insert(p: Int): Unit = if (cache != null) cache(cacheKey(p)) = p
    var y = 0
    while (y < h) {
      val rowEqual = lz77Rows && y > 0 && {
        var eq = true; var x = 0
        while (eq && x < w) { eq = stored(y * w + x) == stored((y - 1) * w + x); x += 1 }
        eq
      }
      if (rowEqual) {
        // one back-reference: len = w, dist = w (spelled as the
        // non-neighborhood distance code dist + 120)
        val (lc, lBits, lExtra) = lz77Prefix(w)
        writeRev(bw, gc(256 + lc), gl(256 + lc))
        bw.write(lExtra, lBits)
        val (dcode, dBits, dExtra) = lz77Prefix(w + 120)
        writeRev(bw, dc(dcode), dl(dcode))
        bw.write(dExtra, dBits)
        var x = 0
        while (x < w) { insert(stored(y * w + x)); x += 1 }
      } else {
        var x = 0
        while (x < w) {
          val p = stored(y * w + x)
          if (cache != null && cache(cacheKey(p)) == p) {
            val sym = 256 + 24 + cacheKey(p)
            writeRev(bw, gc(sym), gl(sym))
          } else {
            writeRev(bw, gc((p >> 8) & 0xff), gl((p >> 8) & 0xff))
            writeRev(bw, cc((p >> 16) & 0xff), cl((p >> 16) & 0xff))
            writeRev(bw, cc(p & 0xff), cl(p & 0xff))
            writeRev(bw, cc((p >>> 24) & 0xff), cl((p >>> 24) & 0xff))
            insert(p)
          }
          x += 1
        }
      }
      y += 1
    }
    wrapRiff(bw.toBytes)
  }

  /** Palette (COLOR_INDEXING) VP8L: `palette` ARGB entries, `idxOf` the
    * per-pixel palette index — exercises the delta-coded palette stream
    * and sub-byte index bundling (palette ≤ 16).
    */
  def synthWebpPalette(
      w: Int, h: Int,
      palette: Seq[Int],
      idxOf: (Int, Int) => Int): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 16383 && h <= 16383, s"bad dims ${w}x$h")
    require(palette.nonEmpty && palette.length <= 256, "palette size 1..256")
    val bw = new BitWriter
    bw.write(0x2f, 8)
    bw.write(w - 1, 14); bw.write(h - 1, 14)
    bw.write(0, 1); bw.write(0, 3)
    bw.write(1, 1); bw.write(3, 2) // transform: color indexing
    bw.write(palette.length - 1, 8)
    // palette stream: entropy image of size x 1, DELTA-coded entries
    locally {
      bw.write(0, 1) // no color cache
      val (l, c) = flatCode(256 + 24)
      val (cl, cc) = flatCode(256)
      val (dl, dc) = flatCode(40)
      writeFlatCode(bw, l)
      writeFlatCode(bw, cl); writeFlatCode(bw, cl); writeFlatCode(bw, cl)
      writeFlatCode(bw, dl)
      var prev = 0
      palette.foreach { p =>
        val d = subPixels(p, prev); prev = p
        writeRev(bw, c((d >> 8) & 0xff), l((d >> 8) & 0xff))
        writeRev(bw, cc((d >> 16) & 0xff), cl((d >> 16) & 0xff))
        writeRev(bw, cc(d & 0xff), cl(d & 0xff))
        writeRev(bw, cc((d >>> 24) & 0xff), cl((d >>> 24) & 0xff))
      }
    }
    bw.write(0, 1) // no more transforms
    // main stream: packed indices in the GREEN channel
    bw.write(0, 1) // no color cache
    bw.write(0, 1) // no huffman image
    val (gl, gc) = flatCode(256 + 24)
    val (cl2, cc2) = flatCode(256)
    val (dl2, dc2) = flatCode(40)
    writeFlatCode(bw, gl)
    writeFlatCode(bw, cl2); writeFlatCode(bw, cl2); writeFlatCode(bw, cl2)
    writeFlatCode(bw, dl2)
    val bits =
      if (palette.length <= 2) 3
      else if (palette.length <= 4) 2
      else if (palette.length <= 16) 1 else 0
    val perByte = 1 << bits
    val idxBits = 8 >> bits
    val packedW = (w + perByte - 1) >> bits
    for (r <- 0 until h; pc <- 0 until packedW) {
      var cell = 0
      var s = 0
      while (s < perByte) {
        val x = (pc << bits) + s
        if (x < w) {
          val i = idxOf(r, x)
          require(i >= 0 && i < palette.length, s"palette index $i")
          cell |= i << (s * idxBits)
        }
        s += 1
      }
      // pixel = (a=0, r=0, g=cell, b=0): alpha/red/blue all 0
      writeRev(bw, gc(cell), gl(cell))
      writeRev(bw, cc2(0), cl2(0))
      writeRev(bw, cc2(0), cl2(0))
      writeRev(bw, cc2(0), cl2(0))
    }
    wrapRiff(bw.toBytes)
  }

  /** Fixture writer for the 2-D DISTANCE NEIGHBORHOOD codes (plane codes
    * 1..120): `literals` pixels first, then each `(len, planeCode)` copy
    * emitted with the plane code AS the distance value (≤ 120 — the
    * decoder maps it through the (dx, dy) table). The in-repo encoder's
    * own LZ77 path only ever emits `dist + 120` codes, so round trips
    * never exercised the neighborhood map — this demo stream is how the
    * decode test pins `dist = dy*xsize + dx` (a sign error mirrors every
    * dx-asymmetric code and collapses pure-horizontal ones to 1).
    */
  def synthWebpLz77Demo(
      w: Int, h: Int,
      literals: Seq[Int],
      copies: Seq[(Int, Int)]): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 16383 && h <= 16383, s"bad dims ${w}x$h")
    require(literals.length + copies.map(_._1).sum == w * h,
      "literals + copy lengths must tile the image exactly")
    val bw = new BitWriter
    bw.write(0x2f, 8)
    bw.write(w - 1, 14); bw.write(h - 1, 14)
    bw.write(0, 1); bw.write(0, 3) // alpha hint, version
    bw.write(0, 1) // no transforms
    bw.write(0, 1) // no color cache
    bw.write(0, 1) // no huffman image
    val (gl, gc) = flatCode(256 + 24)
    val (cl, cc) = flatCode(256)
    val (dl, dc) = flatCode(40)
    writeFlatCode(bw, gl)
    writeFlatCode(bw, cl); writeFlatCode(bw, cl); writeFlatCode(bw, cl)
    writeFlatCode(bw, dl)
    literals.foreach { p =>
      writeRev(bw, gc((p >> 8) & 0xff), gl((p >> 8) & 0xff))
      writeRev(bw, cc((p >> 16) & 0xff), cl((p >> 16) & 0xff))
      writeRev(bw, cc(p & 0xff), cl(p & 0xff))
      writeRev(bw, cc((p >>> 24) & 0xff), cl((p >>> 24) & 0xff))
    }
    copies.foreach { case (len, planeCode) =>
      require(planeCode >= 1 && planeCode <= 120, s"plane code $planeCode")
      val (lcode, lBits, lExtra) = lz77Prefix(len)
      writeRev(bw, gc(256 + lcode), gl(256 + lcode))
      bw.write(lExtra, lBits)
      val (dcode, dBits, dExtra) = lz77Prefix(planeCode)
      writeRev(bw, dc(dcode), dl(dcode))
      bw.write(dExtra, dBits)
    }
    wrapRiff(bw.toBytes)
  }

  private def subPixels(a: Int, b: Int): Int = {
    // per-channel mod-256 difference a - b
    var out = 0
    var i = 0
    while (i < 4) {
      val d = (((a >>> (8 * i)) & 0xff) - ((b >>> (8 * i)) & 0xff)) & 0xff
      out |= d << (8 * i)
      i += 1
    }
    out
  }

  private def wrapRiff(vp8l: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    val chunk = vp8l.length + (vp8l.length & 1)
    tag("RIFF"); le32(4 + 8 + chunk); tag("WEBP")
    tag("VP8L"); le32(vp8l.length); out.write(vp8l)
    if ((vp8l.length & 1) == 1) out.write(0)
    out.toByteArray
  }
}
