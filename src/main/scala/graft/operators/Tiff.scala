package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TIFF / GeoTIFF header + block codec — the one format the
  * reference actually reads and writes (feature_stacking.py:75-98 opens
  * every scene/auxiliary raster as a (Big)TIFF; :226-249 writes the
  * stacked output `tiled=True, blockxsize=1024, blockysize=1024,
  * compress='lzw', bigtiff='YES'`). The engine's raster model is the
  * pixel table; this codec closes the gap so reference-shaped artifacts
  * can be INGESTED: a TIFF binary column → `tiffToBlocks` → (tile_y,
  * tile_x, blob) block rows → [[RasterBridge.explodeBlocks]] → pixel rows.
  *
  * Scope: classic TIFF (magic 42) AND BigTIFF (magic 43 — 8-byte offsets,
  * 20-byte IFD entries), both byte orders, single-image IFD, tiled or
  * stripped layout, uncompressed or LZW-compressed blocks (MSB-first
  * early-change TIFF-6 LZW — the reference's exact write profile), any
  * SampleFormat for the header surface; block decode covers float32 (the
  * reference's dtype at feature_stacking.py:234) and signed/unsigned
  * int8/16/32 (the stage-1 OUTPUT profile: int32 labels + LZW,
  * pixel_classifier_stream.py:77-83), with predictors none (1),
  * integer horizontal differencing (2, GDAL PREDICTOR=2) and
  * floating-point (3, TechNote 3). Integer samples surface as float32
  * pixel values (exact for |v| <= 2^24 — the engine's raster model, the
  * reference's own INTERNAL_DTYPE move). Other compressions and sample
  * types parse their HEADER fine but block decode fails closed. GeoTIFF georeferencing is read from ModelPixelScale
  * (33550) + ModelTiepoint (33922) — exactly the north-up affine the
  * reference's `transform` carries — and surfaces as a [[Regrid.GridDef]].
  *
  * Everything is implemented from the public TIFF 6.0 / BigTIFF layout:
  * no codec libraries, pure byte arithmetic, safe for executor-side
  * `mapPartitions` (the decode is per-row work; no shuffle, no driver
  * state).
  */
object Tiff {

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("sample_format", IntegerType),
    StructField("n_bands", IntegerType),
    StructField("planar_config", IntegerType),
    StructField("compression", IntegerType),
    StructField("tiled", BooleanType),
    StructField("block_w", IntegerType),
    StructField("block_h", IntegerType),
    StructField("n_blocks", IntegerType),
    StructField("byte_order", StringType),
    StructField("is_big", BooleanType),
    StructField("px_w", DoubleType),
    StructField("px_h", DoubleType),
    StructField("origin_x", DoubleType),
    StructField("origin_y", DoubleType)))

  // ---- low-level byte access in either order ----

  private final class Reader(b: Array[Byte], le: Boolean) {
    def u16(off: Int): Int =
      if (le) (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
      else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    def u32(off: Int): Long = {
      val v =
        if (le) (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
          ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
        else ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
          ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
      v
    }
    def u64(off: Int): Long = {
      var bits = 0L
      var i = 0
      while (i < 8) {
        val byte = b(off + (if (le) i else 7 - i)) & 0xffL
        bits |= byte << (8 * i)
        i += 1
      }
      bits
    }
    def f64(off: Int): Double = java.lang.Double.longBitsToDouble(u64(off))
  }

  /** One parsed IFD entry's scalar or array value (SHORT/LONG/DOUBLE). */
  private final case class Entry(tag: Int, typ: Int, count: Long, valOff: Int)

  private final case class Parsed(
      r: Reader, le: Boolean, big: Boolean, entries: Map[Int, Entry],
      bytes: Array[Byte]) {

    private def typeSize(t: Int): Int = t match {
      case 1 | 2 | 6 | 7 => 1 // BYTE/ASCII/SBYTE/UNDEFINED
      case 3 | 8 => 2 // SHORT/SSHORT
      case 4 | 9 | 11 => 4 // LONG/SLONG/FLOAT
      case 5 | 10 | 12 => 8 // RATIONAL/SRATIONAL/DOUBLE
      case 16 | 17 | 18 => 8 // LONG8/SLONG8/IFD8 (BigTIFF)
      case _ => 0
    }

    /** Where the entry's payload lives: inline when it fits in the value
      * field (4 bytes classic, 8 bytes BigTIFF). External payloads are
      * bounds-checked here so a corrupt offset rejects descriptively
      * instead of letting a later array read escape.
      */
    private def payloadOff(e: Entry): Int = {
      // count is a raw u32/u64 read as signed Long from untrusted bytes: a
      // negative (wrapped) or absurd value would overflow sz past the
      // inline-fit test and reach Array.tabulate as a crash instead of the
      // codec's descriptive reject. No legitimate entry has more elements
      // than the file has bytes.
      require(e.count >= 0 && e.count <= bytes.length,
        s"tag ${e.tag}: entry count ${e.count} outside the ${bytes.length}-byte file")
      val sz = typeSize(e.typ) * e.count
      if (sz <= (if (big) 8 else 4)) e.valOff
      else {
        val off = if (big) r.u64(e.valOff) else r.u32(e.valOff)
        require(off >= 0 && off + sz <= bytes.length,
          s"tag ${e.tag}: external payload at $off+$sz outside the ${bytes.length}-byte file")
        off.toInt
      }
    }

    def intVal(tag: Int): Option[Long] = entries.get(tag).map { e =>
      val off = payloadOff(e)
      e.typ match {
        case 3 => r.u16(off).toLong
        case 4 => r.u32(off)
        case 16 => r.u64(off)
        case t => throw new IllegalArgumentException(s"tag $tag: unexpected type $t")
      }
    }

    def longArray(tag: Int): Option[Array[Long]] = entries.get(tag).map { e =>
      val off = payloadOff(e)
      val step = typeSize(e.typ)
      Array.tabulate(e.count.toInt) { i =>
        e.typ match {
          case 3 => r.u16(off + i * step).toLong
          case 4 => r.u32(off + i * step)
          case 16 => r.u64(off + i * step)
          case t => throw new IllegalArgumentException(s"tag $tag: unexpected type $t")
        }
      }
    }

    def doubleArray(tag: Int): Option[Array[Double]] = entries.get(tag).map { e =>
      val off = payloadOff(e)
      Array.tabulate(e.count.toInt)(i => r.f64(off + i * 8))
    }

    /** Raw payload bytes of a BYTE/UNDEFINED tag (JPEGTables lives in
      * UNDEFINED type 7 per TIFF Tech Note 2).
      */
    def rawBytes(tag: Int): Option[Array[Byte]] = entries.get(tag).map { e =>
      require(e.typ == 1 || e.typ == 7,
        s"tag $tag: expected BYTE/UNDEFINED payload, got type ${e.typ}")
      val off = payloadOff(e)
      java.util.Arrays.copyOfRange(bytes, off, off + e.count.toInt)
    }
  }

  /** Parse header + first IFD — classic TIFF (magic 42) or BigTIFF
    * (magic 43: u16 offset-size 8, u16 reserved 0, u64 IFD offset; IFD is
    * u64 entry count + 20-byte entries with u64 counts and 8-byte value
    * fields). Returns None when the payload is neither (fail-closed —
    * consumers branch on parse success).
    */
  private def parse(bytes: Array[Byte]): Option[Parsed] = {
    if (bytes == null || bytes.length < 8) return None
    val le = bytes(0) == 'I'.toByte && bytes(1) == 'I'.toByte
    val be = bytes(0) == 'M'.toByte && bytes(1) == 'M'.toByte
    if (!le && !be) return None
    val r = new Reader(bytes, le)
    r.u16(2) match {
      case 42 =>
        val ifdOff = r.u32(4).toInt
        if (ifdOff < 8 || ifdOff + 2 > bytes.length) return None
        val n = r.u16(ifdOff)
        if (ifdOff + 2 + 12 * n > bytes.length) return None
        val entries = (0 until n).map { i =>
          val eo = ifdOff + 2 + 12 * i
          val e = Entry(r.u16(eo), r.u16(eo + 2), r.u32(eo + 4), eo + 8)
          e.tag -> e
        }.toMap
        Some(Parsed(r, le, big = false, entries, bytes))
      case 43 =>
        if (bytes.length < 16 || r.u16(4) != 8 || r.u16(6) != 0) return None
        val ifdOff = r.u64(8).toInt
        if (ifdOff < 16 || ifdOff + 8 > bytes.length) return None
        val n = r.u64(ifdOff).toInt
        if (n < 0 || ifdOff + 8 + 20L * n > bytes.length) return None
        val entries = (0 until n).map { i =>
          val eo = ifdOff + 8 + 20 * i
          val e = Entry(r.u16(eo), r.u16(eo + 2), r.u64(eo + 4), eo + 12)
          e.tag -> e
        }.toMap
        Some(Parsed(r, le, big = true, entries, bytes))
      case _ => None
    }
  }

  /** Scalar IFD tag lookup over any TIFF-STRUCTURED payload — the Exif
    * body inside a JPEG APP1 is exactly a TIFF header + IFD0, so
    * [[Jpeg.exifOrientation]] reads tag 274 through this seam. Throws
    * when the payload is not TIFF-shaped (the caller declared it Exif —
    * a malformed body fails closed); None when it parses but lacks the
    * tag.
    */
  private[operators] def ifdScalarStrict(bytes: Array[Byte], tag: Int): Option[Long] = {
    val p = parse(bytes)
    require(p.isDefined, "payload is not a TIFF structure")
    p.get.intVal(tag)
  }

  /** REAL TIFF header decode (the raster twin of the PNG/BMP/WAV parsers
    * in [[MultimodalOps]]): dimensions, sample layout, compression, block
    * geometry (tiles or strips), byte order, and the GeoTIFF north-up
    * affine when present. NULL row on anything that is not a classic
    * TIFF.
    */
  def decodeMeta(bytes: Array[Byte]): Row = parse(bytes) match {
    case None => null
    case Some(p) =>
      try {
        val width = p.intVal(256).getOrElse(return null).toInt
        val height = p.intVal(257).getOrElse(return null).toInt
        val bits = p.intVal(258).map(_.toInt).getOrElse(1)
        val sampleFormat = p.intVal(339).map(_.toInt).getOrElse(1)
        val nBands = p.intVal(277).map(_.toInt).getOrElse(1)
        val planarConfig = p.intVal(284).map(_.toInt).getOrElse(1)
        val compression = p.intVal(259).map(_.toInt).getOrElse(1)
        val tiled = p.entries.contains(322)
        val (bw, bh) =
          if (tiled) (p.intVal(322).get.toInt, p.intVal(323).get.toInt)
          else (width, p.intVal(278).map(_.toInt).getOrElse(height))
        val nBlocks =
          if (tiled) ((width + bw - 1) / bw) * ((height + bh - 1) / bh)
          else (height + bh - 1) / bh
        val scale = p.doubleArray(33550)
        val tiepoint = p.doubleArray(33922)
        // ModelTiepoint (i,j,k, x,y,z): raster (i,j) pins world (x,y);
        // origin = world position of raster (0,0)'s top-left corner
        val (pxW, pxH) = scale match {
          case Some(s) if s.length >= 2 => (s(0), s(1))
          case _ => (null, null)
        }
        val (ox, oy) = (scale, tiepoint) match {
          case (Some(s), Some(t)) if s.length >= 2 && t.length >= 6 =>
            (t(3) - t(0) * s(0), t(4) + t(1) * s(1))
          case _ => (null, null)
        }
        Row(width, height, bits, sampleFormat, nBands, planarConfig,
          compression, tiled, bw, bh,
          nBlocks, if (p.le) "LE" else "BE", p.big, pxW, pxH, ox, oy)
      } catch { case _: Exception => null }
  }

  /** GeoTIFF georeferencing as the engine's grid definition (None when the
    * file carries no ModelPixelScale/ModelTiepoint pair).
    */
  def gridDefOf(bytes: Array[Byte]): Option[Regrid.GridDef] = {
    val m = decodeMeta(bytes)
    val pxW = metaSchema.fieldIndex("px_w")
    val ox = metaSchema.fieldIndex("origin_x")
    if (m == null || m.isNullAt(pxW) || m.isNullAt(ox)) None
    else Some(Regrid.GridDef(m.getDouble(ox), m.getDouble(ox + 1),
      m.getDouble(pxW), m.getDouble(pxW + 1)))
  }

  // ---- TIFF-6 LZW (the reference's write profile: compress='lzw') ----
  //
  // MSB-first bit packing, ClearCode 256, EOI 257, first table code 258,
  // 12-bit max, EARLY CHANGE: both sides derive the code width from the
  // encoder's next-free-code counter n via w(n) = 9 while n ≤ 510, 10
  // while n ≤ 1022, 11 while n ≤ 2046, else 12 (the decoder lags one
  // table add, so it reads at w(nextCode+1)). The encoder emits a clear
  // when n reaches 4094, so code 4095 is never assigned.

  // Code width while the next table entry will be `n`: plain-LZW timing
  // (bump at 512/1024/2048 table entries). Round 10 bumped one code
  // EARLY (a misreading of the "TIFF early change" lore) — self-
  // consistent round trips hid it while real encoders' files misdecoded
  // and real readers (the JDK's JAI codec, libtiff-interop-tested for
  // decades) crashed on the in-repo writer's output. Caught by the r11
  // ImageIoConformanceSpec (the VP8L lesson applied to every codec).
  private def lzwWidth(n: Int): Int =
    if (n <= 511) 9 else if (n <= 1023) 10 else if (n <= 2047) 11 else 12

  /** Decode one LZW-compressed block. `maxOut` bounds the output (the
    * caller knows the uncompressed block size); a stream that would
    * overflow it fails rather than allocating unboundedly.
    */
  private[graft] def lzwDecode(in: Array[Byte], maxOut: Int): Array[Byte] = {
    val out = new Array[Byte](maxOut)
    var outLen = 0
    // table: code -> (prefix code, appended byte); codes < 256 literal
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var nextCode = 258
    var bitPos = 0
    val nBits = in.length * 8

    def readCode(width: Int): Int = {
      if (bitPos + width > nBits) return 257 // truncated stream: treat as EOI
      var v = 0
      var i = 0
      while (i < width) {
        val b = (in((bitPos + i) >> 3) >> (7 - ((bitPos + i) & 7))) & 1
        v = (v << 1) | b
        i += 1
      }
      bitPos += width
      v
    }

    def emit(code: Int): Int = { // writes string(code), returns its first byte
      if (code < 256) {
        require(outLen < maxOut, "LZW output exceeds expected block size")
        out(outLen) = code.toByte; outLen += 1
        code
      } else {
        val first = emit(prefix(code))
        require(outLen < maxOut, "LZW output exceeds expected block size")
        out(outLen) = append(code); outLen += 1
        first
      }
    }

    var prev = -1
    var done = false
    while (!done) {
      val code = readCode(if (prev < 0) 9 else lzwWidth(nextCode + 1))
      if (code == 257) done = true
      else if (code == 256) { nextCode = 258; prev = -1 }
      else if (prev < 0) {
        require(code < 256, s"LZW: first code after clear must be literal, got $code")
        emit(code); prev = code
      } else {
        require(code <= nextCode && nextCode < 4096, s"LZW: code $code out of range")
        if (code < nextCode) {
          val first = emit(code)
          prefix(nextCode) = prev; append(nextCode) = first.toByte; nextCode += 1
        } else { // KwKwK: string(prev) + first(string(prev))
          var f = prev
          while (f >= 256) f = prefix(f)
          prefix(nextCode) = prev; append(nextCode) = f.toByte; nextCode += 1
          emit(code)
        }
        prev = code
      }
    }
    require(outLen == maxOut,
      s"LZW block decoded to $outLen bytes, expected $maxOut")
    out
  }

  /** Encode one block with TIFF-6 LZW (the synth-writer half — mm3/mm4
    * pattern: the spec proves decode against this plus a hand-derived
    * code-stream vector, so encoder and decoder cannot share a mirrored
    * width bug).
    */
  private[graft] def lzwEncode(in: Array[Byte]): Array[Byte] = {
    val bits = new java.io.ByteArrayOutputStream(in.length)
    var acc = 0L
    var accBits = 0
    def write(code: Int, width: Int): Unit = {
      acc = (acc << width) | code
      accBits += width
      while (accBits >= 8) {
        bits.write(((acc >> (accBits - 8)) & 0xff).toInt)
        accBits -= 8
      }
    }
    // string table: (prefixCode << 8 | byte) -> code
    var table = new java.util.HashMap[Integer, Integer](8192)
    var nextCode = 258
    write(256, 9)
    var omega = -1
    var i = 0
    while (i < in.length) {
      val c = in(i) & 0xff
      if (omega < 0) omega = c
      else {
        val key = Integer.valueOf((omega << 8) | c)
        val hit = table.get(key)
        if (hit != null) omega = hit.intValue()
        else {
          write(omega, lzwWidth(nextCode))
          table.put(key, Integer.valueOf(nextCode)); nextCode += 1
          omega = c
          if (nextCode == 4094) {
            write(256, lzwWidth(nextCode)) // clear before the table fills
            table = new java.util.HashMap[Integer, Integer](8192)
            nextCode = 258
          }
        }
      }
      i += 1
    }
    if (omega >= 0) write(omega, lzwWidth(nextCode))
    write(257, lzwWidth(nextCode + 1))
    if (accBits > 0) bits.write(((acc << (8 - accBits)) & 0xff).toInt)
    bits.toByteArray
  }

  // ---- Deflate (259 = 8, zlib streams per the Adobe Deflate note —
  // GDAL's COMPRESSION=DEFLATE) and PackBits (259 = 32773, the TIFF-6
  // byte-RLE every scanner writes) ----

  private[graft] def inflateBlock(in: Array[Byte], maxOut: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(in)
    val out = new Array[Byte](maxOut)
    var got = 0
    while (got < maxOut && !inf.finished()) {
      val n = inf.inflate(out, got, maxOut - got)
      // zero progress means truncation, a preset-dictionary (FDICT)
      // stream, or any other stall — fail loudly instead of spinning
      if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
        throw new IllegalArgumentException(
          if (inf.needsDictionary()) "deflate block requires a preset dictionary (unsupported)"
          else "truncated deflate block")
      got += n
    }
    inf.end()
    require(got == maxOut, s"deflate block inflates to $got bytes, expected $maxOut")
    out
  }

  private[graft] def deflateBlock(in: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(in); d.finish()
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
    d.end()
    buf.toByteArray
  }

  /** TIFF-6 PackBits: header n in 0..127 → n+1 literal bytes follow;
    * n in -1..-127 → the next byte repeats 1-n times; -128 is a no-op.
    */
  private[graft] def packBitsDecode(in: Array[Byte], maxOut: Int): Array[Byte] = {
    val out = new Array[Byte](maxOut)
    var i = 0; var o = 0
    while (o < maxOut) {
      require(i < in.length, "truncated PackBits block")
      val n = in(i); i += 1
      if (n >= 0) {
        require(i + n + 1 <= in.length && o + n + 1 <= maxOut, "PackBits literal overrun")
        System.arraycopy(in, i, out, o, n + 1)
        i += n + 1; o += n + 1
      } else if (n != -128) {
        require(i < in.length && o + (1 - n) <= maxOut, "PackBits run overrun")
        java.util.Arrays.fill(out, o, o + 1 - n, in(i))
        i += 1; o += 1 - n
      }
    }
    out
  }

  private[graft] def packBitsEncode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    def repeatAt(k: Int): Int = {
      var r = 1
      while (k + r < in.length && r < 128 && in(k + r) == in(k)) r += 1
      r
    }
    while (i < in.length) {
      val run = repeatAt(i)
      if (run >= 2) {
        out.write(1 - run) // -(run-1): repeats 1-(1-run) = run times
        out.write(in(i))
        i += run
      } else {
        var j = i + 1
        while (j < in.length && j - i < 128 && repeatAt(j) < 3) j += 1
        out.write(j - i - 1)
        out.write(in, i, j - i)
        i = j
      }
    }
    out.toByteArray
  }

  // ---- TIFF TechNote 3 floating-point predictor (317 = 3) ----
  //
  // The common write profile for float32 GeoTIFFs (GDAL `PREDICTOR=3`):
  // per block row, each sample's 4 bytes are split into significance
  // planes (all MSBs first, ... , all LSBs last — BIG-endian significance
  // order regardless of the file's byte order), then the whole row is
  // byte-wise forward-differenced before LZW. Undoing is the reverse:
  // cumulative byte sums, then plane gather back into per-sample BE
  // bytes — which is already the bridge's buffer order, so predictor-3
  // blocks skip the LE swap.

  private def fpPredictorUndo(buf: Array[Byte], samplesPerRow: Int): Unit = {
    val rowBytes = 4 * samplesPerRow
    require(buf.length % rowBytes == 0,
      s"predictor-3 block of ${buf.length} bytes is not whole rows of $rowBytes")
    var r0 = 0
    while (r0 < buf.length) {
      var i = r0 + 1
      while (i < r0 + rowBytes) { buf(i) = (buf(i) + buf(i - 1)).toByte; i += 1 }
      val tmp = java.util.Arrays.copyOfRange(buf, r0, r0 + rowBytes)
      var s = 0
      while (s < samplesPerRow) {
        var k = 0
        while (k < 4) { buf(r0 + 4 * s + k) = tmp(k * samplesPerRow + s); k += 1 }
        s += 1
      }
      r0 += rowBytes
    }
  }

  /** The encode half: `raw` holds float32 samples in FILE byte order;
    * output is plane-split, forward-differenced rows ready for LZW.
    */
  private def fpPredictorApply(raw: Array[Byte], samplesPerRow: Int,
      fileLE: Boolean): Array[Byte] = {
    val rowBytes = 4 * samplesPerRow
    val out = new Array[Byte](raw.length)
    var r0 = 0
    while (r0 < raw.length) {
      var s = 0
      while (s < samplesPerRow) {
        var k = 0
        while (k < 4) {
          // byte k of the BE representation of sample s
          val src = r0 + 4 * s + (if (fileLE) 3 - k else k)
          out(r0 + k * samplesPerRow + s) = raw(src)
          k += 1
        }
        s += 1
      }
      var i = r0 + rowBytes - 1
      while (i > r0) { out(i) = (out(i) - out(i - 1)).toByte; i -= 1 }
      r0 += rowBytes
    }
    out
  }

  // ---- TIFF 6.0 predictor 2 (integer horizontal differencing) ----
  //
  // The common write profile for INTEGER rasters (GDAL `PREDICTOR=2` —
  // the reference's stage-1 OUTPUT profile: int32 + LZW,
  // pixel_classifier_stream.py:77-83): per block row, each sample value
  // is stored as the difference from the sample one PIXEL to the left of
  // the same channel (stride = SamplesPerPixel for chunky data),
  // arithmetic mod 2^bits on the native-width sample in the file's byte
  // order. Undo = cumulative sums left to right.

  private def readIntN(b: Array[Byte], off: Int, bps: Int, le: Boolean): Int = bps match {
    case 1 => b(off) & 0xff
    case 2 =>
      if (le) (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
      else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    case _ =>
      if (le) (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
      else ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  }

  private def writeIntN(b: Array[Byte], off: Int, bps: Int, le: Boolean, v: Int): Unit = {
    var k = 0
    while (k < bps) {
      val shift = 8 * (if (le) k else bps - 1 - k)
      b(off + k) = ((v >>> shift) & 0xff).toByte
      k += 1
    }
  }

  /** Undo horizontal differencing in place on native-width integer
    * samples. `stride` is the channel count for chunky data (each channel
    * differences independently), 1 for planar/single-band.
    */
  private def intPredictorUndo(buf: Array[Byte], bps: Int,
      samplesPerRow: Int, stride: Int, le: Boolean): Unit = {
    val rowBytes = bps * samplesPerRow
    require(buf.length % rowBytes == 0,
      s"predictor-2 block of ${buf.length} bytes is not whole rows of $rowBytes")
    var r0 = 0
    while (r0 < buf.length) {
      var i = stride
      while (i < samplesPerRow) {
        val prev = readIntN(buf, r0 + bps * (i - stride), bps, le)
        val cur = readIntN(buf, r0 + bps * i, bps, le)
        writeIntN(buf, r0 + bps * i, bps, le, prev + cur) // wraps mod 2^bits
        i += 1
      }
      r0 += rowBytes
    }
  }

  /** The encode half: forward-difference native-width integer samples. */
  private def intPredictorApply(buf: Array[Byte], bps: Int,
      samplesPerRow: Int, stride: Int, le: Boolean): Unit = {
    val rowBytes = bps * samplesPerRow
    var r0 = 0
    while (r0 < buf.length) {
      var i = samplesPerRow - 1
      while (i >= stride) {
        val prev = readIntN(buf, r0 + bps * (i - stride), bps, le)
        val cur = readIntN(buf, r0 + bps * i, bps, le)
        writeIntN(buf, r0 + bps * i, bps, le, cur - prev)
        i -= 1
      }
      r0 += rowBytes
    }
  }

  /** Integer samples → the bridge's big-endian float32 plane. Exact for
    * |v| <= 2^24 (the reference's int32 class labels are tiny); larger
    * magnitudes round to the nearest float32 like any float cast.
    */
  private def intToFloatBE(buf: Array[Byte], bps: Int, le: Boolean,
      signed: Boolean): Array[Byte] = {
    val n = buf.length / bps
    val out = new Array[Byte](4 * n)
    var i = 0
    while (i < n) {
      val raw = readIntN(buf, i * bps, bps, le)
      val v: Float =
        if (signed) bps match {
          case 1 => raw.toByte.toFloat
          case 2 => raw.toShort.toFloat
          case _ => raw.toFloat
        } else bps match {
          case 1 => raw.toFloat // readIntN already masked to 0..255
          case 2 => raw.toFloat // 0..65535
          case _ => (raw.toLong & 0xffffffffL).toFloat
        }
      val bits = java.lang.Float.floatToIntBits(v)
      out(4 * i) = (bits >>> 24).toByte
      out(4 * i + 1) = (bits >>> 16).toByte
      out(4 * i + 2) = (bits >>> 8).toByte
      out(4 * i + 3) = bits.toByte
      i += 1
    }
    out
  }

  /** Decode a float32 tiled/stripped TIFF or BigTIFF — uncompressed or
    * LZW — into block rows shaped for [[RasterBridge.explodeBlocks]]:
    * (tile_y, tile_x, block_h, block_w, blob) with the blob byte-swapped
    * to big-endian (the bridge's buffer order) when the file is
    * little-endian. Tiles are emitted at FULL tile size (TIFF pads edge
    * tiles; pad cells carry whatever the writer put there — nodata by
    * convention, which explodeBlocks drops). Strips are clipped by the
    * spec, so the last strip's block_h shrinks.
    */
  def blocksOf(bytes: Array[Byte]): Seq[(Int, Int, Int, Int, Array[Byte])] = {
    val spp = parse(bytes).flatMap(_.intVal(277)).getOrElse(1L)
    // fail CLOSED: silently decoding a multi-band file here would
    // interleave every band's samples into one plane
    require(spp == 1L,
      s"blocksOf is single-band; file has SamplesPerPixel=$spp — use bandBlocksOf")
    bandBlocksOf(bytes).map { case (_, ty, tx, bh, bw, blob) => (ty, tx, bh, bw, blob) }
  }

  /** Multi-band block decode: (band, tile_y, tile_x, block_h, block_w,
    * blob) with each blob a SINGLE band's float32 plane in the bridge's
    * big-endian order. Handles both sample layouts the spec defines —
    * PlanarConfiguration=1 (chunky: bands interleaved per pixel inside
    * each block, de-interleaved here) and 2 (planar: the offset/count
    * arrays carry SamplesPerPixel × blocks-per-plane entries, plane-
    * major). Anything else fails closed. Reference shape: the 7-band
    * float32 feature stack (feature_stacking.py:219-251) read band-wise
    * (:114-115,150; image_segmentation.py:37,137).
    */
  def bandBlocksOf(bytes: Array[Byte]): Seq[(Int, Int, Int, Int, Int, Array[Byte])] = {
    val p = parse(bytes).getOrElse(
      throw new IllegalArgumentException("not a TIFF/BigTIFF"))
    val compression = p.intVal(259).getOrElse(1L)
    require(compression == 1L || compression == 5L || compression == 8L ||
        compression == 32773L || compression == 7L,
      s"only uncompressed (1), JPEG (7), LZW (5), Deflate (8), or PackBits " +
        s"(32773) TIFF blocks decode, got $compression")
    val predictor = p.intVal(317).getOrElse(1L).toInt
    // BitsPerSample/SampleFormat have count=SamplesPerPixel: EVERY element
    // must agree (a mixed-type file would silently misdecode). Spec
    // defaults when the tags are absent: bits=1, format=1 (unsigned int).
    val bitsSeq = p.longArray(258).map(_.toSeq).getOrElse(Seq(1L))
    val fmtSeq = p.longArray(339).map(_.toSeq).getOrElse(Seq(1L))
    require(bitsSeq.distinct.size == 1 && fmtSeq.distinct.size == 1,
      s"mixed per-band sample types unsupported (bits=$bitsSeq, fmt=$fmtSeq)")
    val bits = bitsSeq.head.toInt
    val fmt = fmtSeq.head.toInt
    val isFloat = fmt == 3
    require(
      (isFloat && bits == 32) ||
        ((fmt == 1 || fmt == 2) && (bits == 8 || bits == 16 || bits == 32)),
      s"unsupported sample type SampleFormat=$fmt/BitsPerSample=$bits " +
        "(float32, or signed/unsigned int8/16/32)")
    val bps = bits / 8
    // predictors pair with the dictionary codecs (LZW/Deflate — GDAL
    // writes PREDICTOR with both); PackBits is raw byte RLE, no predictor
    val dictCodec = compression == 5L || compression == 8L
    require(predictor == 1 ||
        (predictor == 3 && dictCodec && isFloat) ||
        (predictor == 2 && dictCodec && !isFloat),
      s"Predictor $predictor unsupported (none (1); horizontal-difference (2) " +
        "with LZW/Deflate on integer samples; floating-point (3) with LZW/Deflate on float32)")
    val spp = p.intVal(277).map(_.toInt).getOrElse(1)
    val planar = p.intVal(284).map(_.toInt).getOrElse(1)
    require(spp >= 1, s"bad SamplesPerPixel $spp")
    require(planar == 1 || planar == 2,
      s"PlanarConfiguration must be chunky (1) or planar (2), got $planar")
    // New-style JPEG-in-TIFF (compression 7, TIFF Tech Note 2 — the
    // profile real aerial-imagery GeoTIFF archives ship): each strip/tile
    // is a complete (possibly table-less "abbreviated") JPEG stream; the
    // optional JPEGTables tag (347) carries shared DQT/DHT segments as an
    // SOI..EOI datastream spliced ahead of every block's own segments.
    // Bands surface the STORED sample space (Y for photometric 1, raw
    // Y/Cb/Cr components for photometric 6 — same contract as every other
    // compression here: the reader never color-converts). Old-style
    // compression 6 stays rejected (deprecated, no JPEGTables semantics).
    val jpegTables: Option[Array[Byte]] =
      if (compression == 7L) {
        require(bits == 8 && fmt == 1,
          s"JPEG-in-TIFF is 8-bit unsigned (got bits=$bits fmt=$fmt)")
        require(planar == 1, "JPEG-in-TIFF blocks are pixel-interleaved " +
          s"(PlanarConfiguration 1), got $planar")
        val t = p.rawBytes(347)
        t.foreach { tb =>
          require(tb.length >= 4 &&
              (tb(0) & 0xff) == 0xff && (tb(1) & 0xff) == 0xd8 &&
              (tb(tb.length - 2) & 0xff) == 0xff && (tb(tb.length - 1) & 0xff) == 0xd9,
            "JPEGTables must be an SOI..EOI table datastream (Tech Note 2)")
        }
        t
      } else None
    def reqTag(tag: Int): Long = p.intVal(tag).getOrElse(
      throw new IllegalArgumentException(s"missing required TIFF tag $tag"))
    val width = reqTag(256).toInt
    val height = reqTag(257).toInt
    require(width > 0 && height > 0 && width <= (1 << 20) && height <= (1 << 20),
      s"implausible TIFF geometry ${width}x$height")
    val tiled = p.entries.contains(322)
    val offsets = p.longArray(if (tiled) 324 else 273).getOrElse(
      throw new IllegalArgumentException("missing block offsets tag"))
    val counts = p.longArray(if (tiled) 325 else 279).getOrElse(
      throw new IllegalArgumentException("missing block byte-counts tag"))
    require(offsets.length == counts.length, "offset/count arrays disagree")

    /** Decode one JPEG block: splice JPEGTables ahead of the block's own
      * segments (both open with SOI; the tables stream's EOI is dropped —
      * a block re-specifying a table id overrides, plain T.81 semantics),
      * then crop the decoded MCU-padded image to the block geometry.
      * Output is interleaved uint8 samples, exactly what the generic
      * integer path expects.
      */
    def jpegBlock(stored: Array[Byte], bw: Int, bh: Int, ch: Int): Array[Byte] = {
      require(stored.length >= 2 &&
          (stored(0) & 0xff) == 0xff && (stored(1) & 0xff) == 0xd8,
        "JPEG-in-TIFF block does not start with SOI")
      val merged = jpegTables match {
        case Some(tb) =>
          val m = new Array[Byte](tb.length - 2 + stored.length - 2)
          System.arraycopy(tb, 0, m, 0, tb.length - 2) // SOI + tables
          System.arraycopy(stored, 2, m, tb.length - 2, stored.length - 2)
          m
        case None => stored
      }
      val (jw, jh, jch, px) = Jpeg.decodeJpegPixels(merged)
      require(jch == ch,
        s"JPEG block has $jch components, file declares SamplesPerPixel=$ch")
      require(jw >= bw && jh >= bh,
        s"JPEG block ${jw}x$jh smaller than its ${bw}x$bh grid cell")
      if (jw == bw && jh == bh) px
      else { // writer padded the stream to MCU multiples: crop row-wise
        val out = new Array[Byte](bw * bh * ch)
        var y = 0
        while (y < bh) {
          System.arraycopy(px, y * jw * ch, out, y * bw * ch, bw * ch)
          y += 1
        }
        out
      }
    }

    def slice(off: Long, len: Long, nSamples: Int, samplesPerRow: Int,
        stride: Int): Array[Byte] = {
      require(off >= 0 && len >= 0 && off + len <= bytes.length,
        s"block at $off+$len beyond EOF ${bytes.length}")
      val rawLen = bps * nSamples
      val stored = java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)
      val out =
        if (compression == 7L)
          jpegBlock(stored, samplesPerRow / stride, nSamples / samplesPerRow, stride)
        else if (compression == 5L) lzwDecode(stored, rawLen)
        else if (compression == 8L) inflateBlock(stored, rawLen)
        else if (compression == 32773L) packBitsDecode(stored, rawLen)
        else { require(stored.length == rawLen,
          s"block byte count ${stored.length} != $rawLen"); stored }
      if (!isFloat) {
        if (predictor == 2) intPredictorUndo(out, bps, samplesPerRow, stride, p.le)
        intToFloatBE(out, bps, p.le, signed = fmt == 2)
      } else if (predictor == 3) {
        // plane gather yields BIG-endian sample bytes directly (TechNote 3
        // significance order is endianness-independent) — no swap after
        fpPredictorUndo(out, samplesPerRow)
        out
      } else {
        if (p.le) { // swap each float32 word to the bridge's big-endian order
          var i = 0
          while (i + 3 < out.length) {
            val b0 = out(i); val b1 = out(i + 1)
            out(i) = out(i + 3); out(i + 1) = out(i + 2)
            out(i + 2) = b1; out(i + 3) = b0
            i += 4
          }
        }
        out
      }
    }

    // spatial geometry: (tile_y, tile_x, rows, cols) for plane-block i
    val (nSpatial, geom): (Int, Int => (Int, Int, Int, Int)) =
      if (tiled) {
        val tw = reqTag(322).toInt
        val th = reqTag(323).toInt
        require(tw > 0 && th > 0 && tw <= (1 << 16) && th <= (1 << 16),
          s"implausible tile geometry ${tw}x$th")
        val across = (width + tw - 1) / tw
        val down = (height + th - 1) / th
        (across * down, i => (i / across, i % across, th, tw))
      } else {
        val rps = p.intVal(278).map(_.toInt).getOrElse(height)
        val n = (height + rps - 1) / rps
        (n, i => (i, 0, math.min(rps, height - i * rps), width))
      }
    val expected = if (planar == 2) spp * nSpatial else nSpatial
    require(offsets.length == expected,
      s"offset array has ${offsets.length} entries, layout needs $expected")

    if (planar == 2) {
      // plane-major: all of band 0's blocks, then band 1's, ...
      (0 until spp).flatMap { band =>
        (0 until nSpatial).map { i =>
          val (ty, tx, bh, bw) = geom(i)
          val k = band * nSpatial + i
          (band, ty, tx, bh, bw, slice(offsets(k), counts(k), bw * bh, bw, 1))
        }
      }
    } else if (spp == 1) {
      (0 until nSpatial).map { i =>
        val (ty, tx, bh, bw) = geom(i)
        (0, ty, tx, bh, bw, slice(offsets(i), counts(i), bw * bh, bw, 1))
      }
    } else {
      // chunky: each block holds bh*bw pixels × spp interleaved samples;
      // de-interleave into one contiguous plane per band (each float is
      // already big-endian after slice, so copy whole 4-byte words)
      (0 until nSpatial).flatMap { i =>
        val (ty, tx, bh, bw) = geom(i)
        val mixed = slice(offsets(i), counts(i), bw * bh * spp, bw * spp, spp)
        (0 until spp).map { band =>
          val plane = new Array[Byte](4 * bw * bh)
          var px = 0
          while (px < bw * bh) {
            System.arraycopy(mixed, 4 * (px * spp + band), plane, 4 * px, 4)
            px += 1
          }
          (band, ty, tx, bh, bw, plane)
        }
      }
    }
  }

  /** Partition-mapped header decode over a TIFF binary column — the mm5
    * surface (same shape as [[MultimodalOps.withDecodedMeta]]).
    */
  def withTiffMeta(media: DataFrame, bytesCol: String = "bytes"): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields :+ StructField("tiff_meta", metaSchema))
    val bytesIdx = media.schema.fieldIndex(bytesCol)
    val rdd = media.rdd.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ decodeMeta(r.getAs[Array[Byte]](bytesIdx))))
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** TIFF binary column → block rows (pass-through columns preserved,
    * bytes column replaced by tile_y/tile_x/block_h/block_w/blob).
    * Generator shape: flatMap, zero shuffle; compose with
    * [[RasterBridge.explodeBlocks]] for pixel rows — together these are
    * the reference's windowed `src.read(window)` loop as a plan.
    */
  def tiffToBlocks(media: DataFrame, bytesCol: String = "bytes"): DataFrame =
    MediaExplode.explode(media, bytesCol, BlockFields) { payload =>
      blocksOf(payload).iterator.map { case (ty, tx, bh, bw, blob) =>
        Seq[Any](ty, tx, bh, bw, blob)
      }
    }

  /** The (tile_y, tile_x, block_h, block_w, blob) suffix the block
    * bridges emit.
    */
  private[operators] val BlockFields: Seq[StructField] = Seq(
    StructField("tile_y", IntegerType, nullable = false),
    StructField("tile_x", IntegerType, nullable = false),
    StructField("block_h", IntegerType, nullable = false),
    StructField("block_w", IntegerType, nullable = false),
    StructField("blob", BinaryType, nullable = false))

  /** Multi-band twin of [[tiffToBlocks]]: adds a `band` column, decodes
    * both planar configurations via [[bandBlocksOf]]. The band column is
    * an ordinary pass-through for [[RasterBridge.explodeBlocks]], so
    * per-band pixel tables come out of the same bridge plan.
    */
  def tiffToBandBlocks(media: DataFrame, bytesCol: String = "bytes"): DataFrame =
    MediaExplode.explode(media, bytesCol,
      StructField("band", IntegerType, nullable = false) +: BlockFields) { payload =>
      bandBlocksOf(payload).iterator.map { case (band, ty, tx, bh, bw, blob) =>
        Seq[Any](band, ty, tx, bh, bw, blob)
      }
    }

  // ---- synth writer (the encode half, for tests/oracles — mm3 pattern) ----

  private final class Writer(size: Int, le: Boolean, big: Boolean) {
    val buf: java.nio.ByteBuffer = java.nio.ByteBuffer.allocate(size)
      .order(if (le) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
    /** One IFD entry. Value semantics follow the inline rule: the caller
      * passes either the inline value or the external payload offset —
      * whichever the type×count size dictates for this container.
      */
    def entry(tag: Int, typ: Int, count: Int, value: Long): Unit = {
      buf.putShort(tag.toShort).putShort(typ.toShort)
      if (big) buf.putLong(count.toLong) else buf.putInt(count)
      val fieldEnd = buf.position() + (if (big) 8 else 4)
      val typeSize = typ match {
        case 1 | 7 => 1 // BYTE / UNDEFINED (JPEGTables)
        case 3 => 2 // SHORT
        case 4 => 4 // LONG
        case 12 | 16 => 8 // DOUBLE / LONG8
        case _ => 4
      }
      if (typeSize.toLong * count > (if (big) 8 else 4)) {
        // external payload: the field holds an offset at the CONTAINER's
        // offset width (8 bytes in BigTIFF — the decoder reads it as u64,
        // so a left-justified 4-byte write would decode as offset<<32 on
        // big-endian files)
        if (big) buf.putLong(value) else buf.putInt(value.toInt)
      } else typ match { // inline: natural width, left-justified in the field
        case 3 if count == 1 => buf.putShort(value.toShort)
        case 16 => buf.putLong(value)
        case _ => buf.putInt(value.toInt)
      }
      while (buf.position() < fieldEnd) buf.put(0.toByte) // left-justified pad
    }
    /** SHORT-array entry (BitsPerSample/SampleFormat with count =
      * SamplesPerPixel): inline when the elements fit the value field
      * (the spec's inline rule is mandatory), else `extOff` points at the
      * externally-written array.
      */
    def entryShorts(tag: Int, values: Seq[Int], extOff: Long): Unit = {
      buf.putShort(tag.toShort).putShort(3.toShort)
      if (big) buf.putLong(values.length.toLong) else buf.putInt(values.length)
      val fieldEnd = buf.position() + (if (big) 8 else 4)
      if (2 * values.length <= (if (big) 8 else 4))
        values.foreach(v => buf.putShort(v.toShort))
      else if (big) buf.putLong(extOff)
      else buf.putInt(extOff.toInt)
      while (buf.position() < fieldEnd) buf.put(0.toByte)
    }
  }

  /** Distributed GeoTIFF raster sink — the composed WRITE half of the
    * reference's stage-0/1 contract, which this engine could until now
    * only read (feature_stacking.py:226-249 writes the feature stack as a
    * tiled, LZW-compressed BigTIFF block by block;
    * pixel_classifier_stream.py:76-87 writes the int32 label raster with
    * nodata −1). One `.tif` per `sceneCol` value under `dir`, assembled
    * ON THE EXECUTORS from [[RasterBridge.packBlocks]]-shaped block rows
    * via the [[KeyedFileSink]] pattern: scenes hash-shuffle across the
    * cluster, each task serializes its scenes locally, nothing rides the
    * driver. A scene is one unsplittable container, so one scene's
    * blocks are the per-task memory floor — exactly the
    * [[GeoPackage.writeLayerFiles]] doctrine; a 100 TB corpus
    * parallelizes by scene.
    *
    * Input schema: `sceneCol` [, `band`], `tile_y`, `tile_x`, `block_h`,
    * `block_w`, `blob` — each blob a float32 BIG-endian plane (the
    * bridge's buffer order). Optional constant-per-scene columns:
    *   - `origin_x`/`origin_y`/`px_w`/`px_h` → GeoTIFF
    *     ModelPixelScale + ModelTiepoint tags (the `GridDef` pair);
    *   - `width`/`height` → exact raster extent (edge tiles pad with
    *     `nodata`, spec behavior); absent → the tight full-block extent.
    * Missing blocks (sparse scenes) and missing band planes fill with
    * `nodata`. Integer profiles (`sampleFormat` 1|2) round the float
    * pipeline values — exact for the label-raster case (IDs ≤ 2^24);
    * `nodata` must then itself be integral.
    *
    * The container round-trips bit-exactly: [[tiffToBandBlocks]] ∘
    * writeGeoTiffFiles ≡ the input blocks (TiffSpec matrix + the s20
    * oracle prove the container invisible across the profile matrix —
    * LZW/Deflate/PackBits/uncompressed, BigTIFF, chunky/planar,
    * predictors, both endiannesses).
    */
  def writeGeoTiffFiles(
      blocks: DataFrame,
      dir: String,
      sceneCol: String,
      littleEndian: Boolean = true,
      compressionCode: Int = 5, // LZW — the reference's write profile
      bigTiff: Boolean = true, //   ... and BIGTIFF='YES'
      planarConfig: Int = 1,
      predictor: Int = 1,
      sampleBits: Int = 32,
      sampleFormat: Int = 3,
      nodata: Float = Float.NaN): Unit = {
    // Normalize numeric column types up front: the per-row readers below
    // use positional getDouble/getInt, so a caller supplying e.g. an
    // IntegerType origin_x or a LongType width would otherwise die in a
    // raw ClassCastException instead of this sink's descriptive errors.
    // Non-numeric drift (a string width) rejects loudly here.
    val doubleCols = Seq("origin_x", "origin_y", "px_w", "px_h")
    val intCols = Seq("band", "tile_y", "tile_x", "block_h", "block_w",
      "width", "height")
    val normalized = blocks.columns.foldLeft(blocks) { (df, c) =>
      val want =
        if (doubleCols.contains(c)) Some(DoubleType)
        else if (intCols.contains(c)) Some(IntegerType)
        else None
      want match {
        case Some(t) if df.schema(c).dataType == t => df
        case Some(t) =>
          require(df.schema(c).dataType.isInstanceOf[NumericType],
            s"column $c must be numeric for the GeoTIFF sink, got " +
              df.schema(c).dataType.simpleString)
          df.withColumn(c, col(c).cast(t))
        case None => df
      }
    }
    writeGeoTiffFilesTyped(normalized, dir, sceneCol, littleEndian,
      compressionCode, bigTiff, planarConfig, predictor, sampleBits,
      sampleFormat, nodata)
  }

  private def writeGeoTiffFilesTyped(
      blocks: DataFrame,
      dir: String,
      sceneCol: String,
      littleEndian: Boolean,
      compressionCode: Int,
      bigTiff: Boolean,
      planarConfig: Int,
      predictor: Int,
      sampleBits: Int,
      sampleFormat: Int,
      nodata: Float): Unit = {
    val schema = blocks.schema
    def idxOpt(n: String): Option[Int] =
      if (schema.fieldNames.contains(n)) Some(schema.fieldIndex(n)) else None
    val bandIdx = idxOpt("band")
    val tyIdx = schema.fieldIndex("tile_y")
    val txIdx = schema.fieldIndex("tile_x")
    val bhIdx = schema.fieldIndex("block_h")
    val bwIdx = schema.fieldIndex("block_w")
    val blobIdx = schema.fieldIndex("blob")
    val geoIdx = Seq("origin_x", "origin_y", "px_w", "px_h").map(idxOpt)
    require(geoIdx.forall(_.isDefined) || geoIdx.forall(_.isEmpty),
      "georeferencing columns must appear all together (origin_x, origin_y, px_w, px_h)")
    val whIdx = Seq("width", "height").map(idxOpt)
    require(whIdx.forall(_.isDefined) || whIdx.forall(_.isEmpty),
      "extent columns must appear together (width, height)")
    val isFloat = sampleFormat == 3
    if (!isFloat) require(nodata == math.rint(nodata),
      s"integer sample format needs an integral nodata, got $nodata")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    KeyedFileSink.foreachKeyRun(blocks, sceneCol) { (key, rows) =>
      require(rows.nonEmpty, s"scene '$key' has no blocks")
      // the file stem IS the scene id on re-ingest (readGeoTiffFiles) —
      // a key that sanitization would rename cannot round-trip, so it
      // fails closed instead of silently re-keying the corpus
      require(KeyedFileSink.safeName(key) == key,
        s"scene '$key' is not filesystem-safe ([A-Za-z0-9_.-]) — the stem is " +
          "the scene id on read-back; rename the scene column before writing")
      val blockH = rows.head.getInt(bhIdx)
      val blockW = rows.head.getInt(bwIdx)
      val plane = new scala.collection.mutable.HashMap[(Int, Int, Int), Array[Byte]]
      var maxBand = 0; var maxTy = 0; var maxTx = 0
      rows.foreach { r =>
        val band = bandIdx.map(r.getInt).getOrElse(0)
        val ty = r.getInt(tyIdx); val tx = r.getInt(txIdx)
        require(ty >= 0 && tx >= 0 && band >= 0,
          s"scene '$key': negative tile/band index ($band,$ty,$tx) — a raster origin is (0,0)")
        require(r.getInt(bhIdx) == blockH && r.getInt(bwIdx) == blockW,
          s"scene '$key': mixed block geometry (${r.getInt(bhIdx)}x${r.getInt(bwIdx)} vs ${blockH}x$blockW)")
        val blob = r.getAs[Array[Byte]](blobIdx)
        require(blob.length == 4 * blockH * blockW,
          s"scene '$key': blob length ${blob.length} != 4*$blockH*$blockW")
        require(plane.put((band, ty, tx), blob).isEmpty,
          s"scene '$key': duplicate block ($band,$ty,$tx)")
        maxBand = math.max(maxBand, band); maxTy = math.max(maxTy, ty); maxTx = math.max(maxTx, tx)
      }
      def constCol(i: Int, name: String): Double = {
        val vs = rows.map(_.getDouble(i)).distinct
        require(vs.size == 1, s"scene '$key': $name varies within the scene: $vs")
        vs.head
      }
      val grid = if (geoIdx.head.isDefined) Some(Regrid.GridDef(
        constCol(geoIdx(0).get, "origin_x"), constCol(geoIdx(1).get, "origin_y"),
        constCol(geoIdx(2).get, "px_w"), constCol(geoIdx(3).get, "px_h"))) else None
      def constInt(i: Int, name: String): Int = {
        val vs = rows.map(_.getInt(i)).distinct
        require(vs.size == 1, s"scene '$key': $name varies within the scene: $vs")
        vs.head
      }
      val width = whIdx.head.map(constInt(_, "width")).getOrElse((maxTx + 1) * blockW)
      val height = whIdx(1).map(constInt(_, "height")).getOrElse((maxTy + 1) * blockH)
      require(width > maxTx * blockW && height > maxTy * blockH,
        s"scene '$key': extent ${width}x$height does not reach tile ($maxTy,$maxTx)")
      def valueAt(b: Int, gr: Int, gc: Int): Float =
        plane.get((b, gr / blockH, gc / blockW)) match {
          case Some(blob) =>
            val off = 4 * ((gr % blockH) * blockW + (gc % blockW))
            java.lang.Float.intBitsToFloat(
              ((blob(off) & 0xff) << 24) | ((blob(off + 1) & 0xff) << 16) |
                ((blob(off + 2) & 0xff) << 8) | (blob(off + 3) & 0xff))
          case None => nodata
        }
      val tif = synthMultibandTiff(width, height, blockW, blockH,
        littleEndian, tile = true, bands = maxBand + 1, planarConfig, grid,
        pad = nodata, lzw = false, bigTiff = bigTiff, predictor = predictor,
        sampleBits = sampleBits, sampleFormat = sampleFormat,
        intValues = if (isFloat) null
          else (b: Int, r: Int, c: Int) => math.rint(valueAt(b, r, c).toDouble).toLong,
        intPad = math.rint(nodata.toDouble).toLong,
        compressionCode = compressionCode)(
        if (isFloat) (b, r, c) => valueAt(b, r, c) else (_, _, _) => 0f)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"${KeyedFileSink.safeName(key)}.tif"), tif)
    }
  }

  /** Directory of per-scene `.tif` files → band-block rows (scene from
    * the file stem, then [[tiffToBandBlocks]]'s band/tile/blob columns) —
    * the matching source, one task per file.
    */
  def readGeoTiffFiles(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, regexp_extract}
    // glob resolved driver-side (Fs.resolveGlob) — a literal glob path
    // trips FileStreamSink's metadata probe and its WARN stack per load
    val tifPaths = Fs.resolveGlob(spark, path + "/*.tif")
    require(tifPaths.nonEmpty, s"no .tif files under $path")
    tiffToBandBlocks(
      spark.read.format("binaryFile").load(tifPaths: _*)
        .select(regexp_extract(col("path"), "([^/]+)\\.tif$", 1).as("scene"),
          col("content")),
      bytesCol = "content")
  }

  /** Minimal valid float32 TIFF bytes. `tile` picks tiled (true) vs
    * stripped (false) layout; `grid` adds the GeoTIFF ModelPixelScale/
    * ModelTiepoint pair; `lzw` compresses each block with TIFF-6 LZW;
    * `bigTiff` writes the BigTIFF container (magic 43, 8-byte offsets —
    * the reference's `bigtiff='YES'`). Edge tiles are padded with `pad`;
    * edge strips are clipped (spec behavior on both counts).
    * `values(row, col)` fills the raster.
    */
  def synthTiff(
      width: Int, height: Int,
      blockW: Int, blockH: Int,
      littleEndian: Boolean,
      tile: Boolean,
      grid: Option[Regrid.GridDef] = None,
      pad: Float = Float.NaN,
      lzw: Boolean = false,
      bigTiff: Boolean = false,
      predictor: Int = 1)(values: (Int, Int) => Float): Array[Byte] =
    synthMultibandTiff(width, height, blockW, blockH, littleEndian, tile,
      bands = 1, planarConfig = 1, grid, pad, lzw, bigTiff, predictor)(
      (_, r, c) => values(r, c))

  /** Multi-band float32 TIFF bytes — the reference's central artifact
    * shape (the 7-band stacked BigTIFF, feature_stacking.py:219-251).
    * `planarConfig` 1 writes chunky (samples interleaved per pixel),
    * 2 writes planar (one plane per band, plane-major offset arrays);
    * `values(band, row, col)` fills the raster. Single-band output is
    * byte-identical to the classic [[synthTiff]] (no PlanarConfiguration
    * tag, scalar BitsPerSample/SampleFormat).
    */
  def synthMultibandTiff(
      width: Int, height: Int,
      blockW: Int, blockH: Int,
      littleEndian: Boolean,
      tile: Boolean,
      bands: Int,
      planarConfig: Int = 1,
      grid: Option[Regrid.GridDef] = None,
      pad: Float = Float.NaN,
      lzw: Boolean = false,
      bigTiff: Boolean = false,
      predictor: Int = 1,
      sampleBits: Int = 32,
      sampleFormat: Int = 3,
      intValues: (Int, Int, Int) => Long = null,
      intPad: Long = 0L,
      compressionCode: Int = -1)(values: (Int, Int, Int) => Float): Array[Byte] = {
    require(width > 0 && height > 0 && blockW > 0 && blockH > 0, "bad geometry")
    require(tile || blockW == width, "strips span the full width")
    require(bands >= 1, s"bad band count $bands")
    require(planarConfig == 1 || planarConfig == 2, s"bad PlanarConfiguration $planarConfig")
    // compressionCode overrides the legacy lzw flag: 1 none, 5 LZW,
    // 8 Deflate (zlib), 32773 PackBits
    val comp = if (compressionCode >= 0) compressionCode else if (lzw) 5 else 1
    require(Set(1, 5, 8, 32773)(comp), s"unsupported compression code $comp")
    require(compressionCode < 0 || !lzw || compressionCode == 5,
      "conflicting lzw flag and compressionCode")
    val isFloat = sampleFormat == 3
    require(
      (isFloat && sampleBits == 32) ||
        ((sampleFormat == 1 || sampleFormat == 2) &&
          (sampleBits == 8 || sampleBits == 16 || sampleBits == 32)),
      s"unsupported sample type SampleFormat=$sampleFormat/BitsPerSample=$sampleBits")
    require(isFloat == (intValues == null),
      "pass intValues exactly when SampleFormat is integer (1|2)")
    val dictCodec = comp == 5 || comp == 8
    require(predictor == 1 || (predictor == 3 && dictCodec && isFloat) ||
        (predictor == 2 && dictCodec && !isFloat),
      s"predictor $predictor unsupported (none; horizontal-difference (2) with " +
        "LZW/Deflate on integer samples; floating-point (3) with LZW/Deflate on float32)")
    val bps = sampleBits / 8
    val across = if (tile) (width + blockW - 1) / blockW else 1
    val down = (height + blockH - 1) / blockH
    val nSpatial = across * down
    val planar = planarConfig == 2 && bands > 1
    val n = if (planar) bands * nSpatial else nSpatial // offset-array entries
    val order =
      if (littleEndian) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN

    def rowsOf(i: Int): Int = {
      val ty = if (tile) i / across else i
      if (tile) blockH else math.min(blockH, height - ty * blockH)
    }
    // raw (then optionally compressed) bytes per block, in file byte order.
    // chunky: one block per spatial cell, samples interleaved per pixel;
    // planar: plane-major — band b's spatial block i sits at b*nSpatial+i.
    val blocks: IndexedSeq[Array[Byte]] = (0 until n).map { k =>
      val (band, i) = if (planar) (k / nSpatial, k % nSpatial) else (0, k)
      val (ty, tx) = if (tile) (i / across, i % across) else (i, 0)
      val rows = rowsOf(i)
      val sampPerPx = if (planar) 1 else bands
      val raw = java.nio.ByteBuffer.allocate(bps * rows * blockW * sampPerPx).order(order)
      def putInt(v: Long): Unit = bps match {
        case 1 => raw.put(v.toByte)
        case 2 => raw.putShort(v.toShort)
        case _ => raw.putInt(v.toInt)
      }
      def putSample(b: Int, gr: Int, gc: Int, in: Boolean): Unit =
        if (isFloat) raw.putFloat(if (in) values(b, gr, gc) else pad)
        else putInt(if (in) intValues(b, gr, gc) else intPad)
      for (lr <- 0 until rows; lc <- 0 until blockW) {
        val gr = ty * blockH + lr; val gc = tx * blockW + lc
        val in = gr < height && gc < width
        if (planar) putSample(band, gr, gc, in)
        else for (s <- 0 until bands) putSample(s, gr, gc, in)
      }
      val samplesPerRow = if (planar) blockW else blockW * bands
      val pre =
        if (predictor == 3)
          fpPredictorApply(raw.array(), samplesPerRow, littleEndian)
        else {
          if (predictor == 2)
            intPredictorApply(raw.array(), bps, samplesPerRow,
              if (planar) 1 else bands, littleEndian)
          raw.array()
        }
      comp match {
        case 5 => lzwEncode(pre)
        case 8 => deflateBlock(pre)
        case 32773 => packBitsEncode(pre)
        case _ => pre
      }
    }
    val blockBytes = blocks.map(_.length)

    val headerSize = if (bigTiff) 16 else 8
    val entrySize = if (bigTiff) 20 else 12
    val countSize = if (bigTiff) 8 else 2
    val arrElem = if (bigTiff) 8 else 4 // offset/count arrays: LONG8 vs LONG
    val arrTyp = if (bigTiff) 16 else 4
    val inlineCap = if (bigTiff) 8 else 4
    val arraysInline = arrElem * n <= inlineCap // n == 1: values live in the field
    val shortsInline = 2 * bands <= inlineCap // BitsPerSample/SampleFormat arrays

    val nEntries = (if (tile) 11 else 10) + (if (grid.isDefined) 2 else 0) +
      (if (bands > 1) 1 else 0) + // 284 written only for multi-band
      (if (predictor != 1) 1 else 0) // 317 written only when predicting
    val ifdSize = countSize + entrySize * nEntries + (if (bigTiff) 8 else 4)
    val extOff = headerSize + ifdSize
    val offArrOff = extOff
    val cntArrOff = offArrOff + (if (arraysInline) 0 else arrElem * n)
    val bitsArrOff = cntArrOff + (if (arraysInline) 0 else arrElem * n)
    val fmtArrOff = bitsArrOff + (if (shortsInline) 0 else 2 * bands)
    val scaleOff = fmtArrOff + (if (shortsInline) 0 else 2 * bands)
    val tieOff = scaleOff + (if (grid.isDefined) 24 else 0)
    val dataOff = tieOff + (if (grid.isDefined) 48 else 0)
    val total = dataOff + blockBytes.sum
    val offs = blockBytes.scanLeft(dataOff)(_ + _)

    val w = new Writer(total, littleEndian, bigTiff)
    val b = w.buf
    b.put((if (littleEndian) "II" else "MM").getBytes("US-ASCII"))
    if (bigTiff) b.putShort(43).putShort(8).putShort(0).putLong(16L)
    else b.putShort(42).putInt(8)
    // IFD (tags ascending, as the spec requires)
    if (bigTiff) b.putLong(nEntries.toLong) else b.putShort(nEntries.toShort)
    def offsetsEntry(tag: Int): Unit =
      w.entry(tag, arrTyp, n, if (arraysInline) offs(0).toLong else offArrOff.toLong)
    def countsEntry(tag: Int): Unit =
      w.entry(tag, arrTyp, n, if (arraysInline) blockBytes(0).toLong else cntArrOff.toLong)
    w.entry(256, 4, 1, width)
    w.entry(257, 4, 1, height)
    if (bands == 1) w.entry(258, 3, 1, sampleBits)
    else w.entryShorts(258, Seq.fill(bands)(sampleBits), bitsArrOff)
    w.entry(259, 3, 1, comp)
    w.entry(262, 3, 1, 1)
    if (!tile) offsetsEntry(273)
    w.entry(277, 3, 1, bands)
    if (!tile) {
      w.entry(278, 4, 1, blockH)
      countsEntry(279)
    }
    if (bands > 1) w.entry(284, 3, 1, planarConfig)
    if (predictor != 1) w.entry(317, 3, 1, predictor)
    if (tile) {
      w.entry(322, 3, 1, blockW)
      w.entry(323, 3, 1, blockH)
      offsetsEntry(324)
      countsEntry(325)
    }
    if (bands == 1) w.entry(339, 3, 1, sampleFormat)
    else w.entryShorts(339, Seq.fill(bands)(sampleFormat), fmtArrOff)
    grid.foreach { _ =>
      w.entry(33550, 12, 3, scaleOff)
      w.entry(33922, 12, 6, tieOff)
    }
    if (bigTiff) b.putLong(0L) else b.putInt(0) // next-IFD terminator

    if (!arraysInline) {
      offs.dropRight(1).foreach(o => if (bigTiff) b.putLong(o.toLong) else b.putInt(o))
      blockBytes.foreach(c => if (bigTiff) b.putLong(c.toLong) else b.putInt(c))
    }
    if (!shortsInline) {
      for (_ <- 0 until bands) b.putShort(sampleBits.toShort)
      for (_ <- 0 until bands) b.putShort(sampleFormat.toShort)
    }
    grid.foreach { g =>
      b.putDouble(g.pxW).putDouble(g.pxH).putDouble(0.0)
      // tiepoint: raster (0,0,0) pins world (originX, originY, 0)
      b.putDouble(0.0).putDouble(0.0).putDouble(0.0)
      b.putDouble(g.originX).putDouble(g.originY).putDouble(0.0)
    }
    blocks.foreach(b.put)
    b.array()
  }

  /** Minimal classic-TIFF container around per-strip JPEG streams
    * (compression 7, TIFF Tech Note 2 — the profile real aerial-imagery
    * GeoTIFF archives ship). `stripJpeg(i)` supplies strip i's FULL JPEG
    * stream ([[Jpeg.synthJpeg]] output, tables included); with
    * `useJpegTables` the DQT/DHT segments split out into tag 347 and the
    * strips store abbreviated streams — all strips must then agree on
    * their tables (fails closed on divergence: a strip's own overriding
    * tables are legal to READ but ambiguous to dedupe on write).
    * Photometric derives from the channel count: 1 (BlackIsZero) for one
    * sample, 6 (YCbCr) for three — the stored components, no conversion.
    */
  def synthJpegTiff(
      width: Int, height: Int, spp: Int, rowsPerStrip: Int,
      littleEndian: Boolean = true,
      useJpegTables: Boolean = true)(stripJpeg: Int => Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && rowsPerStrip > 0, "bad geometry")
    require(spp == 1 || spp == 3, s"JPEG-in-TIFF writes 1 or 3 samples, got $spp")
    val nStrips = (height + rowsPerStrip - 1) / rowsPerStrip
    val full = (0 until nStrips).map(stripJpeg)
    val (tablesOpt, blocks) =
      if (useJpegTables) {
        val split = full.map(Jpeg.splitTables)
        val tabs = split.map(_._1)
        require(tabs.forall(t => java.util.Arrays.equals(t, tabs.head)),
          "strips disagree on their table segments; cannot share JPEGTables")
        (Some(tabs.head), split.map(_._2))
      } else (None, full)
    val n = nStrips
    val arraysInline = 4 * n <= 4
    val shortsInline = 2 * spp <= 4
    val nEntries = 10 + (if (spp > 1) 1 else 0) + tablesOpt.size
    val ifdSize = 2 + 12 * nEntries + 4
    val extOff = 8 + ifdSize
    val offArrOff = extOff
    val cntArrOff = offArrOff + (if (arraysInline) 0 else 4 * n)
    val bitsArrOff = cntArrOff + (if (arraysInline) 0 else 4 * n)
    val fmtArrOff = bitsArrOff + (if (shortsInline) 0 else 2 * spp)
    val tabOff = fmtArrOff + (if (shortsInline) 0 else 2 * spp)
    val dataOff = tabOff + tablesOpt.map(_.length).getOrElse(0)
    val blockBytes = blocks.map(_.length)
    val total = dataOff + blockBytes.sum
    val offs = blockBytes.scanLeft(dataOff)(_ + _)
    val w = new Writer(total, littleEndian, big = false)
    val b = w.buf
    b.put((if (littleEndian) "II" else "MM").getBytes("US-ASCII"))
    b.putShort(42).putInt(8)
    b.putShort(nEntries.toShort)
    w.entry(256, 4, 1, width)
    w.entry(257, 4, 1, height)
    if (spp == 1) w.entry(258, 3, 1, 8)
    else w.entryShorts(258, Seq.fill(spp)(8), bitsArrOff)
    w.entry(259, 3, 1, 7)
    w.entry(262, 3, 1, if (spp == 3) 6 else 1)
    w.entry(273, 4, n, if (arraysInline) offs(0).toLong else offArrOff.toLong)
    w.entry(277, 3, 1, spp)
    w.entry(278, 4, 1, rowsPerStrip)
    w.entry(279, 4, n, if (arraysInline) blockBytes(0).toLong else cntArrOff.toLong)
    if (spp > 1) w.entry(284, 3, 1, 1)
    if (spp == 1) w.entry(339, 3, 1, 1)
    else w.entryShorts(339, Seq.fill(spp)(1), fmtArrOff)
    tablesOpt.foreach(tb => w.entry(347, 7, tb.length, tabOff.toLong))
    b.putInt(0) // next-IFD terminator
    if (!arraysInline) {
      offs.dropRight(1).foreach(o => b.putInt(o))
      blockBytes.foreach(c => b.putInt(c))
    }
    if (!shortsInline) {
      for (_ <- 0 until spp) b.putShort(8.toShort)
      for (_ <- 0 until spp) b.putShort(1.toShort)
    }
    tablesOpt.foreach(tb => b.put(tb))
    blocks.foreach(blk => b.put(blk))
    b.array()
  }
}
