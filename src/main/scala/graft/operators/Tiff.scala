package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Baseline TIFF / GeoTIFF header + block codec — the one format the
  * reference actually reads and writes (feature_stacking.py:75-98 opens
  * every scene/auxiliary raster as a (Big)TIFF; :226-249 writes the
  * stacked output `tiled=True, blockxsize=1024, blockysize=1024`). The
  * engine's raster model is the pixel table; this codec closes the gap so
  * reference-shaped artifacts can be INGESTED: a TIFF binary column →
  * `tiffToBlocks` → (tile_y, tile_x, blob) block rows →
  * [[RasterBridge.explodeBlocks]] → pixel rows.
  *
  * Scope: classic TIFF (magic 42), both byte orders, single-image IFD,
  * uncompressed tiled or stripped layout, any SampleFormat for the header
  * surface, float32 for block decode (the reference's dtype at
  * feature_stacking.py:234). Compressed TIFFs parse their HEADER fine
  * (compression is reported) but block decode fails closed. GeoTIFF
  * georeferencing is read from ModelPixelScale (33550) + ModelTiepoint
  * (33922) — exactly the north-up affine the reference's `transform`
  * carries — and surfaces as a [[Regrid.GridDef]].
  *
  * Everything is implemented from the public TIFF 6.0 layout: no codec
  * libraries, pure byte arithmetic, safe for executor-side `mapPartitions`
  * (the decode is per-row work; no shuffle, no driver state).
  */
object Tiff {

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("sample_format", IntegerType),
    StructField("compression", IntegerType),
    StructField("tiled", BooleanType),
    StructField("block_w", IntegerType),
    StructField("block_h", IntegerType),
    StructField("n_blocks", IntegerType),
    StructField("byte_order", StringType),
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
    def f64(off: Int): Double = {
      var bits = 0L
      var i = 0
      while (i < 8) {
        val byte = b(off + (if (le) i else 7 - i)) & 0xffL
        bits |= byte << (8 * i)
        i += 1
      }
      java.lang.Double.longBitsToDouble(bits)
    }
  }

  /** One parsed IFD entry's scalar or array value (SHORT/LONG/DOUBLE). */
  private final case class Entry(tag: Int, typ: Int, count: Long, valOff: Int)

  private final case class Parsed(
      r: Reader, le: Boolean, entries: Map[Int, Entry], bytes: Array[Byte]) {

    private def typeSize(t: Int): Int = t match {
      case 1 | 2 | 6 | 7 => 1 // BYTE/ASCII/SBYTE/UNDEFINED
      case 3 | 8 => 2 // SHORT/SSHORT
      case 4 | 9 | 11 => 4 // LONG/SLONG/FLOAT
      case 5 | 10 | 12 => 8 // RATIONAL/SRATIONAL/DOUBLE
      case _ => 0
    }

    /** Where the entry's payload lives: inline when it fits in 4 bytes. */
    private def payloadOff(e: Entry): Int = {
      val sz = typeSize(e.typ) * e.count
      if (sz <= 4) e.valOff else r.u32(e.valOff).toInt
    }

    def intVal(tag: Int): Option[Long] = entries.get(tag).map { e =>
      val off = payloadOff(e)
      e.typ match {
        case 3 => r.u16(off).toLong
        case 4 => r.u32(off)
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
          case t => throw new IllegalArgumentException(s"tag $tag: unexpected type $t")
        }
      }
    }

    def doubleArray(tag: Int): Option[Array[Double]] = entries.get(tag).map { e =>
      val off = payloadOff(e)
      Array.tabulate(e.count.toInt)(i => r.f64(off + i * 8))
    }
  }

  /** Parse header + first IFD. Returns None when the payload is not a
    * classic TIFF (fail-closed — consumers branch on parse success).
    */
  private def parse(bytes: Array[Byte]): Option[Parsed] = {
    if (bytes == null || bytes.length < 8) return None
    val le = bytes(0) == 'I'.toByte && bytes(1) == 'I'.toByte
    val be = bytes(0) == 'M'.toByte && bytes(1) == 'M'.toByte
    if (!le && !be) return None
    val r = new Reader(bytes, le)
    if (r.u16(2) != 42) return None
    val ifdOff = r.u32(4).toInt
    if (ifdOff < 8 || ifdOff + 2 > bytes.length) return None
    val n = r.u16(ifdOff)
    if (ifdOff + 2 + 12 * n > bytes.length) return None
    val entries = (0 until n).map { i =>
      val eo = ifdOff + 2 + 12 * i
      val e = Entry(r.u16(eo), r.u16(eo + 2), r.u32(eo + 4), eo + 8)
      e.tag -> e
    }.toMap
    Some(Parsed(r, le, entries, bytes))
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
        Row(width, height, bits, sampleFormat, compression, tiled, bw, bh,
          nBlocks, if (p.le) "LE" else "BE", pxW, pxH, ox, oy)
      } catch { case _: Exception => null }
  }

  /** GeoTIFF georeferencing as the engine's grid definition (None when the
    * file carries no ModelPixelScale/ModelTiepoint pair).
    */
  def gridDefOf(bytes: Array[Byte]): Option[Regrid.GridDef] = {
    val m = decodeMeta(bytes)
    if (m == null || m.isNullAt(10) || m.isNullAt(12)) None
    else Some(Regrid.GridDef(m.getDouble(12), m.getDouble(13),
      m.getDouble(10), m.getDouble(11)))
  }

  /** Decode an uncompressed float32 tiled/stripped TIFF into block rows
    * shaped for [[RasterBridge.explodeBlocks]]: (tile_y, tile_x, block_h,
    * block_w, blob) with the blob byte-swapped to big-endian (the bridge's
    * buffer order) when the file is little-endian. Tiles are emitted at
    * FULL tile size (TIFF pads edge tiles; pad cells carry whatever the
    * writer put there — nodata by convention, which explodeBlocks drops).
    * Strips are clipped by the spec, so the last strip's block_h shrinks.
    */
  def blocksOf(bytes: Array[Byte]): Seq[(Int, Int, Int, Int, Array[Byte])] = {
    val p = parse(bytes).getOrElse(
      throw new IllegalArgumentException("not a classic TIFF"))
    require(p.intVal(259).forall(_ == 1L), "only uncompressed TIFF blocks decode")
    require(p.intVal(258).forall(_ == 32L) && p.intVal(339).forall(_ == 3L),
      "block decode expects float32 samples (BitsPerSample=32, SampleFormat=3)")
    val width = p.intVal(256).get.toInt
    val height = p.intVal(257).get.toInt
    val tiled = p.entries.contains(322)
    val offsets = p.longArray(if (tiled) 324 else 273).get
    val counts = p.longArray(if (tiled) 325 else 279).get
    require(offsets.length == counts.length, "offset/count arrays disagree")

    def slice(off: Long, len: Long): Array[Byte] = {
      require(off + len <= bytes.length, s"block at $off+$len beyond EOF ${bytes.length}")
      val out = java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)
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

    if (tiled) {
      val tw = p.intVal(322).get.toInt
      val th = p.intVal(323).get.toInt
      val across = (width + tw - 1) / tw
      offsets.indices.map { i =>
        require(counts(i) == 4L * tw * th, s"tile $i byte count ${counts(i)} != ${4 * tw * th}")
        (i / across, i % across, th, tw, slice(offsets(i), counts(i)))
      }
    } else {
      val rps = p.intVal(278).map(_.toInt).getOrElse(height)
      offsets.indices.map { i =>
        val rows = math.min(rps, height - i * rps)
        require(counts(i) == 4L * width * rows,
          s"strip $i byte count ${counts(i)} != ${4 * width * rows}")
        (i, 0, rows, width, slice(offsets(i), counts(i)))
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
  def tiffToBlocks(media: DataFrame, bytesCol: String = "bytes"): DataFrame = {
    val spark = media.sparkSession
    val passFields = media.schema.fields.filterNot(_.name == bytesCol)
    val passIdx = passFields.map(f => media.schema.fieldIndex(f.name))
    val bytesIdx = media.schema.fieldIndex(bytesCol)
    val outSchema = StructType(passFields.toSeq ++ Seq(
      StructField("tile_y", IntegerType, nullable = false),
      StructField("tile_x", IntegerType, nullable = false),
      StructField("block_h", IntegerType, nullable = false),
      StructField("block_w", IntegerType, nullable = false),
      StructField("blob", BinaryType, nullable = false)))
    val rdd = media.rdd.flatMap { r =>
      val pass = passIdx.map(r.get).toSeq
      blocksOf(r.getAs[Array[Byte]](bytesIdx)).map { case (ty, tx, bh, bw, blob) =>
        Row.fromSeq(pass ++ Seq(ty, tx, bh, bw, blob))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ---- synth writer (the encode half, for tests/oracles — mm3 pattern) ----

  private final class Writer(size: Int, le: Boolean) {
    val buf: java.nio.ByteBuffer = java.nio.ByteBuffer.allocate(size)
      .order(if (le) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
    def entry(tag: Int, typ: Int, count: Int, value: Long): Unit = {
      buf.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      typ match {
        case 3 if count == 1 => buf.putShort(value.toShort).putShort(0.toShort)
        case _ => buf.putInt(value.toInt)
      }
    }
  }

  /** Minimal valid uncompressed float32 TIFF bytes. `tile` picks tiled
    * (true) vs stripped (false) layout; `grid` adds the GeoTIFF
    * ModelPixelScale/ModelTiepoint pair. Edge tiles are padded with
    * `pad`; edge strips are clipped (spec behavior on both counts).
    * `values(row, col)` fills the raster.
    */
  def synthTiff(
      width: Int, height: Int,
      blockW: Int, blockH: Int,
      littleEndian: Boolean,
      tile: Boolean,
      grid: Option[Regrid.GridDef] = None,
      pad: Float = Float.NaN)(values: (Int, Int) => Float): Array[Byte] = {
    require(width > 0 && height > 0 && blockW > 0 && blockH > 0, "bad geometry")
    require(tile || blockW == width, "strips span the full width")
    val across = if (tile) (width + blockW - 1) / blockW else 1
    val down = (height + blockH - 1) / blockH
    val n = across * down
    val blockBytes: Seq[Int] =
      if (tile) Seq.fill(n)(4 * blockW * blockH)
      else (0 until n).map(i => 4 * width * math.min(blockH, height - i * blockH))

    val nEntries = (if (tile) 11 else 10) + (if (grid.isDefined) 2 else 0)
    val ifdSize = 2 + 12 * nEntries + 4
    val extOff = 8 + ifdSize
    val offArrOff = extOff
    val cntArrOff = offArrOff + 4 * n
    val scaleOff = cntArrOff + 4 * n
    val tieOff = scaleOff + (if (grid.isDefined) 24 else 0)
    val dataOff = tieOff + (if (grid.isDefined) 48 else 0)
    val total = dataOff + blockBytes.sum

    val w = new Writer(total, littleEndian)
    val b = w.buf
    b.put((if (littleEndian) "II" else "MM").getBytes("US-ASCII"))
    b.putShort(42).putInt(8)
    // IFD (tags ascending, as the spec requires)
    b.putShort(nEntries.toShort)
    w.entry(256, 4, 1, width)
    w.entry(257, 4, 1, height)
    w.entry(258, 3, 1, 32)
    w.entry(259, 3, 1, 1)
    w.entry(262, 3, 1, 1)
    if (!tile) w.entry(273, 4, n, offArrOff)
    w.entry(277, 3, 1, 1)
    if (!tile) {
      w.entry(278, 4, 1, blockH)
      w.entry(279, 4, n, cntArrOff)
    }
    if (tile) {
      w.entry(322, 3, 1, blockW)
      w.entry(323, 3, 1, blockH)
      w.entry(324, 4, n, offArrOff)
      w.entry(325, 4, n, cntArrOff)
    }
    w.entry(339, 3, 1, 3)
    grid.foreach { _ =>
      w.entry(33550, 12, 3, scaleOff)
      w.entry(33922, 12, 6, tieOff)
    }
    b.putInt(0) // next-IFD terminator

    val offs = blockBytes.scanLeft(dataOff)(_ + _)
    offs.dropRight(1).foreach(o => b.putInt(o))
    blockBytes.foreach(c => b.putInt(c))
    grid.foreach { g =>
      b.putDouble(g.pxW).putDouble(g.pxH).putDouble(0.0)
      // tiepoint: raster (0,0,0) pins world (originX, originY, 0)
      b.putDouble(0.0).putDouble(0.0).putDouble(0.0)
      b.putDouble(g.originX).putDouble(g.originY).putDouble(0.0)
    }
    for (i <- 0 until n) {
      val (ty, tx) = if (tile) (i / across, i % across) else (i, 0)
      val rows = if (tile) blockH else math.min(blockH, height - i * blockH)
      for (lr <- 0 until rows; lc <- 0 until blockW) {
        val gr = ty * blockH + lr; val gc = tx * blockW + lc
        b.putFloat(if (gr < height && gc < width) values(gr, gc) else pad)
      }
    }
    b.array()
  }
}
