package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** NPY / NPZ tensor codec — the array interchange format ML pipelines
  * stage features and embeddings in (an `.npz` bundle IS a zip of `.npy`
  * members, so the container half is [[Zip]]). The reference stages its
  * feature stack through in-memory numpy arrays (feature_stacking.py:
  * 105-135); at corpus scale the same tensors arrive as files, and this
  * codec makes them a first-class binary-column source: one task per
  * file, generator-shaped explode, zero shuffle.
  *
  * Implemented from the public NumPy format spec: `\x93NUMPY`, version
  * bytes, LE header length (2-byte v1.0 / 4-byte v2.0+, both read —
  * r11), then a Python dict literal `{'descr': '<f4', 'fortran_order':
  * False, 'shape': (3, 4), }` padded to 64-byte alignment, then the raw
  * little-endian buffer. Supported descrs: `|u1 |i1 <u2 <i2 <u4 <i4 <i8
  * <f4 <f8`; fortran_order=True decodes with a TRANSPOSE on read (r11 —
  * scipy/legacy dumps ship column-major; elements surface in C order
  * either way, so the layout is invisible to consumers). Fail-closed
  * doctrine: big-endian data, object/string dtypes, shape/buffer
  * disagreement, and unparseable header dicts all reject descriptively —
  * a tensor store must never silently misread numbers.
  */
object Npy {

  private val Magic: Array[Byte] =
    Array(0x93.toByte, 'N'.toByte, 'U'.toByte, 'M'.toByte, 'P'.toByte, 'Y'.toByte)

  /** One decoded tensor: exactly one of `longs` (integer descrs, widened
    * to Long) / `doubles` (float descrs, widened to Double) is non-null.
    */
  final case class Tensor(descr: String, shape: Seq[Int],
                          longs: Array[Long], doubles: Array[Double]) {
    def nElems: Long = shape.foldLeft(1L)(_ * _)
  }

  private def elemSize(descr: String): Int = descr match {
    case "|u1" | "|i1" => 1
    case "<u2" | "<i2" => 2
    case "<u4" | "<i4" | "<f4" => 4
    case "<i8" | "<f8" => 8
    case other => throw new IllegalArgumentException(
      s"unsupported npy descr '$other' — only |u1 |i1 <u2 <i2 <u4 <i4 <i8 <f4 <f8 " +
        "(little-endian numeric) are supported; big-endian/object/string dtypes fail closed")
  }

  private val DescrRe = """'descr'\s*:\s*'([^']*)'""".r
  private val OrderRe = """'fortran_order'\s*:\s*(True|False)""".r
  private val ShapeRe = """'shape'\s*:\s*\(([^)]*)\)""".r

  /** C-order index → fortran (column-major) buffer index, for the
    * transpose-on-read of fortran_order tensors (first axis fastest).
    */
  private def fortranMap(shape: Seq[Int], n: Int): Array[Int] = {
    val k = shape.length
    val fs = new Array[Long](k)
    var acc = 1L
    var j = 0
    while (j < k) { fs(j) = acc; acc *= shape(j); j += 1 }
    val idx = new Array[Int](n)
    val coords = new Array[Int](k)
    var i = 0
    while (i < n) {
      var f = 0L
      j = 0
      while (j < k) { f += coords(j).toLong * fs(j); j += 1 }
      idx(i) = f.toInt
      var a = k - 1 // increment C-order coords, last axis fastest
      var carrying = true
      while (a >= 0 && carrying) {
        coords(a) += 1
        if (coords(a) == shape(a)) { coords(a) = 0; a -= 1 } else carrying = false
      }
      i += 1
    }
    idx
  }

  /** Parse one `.npy` payload → [[Tensor]]. */
  def npyTensor(bytes: Array[Byte]): Tensor = {
    require(bytes != null && bytes.length >= 10, "not an npy file (shorter than the fixed header)")
    require((0 until 6).forall(i => bytes(i) == Magic(i)),
      "bad npy magic (expected \\x93NUMPY)")
    val (major, minor) = (bytes(6) & 0xff, bytes(7) & 0xff)
    require(major >= 1 && major <= 3,
      s"npy format version $major.$minor unsupported (v1-v3 only)")
    // v1: 2-byte LE header length at 8; v2/v3: 4-byte LE at 8
    val (hlen, hdrAt) =
      if (major == 1) (((bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)).toLong, 10)
      else {
        require(bytes.length >= 12, "npy v2+ header length field truncated")
        ((bytes(8) & 0xffL) | ((bytes(9) & 0xffL) << 8) |
          ((bytes(10) & 0xffL) << 16) | ((bytes(11) & 0xffL) << 24), 12)
      }
    require(hlen <= (1 << 20), s"implausible npy header length $hlen")
    require(hdrAt + hlen <= bytes.length, s"npy header ($hlen bytes) overruns the file")
    val header = new String(bytes, hdrAt, hlen.toInt, "US-ASCII")
    val descr = DescrRe.findFirstMatchIn(header).map(_.group(1)).getOrElse(
      throw new IllegalArgumentException(s"npy header has no parseable 'descr': $header"))
    val fortranStr = OrderRe.findFirstMatchIn(header).map(_.group(1)).getOrElse(
      throw new IllegalArgumentException(s"npy header has no parseable 'fortran_order': $header"))
    val fortran = fortranStr == "True"
    val shapeBody = ShapeRe.findFirstMatchIn(header).map(_.group(1)).getOrElse(
      throw new IllegalArgumentException(s"npy header has no parseable 'shape': $header"))
    val shape: Seq[Int] = shapeBody.split(',').map(_.trim).filter(_.nonEmpty).toSeq.map { t =>
      val v = try t.toLong catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"non-integer npy shape component '$t'")
      }
      require(v >= 0 && v <= Int.MaxValue, s"npy shape component $v out of range")
      v.toInt
    }
    val esz = elemSize(descr)
    val n = shape.foldLeft(1L)(_ * _)
    require(n <= Int.MaxValue / 8, s"npy tensor too large ($n elements)")
    val dataOff = hdrAt.toLong + hlen
    require(dataOff + n * esz == bytes.length,
      s"npy buffer length ${bytes.length - dataOff} disagrees with shape " +
        s"${shape.mkString("(", ",", ")")} x $esz-byte '$descr' (${n * esz} bytes)")
    val bb = java.nio.ByteBuffer.wrap(bytes, dataOff.toInt, (n * esz).toInt)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // fortran_order: the buffer is column-major — surface C order anyway
    // (transpose on read), so downstream elem_idx semantics never change
    val fmap = if (fortran && shape.length > 1) fortranMap(shape, n.toInt) else null
    def permuteD(a: Array[Double]): Array[Double] =
      if (fmap == null) a
      else { val o = new Array[Double](a.length)
        var i = 0; while (i < a.length) { o(i) = a(fmap(i)); i += 1 }; o }
    def permuteL(a: Array[Long]): Array[Long] =
      if (fmap == null) a
      else { val o = new Array[Long](a.length)
        var i = 0; while (i < a.length) { o(i) = a(fmap(i)); i += 1 }; o }
    descr match {
      case "<f4" =>
        val a = new Array[Double](n.toInt)
        var i = 0; while (i < a.length) { a(i) = bb.getFloat().toDouble; i += 1 }
        Tensor(descr, shape, null, permuteD(a))
      case "<f8" =>
        val a = new Array[Double](n.toInt)
        var i = 0; while (i < a.length) { a(i) = bb.getDouble(); i += 1 }
        Tensor(descr, shape, null, permuteD(a))
      case _ =>
        val a = new Array[Long](n.toInt)
        var i = 0
        descr match {
          case "|u1" => while (i < a.length) { a(i) = bb.get() & 0xffL; i += 1 }
          case "|i1" => while (i < a.length) { a(i) = bb.get().toLong; i += 1 }
          case "<u2" => while (i < a.length) { a(i) = bb.getShort() & 0xffffL; i += 1 }
          case "<i2" => while (i < a.length) { a(i) = bb.getShort().toLong; i += 1 }
          case "<u4" => while (i < a.length) { a(i) = bb.getInt() & 0xffffffffL; i += 1 }
          case "<i4" => while (i < a.length) { a(i) = bb.getInt().toLong; i += 1 }
          case "<i8" => while (i < a.length) { a(i) = bb.getLong(); i += 1 }
        }
        Tensor(descr, shape, permuteL(a), null)
    }
  }

  /** Encode one tensor → `.npy` bytes (header space-padded to the spec's
    * 64-byte alignment, newline-terminated — byte-deterministic).
    * Integer descrs take `longs` (range-checked, fail closed on
    * overflow); float descrs take `doubles` (`<f4` requires values that
    * survive the float round-trip exactly — a tensor STORE must not
    * silently lose precision). Values are ALWAYS given in C order;
    * `fortranOrder = true` permutes them into a column-major buffer (and
    * says so in the dict) — the read side transposes back, so the layout
    * choice round-trips to the identity. `version = 2` writes the v2.0
    * 4-byte header-length field.
    */
  def synthNpy(descr: String, shape: Seq[Int],
               longs: Array[Long] = null, doubles: Array[Double] = null,
               fortranOrder: Boolean = false, version: Int = 1): Array[Byte] = {
    require(version == 1 || version == 2, s"npy writer version $version (1 or 2)")
    val esz = elemSize(descr)
    val isFloat = descr == "<f4" || descr == "<f8"
    require(if (isFloat) doubles != null && longs == null else longs != null && doubles == null,
      s"descr '$descr' takes ${if (isFloat) "doubles" else "longs"}")
    val n = shape.foldLeft(1L)(_ * _)
    require(shape.forall(_ >= 0), s"negative shape component in ${shape.mkString(",")}")
    val have = if (isFloat) doubles.length else longs.length
    require(n == have, s"shape ${shape.mkString("(", ",", ")")} wants $n values, got $have")
    val dict = s"{'descr': '$descr', 'fortran_order': ${if (fortranOrder) "True" else "False"}, " +
      s"'shape': (${shape.mkString(", ")}${if (shape.length == 1) "," else ""}), }"
    val fixed = if (version == 1) 10 else 12
    val pad = (64 - (fixed + dict.length + 1) % 64) % 64
    val header = dict + (" " * pad) + "\n"
    // fail-closed write doctrine: a v1 header longer than the 2-byte
    // length field would silently wrap the stored length and emit a
    // corrupt file (ADVICE r11) — numpy itself auto-upgrades to v2 here;
    // we reject and let the caller ask for v2 explicitly
    require(version != 1 || header.length <= 0xffff,
      s"v1 npy header (${header.length} bytes) overflows the 2-byte length " +
        "field — write version 2")
    val out = java.nio.ByteBuffer.allocate(fixed + header.length + (n * esz).toInt)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(Magic).put(version.toByte).put(0.toByte)
    if (version == 1)
      out.put((header.length & 0xff).toByte).put(((header.length >> 8) & 0xff).toByte)
    else out.putInt(header.length)
    out.put(header.getBytes("US-ASCII"))
    def checked(v: Long, lo: Long, hi: Long): Long = {
      require(v >= lo && v <= hi, s"value $v out of range [$lo,$hi] for descr '$descr'")
      v
    }
    // C-order input index for buffer position k: with fortranOrder the
    // buffer is column-major, so buffer(k) = values(fmap⁻¹... — fmap maps
    // C index → fortran index; invert it once
    val order: Array[Int] =
      if (!fortranOrder || shape.length <= 1) null
      else {
        val fmap = fortranMap(shape, n.toInt)
        val inv = new Array[Int](n.toInt)
        var i = 0
        while (i < fmap.length) { inv(fmap(i)) = i; i += 1 }
        inv
      }
    @inline def lAt(k: Int): Long = longs(if (order == null) k else order(k))
    @inline def dAt(k: Int): Double = doubles(if (order == null) k else order(k))
    var k = 0
    while (k < n) {
      descr match {
        case "<f4" =>
          val v = dAt(k); val f = v.toFloat
          require(f.toDouble == v || (v.isNaN && f.isNaN),
            s"value $v is not exactly representable as float32 — refusing lossy write")
          out.putFloat(f)
        case "<f8" => out.putDouble(dAt(k))
        case "|u1" => out.put(checked(lAt(k), 0, 255).toByte)
        case "|i1" => out.put(checked(lAt(k), -128, 127).toByte)
        case "<u2" => out.putShort(checked(lAt(k), 0, 0xffff).toShort)
        case "<i2" => out.putShort(checked(lAt(k), Short.MinValue, Short.MaxValue).toShort)
        case "<u4" => out.putInt(checked(lAt(k), 0, 0xffffffffL).toInt)
        case "<i4" => out.putInt(checked(lAt(k), Int.MinValue, Int.MaxValue).toInt)
        case "<i8" => out.putLong(lAt(k))
      }
      k += 1
    }
    out.array()
  }

  private val tensorFields = Seq(
    StructField("dtype", StringType, nullable = false),
    StructField("shape", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("elem_idx", LongType, nullable = false),
    StructField("value_l", LongType, nullable = true),
    StructField("value_d", DoubleType, nullable = true))

  private def tensorRows(name: Option[String], t: Tensor): Iterator[Seq[Any]] = {
    val n = t.nElems.toInt
    val base = Iterator.range(0, n).map { i =>
      val (l, d): (Any, Any) =
        if (t.longs != null) (t.longs(i), null) else (null, t.doubles(i))
      Seq[Any](t.descr, t.shape, i.toLong, l, d)
    }
    name match {
      case Some(nm) => base.map(nm +: _)
      case None => base
    }
  }

  /** `.npy` binary column → one row per element (pass-through preserved):
    * dtype, shape, elem_idx (C order), value_l / value_d (exactly one
    * set, by descr class). Generator shape: one task per file.
    */
  def npyToValues(media: DataFrame, bytesCol: String = "bytes"): DataFrame =
    MediaExplode.explode(media, bytesCol, tensorFields)(p =>
      tensorRows(None, npyTensor(p)))

  /** `.npz` bundle binary column → one row per tensor element, with the
    * member name (minus `.npy`) as `tensor`. The zip walk and the npy
    * parses happen in ONE generator — a corpus of bundles parallelizes
    * by bundle, zero shuffle. Non-`.npy` members fail closed (an npz
    * must contain only arrays).
    */
  def npzToValues(media: DataFrame, bytesCol: String = "bytes"): DataFrame =
    MediaExplode.explode(media, bytesCol,
      StructField("tensor", StringType, nullable = false) +: tensorFields) { p =>
      Zip.zipEntries(p).iterator.flatMap { case (name, data) =>
        require(name.endsWith(".npy"),
          s"npz member '$name' is not an .npy array — fail closed")
        tensorRows(Some(name.dropRight(4)), npyTensor(data))
      }
    }
}
