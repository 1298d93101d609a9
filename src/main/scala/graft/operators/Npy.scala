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
  * Implemented from the public NumPy format spec (format version 1.0):
  * `\x93NUMPY`, version bytes, 2-byte LE header length, then a Python
  * dict literal `{'descr': '<f4', 'fortran_order': False, 'shape':
  * (3, 4), }` padded to 64-byte alignment, then the raw little-endian
  * buffer. Supported descrs: `|u1 |i1 <u2 <i2 <u4 <i4 <i8 <f4 <f8`.
  * Fail-closed doctrine: big-endian data, fortran order, object/string
  * dtypes, v2+ headers, shape/buffer disagreement, and unparseable
  * header dicts all reject descriptively — a tensor store must never
  * silently misread numbers.
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

  /** Parse one `.npy` payload → [[Tensor]]. */
  def npyTensor(bytes: Array[Byte]): Tensor = {
    require(bytes != null && bytes.length >= 10, "not an npy file (shorter than the fixed header)")
    require((0 until 6).forall(i => bytes(i) == Magic(i)),
      "bad npy magic (expected \\x93NUMPY)")
    val (major, minor) = (bytes(6) & 0xff, bytes(7) & 0xff)
    require(major == 1,
      s"npy format version $major.$minor unsupported (only 1.0; v2+ 4-byte headers fail closed)")
    val hlen = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    require(10L + hlen <= bytes.length, s"npy header ($hlen bytes) overruns the file")
    val header = new String(bytes, 10, hlen, "US-ASCII")
    val descr = DescrRe.findFirstMatchIn(header).map(_.group(1)).getOrElse(
      throw new IllegalArgumentException(s"npy header has no parseable 'descr': $header"))
    val fortran = OrderRe.findFirstMatchIn(header).map(_.group(1)).getOrElse(
      throw new IllegalArgumentException(s"npy header has no parseable 'fortran_order': $header"))
    require(fortran == "False",
      "fortran-order npy unsupported — a C-order reader must not silently transpose; fail closed")
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
    val dataOff = 10L + hlen
    require(dataOff + n * esz == bytes.length,
      s"npy buffer length ${bytes.length - dataOff} disagrees with shape " +
        s"${shape.mkString("(", ",", ")")} x $esz-byte '$descr' (${n * esz} bytes)")
    val bb = java.nio.ByteBuffer.wrap(bytes, dataOff.toInt, (n * esz).toInt)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    descr match {
      case "<f4" =>
        val a = new Array[Double](n.toInt)
        var i = 0; while (i < a.length) { a(i) = bb.getFloat().toDouble; i += 1 }
        Tensor(descr, shape, null, a)
      case "<f8" =>
        val a = new Array[Double](n.toInt)
        var i = 0; while (i < a.length) { a(i) = bb.getDouble(); i += 1 }
        Tensor(descr, shape, null, a)
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
        Tensor(descr, shape, a, null)
    }
  }

  /** Encode one tensor → `.npy` bytes (v1.0, header space-padded to the
    * spec's 64-byte alignment, newline-terminated — byte-deterministic).
    * Integer descrs take `longs` (range-checked, fail closed on
    * overflow); float descrs take `doubles` (`<f4` requires values that
    * survive the float round-trip exactly — a tensor STORE must not
    * silently lose precision).
    */
  def synthNpy(descr: String, shape: Seq[Int],
               longs: Array[Long] = null, doubles: Array[Double] = null): Array[Byte] = {
    val esz = elemSize(descr)
    val isFloat = descr == "<f4" || descr == "<f8"
    require(if (isFloat) doubles != null && longs == null else longs != null && doubles == null,
      s"descr '$descr' takes ${if (isFloat) "doubles" else "longs"}")
    val n = shape.foldLeft(1L)(_ * _)
    require(shape.forall(_ >= 0), s"negative shape component in ${shape.mkString(",")}")
    val have = if (isFloat) doubles.length else longs.length
    require(n == have, s"shape ${shape.mkString("(", ",", ")")} wants $n values, got $have")
    val dict = s"{'descr': '$descr', 'fortran_order': False, " +
      s"'shape': (${shape.mkString(", ")}${if (shape.length == 1) "," else ""}), }"
    val pad = (64 - (10 + dict.length + 1) % 64) % 64
    val header = dict + (" " * pad) + "\n"
    val out = java.nio.ByteBuffer.allocate(10 + header.length + (n * esz).toInt)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(Magic).put(1.toByte).put(0.toByte)
    out.put((header.length & 0xff).toByte).put(((header.length >> 8) & 0xff).toByte)
    out.put(header.getBytes("US-ASCII"))
    def checked(v: Long, lo: Long, hi: Long): Long = {
      require(v >= lo && v <= hi, s"value $v out of range [$lo,$hi] for descr '$descr'")
      v
    }
    descr match {
      case "<f4" => doubles.foreach { v =>
        val f = v.toFloat
        require(f.toDouble == v || (v.isNaN && f.isNaN),
          s"value $v is not exactly representable as float32 — refusing lossy write")
        out.putFloat(f)
      }
      case "<f8" => doubles.foreach(out.putDouble)
      case "|u1" => longs.foreach(v => out.put(checked(v, 0, 255).toByte))
      case "|i1" => longs.foreach(v => out.put(checked(v, -128, 127).toByte))
      case "<u2" => longs.foreach(v => out.putShort(checked(v, 0, 0xffff).toShort))
      case "<i2" => longs.foreach(v => out.putShort(checked(v, Short.MinValue, Short.MaxValue).toShort))
      case "<u4" => longs.foreach(v => out.putInt(checked(v, 0, 0xffffffffL).toInt))
      case "<i4" => longs.foreach(v => out.putInt(checked(v, Int.MinValue, Int.MaxValue).toInt))
      case "<i8" => longs.foreach(out.putLong)
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
