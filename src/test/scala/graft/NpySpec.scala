package graft

import graft.operators.{Npy, Zip}
import org.scalatest.funsuite.AnyFunSuite

/** NPY/NPZ tensor codec invariants. The golden fixtures below are the
  * EXACT bytes numpy 1.x emits (`np.lib.format.write_array(..., version=
  * (1,0))`, captured offline) — the reader must decode real numpy output
  * and the writer must reproduce it byte-for-byte, so interop is proven
  * against the reference implementation, not just round-trip symmetry.
  */
class NpySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // np.array([[1.5,-2.25],[3.0,4.75],[0.125,100.0]], dtype='<f4')
  private val goldenF4 = unhex(
    "934e554d5059010076007b276465736372273a20273c6634272c2027666f727472616e5f6f72646572273a2046616c73652c20277368617065273a2028332c2032292c207d202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020200a0000c03f000010c000004040000098400000003e0000c842")
  // np.arange(-3, 9, dtype='<i2').reshape(3,4)
  private val goldenI2 = unhex(
    "934e554d5059010076007b276465736372273a20273c6932272c2027666f727472616e5f6f72646572273a2046616c73652c20277368617065273a2028332c2034292c207d202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020200afdfffeffffff000001000200030004000500060007000800")
  // np.array([7], dtype='|u1')
  private val goldenU1 = unhex(
    "934e554d5059010076007b276465736372273a20277c7531272c2027666f727472616e5f6f72646572273a2046616c73652c20277368617065273a2028312c292c207d2020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020200a07")
  // np.array(range(5), dtype='<i8') * 1000000007
  private val goldenI8 = unhex(
    "934e554d5059010076007b276465736372273a20273c6938272c2027666f727472616e5f6f72646572273a2046616c73652c20277368617065273a2028352c292c207d2020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020200a000000000000000007ca9a3b000000000e94357700000000155ed0b2000000001c286bee00000000")

  test("reader decodes real numpy output exactly") {
    val f4 = Npy.npyTensor(goldenF4)
    assert(f4.descr == "<f4" && f4.shape == Seq(3, 2))
    assert(f4.doubles.toSeq == Seq(1.5, -2.25, 3.0, 4.75, 0.125, 100.0))
    val i2 = Npy.npyTensor(goldenI2)
    assert(i2.descr == "<i2" && i2.shape == Seq(3, 4))
    assert(i2.longs.toSeq == (-3L to 8L))
    val u1 = Npy.npyTensor(goldenU1)
    assert(u1.shape == Seq(1) && u1.longs.toSeq == Seq(7L))
    val i8 = Npy.npyTensor(goldenI8)
    assert(i8.longs.toSeq == (0 until 5).map(_ * 1000000007L))
  }

  test("writer reproduces numpy's bytes exactly (header layout, padding, buffer)") {
    assert(Npy.synthNpy("<f4", Seq(3, 2),
      doubles = Array(1.5, -2.25, 3.0, 4.75, 0.125, 100.0)).sameElements(goldenF4))
    assert(Npy.synthNpy("<i2", Seq(3, 4),
      longs = (-3L to 8L).toArray).sameElements(goldenI2))
    assert(Npy.synthNpy("|u1", Seq(1), longs = Array(7L)).sameElements(goldenU1))
    assert(Npy.synthNpy("<i8", Seq(5),
      longs = (0 until 5).map(_ * 1000000007L).toArray).sameElements(goldenI8))
  }

  test("every supported descr round-trips; lossy/out-of-range writes fail closed") {
    for (descr <- Seq("|u1", "|i1", "<u2", "<i2", "<u4", "<i4", "<i8")) {
      val vals = Array(0L, 1L, 100L)
      val t = Npy.npyTensor(Npy.synthNpy(descr, Seq(3), longs = vals))
      assert(t.longs.toSeq == vals.toSeq, descr)
    }
    for (descr <- Seq("<f4", "<f8")) {
      val vals = Array(0.0, -1.25, 3.5e4)
      val t = Npy.npyTensor(Npy.synthNpy(descr, Seq(3), doubles = vals))
      assert(t.doubles.toSeq == vals.toSeq, descr)
    }
    // u1 range check
    assert(intercept[IllegalArgumentException](
      Npy.synthNpy("|u1", Seq(1), longs = Array(256L))).getMessage.contains("out of range"))
    // f4 refuses values that don't survive the float32 round-trip
    assert(intercept[IllegalArgumentException](
      Npy.synthNpy("<f4", Seq(1), doubles = Array(0.1))).getMessage.contains("float32"))
    // scalar (0-d) and empty tensors are legal
    assert(Npy.npyTensor(Npy.synthNpy("<i4", Nil, longs = Array(42L))).longs.toSeq == Seq(42L))
    assert(Npy.npyTensor(Npy.synthNpy("<f8", Seq(0), doubles = Array[Double]())).nElems == 0L)
  }

  // r11 goldens, same capture protocol (np.lib.format.write_array):
  // np.asfortranarray of goldenF4's values, version (1,0)
  private val goldenFortranF4 = unhex(
    "934e554d5059010076007b276465736372273a20273c6634272c2027666f727472616e5f6f72646572273a20547275652c20277368617065273a2028332c2032292c207d20202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020200a0000c03f000040400000003e000010c0000098400000c842")
  // np.arange(6,dtype='<i4').reshape(2,3)*7-9, version (2,0)
  private val goldenV2I4 = unhex(
    "934e554d50590200740000007b276465736372273a20273c6934272c2027666f727472616e5f6f72646572273a2046616c73652c20277368617065273a2028322c2033292c207d20202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020200af7fffffffeffffff050000000c000000130000001a000000")
  // np.asfortranarray(np.arange(12,dtype='<i8').reshape(2,3,2)*1000003-17), version (2,0)
  private val goldenV2FortranI8 = unhex(
    "934e554d50590200740000007b276465736372273a20273c6938272c2027666f727472616e5f6f72646572273a20547275652c20277368617065273a2028322c20332c2032292c207d2020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020202020200aefffffffffffffff818d5b000000000075841e000000000007127a0000000000fb083d00000000008d9698000000000032420f0000000000c4cf6a0000000000b8c62d00000000004a548900000000003e4b4c0000000000d0d8a70000000000")

  test("fortran order transposes on read; v2 headers parse — real numpy bytes (r11)") {
    // fortran f4 decodes to the SAME C-order values as the C-layout twin
    val f = Npy.npyTensor(goldenFortranF4)
    assert(f.shape == Seq(3, 2))
    assert(f.doubles.toSeq == Npy.npyTensor(goldenF4).doubles.toSeq)
    // v2 4-byte header length
    val v2 = Npy.npyTensor(goldenV2I4)
    assert(v2.shape == Seq(2, 3))
    assert(v2.longs.toSeq == (0 until 6).map(_ * 7L - 9))
    // v2 + fortran, 3-d
    val vf = Npy.npyTensor(goldenV2FortranI8)
    assert(vf.shape == Seq(2, 3, 2))
    assert(vf.longs.toSeq == (0 until 12).map(_ * 1000003L - 17))
    // writer halves reproduce numpy's bytes for both features
    assert(Npy.synthNpy("<f4", Seq(3, 2),
      doubles = Array(1.5, -2.25, 3.0, 4.75, 0.125, 100.0),
      fortranOrder = true).sameElements(goldenFortranF4))
    assert(Npy.synthNpy("<i4", Seq(2, 3),
      longs = (0 until 6).map(_ * 7L - 9).toArray,
      version = 2).sameElements(goldenV2I4))
    assert(Npy.synthNpy("<i8", Seq(2, 3, 2),
      longs = (0 until 12).map(_ * 1000003L - 17).toArray,
      fortranOrder = true, version = 2).sameElements(goldenV2FortranI8))
    // fortran round trip is the identity for every rank
    for (shape <- Seq(Seq(5), Seq(2, 3), Seq(2, 3, 4), Seq(3, 1, 2, 2))) {
      val n = shape.product
      val vals = Array.tabulate(n)(i => i * 31L - 7)
      val t = Npy.npyTensor(Npy.synthNpy("<i8", shape, longs = vals, fortranOrder = true))
      assert(t.longs.toSeq == vals.toSeq, shape)
    }
  }

  test("malformed tensors fail closed descriptively") {
    assert(intercept[IllegalArgumentException](Npy.npyTensor("junk".getBytes))
      .getMessage.contains("npy"))
    // big-endian descr rejects
    val be = goldenF4.clone()
    be(new String(goldenF4, "ISO-8859-1").indexOf("<f4")) = '>'.toByte
    assert(intercept[IllegalArgumentException](Npy.npyTensor(be))
      .getMessage.contains("descr"))
    // shape/buffer disagreement
    assert(intercept[IllegalArgumentException](Npy.npyTensor(goldenF4.dropRight(4)))
      .getMessage.contains("disagrees"))
    // v4+ headers reject
    val v4 = goldenF4.clone(); v4(6) = 4
    assert(intercept[IllegalArgumentException](Npy.npyTensor(v4))
      .getMessage.contains("version"))
  }

  test("npyToValues / npzToValues explode with pass-through and C-order indices") {
    import spark.implicits._
    val npy = Npy.synthNpy("<i2", Seq(2, 2), longs = Array(10L, 20L, 30L, 40L))
    val rows = Npy.npyToValues(Seq((5L, npy)).toDF("file_id", "bytes"))
      .orderBy("elem_idx").collect()
    assert(rows.map(_.getLong(4)).toSeq == Seq(10L, 20L, 30L, 40L))
    assert(rows.forall(r => r.getLong(0) == 5L && r.isNullAt(5)))
    assert(rows.head.getSeq[Int](2) == Seq(2, 2))

    val npz = Zip.synthZip(Seq(
      "emb.npy" -> Npy.synthNpy("<f4", Seq(3), doubles = Array(1.0, 2.5, -3.0)),
      "ids.npy" -> Npy.synthNpy("<i8", Seq(3), longs = Array(9L, 8L, 7L))))
    val z = Npy.npzToValues(Seq((1L, npz)).toDF("bundle_id", "bytes"))
      .orderBy("tensor", "elem_idx").collect()
    assert(z.map(_.getString(1)).toSeq == Seq("emb", "emb", "emb", "ids", "ids", "ids"))
    assert(z.take(3).map(_.getDouble(6)).toSeq == Seq(1.0, 2.5, -3.0))
    assert(z.drop(3).map(_.getLong(5)).toSeq == Seq(9L, 8L, 7L))
    // a non-npy member in an npz fails closed
    val bad = Zip.synthZip(Seq("notes.txt" -> "x".getBytes))
    val err = intercept[org.apache.spark.SparkException](
      Npy.npzToValues(Seq((1L, bad)).toDF("bundle_id", "bytes")).count())
    assert(err.getMessage.contains("not an .npy"))
  }
}
