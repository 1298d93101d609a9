package graft

import graft.operators.Zip
import org.scalatest.funsuite.AnyFunSuite

/** ZIP shard codec invariants: writer and walker agree (names, payloads,
  * directory order, stored AND deflated members), CRCs are real, sizes
  * are authoritative, the ZIP64 layout (r11) reads identically to the
  * classic one, and everything outside the supported profile
  * (encryption, foreign methods, multi-disk) fails closed.
  */
class ZipSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def entries = Seq(
    "0000.npy" -> Array.tabulate(600)(i => (i * 7 % 251).toByte),
    "0000.txt" -> "hello zip shard".getBytes("UTF-8"),
    "0001.bin" -> Array.tabulate(4096)(i => (i % 256).toByte), // compresses well
    "0001.txt" -> Array.emptyByteArray, // zero-length member
    "deep/dir/0002.dat" -> Array[Byte](1, 2, 3))

  test("synthZip round-trips members in order, both methods") {
    for (method <- Seq(true, false)) {
      val zip = Zip.synthZip(entries, deflate = _ => method)
      val got = Zip.zipEntries(zip)
      assert(got.map(_._1) == entries.map(_._1))
      got.zip(entries).foreach { case ((_, g), (_, w)) => assert(g.sameElements(w)) }
    }
    // mixed methods in one shard
    val mixed = Zip.synthZip(entries, deflate = _.endsWith(".bin"))
    assert(Zip.zipEntries(mixed).map(_._1) == entries.map(_._1))
    // deflate actually compresses the repetitive member
    val stored = Zip.synthZip(Seq(entries(2)), deflate = _ => false)
    val packed = Zip.synthZip(Seq(entries(2)), deflate = _ => true)
    assert(packed.length < stored.length)
  }

  test("writer is byte-deterministic (fixed timestamps)") {
    assert(Zip.synthZip(entries).sameElements(Zip.synthZip(entries)))
  }

  test("corrupt or unsupported archives fail closed with descriptive errors") {
    val zip = Zip.synthZip(entries)
    // no EOCD at all
    assert(intercept[IllegalArgumentException](Zip.zipEntries(zip.take(zip.length - 4)))
      .getMessage.contains("end-of-central-directory"))
    // payload flip → CRC mismatch (first member is stored? make all stored)
    val st = Zip.synthZip(Seq("a.txt" -> "abcdefgh".getBytes), deflate = _ => false)
    val flip = st.clone(); flip(30 + 5 + 2) = 'Z'.toByte // inside stored payload
    assert(intercept[IllegalArgumentException](Zip.zipEntries(flip))
      .getMessage.contains("CRC32"))
    // encrypted flag in the central record
    val enc = Zip.synthZip(Seq("a.txt" -> "x".getBytes))
    // central dir starts at cdOff (read it back from EOCD): flags at +8
    val cdOff = java.nio.ByteBuffer.wrap(enc, enc.length - 6, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    enc(cdOff + 8) = 0x1.toByte
    assert(intercept[IllegalArgumentException](Zip.zipEntries(enc))
      .getMessage.contains("encrypted"))
    // unknown compression method
    val meth = Zip.synthZip(Seq("a.txt" -> "x".getBytes), deflate = _ => false)
    val cd2 = java.nio.ByteBuffer.wrap(meth, meth.length - 6, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    meth(cd2 + 10) = 12 // bzip2
    assert(intercept[IllegalArgumentException](Zip.zipEntries(meth))
      .getMessage.contains("method 12"))
    // declared uncompressed size too small → deflate over-produces, rejects
    val blob = Zip.synthZip(Seq("b.bin" -> Array.tabulate(100)(_.toByte)))
    val cd3 = java.nio.ByteBuffer.wrap(blob, blob.length - 6, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    blob(cd3 + 24) = 10; blob(cd3 + 25) = 0 // usize 100 -> 10
    intercept[IllegalArgumentException](Zip.zipEntries(blob))
  }

  test("zip64: forced-marker layout decodes identically; broken locator fails closed") {
    val z64 = Zip.synthZip(entries, forceZip64 = true)
    val got = Zip.zipEntries(z64)
    assert(got.map(_._1) == entries.map(_._1))
    got.zip(entries).foreach { case ((_, g), (_, w)) => assert(g.sameElements(w)) }
    // the classic spelling of the same members decodes to the same bytes
    val classic = Zip.zipEntries(Zip.synthZip(entries))
    classic.zip(got).foreach { case ((_, a), (_, b)) => assert(a.sameElements(b)) }
    // markers without a locator reject descriptively
    val noLoc = z64.clone()
    noLoc(noLoc.length - 22 - 20) = 'X'.toByte // locator signature byte
    assert(intercept[IllegalArgumentException](Zip.zipEntries(noLoc))
      .getMessage.contains("locator"))
    // a masked member whose 0x0001 extra is missing rejects descriptively:
    // flip the extra header id in the first central entry
    val noExtra = z64.clone()
    val cdOff = {
      // EOCD64 record sits right after the central directory; read cdOff
      // from it (offset +48)
      val e64 = noExtra.length - 22 - 20 - 56
      java.nio.ByteBuffer.wrap(noExtra, e64 + 48, 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong.toInt
    }
    val nameLen = (noExtra(cdOff + 28) & 0xff) | ((noExtra(cdOff + 29) & 0xff) << 8)
    noExtra(cdOff + 46 + nameLen) = 0x77 // extra id 0x0001 -> 0x7777? (lo byte)
    assert(intercept[IllegalArgumentException](Zip.zipEntries(noExtra))
      .getMessage.contains("0x0001"))
  }

  test("zipToFiles explodes shards with pass-through, order, and modality keys") {
    import spark.implicits._
    val df = Zip.zipToFiles(Seq((7L, Zip.synthZip(entries))).toDF("shard_id", "bytes"))
    val rows = df.orderBy("member_idx").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getLong(0) == 7L))
    assert(rows.map(_.getInt(1)).toSeq == (0 until 5))
    assert(rows.map(_.getString(3)).toSeq == Seq("npy", "txt", "bin", "txt", "dat"))
    assert(rows(4).getString(2) == "deep/dir/0002.dat")
    assert(rows(3).getAs[Array[Byte]](4).isEmpty)
  }
}
