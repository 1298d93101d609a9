package graft

import graft.operators.Tar
import org.scalatest.funsuite.AnyFunSuite

/** USTAR shard codec invariants: the synth writer and the walker must
  * agree (names incl. prefix splits, sizes, order), checksums are real,
  * and everything outside a data shard's shape fails closed.
  */
class TarSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def entries = Seq(
    "0000.png" -> Array.tabulate(600)(i => (i * 7 % 251).toByte), // spans blocks
    "0000.txt" -> "hello webdataset".getBytes("UTF-8"),
    "0001.png" -> Array.tabulate(512)(i => (i % 256).toByte), // exact block
    "0001.txt" -> Array.emptyByteArray, // zero-length member
    "deep/dir/0002.bin" -> Array[Byte](1, 2, 3))

  test("synthTar round-trips members in order with exact payloads") {
    val tar = Tar.synthTar(entries)
    assert(tar.length % 512 == 0)
    val got = Tar.tarEntries(tar)
    assert(got.map(_._1) == entries.map(_._1))
    got.zip(entries).foreach { case ((_, g), (_, w)) => assert(g.sameElements(w)) }
    // trailing end-of-archive: two zero blocks
    assert(tar.takeRight(1024).forall(_ == 0))
  }

  test("corrupted shards fail closed: checksum, magic, truncation, foreign typeflags") {
    val tar = Tar.synthTar(entries)
    // flip a payload byte INSIDE the first member → its header checksum
    // still matches (payload is not covered) but flipping a header byte fails
    val badHdr = tar.clone(); badHdr(0) = 'Z'.toByte // name byte: checksum breaks
    assert(intercept[IllegalArgumentException](Tar.tarEntries(badHdr))
      .getMessage.contains("checksum"))
    val badMagic = tar.clone(); badMagic(257) = 'X'.toByte
    assert(intercept[IllegalArgumentException](Tar.tarEntries(badMagic))
      .getMessage.contains("magic"))
    // truncation: drop the final zero blocks AND part of the last member
    intercept[IllegalArgumentException](Tar.tarEntries(tar.take(tar.length - 1536)))
    // non-multiple-of-512 length
    intercept[IllegalArgumentException](Tar.tarEntries(tar.take(tar.length - 100)))
    // a symlink member (typeflag '2') rejects rather than skipping
    val link = Tar.synthTar(Seq("a.txt" -> "x".getBytes))
    link(156) = '2'.toByte
    // re-checksum the tampered header so the typeflag check is what fires
    java.util.Arrays.fill(link, 148, 156, ' '.toByte)
    var sum = 0L
    for (i <- 0 until 512) sum += link(i) & 0xff
    val cs = java.lang.Long.toOctalString(sum)
    System.arraycopy((("0" * (6 - cs.length)) + cs).getBytes("US-ASCII"), 0, link, 148, 6)
    link(154) = 0; link(155) = ' '.toByte
    assert(intercept[IllegalArgumentException](Tar.tarEntries(link))
      .getMessage.contains("typeflag"))
  }

  test("tarToFiles explodes shards with pass-through, archive order, and modality keys") {
    import spark.implicits._
    val df = Tar.tarToFiles(Seq((7L, Tar.synthTar(entries))).toDF("shard_id", "bytes"))
    val rows = df.orderBy("member_idx").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getLong(0) == 7L))
    assert(rows.map(_.getInt(1)).toSeq == (0 until 5))
    assert(rows.map(_.getString(3)).toSeq == Seq("png", "txt", "png", "txt", "bin"))
    assert(rows(4).getString(2) == "deep/dir/0002.bin")
    assert(rows(3).getAs[Array[Byte]](4).isEmpty) // zero-length member survives
  }
}
