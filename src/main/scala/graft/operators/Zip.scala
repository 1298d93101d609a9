package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** ZIP shard codec — the other container multimodal/training corpora ship
  * in besides tar (NPZ tensor bundles ARE zip archives; crawl dumps and
  * annotation drops commonly arrive zipped). Same 100 TB contract as
  * [[Tar]]: the SHARD is the parallelism unit — `zipToFiles` is a
  * generator-shaped flatMap (zero shuffle, one task per shard) whose
  * members feed the per-modality codecs. Reference corpus shape:
  * feature_stacking.py:67-70 globs a directory of per-scene files; at
  * scale the same corpus arrives as bounded archives.
  *
  * Implemented from the public PKWARE APPNOTE layout: local file headers
  * (PK\x03\x04), central directory (PK\x01\x02), end-of-central-directory
  * record (PK\x05\x06). The reader walks from the END — EOCD scan, then
  * the central directory (the authoritative index), then each member's
  * local header — because appended junk or a truncated tail must fail
  * loudly, not shift member boundaries. Stored (0) and deflate (8)
  * members, CRC-32 verified over every decoded payload. ZIP64 reads
  * (r11): the EOCD64 locator + record take over when the classic EOCD
  * carries 0xFFFF/0xFFFFFFFF markers, and per-member 0x0001 extra fields
  * supply the masked sizes/offsets — webdataset-scale shards routinely
  * exceed 4 GiB / 65k members. Fail-closed doctrine: encryption,
  * multi-disk, unknown methods, central/local name disagreement,
  * size/CRC mismatches all reject with descriptive errors. All offset
  * arithmetic in Long (untrusted u32 fields must never wrap an Int — the
  * RIFF lesson, NOTES_BUILDER r9).
  */
object Zip {

  private val LocalSig = 0x04034b50L
  private val CentralSig = 0x02014b50L
  private val EocdSig = 0x06054b50L
  private val Eocd64Sig = 0x06064b50L
  private val Eocd64LocSig = 0x07064b50L

  private def u16(b: Array[Byte], off: Long): Int = {
    val o = off.toInt
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  }
  private def u32(b: Array[Byte], off: Long): Long = {
    val o = off.toInt
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  }
  private def u64(b: Array[Byte], off: Long): Long = {
    val v = u32(b, off) | (u32(b, off + 4) << 32)
    require(v >= 0, f"zip64 field 0x$v%016x exceeds the signed-64 range")
    v
  }

  /** Walk a zip shard → (member name, payload) for every file member, in
    * central-directory order. Directory entries (trailing '/', empty) are
    * structural and skipped; anything unsupported fails closed.
    */
  def zipEntries(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    require(bytes != null && bytes.length >= 22,
      s"not a zip archive (${if (bytes == null) -1 else bytes.length} bytes < 22-byte EOCD)")
    // EOCD: last record in the file; scan back over a possible comment.
    // A candidate only counts if its comment length closes the file
    // exactly — guards against PK\x05\x06 appearing inside member data.
    val len = bytes.length.toLong
    var eocd = -1L
    var cand = len - 22
    val floor = math.max(0L, len - 22 - 0xffff)
    while (eocd < 0 && cand >= floor) {
      if (u32(bytes, cand) == EocdSig && cand + 22 + u16(bytes, cand + 20) == len)
        eocd = cand
      else cand -= 1
    }
    require(eocd >= 0, "no end-of-central-directory record (not a zip, or truncated tail)")
    var diskNo = u16(bytes, eocd + 4).toLong
    var cdDisk = u16(bytes, eocd + 6).toLong
    var nOnDisk = u16(bytes, eocd + 8).toLong
    var nTotal = u16(bytes, eocd + 10).toLong
    var cdSize = u32(bytes, eocd + 12)
    var cdOff = u32(bytes, eocd + 16)
    // the position the central directory must end at or before: the EOCD
    // itself classically, tightened to the EOCD64 record start under zip64
    var cdEnd = eocd
    // zip64 (r11): 0xFFFF/0xFFFFFFFF EOCD markers hand authority to the
    // EOCD64 record, reached through the 20-byte locator that directly
    // precedes the EOCD (webdataset-scale shards routinely exceed the
    // 4 GiB / 65k-member classic limits; small archives may carry the
    // markers too — writers force zip64 freely)
    if (nTotal == 0xffffL || cdOff == 0xffffffffL || cdSize == 0xffffffffL) {
      require(eocd >= 20 && u32(bytes, eocd - 20) == Eocd64LocSig,
        "EOCD carries zip64 markers but no EOCD64 locator precedes it")
      val locDisk = u32(bytes, eocd - 16)
      val e64 = u64(bytes, eocd - 12)
      val totalDisks = u32(bytes, eocd - 4)
      require(locDisk == 0 && totalDisks <= 1,
        s"multi-disk zip64 archive (EOCD64 on disk $locDisk of $totalDisks) unsupported")
      require(e64 + 56 <= eocd - 20, s"EOCD64 record at $e64 overruns its locator")
      require(u32(bytes, e64) == Eocd64Sig,
        f"bad EOCD64 signature 0x${u32(bytes, e64)}%08x at $e64")
      diskNo = u32(bytes, e64 + 16)
      cdDisk = u32(bytes, e64 + 20)
      nOnDisk = u64(bytes, e64 + 24)
      nTotal = u64(bytes, e64 + 32)
      cdSize = u64(bytes, e64 + 40)
      cdOff = u64(bytes, e64 + 48)
      // with zip64 in effect the directory must end BEFORE the EOCD64
      // record, not merely before the classic EOCD — the looser bound let
      // a crafted directory overlap the EOCD64/locator region (ADVICE r11)
      cdEnd = e64
    }
    require(diskNo == 0 && cdDisk == 0 && nOnDisk == nTotal,
      s"multi-disk archive (disk $diskNo/$cdDisk, $nOnDisk/$nTotal) unsupported")
    require(cdOff + cdSize <= cdEnd,
      s"central directory [$cdOff,+$cdSize) overruns its bound at $cdEnd")
    require(nTotal <= cdSize / 46 + 1,
      s"$nTotal members cannot fit a $cdSize-byte central directory")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var off = cdOff
    var i = 0L
    while (i < nTotal) {
      require(off + 46 <= cdEnd, s"central entry $i truncated at $off")
      require(u32(bytes, off) == CentralSig,
        f"bad central-directory signature 0x${u32(bytes, off)}%08x for entry $i at $off")
      val flags = u16(bytes, off + 8)
      val method = u16(bytes, off + 10)
      val crc = u32(bytes, off + 16)
      var csize = u32(bytes, off + 20)
      var usize = u32(bytes, off + 24)
      val nameLen = u16(bytes, off + 28)
      val extraLen = u16(bytes, off + 30)
      val commentLen = u16(bytes, off + 32)
      var diskStart = u16(bytes, off + 34).toLong
      var localOff = u32(bytes, off + 42)
      require(off + 46 + nameLen + extraLen + commentLen <= cdEnd,
        s"central entry $i variable fields overrun the directory")
      val name = new String(bytes, (off + 46).toInt, nameLen, "UTF-8")
      require((flags & 0x1) == 0, s"member '$name' is encrypted — unsupported, fail closed")
      // zip64 extra field (id 0x0001): carries, IN ORDER, exactly the
      // fields the fixed record masked with 0xFFFFFFFF/0xFFFF
      if (usize == 0xffffffffL || csize == 0xffffffffL ||
          localOff == 0xffffffffL || diskStart == 0xffffL) {
        var ex = off + 46 + nameLen
        val exEnd = ex + extraLen
        var found = false
        while (!found && ex + 4 <= exEnd) {
          val id = u16(bytes, ex)
          val sz = u16(bytes, ex + 2)
          require(ex + 4 + sz <= exEnd,
            f"member '$name%s': extra field 0x$id%04x overruns the extra block")
          if (id == 0x0001) {
            var p = ex + 4
            def take8(what: String): Long = {
              require(p + 8 <= ex + 4 + sz,
                s"member '$name': zip64 extra too short for $what")
              val v = u64(bytes, p); p += 8; v
            }
            if (usize == 0xffffffffL) usize = take8("uncompressed size")
            if (csize == 0xffffffffL) csize = take8("compressed size")
            if (localOff == 0xffffffffL) localOff = take8("local header offset")
            if (diskStart == 0xffffL) {
              require(p + 4 <= ex + 4 + sz,
                s"member '$name': zip64 extra too short for disk start")
              diskStart = u32(bytes, p)
            }
            found = true
          } else ex += 4 + sz
        }
        require(found, s"member '$name' carries zip64 markers but no 0x0001 extra field")
      }
      require(diskStart == 0, s"member '$name' starts on disk $diskStart — multi-disk unsupported")
      val isDir = name.endsWith("/")
      if (isDir) {
        require(usize == 0, s"directory '$name' with nonzero size $usize")
      } else {
        require(method == 0 || method == 8,
          s"member '$name' uses compression method $method — only stored (0) and deflate (8) supported")
        // Local header: coherence check, then locate the data. Sizes come
        // from the CENTRAL record (authoritative even when the writer set
        // GP bit 3 and zeroed the local copies).
        require(localOff + 30 <= len, s"member '$name' local header at $localOff overruns the file")
        require(u32(bytes, localOff) == LocalSig,
          f"member '$name': bad local signature 0x${u32(bytes, localOff)}%08x at $localOff")
        val lNameLen = u16(bytes, localOff + 26)
        val lExtraLen = u16(bytes, localOff + 28)
        require(localOff + 30 + lNameLen + lExtraLen <= len,
          s"member '$name' local variable fields overrun the file")
        val lName = new String(bytes, (localOff + 30).toInt, lNameLen, "UTF-8")
        require(lName == name,
          s"central/local name disagreement: '$name' vs '$lName' — corrupt directory")
        val dataOff = localOff + 30 + lNameLen + lExtraLen
        require(dataOff + csize <= len,
          s"member '$name' data [$dataOff,+$csize) overruns the file")
        require(usize <= Int.MaxValue && csize <= Int.MaxValue,
          s"member '$name' too large ($usize bytes)")
        val raw = java.util.Arrays.copyOfRange(bytes, dataOff.toInt, (dataOff + csize).toInt)
        val data =
          if (method == 0) {
            require(csize == usize,
              s"stored member '$name': compressed $csize != uncompressed $usize")
            raw
          } else {
            val inf = new java.util.zip.Inflater(true) // raw deflate, no zlib wrapper
            try {
              inf.setInput(raw)
              val outBuf = new Array[Byte](usize.toInt)
              var got = 0
              // inflate returns 0 exactly when it can make no progress
              // (finished, starved, or buffer full) — each a terminal state
              // here; the zero-length final call lets an empty member reach
              // finished()
              var n = -1
              while (!inf.finished() && n != 0) {
                n = inf.inflate(outBuf, got, outBuf.length - got)
                got += n
              }
              require(inf.finished() && got == outBuf.length,
                s"member '$name': deflate produced $got of declared $usize bytes" +
                  (if (!inf.finished()) " without reaching stream end" else ""))
              require(inf.getBytesRead == csize,
                s"member '$name': deflate consumed ${inf.getBytesRead} of declared $csize bytes")
              outBuf
            } catch {
              case e: java.util.zip.DataFormatException =>
                throw new IllegalArgumentException(
                  s"member '$name': corrupt deflate stream (${e.getMessage})")
            } finally inf.end()
          }
        val c = new java.util.zip.CRC32
        c.update(data)
        require(c.getValue == crc,
          f"member '$name': CRC32 0x${c.getValue}%08x != stored 0x$crc%08x")
        out += name -> data
      }
      off += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    out.toSeq
  }

  /** Assemble a valid zip shard (the encode half for fixtures/oracles and
    * the NPZ writer). `deflate(name)` picks the method per member; fixed
    * DOS timestamps keep shards byte-deterministic. `forceZip64` writes
    * the zip64 layout regardless of size — EOCD markers + EOCD64 record
    * + locator, and per-member 0x0001 extras masking sizes/offset — the
    * legal small-file spelling writers use under force_zip64, so the
    * reader's zip64 path is testable without a 4 GiB fixture.
    */
  def synthZip(entries: Seq[(String, Array[Byte])],
               deflate: String => Boolean = _ => true,
               forceZip64: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    def w64(v: Long): Unit = { w32(v & 0xffffffffL); w32((v >>> 32) & 0xffffffffL) }
    case class Central(name: Array[Byte], method: Int, crc: Long,
                       csize: Int, usize: Int, off: Long)
    val centrals = scala.collection.mutable.ArrayBuffer.empty[Central]
    val version = if (forceZip64) 45 else 20
    entries.foreach { case (name, data) =>
      val nb = name.getBytes("UTF-8")
      require(nb.nonEmpty && nb.length <= 0xffff, s"bad member name '$name'")
      val crc = { val c = new java.util.zip.CRC32; c.update(data); c.getValue }
      val method = if (deflate(name)) 8 else 0
      val payload = if (method == 0) data else {
        val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        try {
          d.setInput(data); d.finish()
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
          buf.toByteArray
        } finally d.end()
      }
      val off = bos.size().toLong
      w32(LocalSig); w16(version); w16(0); w16(method)
      w16(0); w16(0x21) // fixed DOS time 00:00:00, date 1980-01-01: deterministic
      w32(crc); w32(payload.length.toLong); w32(data.length.toLong)
      w16(nb.length); w16(0)
      bos.write(nb); bos.write(payload)
      centrals += Central(nb, method, crc, payload.length, data.length, off)
    }
    val cdOff = bos.size().toLong
    centrals.foreach { c =>
      w32(CentralSig); w16(version); w16(version); w16(0); w16(c.method)
      w16(0); w16(0x21); w32(c.crc)
      if (forceZip64) {
        w32(0xffffffffL); w32(0xffffffffL) // csize, usize masked
        w16(c.name.length); w16(4 + 24); w16(0); w16(0); w16(0); w32(0)
        w32(0xffffffffL) // local offset masked
        bos.write(c.name)
        w16(0x0001); w16(24) // zip64 extra: usize, csize, local offset
        w64(c.usize.toLong); w64(c.csize.toLong); w64(c.off)
      } else {
        w32(c.csize.toLong); w32(c.usize.toLong)
        w16(c.name.length); w16(0); w16(0); w16(0); w16(0); w32(0)
        w32(c.off); bos.write(c.name)
      }
    }
    val cdSize = bos.size().toLong - cdOff
    if (forceZip64) {
      val e64 = bos.size().toLong
      w32(Eocd64Sig); w64(44) // record size (excl. sig + this field)
      w16(45); w16(45); w32(0); w32(0)
      w64(centrals.size.toLong); w64(centrals.size.toLong)
      w64(cdSize); w64(cdOff)
      w32(Eocd64LocSig); w32(0); w64(e64); w32(1)
      w32(EocdSig); w16(0); w16(0); w16(0xffff); w16(0xffff)
      w32(0xffffffffL); w32(0xffffffffL); w16(0)
    } else {
      w32(EocdSig); w16(0); w16(0); w16(centrals.size); w16(centrals.size)
      w32(cdSize); w32(cdOff); w16(0)
    }
    bos.toByteArray
  }

  /** Zip binary column → one row per file member (pass-through columns
    * preserved): member_idx (directory order), name, ext (lowercased
    * final suffix), bytes. Generator shape: flatMap, zero shuffle, one
    * task per SHARD — identical contract to [[Tar.tarToFiles]].
    */
  def zipToFiles(media: DataFrame, bytesCol: String = "bytes"): DataFrame =
    MediaExplode.explode(media, bytesCol, Seq(
      StructField("member_idx", IntegerType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("ext", StringType, nullable = false),
      StructField("bytes", BinaryType, nullable = false))) { payload =>
      zipEntries(payload).iterator.zipWithIndex.map { case ((name, data), i) =>
        val dot = name.lastIndexOf('.')
        val ext = if (dot < 0) "" else name.substring(dot + 1).toLowerCase
        Seq[Any](i, name, ext, data)
      }
    }
}
