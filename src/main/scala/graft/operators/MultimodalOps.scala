package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column operators (extension surface E3/"multimodal" of
  * BASELINE.json; SURVEY.md §2.6 E1-E4 family).
  *
  * Media (image/audio/video) are opaque `binary` columns with a typed
  * metadata struct. The Spark-side plumbing — schemas, partition-mapped
  * batch decode, generator-shaped frame explosion, embedding hand-off to
  * the Similarity operators — is real and tested; ONLY the codec kernels
  * are stubs (this container ships no image/audio libraries). Every stub
  * is deterministic (md5-derived from the bytes) and clearly marked
  * `STUB:`, so swapping in a real decoder changes one function per op and
  * nothing about the distributed shape.
  *
  * Scale shape: decode/extract run as `mapPartitions` over the binary
  * column — one task per partition, no shuffle; frame sampling is a
  * flatMap (rows out ≥ rows in, still shuffle-free); embeddings feed the
  * LSH/top-k path (Similarity) unchanged.
  */
object MultimodalOps {

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("format", StringType)))

  private def md5hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map("%02x".format(_)).mkString
  }

  private def hexInt(hex: String, from: Int, len: Int): Int =
    java.lang.Long.parseLong(hex.substring(from, from + len), 16).toInt

  /** STUB: deterministic fake image decode — metadata derived from the md5
    * of the payload (a real build calls the codec here). The derivation is
    * pure SQL-expressible arithmetic so the oracle can verify the plumbing
    * end-to-end: width = 16 + h[0:4] % 2048, height = 16 + h[4:8] % 2048,
    * channels = 1 + h[8:9] % 4, n_frames = 1 + h[9:12] % 240.
    */
  def stubDecodeMeta(bytes: Array[Byte], format: String): Row = {
    val h = md5hex(bytes)
    Row(16 + hexInt(h, 0, 4) % 2048, 16 + hexInt(h, 4, 4) % 2048,
      1 + hexInt(h, 8, 1) % 4, 1 + hexInt(h, 9, 3) % 240, format)
  }

  /** STUB: deterministic fake feature extraction — `dim` floats in [-0.5,
    * 0.5) seeded from md5(i + "|" + payload). A real build runs the model
    * forward pass here; the batch shape (one call per row, vectorizable
    * per partition) is what matters.
    */
  def stubEmbed(bytes: Array[Byte], dim: Int): Array[Float] = {
    (0 until dim).map { i =>
      val h = md5hex((i + "|").getBytes("UTF-8") ++ bytes)
      (hexInt(h, 0, 4).toFloat / 65536.0f) - 0.5f
    }.toArray
  }

  // ---- real header parsing (PNG IHDR / BMP DIB) ----

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** REAL header decode for PNG (IHDR: width/height big-endian at 16/20,
    * color type at 25 → channel count) and BMP (BITMAPINFOHEADER: width/
    * height little-endian at 18/22, bit count at 28). Anything else falls
    * back to the deterministic md5 stub, so mixed media tables and the
    * mm1/mm2 plumbing checks keep working unchanged. The BMP sniff demands
    * a known DIB header size and NUL padding so text that merely starts
    * with "BM" cannot false-positive.
    */
  def decodeHeaderMeta(bytes: Array[Byte], fallbackFormat: String): Row = {
    if (bytes.length >= 26 && bytes.take(8).sameElements(PngSig) &&
        new String(bytes.slice(12, 16), "US-ASCII") == "IHDR") {
      val channels = bytes(25).toInt match {
        case 0 => 1 // greyscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette
        case 4 => 2 // grey + alpha
        case 6 => 4 // truecolor + alpha
        case _ => 0
      }
      Row(beInt(bytes, 16), beInt(bytes, 20), channels, 1, "png")
    } else if (bytes.length >= 30 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte &&
        Set(40, 108, 124)(leInt(bytes, 14)) && leShort(bytes, 26) == 1 &&
        Set(1, 4, 8, 16, 24, 32)(leShort(bytes, 28))) {
      val bpp = leShort(bytes, 28)
      Row(leInt(bytes, 18), math.abs(leInt(bytes, 22)), math.max(1, bpp / 8), 1, "bmp")
    } else stubDecodeMeta(bytes, fallbackFormat)
  }

  /** Minimal valid PNG header bytes (signature + IHDR, zero CRC): the
    * encode half of the bridge, used to stage synthetic real-format media
    * in tests and oracles. `alpha` picks color type 6 (RGBA) vs 2 (RGB).
    */
  def synthPngHeader(width: Int, height: Int, alpha: Boolean): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + 4 + 4 + 13 + 4)
    out.put(PngSig)
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(width).putInt(height)
    out.put(8.toByte).put((if (alpha) 6 else 2).toByte)
    out.put(0.toByte).put(0.toByte).put(0.toByte)
    out.putInt(0) // CRC not validated by the parser
    out.array()
  }

  /** Minimal valid BMP header bytes (BITMAPFILEHEADER + BITMAPINFOHEADER). */
  def synthBmpHeader(width: Int, height: Int, bpp: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(54).putShort(0).putShort(0).putInt(54) // size, reserved, data offset
    out.putInt(40).putInt(width).putInt(height)
    out.putShort(1).putShort(bpp.toShort)
    out.array()
  }

  /** Attach decoded metadata to a media table (idCol, bytesCol binary).
    * Partition-mapped: the decode runs inside one task per partition with
    * no shuffle; output schema is the typed meta struct. Real PNG/BMP
    * headers are parsed; other payloads get the deterministic stub.
    */
  def withDecodedMeta(media: DataFrame, bytesCol: String = "bytes",
      formatCol: String = "format"): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields :+ StructField("meta", metaSchema))
    val bytesIdx = media.schema.fieldIndex(bytesCol)
    val fmtIdx = media.schema.fieldIndex(formatCol)
    val rdd = media.rdd.mapPartitions { rows =>
      rows.map { r =>
        val meta = decodeHeaderMeta(r.getAs[Array[Byte]](bytesIdx), r.getString(fmtIdx))
        Row.fromSeq(r.toSeq :+ meta)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ---- real audio header parsing (WAV: RIFF / fmt / data) ----

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_us", LongType)))

  private def asciiAt(b: Array[Byte], off: Int, len: Int): String =
    new String(b.slice(off, off + len), "US-ASCII")

  /** Minimal canonical WAV header (RIFF + 16-byte PCM fmt + data chunk
    * declaration, 44 bytes, no payload — the parser reads declared sizes).
    */
  def synthWavHeader(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nFrames: Long): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nFrames * blockAlign
    require(dataSize <= Int.MaxValue, s"data chunk overflows RIFF32: $dataSize")
    val out = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize.toInt)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize.toInt)
    out.array()
  }

  /** REAL header decode for canonical PCM WAV (the audio modality's mm3):
    * sniffs RIFF/WAVE/fmt, demands PCM (format tag 1) and a leading data
    * chunk, derives frame count from the declared data size and block
    * align, duration in µs by integer division. Returns null (→ NULL
    * struct) for anything that doesn't parse — fail-closed, no stub: audio
    * consumers branch on parse success, they don't get fabricated rates.
    */
  def decodeWavMeta(bytes: Array[Byte]): Row = {
    val ok = bytes != null && bytes.length >= 44 &&
      asciiAt(bytes, 0, 4) == "RIFF" && asciiAt(bytes, 8, 4) == "WAVE" &&
      asciiAt(bytes, 12, 4) == "fmt " && leInt(bytes, 16) == 16 &&
      leShort(bytes, 20) == 1 && asciiAt(bytes, 36, 4) == "data"
    if (!ok) return null
    val channels = leShort(bytes, 22)
    val rate = leInt(bytes, 24)
    val blockAlign = leShort(bytes, 32)
    val bits = leShort(bytes, 34)
    if (rate <= 0 || blockAlign <= 0) return null
    val nFrames = (leInt(bytes, 40).toLong & 0xffffffffL) / blockAlign
    Row(rate, channels, bits, nFrames, nFrames * 1000000L / rate)
  }

  /** Audio twin of `withDecodedMeta`: partition-mapped WAV header decode,
    * no shuffle, typed `audio_meta` struct (NULL when the payload is not
    * canonical PCM WAV).
    */
  def withAudioMeta(media: DataFrame, bytesCol: String = "bytes"): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields :+
      StructField("audio_meta", audioMetaSchema))
    val bytesIdx = media.schema.fieldIndex(bytesCol)
    val rdd = media.rdd.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ decodeWavMeta(r.getAs[Array[Byte]](bytesIdx))))
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB-backed resize: recomputes metadata for a target box preserving
    * aspect ratio (the pixel resample would live in the same map).
    */
  def withResizedMeta(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("meta.width"), col("meta.height"))))
      .withColumn("resized_meta", struct(
        (col("meta.width") * col("scale")).cast("int").as("width"),
        (col("meta.height") * col("scale")).cast("int").as("height"),
        col("meta.channels").as("channels"),
        col("meta.n_frames").as("n_frames"),
        col("meta.format").as("format")))
      .drop("scale")

  /** Generator-shaped frame sampling: one row per sampled frame index
    * (every `stride`-th frame of n_frames). The frame payload decode is the
    * STUB boundary; the explosion shape is the real operator (M7's
    * one-in-many-out analog for video).
    */
  def sampleFrames(decoded: DataFrame, stride: Int, idCol: String = "media_id"): DataFrame =
    decoded.select(col(idCol), col("meta"),
      explode(sequence(lit(0), col("meta.n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Attach a STUB embedding column sized `dim`, ready for Similarity
    * (bruteForceTopK / lshTopK) — the multimodal→vector hand-off.
    */
  def withEmbedding(media: DataFrame, dim: Int, bytesCol: String = "bytes"): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields :+
      StructField("embedding", ArrayType(FloatType)))
    val bytesIdx = media.schema.fieldIndex(bytesCol)
    val rdd = media.rdd.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ stubEmbed(r.getAs[Array[Byte]](bytesIdx), dim).toSeq))
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
