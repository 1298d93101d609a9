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

  /** Attach decoded metadata to a media table (idCol, bytesCol binary).
    * Partition-mapped: the decode runs inside one task per partition with
    * no shuffle; output schema is the typed meta struct.
    */
  def withDecodedMeta(media: DataFrame, bytesCol: String = "bytes",
      formatCol: String = "format"): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields :+ StructField("meta", metaSchema))
    val bytesIdx = media.schema.fieldIndex(bytesCol)
    val fmtIdx = media.schema.fieldIndex(formatCol)
    val rdd = media.rdd.mapPartitions { rows =>
      rows.map { r =>
        val meta = stubDecodeMeta(r.getAs[Array[Byte]](bytesIdx), r.getString(fmtIdx))
        Row.fromSeq(r.toSeq :+ meta)
      }
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
