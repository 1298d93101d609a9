package graft

import graft.operators.{MultimodalOps, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media = Seq(
    (1L, "payload-one", "img"),
    (2L, "payload-two", "img"),
    (3L, "payload-one", "img") // identical bytes to 1
  ).toDF("media_id", "payload", "format")
    .withColumn("bytes", col("payload").cast("binary"))
    .drop("payload")

  test("withDecodedMeta attaches deterministic typed metadata (decode plumbing)") {
    val out = MultimodalOps.withDecodedMeta(media).select("media_id", "meta.*")
    val rows = out.orderBy("media_id").collect()
    assert(rows.length == 3)
    // identical bytes → identical meta; different bytes → (a.s.) different
    assert(rows(0).toSeq.tail == rows(2).toSeq.tail)
    assert(rows(0).getInt(1) != rows(1).getInt(1) || rows(0).getInt(2) != rows(1).getInt(2))
    // schema contract
    rows.foreach { r =>
      assert(r.getInt(1) >= 16 && r.getInt(1) < 16 + 2048) // width
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 4)         // channels
      assert(r.getInt(4) >= 1 && r.getInt(4) <= 240)       // n_frames
      assert(r.getString(5) == "img")
    }
  }

  test("decodeHeaderMeta parses real PNG/BMP headers and stubs the rest") {
    // PNG RGBA 640×480 — big-endian IHDR fields
    val png = MultimodalOps.decodeHeaderMeta(
      MultimodalOps.synthPngHeader(640, 480, alpha = true), "x")
    assert(png.toSeq == Seq(640, 480, 4, 1, "png"))
    // PNG RGB without alpha
    assert(MultimodalOps.decodeHeaderMeta(
      MultimodalOps.synthPngHeader(7, 9, alpha = false), "x").toSeq == Seq(7, 9, 3, 1, "png"))
    // BMP 24-bit 1920×1080 — little-endian DIB fields
    val bmp = MultimodalOps.decodeHeaderMeta(
      MultimodalOps.synthBmpHeader(1920, 1080, bpp = 24), "x")
    assert(bmp.toSeq == Seq(1920, 1080, 3, 1, "bmp"))
    // top-down BMP stores negative height; dims come back positive
    val neg = MultimodalOps.synthBmpHeader(32, -64, bpp = 32)
    assert(MultimodalOps.decodeHeaderMeta(neg, "x").toSeq == Seq(32, 64, 4, 1, "bmp"))
    // text that merely starts with "BM" must NOT sniff as BMP
    val text = "BM is a prefix of this perfectly ordinary sentence padded out".getBytes("UTF-8")
    assert(MultimodalOps.decodeHeaderMeta(text, "img").getString(4) == "img")
    // truncated PNG signature falls back too
    assert(MultimodalOps.decodeHeaderMeta(Array[Byte](0x89.toByte, 'P'), "img").getString(4) == "img")
  }

  test("withResizedMeta preserves aspect ratio and caps the long side") {
    val out = MultimodalOps.withResizedMeta(MultimodalOps.withDecodedMeta(media), maxSide = 64)
      .select("meta.width", "meta.height", "resized_meta.width", "resized_meta.height")
    out.collect().foreach { r =>
      val (w, h, rw, rh) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(math.max(rw, rh) <= 64)
      // aspect preserved within integer truncation
      if (w >= h) assert(math.abs(rh.toDouble / rw - h.toDouble / w) < 0.1)
    }
  }

  test("sampleFrames explodes every stride-th frame (generator shape)") {
    val decoded = MultimodalOps.withDecodedMeta(media)
    val frames = MultimodalOps.sampleFrames(decoded, stride = 4)
    val counts = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nFrames = decoded.select("media_id", "meta.n_frames")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    nFrames.foreach { case (id, n) =>
      assert(counts(id) == (n - 1) / 4 + 1, s"media $id: $n frames")
    }
    // frame indices are the arithmetic sequence
    val idx1 = frames.filter(col("media_id") === 1).select("frame_idx")
      .as[Int].collect().sorted
    assert(idx1.toSeq == (0 until nFrames(1L) by 4).toSeq)
  }

  test("decodeWavMeta round-trips canonical PCM WAV and fails closed otherwise") {
    val b = MultimodalOps.synthWavHeader(44100, 2, 16, 44100L)
    val m = MultimodalOps.decodeWavMeta(b)
    assert(m.getInt(0) == 44100 && m.getInt(1) == 2 && m.getInt(2) == 16)
    assert(m.getLong(3) == 44100L && m.getLong(4) == 1000000L)
    // mono 8-bit, non-integer duration floors
    val m2 = MultimodalOps.decodeWavMeta(MultimodalOps.synthWavHeader(8000, 1, 8, 12345L))
    assert(m2.getLong(3) == 12345L && m2.getLong(4) == 12345L * 1000000L / 8000L)
    // not WAV → null (no stub fabrication on the audio path)
    assert(MultimodalOps.decodeWavMeta("RIFFxxxxTEXT".getBytes ++ new Array[Byte](40)) == null)
    assert(MultimodalOps.decodeWavMeta(MultimodalOps.synthPngHeader(4, 4, alpha = true)) == null)
    // truncated header → null
    assert(MultimodalOps.decodeWavMeta(b.take(40)) == null)
    // withAudioMeta: NULL struct for unparseable rows, values for good ones
    val df = Seq((1L, b), (2L, Array[Byte](1, 2, 3))).toDF("media_id", "bytes")
    val out = MultimodalOps.withAudioMeta(df).orderBy("media_id").collect()
    assert(out(0).getAs[org.apache.spark.sql.Row]("audio_meta").getInt(0) == 44100)
    assert(out(1).isNullAt(out(1).fieldIndex("audio_meta")))
  }

  test("PNG pixel decode: every row filter round-trips in every color layout") {
    def v(r: Int, c: Int, ch: Int): Int = (r * 37 + c * 11 + ch * 71 + 13) % 256
    for (ch <- Seq(1, 2, 3, 4); ft <- 0 to 4) {
      val png = MultimodalOps.synthPng(9, 7, ch, _ => ft)(v)
      val (w, h, nch, px) = MultimodalOps.decodePngPixels(png)
      assert((w, h, nch) == ((9, 7, ch)), s"ch=$ch ft=$ft")
      for (r <- 0 until 7; c <- 0 until 9; k <- 0 until ch)
        assert((px((r * 9 + c) * ch + k) & 0xff) == v(r, c, k), s"ch=$ch ft=$ft ($r,$c,$k)")
    }
    // mixed filters per row (the realistic encoder output)
    val png = MultimodalOps.synthPng(16, 10, 3, r => (r * 3 + 1) % 5)(v)
    val (_, _, _, px) = MultimodalOps.decodePngPixels(png)
    for (r <- 0 until 10; c <- 0 until 16; k <- 0 until 3)
      assert((px((r * 16 + c) * 3 + k) & 0xff) == v(r, c, k), s"mixed ($r,$c,$k)")
  }

  test("PNG pixel decode fails closed on interlace, palette, 16-bit, truncation") {
    val good = MultimodalOps.synthPng(6, 4, 3)((r, c, ch) => r + c + ch)
    // interlace byte lives at offset 28 (sig 8 + len 4 + type 4 + 13-1)
    val inter = good.clone(); inter(28) = 1
    assert(intercept[IllegalArgumentException](
      MultimodalOps.decodePngPixels(inter)).getMessage.contains("interlaced"))
    val pal = good.clone(); pal(25) = 3 // color type byte
    assert(intercept[IllegalArgumentException](
      MultimodalOps.decodePngPixels(pal)).getMessage.contains("color type"))
    val deep = good.clone(); deep(24) = 16 // bit depth byte
    assert(intercept[IllegalArgumentException](
      MultimodalOps.decodePngPixels(deep)).getMessage.contains("bit depth"))
    intercept[IllegalArgumentException](
      MultimodalOps.decodePngPixels(good.take(good.length - 20)))
    // header-only synth (no IDAT) is rejected, not fabricated
    intercept[IllegalArgumentException](
      MultimodalOps.decodePngPixels(MultimodalOps.synthPngHeader(4, 4, alpha = false)))
  }

  test("pngToPixels emits one row per sample with pass-through columns") {
    val png = MultimodalOps.synthPng(5, 3, 2)((r, c, ch) => (r * 5 + c) * 2 + ch)
    val df = Seq((42L, png)).toDF("img_id", "bytes")
    val out = MultimodalOps.pngToPixels(df)
    assert(out.columns.toSeq == Seq("img_id", "px_row", "px_col", "channel", "value"))
    assert(out.count() == 5 * 3 * 2)
    val bad = out.filter(col("value") =!=
      (col("px_row") * 5 + col("px_col")) * 2 + col("channel"))
    assert(bad.count() == 0)
    assert(out.select("img_id").distinct().head().getLong(0) == 42L)
  }

  test("withEmbedding feeds Similarity: identical payloads are nearest neighbors") {
    val emb = MultimodalOps.withEmbedding(media, dim = 8)
      .select(col("media_id").as("vec_id"), col("embedding"))
    val top = Similarity.bruteForceTopK(emb.filter(col("vec_id") === 1), emb, k = 2)
      .orderBy("rank").collect()
    assert(top(0).getAs[Long]("neighbor_id") == 3L) // identical bytes → cosine 1
    assert(math.abs(top(0).getAs[Double]("score") - 1.0) < 1e-9)
  }
}
