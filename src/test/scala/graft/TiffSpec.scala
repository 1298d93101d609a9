package graft

import graft.operators.{RasterBridge, Regrid, Tiff}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TIFF codec invariants (feature_stacking.py:75-98 ingest shape): the
  * synth writer and the IFD parser must agree in both byte orders and
  * both block layouts, and the block bridge must reproduce the raster
  * exactly through explodeBlocks.
  */
class TiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def meta(bytes: Array[Byte]) = Tiff.decodeMeta(bytes)

  test("tiled LE round trip recovers geometry") {
    val b = Tiff.synthTiff(40, 24, 16, 16, littleEndian = true, tile = true)((r, c) => r + c)
    val m = meta(b)
    assert(m.getInt(0) == 40 && m.getInt(1) == 24)
    assert(m.getInt(2) == 32 && m.getInt(3) == 3 && m.getInt(4) == 1)
    assert(m.getBoolean(5)) // tiled
    assert(m.getInt(6) == 16 && m.getInt(7) == 16)
    assert(m.getInt(8) == 3 * 2) // ceil(40/16) * ceil(24/16)
    assert(m.getString(9) == "LE")
    assert(m.isNullAt(10) && m.isNullAt(12)) // no geo tags
  }

  test("stripped BE round trip recovers geometry") {
    val b = Tiff.synthTiff(20, 30, 20, 8, littleEndian = false, tile = false)((r, c) => r - c)
    val m = meta(b)
    assert(m.getInt(0) == 20 && m.getInt(1) == 30)
    assert(!m.getBoolean(5))
    assert(m.getInt(6) == 20 && m.getInt(7) == 8)
    assert(m.getInt(8) == 4) // ceil(30/8)
    assert(m.getString(9) == "BE")
  }

  test("GeoTIFF scale/tiepoint surface as a GridDef") {
    val g = Regrid.GridDef(-17.25, 48.5, 0.125, 0.25)
    val b = Tiff.synthTiff(8, 8, 8, 8, littleEndian = true, tile = true,
      grid = Some(g))((r, c) => 0f)
    assert(Tiff.gridDefOf(b).contains(g))
    val noGeo = Tiff.synthTiff(8, 8, 8, 8, littleEndian = true, tile = true)((r, c) => 0f)
    assert(Tiff.gridDefOf(noGeo).isEmpty)
  }

  test("non-TIFF payloads fail closed (null meta)") {
    assert(meta(null) == null)
    assert(meta(Array[Byte]()) == null)
    assert(meta("not a tiff at all".getBytes("UTF-8")) == null)
    assert(meta(operators.MultimodalOps.synthPngHeader(4, 4, alpha = false)) == null)
    // valid order bytes but wrong magic
    val junk = "II".getBytes("US-ASCII") ++ Array[Byte](41, 0, 8, 0, 0, 0)
    assert(meta(junk) == null)
  }

  test("blocksOf rejects compressed or non-float32 files") {
    val b = Tiff.synthTiff(8, 8, 8, 8, littleEndian = true, tile = true)((r, c) => 0f)
    // patch Compression (tag 259, third entry's value) to 5 (LZW)
    val patched = b.clone()
    // IFD at 8; entries at 10; 259 is the 4th entry (256,257,258,259)
    val valOff = 10 + 3 * 12 + 8
    patched(valOff) = 5
    val m = meta(patched)
    assert(m.getInt(4) == 5) // header still parses, compression reported
    val e = intercept[IllegalArgumentException](Tiff.blocksOf(patched))
    assert(e.getMessage.contains("uncompressed"))
  }

  test("tiled round trip through explodeBlocks reproduces the raster (both orders)") {
    for (le <- Seq(true, false)) {
      val tiff = Tiff.synthTiff(24, 16, 16, 16, littleEndian = le, tile = true,
        pad = -1f)((r, c) => (r * 24 + c).toFloat)
      val media = Seq((1L, tiff)).toDF("id", "bytes")
      val blocks = Tiff.tiffToBlocks(media)
      val px = RasterBridge.explodeBlocks(blocks, blockH = 16, blockW = 16, nodata = -1f)
        .select("px_row", "px_col", "value").as[(Int, Int, Float)].collect()
      assert(px.length == 24 * 16, s"le=$le")
      px.foreach { case (r, c, v) =>
        assert(r < 16 && c < 24 && v == r * 24 + c, s"le=$le ($r,$c)=$v")
      }
    }
  }

  test("stripped round trip clips the last strip instead of padding") {
    // 6 rows, 4 per strip: strips of 4 and 2 rows
    val tiff = Tiff.synthTiff(5, 6, 5, 4, littleEndian = true, tile = false)(
      (r, c) => (10 * r + c).toFloat)
    val blocks = Tiff.blocksOf(tiff)
    assert(blocks.map(b => (b._1, b._3)) == Seq((0, 4), (1, 2)))
    val media = Seq((1L, tiff)).toDF("id", "bytes")
    val px = RasterBridge.explodeBlocks(Tiff.tiffToBlocks(media),
        blockH = 4, blockW = 5, nodata = Float.NaN)
      .select("px_row", "px_col", "value").as[(Int, Int, Float)].collect()
    assert(px.length == 30)
    px.foreach { case (r, c, v) => assert(v == 10 * r + c, s"($r,$c)") }
  }

  test("writer geometry contracts are enforced") {
    intercept[IllegalArgumentException] {
      Tiff.synthTiff(0, 4, 4, 4, littleEndian = true, tile = true)((_, _) => 0f)
    }
    intercept[IllegalArgumentException] { // strips must span the width
      Tiff.synthTiff(8, 8, 4, 4, littleEndian = true, tile = false)((_, _) => 0f)
    }
  }
}
