package graft

import graft.operators.RasterBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Block-blob ⇄ pixel-row bridge invariants: explode decodes global
  * coordinates and nodata discipline; pack ∘ explode is the identity on
  * nodata-free pixel tables (the S1/S5 raster-store round trip).
  */
class RasterBridgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val NoData = -9999.0f

  /** One 4×4 block at tile (1, 2) with value 10r+c, nodata on the diagonal. */
  private def blockRow = {
    val buf = java.nio.ByteBuffer.allocate(4 * 16)
    for { r <- 0 until 4; c <- 0 until 4 }
      buf.putFloat(4 * (r * 4 + c), if (r == c) NoData else (10 * r + c).toFloat)
    Seq(("B8", 1, 2, 4, 4, buf.array()))
      .toDF("band", "tile_y", "tile_x", "block_h", "block_w", "blob")
  }

  test("explodeBlocks: global coords, passthrough columns, nodata dropped") {
    val px = RasterBridge.explodeBlocks(blockRow, blockH = 4, blockW = 4, nodata = NoData)
    assert(px.count() == 12) // 16 − 4 diagonal nodata
    val got = px.collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> (r.getString(0), r.getFloat(3))).toMap
    for { r <- 0 until 4; c <- 0 until 4 if r != c } {
      assert(got((4 + r, 8 + c)) == ("B8", (10 * r + c).toFloat), s"local ($r,$c)")
    }
    assert(!got.contains((4, 8))) // diagonal dropped
  }

  test("explodeBlocks keeps nodata as NULL when dropNodata=false") {
    val px = RasterBridge.explodeBlocks(blockRow, 4, 4, NoData, dropNodata = false)
    assert(px.count() == 16)
    assert(px.filter(col("value").isNull).count() == 4)
  }

  test("partial edge blocks decode with their own geometry") {
    // 2×3 edge block at tile (0, 1) of a blockH=4/blockW=4 grid
    val buf = java.nio.ByteBuffer.allocate(4 * 6)
    for (i <- 0 until 6) buf.putFloat(4 * i, i.toFloat)
    val edge = Seq((0, 1, 2, 3, buf.array()))
      .toDF("tile_y", "tile_x", "block_h", "block_w", "blob")
    val px = RasterBridge.explodeBlocks(edge, blockH = 4, blockW = 4, nodata = NoData)
    val got = px.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getFloat(2)).toMap
    assert(got.size == 6)
    assert(got((0, 4)) == 0.0f && got((1, 6)) == 5.0f)
  }

  test("pack/explode round-trips negative coordinates (tiles left/above the origin)") {
    // the affine mapping legitimately produces negative pixel coords for
    // points left/above the grid origin; floor division must bucket them
    // into tile -1 with non-negative local offsets
    val pixels = Seq((-1, -1, 1.0f), (-4, -4, 2.0f), (0, 0, 3.0f), (-1, 2, 4.0f))
      .toDF("px_row", "px_col", "value")
    val blocks = RasterBridge.packBlocks(pixels, blockH = 4, blockW = 4, nodata = NoData)
    val tiles = blocks.select("tile_y", "tile_x")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(tiles == Set((-1, -1), (0, 0), (-1, 0)))
    val back = RasterBridge.explodeBlocks(blocks, 4, 4, NoData)
      .select("px_row", "px_col", "value")
    assert(back.collect().map(_.toSeq).toSet == pixels.collect().map(_.toSeq).toSet)
  }

  test("NaN nodata is honored (NaN != NaN would silently keep every cell)") {
    val buf = java.nio.ByteBuffer.allocate(4 * 4)
    buf.putFloat(0, 1.0f); buf.putFloat(4, Float.NaN)
    buf.putFloat(8, 2.0f); buf.putFloat(12, Float.NaN)
    val blocks = Seq((0, 0, 2, 2, buf.array()))
      .toDF("tile_y", "tile_x", "block_h", "block_w", "blob")
    val dropped = RasterBridge.explodeBlocks(blocks, 2, 2, Float.NaN)
    assert(dropped.count() == 2)
    assert(dropped.select("value").collect().map(_.getFloat(0)).toSet == Set(1.0f, 2.0f))
    val kept = RasterBridge.explodeBlocks(blocks, 2, 2, Float.NaN, dropNodata = false)
    assert(kept.count() == 4)
    assert(kept.filter(col("value").isNull).count() == 2)
  }

  test("packBlocks rejects duplicate pixels instead of order-dependent last-write-wins") {
    val pixels = Seq((1, 1, 1.0f), (1, 1, 2.0f), (0, 0, 3.0f))
      .toDF("px_row", "px_col", "value")
    val e = intercept[org.apache.spark.SparkException] {
      RasterBridge.packBlocks(pixels, blockH = 4, blockW = 4, nodata = NoData).count()
    }
    assert(e.getMessage.contains("duplicate pixel") ||
      Option(e.getCause).exists(_.getMessage.contains("duplicate pixel")))
  }

  test("explode ∘ pack is the identity on nodata-free pixel tables") {
    val pixels = (for { r <- 0 until 8; c <- 0 until 8 if (r * 8 + c) % 5 != 0 }
      yield ("s1", r, c, (r * 100 + c).toFloat)).toDF("scene", "px_row", "px_col", "value")
    val blocks = RasterBridge.packBlocks(pixels, blockH = 4, blockW = 4,
      nodata = NoData, keyCols = Seq("scene"))
    assert(blocks.count() == 4) // 2×2 tile grid
    assert(blocks.select("block_h", "block_w").distinct().head() ==
      org.apache.spark.sql.Row(4, 4))
    val back = RasterBridge.explodeBlocks(blocks, 4, 4, NoData)
      .select("scene", "px_row", "px_col", "value")
    val a = pixels.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
