package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** W1 — the stencil/halo transform (SURVEY.md §2.5 W1, §4 custom item 1).
  *
  * The reference reads each 4096×4096 tile with a 256 px buffer so edge
  * pixels see their neighbors, computes, then crops the buffer
  * (image_segmentation.py:124-149). Spark has no 2-D windows, so we
  * materialize the overlap: every pixel row is emitted once for its own
  * tile (is_core = true) and once for each neighboring tile whose halo
  * region contains it (is_core = false). Downstream stencil kernels
  * (gaussian M6, felzenszwalb M5) group by (halo_tile_x, halo_tile_y),
  * compute with full neighborhoods, and keep only core rows.
  *
  * Scale math: duplication factor is (W+2p)(H+2p)/(W·H) — ≈1.13 for the
  * reference's 4096/256 geometry — so the halo exchange is a single ~13%-
  * inflated shuffle, independent of total data size. No driver involvement,
  * no iterative passes.
  */
object Halo {

  /** Add halo copies. Input must carry global integer pixel coordinates
    * (`rowCol`, `colCol`); tile ids are derived as floorDiv(coord, tile).
    * Output adds: halo_tile_x, halo_tile_y, is_core.
    *
    * `numRows`/`numCols` (global grid extent, exclusive) bound the +1
    * directions so right/bottom edge pixels don't emit copies into tiles
    * past the grid (halo-only groups waste a full kernel run downstream).
    * Pass -1 when the extent is unknown — kernels must then tolerate (or
    * pre-filter) groups with no core rows.
    */
  def withHalo(
      df: DataFrame,
      rowCol: String,
      colCol: String,
      tileH: Int,
      tileW: Int,
      pad: Int,
      numRows: Int = -1,
      numCols: Int = -1): DataFrame = {
    require(pad >= 0 && pad < tileH && pad < tileW, s"pad $pad must be in [0, tile)")
    val r = col(rowCol)
    val c = col(colCol)
    val ty = floor(r / tileH).cast("int")
    val tx = floor(c / tileW).cast("int")
    // offset of the pixel inside its own tile
    val offR = r - ty * tileH
    val offC = c - tx * tileW
    // last tile index in each direction, if the extent is known
    val maxTx = if (numCols > 0) (numCols - 1) / tileW else -1
    val maxTy = if (numRows > 0) (numRows - 1) / tileH else -1

    def fitsX(dx: Int): Column = dx match {
      case 0  => lit(true)
      case -1 => offC < lit(pad) && tx > 0
      case 1  => offC >= lit(tileW - pad) &&
        (if (maxTx >= 0) tx < lit(maxTx) else lit(true))
    }
    def fitsY(dy: Int): Column = dy match {
      case 0  => lit(true)
      case -1 => offR < lit(pad) && ty > 0
      case 1  => offR >= lit(tileH - pad) &&
        (if (maxTy >= 0) ty < lit(maxTy) else lit(true))
    }

    val copies = for { dy <- -1 to 1; dx <- -1 to 1 } yield
      when(fitsX(dx) && fitsY(dy),
        struct(lit(dx).as("dx"), lit(dy).as("dy")))

    df.withColumn("_copies", array(copies: _*))
      .withColumn("_c", explode(filter(col("_copies"), s => s.isNotNull)))
      .withColumn("halo_tile_x", tx + col("_c.dx"))
      .withColumn("halo_tile_y", ty + col("_c.dy"))
      .withColumn("is_core", col("_c.dx") === 0 && col("_c.dy") === 0)
      .drop("_copies", "_c")
  }

  /** 2-D neighborhood mean through the halo exchange: each pixel's output
    * averages the present cells within Chebyshev `radius` — including
    * neighbors in OTHER tiles, which arrive as halo copies. The canonical
    * seam-correctness probe for the W1 machinery (a pixel at a tile edge
    * must see its cross-seam neighbors exactly once).
    *
    * Shape: one ~((T+2r)/T)²-inflated shuffle (withHalo) + one per-tile
    * kernel pass; tiles are independent groups, so the kernel scales with
    * executor count, and each group holds at most (tileH+2r)(tileW+2r)
    * cells — bounded memory regardless of grid extent.
    */
  def tileStencilMean(
      df: DataFrame,
      rowCol: String,
      colCol: String,
      valueCol: String,
      tileH: Int,
      tileW: Int,
      radius: Int,
      numRows: Int = -1,
      numCols: Int = -1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // values flow as DOUBLE: a long cast would silently truncate
    // fractional rasters (NDVI & friends) to integers before averaging.
    // The kernel's add order is the fixed dr/dc scan, so double sums stay
    // deterministic; integer-valued inputs (the oracled w7 path) sum
    // exactly as before.
    val haloed = withHalo(
      df.select(col(rowCol), col(colCol), col(valueCol).cast("double")),
      rowCol, colCol, tileH, tileW, pad = radius, numRows = numRows, numCols = numCols)
      .select(col("halo_tile_x"), col("halo_tile_y"),
        col(rowCol).cast("int"), col(colCol).cast("int"),
        col(valueCol).cast("double"), col("is_core"))
      .as[(Int, Int, Int, Int, Double, Boolean)]
    haloed
      .groupByKey(t => (t._1, t._2))
      .flatMapGroups { (_, rows) =>
        val cells = rows.toArray
        val byPos = cells.iterator.map(t => (t._3, t._4) -> t._5).toMap
        cells.iterator.filter(_._6).map { case (_, _, r, c, _, _) =>
          var sum = 0.0
          var n = 0
          var dr = -radius
          while (dr <= radius) {
            var dc = -radius
            while (dc <= radius) {
              byPos.get((r + dr, c + dc)).foreach { v => sum += v; n += 1 }
              dc += 1
            }
            dr += 1
          }
          (r, c, n, sum / n)
        }
      }
      .toDF(rowCol, colCol, "n_neigh", "nb_mean")
  }
}
