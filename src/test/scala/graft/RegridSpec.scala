package graft

import graft.operators.Regrid
import graft.operators.Regrid.GridDef
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Grid alignment invariants (feature_stacking.py:72-102 semantics):
  * nearest picks the aux cell containing the master center, bilinear
  * reproduces linear fields exactly and renormalizes at coverage edges.
  */
class RegridSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // master: 4×4 grid of 1×1 cells, top-left world corner (0, 4)
  private val masterGrid = GridDef(0.0, 4.0, 1.0, 1.0)
  private def master = (for { r <- 0 until 4; c <- 0 until 4 } yield (r, c))
    .toDF("px_row", "px_col")

  // aux: 2×2 grid of 2×2 cells over the same extent, value = 10r + c
  private val auxGrid = GridDef(0.0, 4.0, 2.0, 2.0)
  private def aux = (for { r <- 0 until 2; c <- 0 until 2 } yield (r, c, (10 * r + c).toDouble))
    .toDF("px_row", "px_col", "dem")

  test("nearest downsample: each master cell reads the containing aux cell") {
    val out = Regrid.regridNearest(master, aux, masterGrid, auxGrid, Seq("dem"))
    assert(out.count() == 16)
    val got = out.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for { r <- 0 until 4; c <- 0 until 4 }
      assert(got((r, c)) == 10.0 * (r / 2) + (c / 2), s"cell ($r,$c)")
  }

  test("nearest out-of-coverage master cells get NULL (dst_nodata fill)") {
    // shift the aux origin right+down by one master cell: master col 0 /
    // row 0 centers now fall outside aux coverage
    val shifted = GridDef(1.0, 3.0, 2.0, 2.0)
    val out = Regrid.regridNearest(master, aux, masterGrid, shifted, Seq("dem"))
    assert(out.count() == 16)
    assert(out.filter(col("dem").isNull).count() == 7) // row 0 ∪ col 0
    assert(out.filter(col("px_row") === 0 && col("dem").isNotNull).count() == 0)
  }

  test("master/valueCols name clash is rejected, not silently duplicated") {
    val masterWithDem = master.withColumn("dem", lit(0.0))
    val e1 = intercept[IllegalArgumentException] {
      Regrid.regridNearest(masterWithDem, aux, masterGrid, auxGrid, Seq("dem"))
    }
    assert(e1.getMessage.contains("disjoint"))
    val e2 = intercept[IllegalArgumentException] {
      Regrid.regridBilinear(masterWithDem, aux, masterGrid, auxGrid, Seq("dem"))
    }
    assert(e2.getMessage.contains("disjoint"))
  }

  test("bilinear reproduces a linear field exactly where all 4 taps exist") {
    // aux value = world x + world y sampled at aux pixel centers
    val linAux = (for { r <- 0 until 2; c <- 0 until 2 } yield {
      val x = 0.0 + (c + 0.5) * 2.0
      val y = 4.0 - (r + 0.5) * 2.0
      (r, c, x + y)
    }).toDF("px_row", "px_col", "f")
    val out = Regrid.regridBilinear(master, linAux, masterGrid, auxGrid, Seq("f"))
    // interior master cells (all four taps in coverage): rows/cols 1-2
    val got = out.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for { r <- 1 to 2; c <- 1 to 2 } {
      val x = 0.0 + (c + 0.5) * 1.0
      val y = 4.0 - (r + 0.5) * 1.0
      assert(math.abs(got((r, c)) - (x + y)) < 1e-12, s"cell ($r,$c)")
    }
  }

  test("bilinear renormalizes dropped edge taps; constant field stays constant") {
    val const = aux.withColumn("dem", lit(7.0))
    val out = Regrid.regridBilinear(master, const, masterGrid, auxGrid, Seq("dem"))
    assert(out.count() == 16)
    // corners/edges lose taps but the renormalized weights still sum to 1
    val vals = out.select("dem").as[Double].collect()
    assert(vals.forall(v => math.abs(v - 7.0) < 1e-12))
  }

  test("cubic on the identity grid reproduces aux values exactly (interior)") {
    // same grid both sides → fx = fy = 0, and Catmull-Rom is interpolating:
    // weights collapse to (0, 1, 0, 0)
    val aux6 = (for { r <- 0 until 6; c <- 0 until 6 } yield (r, c, (10 * r + c).toDouble))
      .toDF("px_row", "px_col", "f")
    val grid6 = GridDef(0.0, 6.0, 1.0, 1.0)
    val out = Regrid.regridCubic(aux6.select("px_row", "px_col"), aux6, grid6, grid6, Seq("f"))
    val got = out.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for { r <- 1 to 3; c <- 1 to 3 } // all 16 taps in coverage
      assert(math.abs(got((r, c)) - (10 * r + c)) < 1e-12, s"cell ($r,$c)")
  }

  test("cubic reproduces a linear field at half-cell offsets (linear precision)") {
    // aux 8×8 of 1×1 cells with f = x + y at centers; master shifted so
    // every master center sits exactly between aux centers (fx = fy = 0.5)
    val aux8 = (for { r <- 0 until 8; c <- 0 until 8 } yield {
      val x = 0.0 + (c + 0.5); val y = 8.0 - (r + 0.5)
      (r, c, x + y)
    }).toDF("px_row", "px_col", "f")
    val masterShift = GridDef(0.5, 7.5, 1.0, 1.0)
    val master8 = (for { r <- 0 until 7; c <- 0 until 7 } yield (r, c)).toDF("px_row", "px_col")
    val out = Regrid.regridCubic(master8, aux8, masterShift, GridDef(0.0, 8.0, 1.0, 1.0), Seq("f"))
    val got = out.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for { r <- 1 to 5; c <- 1 to 5 } { // interior: all 16 taps exist
      val x = 0.5 + (c + 0.5); val y = 7.5 - (r + 0.5)
      assert(math.abs(got((r, c)) - (x + y)) < 1e-12, s"cell ($r,$c)")
    }
  }

  test("bilinear with zero coverage yields NULL") {
    val far = GridDef(100.0, 200.0, 2.0, 2.0)
    val out = Regrid.regridBilinear(master, aux, masterGrid, far, Seq("dem"))
    assert(out.filter(col("dem").isNotNull).count() == 0)
    assert(out.count() == 16)
  }
}
