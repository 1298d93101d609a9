package graft

import graft.pipeline.Stages
import graft.operators.MlOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden end-to-end (SURVEY.md §5.5): a tiny synthetic multi-scene grid
  * through stack → pixel-classify → segment → object-classify, checking the
  * final label table, plus per-stage invariants (B1 planted cases).
  */
class StagesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val bands = Seq("B4", "B6", "B8")

  /** 3 scenes over a 8×8 grid; left half vegetated (high NIR), right half
    * urban (low NIR). Planted: an all-masked pixel, a sentinel pixel,
    * a udm2-masked scene observation.
    */
  private def scenes = {
    val rows = for {
      scene <- 1 to 3
      r <- 0 until 8
      c <- 0 until 8
    } yield {
      val veg = c < 4
      val nir = if (veg) 100.0f + scene else 10.0f + scene
      val red = if (veg) 10.0f else 50.0f
      val green = 30.0f
      val clear = !(r == 7 && c == 7 && scene == 1) // udm2 mask: one obs dirty
      val b8 = if (r == 0 && c == 0 && scene == 2) -9999.0f else nir // sentinel
      (scene.toLong, if (scene <= 2) 6 else 12, r, c, green, red, b8, clear)
    }
    rows.toDF("scene_id", "month", "px_row", "px_col", "B4", "B6", "B8", "udm2_clear")
  }

  test("stage 0: feature stack composites per pixel with NULL discipline") {
    val stack = Stages.featureStack(scenes, bands, monthlyMonths = Seq(6), winterMonths = Seq(12))
    assert(stack.count() == 64)
    val r00 = stack.filter(col("px_row") === 0 && col("px_col") === 0).collect()(0)
    // sentinel in scene 2 nulled; median over scenes {1} month 6 (scene2's B8 null → ndvi null)
    assert(!r00.isNullAt(r00.fieldIndex("ndvi_m6")))
    val veg = stack.filter(col("px_col") < 4).select(avg("ndvi_m6")).as[Double].head()
    val urb = stack.filter(col("px_col") >= 4).select(avg("ndvi_m6")).as[Double].head()
    assert(veg > 0.7 && urb < 0.0) // NDVI separates the halves
    // winter composite carries the full band vector
    assert(stack.columns.contains("win_B8"))
  }

  test("stage 0 step 2: aux raster aligns onto the master grid before stacking") {
    import graft.operators.Regrid.GridDef
    // master: the 8×8 stack grid, 1×1 cells from world origin (0, 8)
    val stack = Stages.featureStack(scenes, bands, Seq(6), Seq(12))
    // aux DEM: 4×4 grid of 2×2 cells over the same extent, elevation 100r+c
    val dem = (for { r <- 0 until 4; c <- 0 until 4 } yield (r, c, (100 * r + c).toDouble))
      .toDF("px_row", "px_col", "elev")
    val aligned = Stages.alignAux(stack.select("px_row", "px_col"), dem,
      GridDef(0.0, 8.0, 1.0, 1.0), GridDef(0.0, 8.0, 2.0, 2.0), Seq("elev"))
    val stacked = stack.join(aligned, Seq("px_row", "px_col"))
    assert(stacked.count() == 64)
    // every master pixel reads the containing DEM cell: (r,c) → (r/2, c/2)
    val bad = stacked.filter(
      col("elev") =!= (floor(col("px_row") / 2) * 100 + floor(col("px_col") / 2))).count()
    assert(bad == 0)
    assert(stacked.filter(col("elev").isNull).count() == 0)
  }

  test("stage 1: per-combo dispatch + rules classify the halves correctly") {
    val stack = Stages.featureStack(scenes, bands, Seq(6), Seq(12))
      .select(col("px_row"), col("px_col"),
        col("ndvi_m6").as("f1"), (col("win_B8") / 100.0).as("f2"))
    val training = stack.withColumn("label", when(col("f1") > 0.5, 1).otherwise(2))
    val out = Stages.classifyPixels(stack, training, Seq("f1", "f2"))
    assert(out.count() == 64)
    val acc = out.withColumn("expect", when(col("px_col") < 4, 1).otherwise(2))
      .filter(col("pred_label") === col("expect")).count()
    assert(acc == 64)
  }

  test("stages 2+3: segment the classified map and object-classify with fallback") {
    val stack = Stages.featureStack(scenes, bands, Seq(6), Seq(12))
    // 8-bit-stretch the index before felzenszwalb, as the reference does
    // (M8, image_segmentation.py:43-51) — scale=35 assumes 0-255 magnitudes
    val pixels = stack.select(col("px_row"), col("px_col"),
      ((coalesce(col("ndvi_m6"), lit(0.0)) + 1.0) * 127.5).cast("float").as("F1"))
    val segs = Stages.segment(pixels, Seq("F1"), tileSize = 8, pad = 2)
    assert(segs.select("seg_id").distinct().count() == 2) // two regions

    val feats = Stages.segmentFeatures(pixels, segs, Seq("F1"))
    assert(feats.count() == 2)
    val rect = feats.select("rectangularity").as[Double].collect()
    assert(rect.forall(_ == 1.0)) // both regions are perfect rectangles

    // backup model trained to map mean_F1 → class; lookup overrides one segment
    val train = (1 to 80).map(i =>
      (if (i % 2 == 0) 230.0 else 40.0, if (i % 2 == 0) 1 else 2)).toDF("mean_F1", "label")
    val backup = MlOps.trainRf(train, Seq("mean_F1"), "label", numTrees = 10, maxDepth = 3)
    val vegSeg = feats.orderBy(desc("mean_F1")).select("seg_id").as[Long].head()
    val lookup = Seq((vegSeg, 7)).toDF("seg_id", "main_pred")
    val out = Stages.classifyObjects(feats, lookup, backup)
      .select("seg_id", "PredClass").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(vegSeg) == 7)                   // lookup wins
    assert(out.values.toSet == Set(7, 2))      // other segment via backup model
  }

  test("prepareSegmentationFeatures: indices + per-tile PCA + 8-bit stretch (Stage-2 prep)") {
    val px = (for { r <- 0 until 16; c <- 0 until 16 } yield
      (r, c, (c * 10).toFloat, (160 - c * 10).toFloat)).toDF("px_row", "px_col", "F1", "F2")
    val out = Stages.prepareSegmentationFeatures(px, Seq("F1", "F2"), tileSize = 16)
    assert(out.count() == 256)
    val cols = out.columns.toSet
    assert(cols.contains("pca1") && cols.contains("F1_8bit") && cols.contains("pca1_8bit"))
    // stretched channels live in [0, 255]
    Seq("F1_8bit", "F2_8bit", "pca1_8bit").foreach { c =>
      val mm = out.agg(min(col(c)), max(col(c))).collect()(0)
      assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 255.0)
    }
    // F1/F2 are perfectly anti-correlated → pca1 captures all variance
    val ratio = out.agg(
      (variance(col("pca1")) / (variance(col("F1")) + variance(col("F2")))).as("r"))
      .collect()(0).getDouble(0)
    assert(ratio > 0.99)
  }

  test("runIfMissing executes once and then reads the checkpoint (S8)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_s8").toString + "/out"
    var runs = 0
    def job = { runs += 1; Seq((1, "a")).toDF("k", "v") }
    val first = Stages.runIfMissing(spark, dir)(job)
    assert(first.count() == 1 && runs == 1)
    val second = Stages.runIfMissing(spark, dir)(job)
    assert(second.count() == 1 && runs == 1) // skipped, read back
  }
}
