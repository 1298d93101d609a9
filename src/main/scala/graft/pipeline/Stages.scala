package graft.pipeline

import graft.functions.ScalarOps
import graft.operators.{Composite, MlOps, Regrid, Segmentation}
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's four pipeline stages re-expressed as composable
  * DataFrame jobs (SURVEY.md §3 lifecycles, §7 step 8).
  *
  * Data model: scenes/stacks are tall pixel tables (SURVEY.md §7 design
  * stance) — `scene_id, month, px_row, px_col, B1..Bn, udm2_clear` — not
  * rasters; tiling is partitioning, not windowing. Each stage is
  * DataFrame-in/DataFrame-out so the whole pipeline is one lazy Catalyst
  * plan unless checkpointed through parquet via `runIfMissing`.
  */
object Stages {

  /** S8 — skip-if-exists orchestration (feature_stacking.py:261-262,318:
    * recompute only when the output is missing). Parquet `_SUCCESS` marker
    * is the completion token; partial writes are rerun.
    */
  def runIfMissing(spark: SparkSession, path: String)(job: => DataFrame): DataFrame = {
    val success = new java.io.File(path, "_SUCCESS")
    if (!success.exists()) {
      job.write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  // ---------- Stage 0 — feature stacking (feature_stacking.py) ----------

  /** Normalize a raw scene table at the scan boundary: sentinel/NaN → NULL
    * (P3), quality-masked pixels nulled (J5's udm2 sidecar applied as a
    * boolean column — the join by filename happened at load).
    */
  def normalizeScenes(scenes: DataFrame, bands: Seq[String]): DataFrame = {
    val masked = bands.foldLeft(scenes) { (df, b) =>
      df.withColumn(b,
        when(col("udm2_clear"), ScalarOps.nullifNoData(col(b))).otherwise(lit(null)))
    }
    masked.drop("udm2_clear")
  }

  /** P5 — attach NDVI/NDWI index columns (feature_stacking.py:253-278;
    * band roles follow the reference: nir=B8, red=B6, green=B4 of the
    * 8-band PlanetScope layout).
    */
  def withIndices(df: DataFrame, nir: String = "B8", red: String = "B6",
      green: String = "B4"): DataFrame =
    df.withColumn("ndvi", ScalarOps.normalizedDiff(col(nir), col(red)))
      .withColumn("ndwi", ScalarOps.normalizedDiff(col(green), col(nir)))

  /** Stage-0 step 2 — align an auxiliary raster (DEM, mask, prior-year
    * scene) onto the master grid BEFORE stacking (feature_stacking.py:
    * 316-320 DEM bilinear, :340-345 scenes/masks). The aux raster lives on
    * its own affine grid; after alignment its `valueCols` ride the master
    * pixel key and band-concat join like any other band.
    */
  def alignAux(
      master: DataFrame,
      aux: DataFrame,
      masterGrid: Regrid.GridDef,
      auxGrid: Regrid.GridDef,
      valueCols: Seq[String],
      bilinear: Boolean = false): DataFrame =
    if (bilinear) Regrid.regridBilinear(master, aux, masterGrid, auxGrid, valueCols)
    else Regrid.regridNearest(master, aux, masterGrid, auxGrid, valueCols)

  /** Stage-0 composite: per-month median NDVI bands + winter max-NDVI
    * 7-band composite, band-concat joined into one stack per pixel
    * (§3.1 steps 4-6). One aggregation per composite + co-partitioned
    * joins on the pixel key — no per-scene passes.
    */
  def featureStack(
      scenes: DataFrame,
      bands: Seq[String],
      monthlyMonths: Seq[Int],
      winterMonths: Seq[Int]): DataFrame = {
    val px = Seq("px_row", "px_col")
    val indexed = withIndices(normalizeScenes(scenes, bands))

    // monthly median-NDVI layers, one column per month (A1)
    val monthly = monthlyMonths.map { m =>
      Composite
        .medianComposite(indexed.filter(col("month") === m), px, Seq("ndvi"))
        .withColumnRenamed("ndvi", s"ndvi_m$m")
    }

    // winter argmax composite: full band vector at max NDVI (A2)
    val winter = Composite
      .argmaxComposite(indexed.filter(col("month").isin(winterMonths: _*)),
        px, "scene_id", "ndvi", bands)
      .select(px.map(col) ++ bands.map(b => col(b).as(s"win_$b")): _*)

    // J3 — K-way band-concat equi-join on the pixel key
    (monthly :+ winter).reduceLeft((a, b) => a.join(b, px, "outer"))
  }

  // ---------- Stage 1 — pixel classification (pixel_classifier_stream.py) ----------

  /** Route pixels to per-combo RF models, classify, apply rule rewrites
    * (J4 + M1 + P8). Rows with no valid band are dropped (the reference's
    * all-NaN skip, :131).
    */
  def classifyPixels(
      stack: DataFrame,
      training: DataFrame,
      bandCols: Seq[String],
      labelCol: String = "label"): DataFrame = {
    val valid = stack.filter(ScalarOps.anyValid(bandCols.map(col)))
    val classified = MlOps.dispatchByCombo(training, valid, bandCols, labelCol)
    classified.withColumn("pred_label",
      ScalarOps.ruleRewrite(col("pred_label"), col("confidence")))
  }

  // ---------- Stage 2 — segmentation (image_segmentation.py) ----------

  /** The reference's segmentation feature stack (image_segmentation.py:
    * 55-96): NDVI-style indices + per-tile PCA first component + 8-bit
    * percentile stretch of every channel, all before the gaussian+felz
    * kernel. Tiles here are derived from pixel coords (`tileSize`); the
    * PCA is the moments+power-iteration operator (A8), the stretch the
    * two-pass percentile cuts (A4/M8) — one aggregation each, broadcast
    * joins back.
    *
    * Returns the frame with `featOut` columns (stretched originals +
    * stretched pca1) ready for `segment`.
    */
  def prepareSegmentationFeatures(
      pixels: DataFrame,
      bands: Seq[String],
      tileSize: Int = 4096): DataFrame = {
    val withTile = pixels
      .withColumn("seg_tile_x", floor(col("px_col") / tileSize).cast("int"))
      .withColumn("seg_tile_y", floor(col("px_row") / tileSize).cast("int"))
    val tileKey = Seq("seg_tile_x", "seg_tile_y")
    val withPca = graft.operators.TilePca.withPca1(withTile, tileKey, bands)
    val stretched = (bands :+ "pca1").foldLeft(withPca) { (df, b) =>
      graft.operators.Composite.withStretch(df, tileKey, b)
        .drop("cut_lo", "cut_hi")
    }
    stretched.drop("seg_tile_x", "seg_tile_y")
  }

  /** Halo'd felzenszwalb over tiles + polygonize; see Segmentation. */
  def segment(
      stack: DataFrame,
      featureCols: Seq[String],
      tileSize: Int = 4096,
      pad: Int = 256): DataFrame =
    Segmentation.segmentTiles(stack, featureCols,
      tileH = tileSize, tileW = tileSize, pad = pad)

  def polygons(segments: DataFrame): DataFrame =
    Segmentation.polygonize(segments.select("px_row", "px_col", "seg_id"))

  // ---------- Stage 3 — object classification (object_classifier.py) ----------

  /** Per-segment feature extraction: band means + the reference's shape
    * features computed from the cell set (object_classifier.py:49-68's
    * cached features, derived relationally instead of from geometry files).
    */
  def segmentFeatures(pixels: DataFrame, segments: DataFrame,
      bandCols: Seq[String]): DataFrame = {
    val joined = pixels.join(segments, Seq("px_row", "px_col"))
    joined
      .groupBy("seg_id")
      .agg(
        count(lit(1)).as("n_px"),
        Seq(
          (max("px_row") - min("px_row") + 1).as("height"),
          (max("px_col") - min("px_col") + 1).as("width")) ++
          bandCols.map(b => avg(col(b)).as(s"mean_$b")): _*)
      .withColumn("rectangularity", col("n_px") / (col("height") * col("width")))
      .withColumn("elongation",
        greatest(col("height"), col("width")) / least(col("height"), col("width")))
  }

  /** J2 — dual-model classification with lookup-first fallback. */
  def classifyObjects(
      features: DataFrame,
      lookup: DataFrame,
      backup: PipelineModel): DataFrame =
    MlOps.withFallback(features, lookup, backup, "seg_id")
      .withColumnRenamed("final_pred", "PredClass")
}
