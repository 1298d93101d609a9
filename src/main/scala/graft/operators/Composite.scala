package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stage-0 compositing operators (SURVEY.md §2.3 A1/A2/A3).
  *
  * The reference composites K monthly scenes per pixel:
  *   - median composite: `np.nanmedian(stack, axis=0)` per pixel/band
  *     (feature_stacking.py:131-138)
  *   - max-NDVI composite: keep the whole band vector of the scene whose
  *     NDVI is maximal for that pixel (feature_stacking.py:140-167, the
  *     running-max update at :162-165).
  *
  * Spark-first formulation: the scene stack is a tall pixel table
  * (scene_id, pixel key..., B1..Bn) and compositing is ONE hash aggregation
  * keyed by pixel — a single shuffle regardless of scene count, with
  * map-side partial aggregation. At 100 TB this is the shape you want:
  * no per-scene passes (the reference loops scenes), no windowing.
  *
  * NULL discipline: inputs are normalized (NoData→NULL) at scan boundary
  * (ScalarOps.nullifNoData); built-in `percentile`/`max_by` skip NULLs,
  * which matches the reference's NaN-skipping semantics exactly.
  */
object Composite {

  /** A1 — exact NaN(NULL)-skipping median per pixel for each band.
    * `percentile(col, 0.5)` is Spark's exact interpolated percentile —
    * same definition as DuckDB `median`/`quantile_cont` (SURVEY.md §7
    * hard part b). Swap to `percentile_approx` at bench scale if exactness
    * is not required.
    */
  def medianComposite(scenes: DataFrame, pixelKey: Seq[String], bands: Seq[String]): DataFrame =
    scenes
      .groupBy(pixelKey.map(col): _*)
      .agg(
        percentile(col(bands.head), lit(0.5)).as(bands.head),
        bands.tail.map(b => percentile(col(b), lit(0.5)).as(b)): _*)

  /** A2 — argmax composite: the full band vector of the scene with maximal
    * `scoreCol` per pixel. Deterministic tiebreak: higher score wins, then
    * LOWER scene_id (the reference's first-scene-wins `>` comparison,
    * feature_stacking.py:162-163, made explicit — SURVEY.md §7 hard part c).
    * Implemented as max of a (score, −scene_id, bands...) struct: one
    * single-pass `max` aggregate (partial-aggregated map-side), cheaper than
    * the window-rank formulation (no sort, no second pass).
    */
  def argmaxComposite(
      scenes: DataFrame,
      pixelKey: Seq[String],
      sceneIdCol: String,
      scoreCol: String,
      bands: Seq[String]): DataFrame = {
    val packed = struct(
      (col(scoreCol).as("s") +:
        (lit(0L) - col(sceneIdCol)).as("negScene") +:
        bands.map(col)): _*)
    val best = scenes
      .filter(col(scoreCol).isNotNull)
      .groupBy(pixelKey.map(col): _*)
      .agg(max(packed).as("best"))
    best.select(
      (pixelKey.map(col) :+
        (lit(0L) - col("best.negScene")).as(sceneIdCol) :+
        col("best.s").as(scoreCol)) ++
        bands.map(b => col(s"best.$b").as(b)): _*)
  }

  /** A3 — running max of a score per pixel (the scalar part of A2). */
  def maxScore(scenes: DataFrame, pixelKey: Seq[String], scoreCol: String): DataFrame =
    scenes.groupBy(pixelKey.map(col): _*).agg(max(col(scoreCol)).as(s"max_$scoreCol"))

  /** A4/M8 — per-group percentile cut values (2%/98% contrast stretch,
    * image_segmentation.py:43-51): two-pass — aggregate cuts per group,
    * broadcast-join them back. The cuts table is tiny (one row per tile),
    * so the join back is a broadcast, never a shuffle of the big side.
    */
  def percentileCuts(
      df: DataFrame,
      groupKey: Seq[String],
      valueCol: String,
      lo: Double = 0.02,
      hi: Double = 0.98): DataFrame =
    df.groupBy(groupKey.map(col): _*)
      .agg(
        percentile(col(valueCol), lit(lo)).as("cut_lo"),
        percentile(col(valueCol), lit(hi)).as("cut_hi"))

  def withStretch(df: DataFrame, groupKey: Seq[String], valueCol: String): DataFrame = {
    val cuts = percentileCuts(df, groupKey, valueCol)
    df.join(broadcast(cuts), groupKey)
      .withColumn(
        s"${valueCol}_8bit",
        graft.functions.ScalarOps.stretch8bit(col(valueCol), col("cut_lo"), col("cut_hi")))
  }
}
