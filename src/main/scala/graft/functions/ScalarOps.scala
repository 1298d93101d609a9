package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar expression catalog — the projection/filter layer of SURVEY.md §2.2.
  *
  * Every kernel the reference applies per-pixel with NumPy becomes a plain
  * Catalyst `Column` expression here, so it stays inside whole-stage codegen
  * (no UDFs anywhere in this file). Citations point at the reference behavior
  * each helper reproduces.
  */
object ScalarOps {

  /** The reference's unified nodata sentinel (feature_stacking.py:43 `OUTPUT_NODATA=-9999.0`). */
  val NoData: Float = -9999.0f

  /** P3 — NoData→NULL normalization at the scan boundary.
    * Mirrors `data[data == nodata] = NaN` (pixel_classifier_stream.py:121-122)
    * and the tolerance check `isclose(-9999, atol=1e-2)` (feature_stacking.py:116).
    * NULL (not NaN) is the engine-wide missing value; NaN from upstream is also
    * normalized so aggregates never see it (SURVEY.md §7 hard part d).
    */
  def nullifNoData(c: Column, nodata: Double = NoData.toDouble, atol: Double = 1e-2): Column =
    when(isnan(c) || (abs(c - lit(nodata)) <= lit(atol)), lit(null)).otherwise(c)

  /** P4 — NULL→fill imputation (`nan_to_num(..., nan=OUTPUT_NODATA)`,
    * feature_stacking.py:138; `fillna(0)` object_classifier.py:111).
    */
  def fillNoData(c: Column, fill: Double = 0.0): Column = coalesce(c, lit(fill))

  /** P5 — normalized-difference index (a-b)/(a+b+eps), the NDVI/NDWI/NDRE
    * kernel (feature_stacking.py:123-124,158-159,270-276). `eps` keeps the
    * divide safe exactly as the reference's `+1e-9` does.
    */
  def normalizedDiff(a: Column, b: Column, eps: Double = 1e-9): Column =
    (a - b) / (a + b + lit(eps))

  /** P5 variant — epsilon-free safe divide: zero denominator → NULL
    * (engine-preferred over the sentinel-epsilon trick; NULL propagates
    * through composites correctly).
    */
  def normalizedDiffNull(a: Column, b: Column): Column =
    when(a + b === lit(0.0), lit(null)).otherwise((a - b) / (a + b))

  /** P7 — range clamp, the 8-bit contrast stretch inner op
    * `np.clip((x-lo)/(hi-lo), 0, 1) * 255` (image_segmentation.py:50-51).
    */
  def clamp(c: Column, lo: Column, hi: Column): Column = least(greatest(c, lo), hi)

  /** P7/M8 — percentile stretch to [0,255] given per-group lo/hi cut values. */
  def stretch8bit(c: Column, lo: Column, hi: Column): Column =
    when(hi === lo, lit(0.0))
      .otherwise(clamp((c - lo) / (hi - lo), lit(0.0), lit(1.0)) * lit(255.0))

  /** P8 — conditional label rewrite rules (pixel_classifier_stream.py:154-161):
    * solar panels (12) below confidence 0.60 → urban (2); shadow (16) → urban (2).
    */
  def ruleRewrite(label: Column, conf: Column,
                  solarClass: Int = 12, shadowClass: Int = 16,
                  urbanClass: Int = 2, solarConfMin: Double = 0.60): Column =
    when(label === lit(solarClass) && conf < lit(solarConfMin), lit(urbanClass))
      .when(label === lit(shadowClass), lit(urbanClass))
      .otherwise(label)

  /** P9 — null-pattern combo key: the names of the non-null band columns,
    * joined with '_' (pixel_classifier_stream.py:130-134 routes each pixel row
    * to the model trained for its exact null pattern).
    */
  def comboKey(bands: Seq[(String, Column)]): Column =
    concat_ws("_", bands.map { case (name, c) => when(c.isNotNull, lit(name)) }: _*)

  /** P10 — stable key hashing for long combo strings
    * (pixel_classifier_stream.py:49-55 hashes combos >100 chars with MD5).
    */
  def stableKey(c: Column, maxLen: Int = 100): Column =
    when(length(c) > lit(maxLen), md5(c)).otherwise(c)

  /** P6 — validity mask over a set of band columns: TRUE iff every listed
    * band is non-null (feature_stacking.py:116-121 invalid-pixel mask,
    * pixel_classifier_stream.py:131 all-NaN row skip).
    */
  def allValid(cols: Seq[Column]): Column =
    cols.map(_.isNotNull).reduce(_ && _)

  /** P6 — any-valid predicate (row kept if at least one band present). */
  def anyValid(cols: Seq[Column]): Column =
    cols.map(_.isNotNull).reduce(_ || _)
}
