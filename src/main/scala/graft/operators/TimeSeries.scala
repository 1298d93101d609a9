package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: fixed-step resampling with gap filling —
  * the "make the event stream a dense per-key grid" step feeding any
  * windowed model (the reference's monthly compositing,
  * feature_stacking.py:283-291, is the same shape at month granularity:
  * group observations onto a regular time grid, then fill).
  *
  * Scale shape: one groupBy onto the (key, bucket) grid (map-side
  * combine), a per-key min/max agg (tiny), the grid explode is bounded
  * by span/step per key, and the forward fill is a per-key window — each
  * key sorts independently, no global sort anywhere.
  */
object TimeSeries {

  /** Resample to a fixed `unit` grid per key ("hour"/"day"/"minute"...),
    * aggregating `valueCol` with a decimal-exact sum, then densify each
    * key's [first, last] bucket span and forward-fill the aggregate.
    * Output: key, bucket start, `filled_sum` (last seen hour sum),
    * `is_gap` (no events in this bucket).
    */
  def resampleCarryForward(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      unit: String = "hour"): DataFrame = {
    val step = unit match {
      case "minute" => "INTERVAL 1 MINUTE"
      case "hour"   => "INTERVAL 1 HOUR"
      case "day"    => "INTERVAL 1 DAY"
      case other    => throw new IllegalArgumentException(s"unsupported unit: $other")
    }
    val bucketed = df
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("__sum"))
    val spans = bucketed.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("__b0"), col("__b1"), expr(step))).as("bucket"))
    val w = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(bucketed, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        last(col("__sum"), ignoreNulls = true).over(w).as("filled_sum"),
        col("__sum").isNull.as("is_gap"))
  }
}
