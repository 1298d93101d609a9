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

  /** Truncated-FIR exponential smoothing per key: ewma_i = Σ_{k<taps}
    * α(1−α)^k · x_{i−k} over the (tsCol, tieCol) order, missing lags as 0.
    * The RECURSIVE form (y_i = αx_i + (1−α)y_{i−1}) is a sequential scan
    * per key — the truncation turns it into a bounded ROWS window (each
    * key smooths independently, no order dependence beyond `taps` rows),
    * the standard trade at corpus scale: with taps = 16 and α ≥ 0.2 the
    * dropped tail weighs < (1−α)^16 ≈ 3%. Tap coefficients are plan-time
    * double constants, the sum a fixed left-to-right chain — engine-exact.
    */
  def ewmaSmooth(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      alpha: Double = 0.3,
      taps: Int = 8,
      outCol: String = "ewma"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(taps >= 1, s"taps must be >= 1, got $taps")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val terms = (0 until taps).map { k =>
      val x = if (k == 0) col(valueCol).cast("double")
        else lag(col(valueCol), k).over(w).cast("double")
      lit(alpha * math.pow(1 - alpha, k)) * coalesce(x, lit(0.0))
    }
    df.withColumn(outCol, terms.reduceLeft(_ + _))
  }

  /** Retention-cohort matrix: users grouped by their first-activity day,
    * counted per (cohort day, day offset) — the standard activation/
    * retention census every event-product team derives from a raw event
    * log, and the time-keyed analog of the reference's monthly scene
    * grouping (feature_stacking.py:283-291: observations bucketed by
    * period, then aggregated per bucket).
    *
    * Every count is over integer day keys, so the whole matrix is
    * hash-exact. `retention_ppm` = active·10^6 / cohort-size in INTEGER
    * division (parts-per-million) — exact, no float ratio.
    *
    * Scale shape: dedup to (user, day) with map-side partial agg, a
    * per-user min for the cohort day, one user-keyed join back, then the
    * final tiny (cohort, offset) aggregation. Because (user, day) rows
    * are distinct and a user has ONE cohort day, (cohort, offset, user)
    * is already unique — so the final count is a plain count, no
    * count-distinct expand. No window, no global sort; every exchange is
    * on post-dedup data.
    */
  def retentionCohorts(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val perDay = events
      .select(col(userCol).as("__user"), to_date(col(tsCol)).as("__day"))
      .groupBy("__user", "__day").agg(count(lit(1)).as("__n_events"))
    val first = perDay.groupBy("__user")
      .agg(min(col("__day")).as("cohort_day"))
    val sized = perDay.join(first, Seq("__user"))
      .withColumn("day_offset", datediff(col("__day"), col("cohort_day")))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"), sum(col("__n_events")).as("n_events"))
    val byCohort = Window.partitionBy("cohort_day")
    sized
      .withColumn("cohort_size",
        max(when(col("day_offset") === 0, col("n_active"))).over(byCohort))
      .withColumn("retention_ppm", // integer division: Column./ is double
        expr("n_active * CAST(1000000 AS BIGINT) div cohort_size"))
      .select("cohort_day", "day_offset", "n_active", "n_events",
        "cohort_size", "retention_ppm")
  }
  /** UNION LENGTH of possibly-overlapping intervals per key — the
    * sweep-line "merge overlapping ranges" classic (billing minutes,
    * sensor uptime, session coverage) as pure window algebra, no
    * per-key iteration: a running max of interval ends (ROWS to 1
    * PRECEDING) marks island starts (start strictly beyond everything
    * seen), a prefix sum numbers the islands, and each island's
    * [min(start), max(end)] contributes its span. Integer columns in,
    * integer coverage out — engine-exact.
    *
    * Scale shape: one partitioned window sort per key (keys sort
    * independently, no global order) + one (key, island) aggregate.
    * Ties on (start, end) cannot flip islands: any tie row after the
    * first sees a running max >= its own start, so its flag is 0
    * regardless of tie order.
    *
    * Output: key columns + `covered` (union length), `n_islands`,
    * `n_intervals`.
    */
  def intervalCoverage(
      df: DataFrame,
      keyCols: Seq[String],
      startCol: String,
      endCol: String): DataFrame = {
    require(keyCols.nonEmpty, "intervalCoverage needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol)).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    // fail-closed on inverted intervals (the repo doctrine): a negative
    // span would silently subtract from the union length. The checked
    // value feeds every use of `end`, so the assert can't be pruned.
    val checkedEnd = when(col(endCol) >= col(startCol), col(endCol))
      .otherwise(raise_error(concat(
        lit(s"intervalCoverage: inverted interval (end < start) at $startCol="),
        col(startCol).cast("string"))))
    val flagged = df
      .withColumn(endCol, checkedEnd)
      .withColumn("__new_island",
        when(prevMax.isNull || col(startCol) > prevMax, lit(1L)).otherwise(lit(0L)))
      .withColumn("__island", sum(col("__new_island"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy((keyCols.map(col) :+ col("__island")): _*)
      .agg(min(col(startCol)).as("__s"), max(col(endCol)).as("__e"),
        count(lit(1)).as("__n"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__e") - col("__s")).as("covered"),
        count(lit(1)).as("n_islands"),
        sum(col("__n")).as("n_intervals"))
  }
}
