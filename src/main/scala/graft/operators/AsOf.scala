package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (declared engine surface; the reference has no as-of joins —
  * SURVEY.md §2.4 note — but any event-keyed store wants one).
  *
  * Formulation: union the two sides tagged, one window pass per key carries
  * the nearest right-side row across (IGNORE NULLS last/first value), then
  * keep left rows. No range join, no per-key loops, one shuffle on the key
  * — the sort-merge-shaped as-of that scales linearly in input size.
  *
  * The full pandas/kdb direction surface: `backward` (latest right with
  * r.ts <= l.ts — the default), `forward` (earliest right with
  * r.ts >= l.ts), `nearest` (whichever is closer in time; ties prefer
  * backward, pandas semantics). `toleranceSec` nulls the match when the
  * time gap exceeds it — all directions, applied AFTER direction choice,
  * exactly as pandas `merge_asof(tolerance=...)`.
  */
object AsOf {

  /** For each row of `left`, attach the matched `right` row's `valueCols`
    * under the chosen direction (same `keyCol`; null when no match in
    * range). Output: left columns + asof_<c> per value column.
    *
    * Determinism contract: WHICH right row wins is defined by event time
    * only, so the right side must be unique per (keyCol, tsCol) — two
    * right rows sharing a timestamp make the carried value
    * partition-order-dependent. Pre-aggregate the right side (as the
    * j14/j15 queries do) when duplicates are possible; the same contract
    * every sort-merge as-of engine documents.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      direction: String = "backward",
      toleranceSec: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward | forward | nearest, got '$direction'")
    val needBwd = direction != "forward"
    val needFwd = direction != "backward"

    val leftCols = left.columns
    // _side: 1 = left (kept), 0 = right (carried)
    val unioned = left.withColumn("_side", lit(1))
      .select((leftCols.map(col) :+ col("_side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
      .unionByName(
        right.withColumn("_side", lit(0)).select(
          (leftCols.map(c =>
            if (c == keyCol || c == tsCol) col(c)
            else lit(null).cast(left.schema(c).dataType).as(c)) :+ col("_side")) ++
            valueCols.map(c => col(c).as(s"_r_$c")): _*))

    // At equal ts both directions MATCH (<= / >=): the right row must fall
    // inside the frame, so it sorts before left for the backward frame
    // (.., current] and after left for the forward frame [current, ..).
    val wBwd = Window.partitionBy(keyCol).orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(keyCol).orderBy(col(tsCol), col("_side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // Carry ONE struct per direction — timestamp and ALL value columns from
    // the SAME matched right row. Carrying each value column in its own
    // last/first(ignoreNulls) would skip back past a matched row whose value
    // is NULL (returning a stale older value, possibly outside tolerance,
    // and mixing rows across value columns); pandas merge_asof returns the
    // matched row's NULL. The struct is non-null for every right row, so
    // ignoreNulls only skips LEFT rows, never a matched right row.
    val carryStruct = struct((col(tsCol).as("_ts") +:
      valueCols.map(c => col(s"_r_$c").as(c))): _*)
    val bwd: Column = last(when(col("_side") === 0, carryStruct), ignoreNulls = true).over(wBwd)
    val fwd: Column = first(when(col("_side") === 0, carryStruct), ignoreNulls = true).over(wFwd)

    var carried = unioned
    if (needBwd) {
      carried = carried.withColumn("_bwd", bwd)
        .withColumn("_bwd_ts", col("_bwd._ts"))
      valueCols.foreach { c => carried = carried.withColumn(s"_bwd_$c", col(s"_bwd.$c")) }
    }
    if (needFwd) {
      carried = carried.withColumn("_fwd", fwd)
        .withColumn("_fwd_ts", col("_fwd._ts"))
      valueCols.foreach { c => carried = carried.withColumn(s"_fwd_$c", col(s"_fwd.$c")) }
    }

    // gap arithmetic works for TIMESTAMP event time (micros; toleranceSec
    // in seconds) and for numeric event time (the column's own units;
    // toleranceSec interpreted in those units)
    val isTs = left.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType
         | org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
    def micros(c: Column): Column = if (isTs) unix_micros(c) else c.cast("long")
    val lts = micros(col(tsCol))
    def bwdGap = lts - micros(col("_bwd_ts"))
    def fwdGap = micros(col("_fwd_ts")) - lts
    // nearest: closer side wins, tie -> backward (pandas). Build the gap
    // expressions only for the directions whose columns exist.
    val (useBwd, gap) = direction match {
      case "backward" => (lit(true), bwdGap)
      case "forward" => (lit(false), fwdGap)
      case _ =>
        val u = col("_bwd_ts").isNotNull &&
          (col("_fwd_ts").isNull || bwdGap <= fwdGap)
        (u, when(u, bwdGap).otherwise(fwdGap))
    }
    val inTol = toleranceSec match {
      case Some(t) => gap <= (if (isTs) t * 1000000L else t)
      case None => lit(true)
    }
    val out = valueCols.foldLeft(carried) { (df, c) =>
      val chosen = when(useBwd, col(if (needBwd) s"_bwd_$c" else s"_fwd_$c"))
        .otherwise(col(if (needFwd) s"_fwd_$c" else s"_bwd_$c"))
      df.withColumn(s"asof_$c", when(inTol, chosen))
    }
    val tmp = Seq("_side") ++
      (if (needBwd) Seq("_bwd", "_bwd_ts") ++ valueCols.map(c => s"_bwd_$c") else Nil) ++
      (if (needFwd) Seq("_fwd", "_fwd_ts") ++ valueCols.map(c => s"_fwd_$c") else Nil) ++
      valueCols.map(c => s"_r_$c")
    out.filter(col("_side") === 1).drop(tmp: _*)
  }
}
