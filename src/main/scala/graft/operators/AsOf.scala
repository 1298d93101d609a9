package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (declared engine surface; the reference has no as-of joins —
  * SURVEY.md §2.4 note — but any event-keyed store wants one).
  *
  * Formulation: union the two sides tagged, one window pass per key carries
  * the most recent right-side row forward (IGNORE NULLS last_value), then
  * keep left rows. No range join, no per-key loops, one shuffle on the key
  * — the sort-merge-shaped as-of that scales linearly in input size.
  */
object AsOf {

  /** For each row of `left`, attach the latest `right` row with
    * right.ts <= left.ts (same `keyCol`). Output: left columns +
    * `valueCols` from the matched right row (null when no prior match).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftTagged = left.withColumn("_side", lit(1))
    val rightTagged = right.withColumn("_side", lit(0))
    val leftCols = left.columns
    val unioned = leftTagged
      .select((leftCols.map(col) :+ col("_side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
      .unionByName(
        rightTagged.select(
          (leftCols.map(c =>
            if (c == keyCol || c == tsCol) col(c)
            else lit(null).cast(left.schema(c).dataType).as(c)) :+ col("_side")) ++
            valueCols.map(c => col(c).as(s"_r_$c")): _*))
    // right rows sort before left rows at equal ts, so a simultaneous
    // right row is visible to the left row (asof <=)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(when(col("_side") === 0, col(s"_r_$c")), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("_side") === 1)
      .drop("_side")
      .drop(valueCols.map(c => s"_r_$c"): _*)
  }
}
