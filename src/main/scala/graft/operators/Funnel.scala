package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-stage conversion funnel over an event stream — the product-
  * analytics census every event store runs (how far did each key get
  * through view → click → purchase, and when). STRICT ordering: stage i
  * completes at the earliest event of its type AT OR AFTER stage i−1's
  * completion time, so out-of-order events (a purchase before the first
  * view) do not count.
  *
  * Scale shape: one filtered keyed aggregation per stage, chained by
  * key-equi-joins — every step is hash-partitioned on the key, no
  * windows, no per-key sequence materialization; stage k's input is
  * already pruned to keys that completed stage k−1 (monotonically
  * shrinking).
  */
object Funnel {

  /** Per-key stage completion times t1..tn (null from the first
    * uncompleted stage onward) plus `depth` = number of completed stages.
    * Keys that never completed stage 1 are absent.
    */
  def stageTimes(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("t1"))
    val full = stages.zipWithIndex.drop(1).foldLeft(first) { case (acc, (stage, i)) =>
      val prev = s"t$i"; val cur = s"t${i + 1}"
      val nxt = events.filter(col(typeCol) === stage)
        .join(acc.select(col(keyCol), col(prev)), Seq(keyCol))
        .filter(col(tsCol) >= col(prev))
        .groupBy(col(keyCol)).agg(min(col(tsCol)).as(cur))
      acc.join(nxt, Seq(keyCol), "left")
    }
    val depth = stages.indices.map(i => when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
      .reduceLeft(_ + _)
    full.withColumn("depth", depth.cast("int"))
  }
}
