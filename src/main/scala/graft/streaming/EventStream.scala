package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §1.3, §7 step 9).
  *
  * The reference's streaming character is its bounded-buffer incremental
  * writes: Stage 1 updates its output per scanline batch
  * (pixel_classifier_stream.py:86-94, `r+` mode) and Stage 3 flushes
  * features every 100k rows (object_classifier.py:46,202-213). The
  * Spark-native home for both is Structured Streaming:
  *   - windowed aggregation + watermark = the per-batch aggregate/merge
  *   - mapGroupsWithState = the cross-batch "latest label wins" merge (J7)
  *   - file-source `maxFilesPerTrigger` = the bounded buffer.
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open the events table as a file stream (parquet dir of µs-timestamp
    * batches). For tests, write the batch table through `toStreamable`
    * first.
    */
  def readEvents(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Tumbling-window counts/sums with a watermark — the streaming st1.
    * Late data beyond the watermark is dropped; in-window late rows merge
    * into their window's running aggregate (the immutable-store equivalent
    * of the reference's read-modify-write window, SURVEY.md J7).
    */
  def tumblingAgg(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_val"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_val"))

  /** Sliding-window variant (5 min slide over 1 h windows). */
  def slidingAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** J7 as streaming state: latest (ts, value) per user via
    * mapGroupsWithState — each micro-batch merges into per-user state,
    * exactly the cross-batch max_by merge of the in-place writer.
    */
  def latestPerUser(events: DataFrame): Dataset[(Long, java.sql.Timestamp, Double)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (userId: Long,
         rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[(java.sql.Timestamp, Double)]) =>
          val candidates = rows.map(r => (r._2, r._3)) ++ state.getOption.iterator
          val latest = candidates.maxBy(_._1.getTime)
          state.update(latest)
          (userId, latest._1, latest._2)
      }
  }

  /** Run any of the above to completion against a bounded file source and
    * return the memory-sink table.
    *
    * NOTE on `Update` mode: the memory sink APPENDS each micro-batch's
    * refinements, so the raw table holds stale rows per key alongside the
    * latest. Pass `finalKeys` to collapse to the final refinement per key
    * (valid for monotone aggregates — counts/sums only grow, so max-struct
    * of the value columns IS the last emit), or re-aggregate yourself.
    * `Complete`/`Append` modes need no collapse.
    */
  def runToCompletion(agg: DataFrame, queryName: String,
      mode: OutputMode = OutputMode.Update(),
      finalKeys: Seq[String] = Nil): DataFrame = {
    val spark = agg.sparkSession
    val q = agg.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    val raw = spark.table(queryName)
    if (finalKeys.isEmpty) raw
    else {
      val valueCols = raw.columns.filterNot(finalKeys.contains)
      raw.groupBy(finalKeys.map(col): _*)
        .agg(max(struct(valueCols.map(col): _*)).as("_m"))
        .select(finalKeys.map(col) ++ valueCols.map(c => col(s"_m.$c").as(c)): _*)
    }
  }
}
