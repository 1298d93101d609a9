package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Open-session state for `EventStream.sessionize` (top level: the state
  * encoder's generated code can't instantiate object-nested private case
  * classes).
  */
private[streaming] case class OpenSession(startUs: Long, endUs: Long, n: Long)

private[streaming] case class PathPoint(lastUs: Long, lastEvent: Long,
  lastLon: Double, lastLat: Double, n: Long, fp: Long)

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
    *
    * J7's semantics genuinely want latest-per-key forever, so the default
    * keeps state unbounded (`stateTtl = None`, NoTimeout). At 100 TB the
    * distinct-user set itself can outgrow the state store: pass `stateTtl`
    * (e.g. "30 days") to evict users idle past the watermark — the evicted
    * user's latest row is re-emitted once on timeout, then a later event
    * for that user starts fresh (its pre-TTL history is forgotten, which is
    * exactly the retention contract a TTL states).
    */
  def latestPerUser(events: DataFrame, stateTtl: Option[String] = None)
      : Dataset[(Long, java.sql.Timestamp, Double)] = {
    val spark = events.sparkSession
    import spark.implicits._
    val src = stateTtl.fold(events)(ttl => events.withWatermark("ts", ttl))
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(timeoutConf) {
        (userId: Long,
         rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[(java.sql.Timestamp, Double)]) =>
          if (!rows.hasNext && state.hasTimedOut) {
            val last = state.get
            state.remove()
            (userId, last._1, last._2)
          } else {
            val candidates = rows.map(r => (r._2, r._3)) ++ state.getOption.iterator
            val latest = candidates.maxBy(_._1.getTime)
            state.update(latest)
            // TTL clock rides the event-time watermark: idle = no event for
            // this user within `stateTtl` of the stream's max event time.
            // The timeout is the latest event's OWN timestamp — the
            // watermark already lags max event time by exactly `stateTtl`
            // (withWatermark above), so the timeout fires once
            // maxEventTime − latest > ttl. Adding the ttl again here would
            // double-count (evict at ~2×ttl). Clamped above the current
            // watermark — the engine rejects timeouts at or below it.
            stateTtl.foreach { _ =>
              state.setTimeoutTimestamp(
                math.max(latest._1.getTime, state.getCurrentWatermarkMs + 1))
            }
            (userId, latest._1, latest._2)
          }
      }
  }

  /** One closed user session: maximal run of events with no gap > gapSec. */
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** java.sql.Timestamp from epoch microseconds (µs-exact — the state
    * tracks µs longs because Timestamp.getTime would truncate to ms and
    * diverge from the batch twin on µs-resolution event times).
    */
  private def tsFromMicros(us: Long): java.sql.Timestamp = {
    val sec = java.lang.Math.floorDiv(us, 1000000L)
    val micro = java.lang.Math.floorMod(us, 1000000L)
    val t = new java.sql.Timestamp(sec * 1000L)
    t.setNanos((micro * 1000L).toInt)
    t
  }

  /** Sessionization with custom state (flatMapGroupsWithState +
    * event-time timeout): events for a user belong to one session while
    * consecutive gaps stay ≤ `gapSec`; a longer gap (or state timeout once
    * the watermark passes end + gap) closes the session and emits it.
    * This is THE case the built-in windowed aggs can't express — session
    * extent depends on the data, not a fixed grid — hence the typed state
    * API (SURVEY.md §7 step 9).
    *
    * State per user is O(1) (open session bounds + count); batches sort
    * their own rows per user before merging, so intra-batch disorder is
    * tolerated and only watermark-late rows are lost (they would be
    * dropped by the state layer anyway).
    */
  def sessionize(events: DataFrame, gapSec: Long,
      watermark: String = "2 hours"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      // the watermarked `ts` attribute must survive into the stateful op
      // (event-time timeout needs it); `us` carries the µs-exact value
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long,
         rows: Iterator[(Long, java.sql.Timestamp, Long)],
         state: GroupState[OpenSession]) =>
          val gapUs = gapSec * 1000000L
          if (!rows.hasNext && state.hasTimedOut) {
            // watermark passed end + gap: the open session can never extend
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, tsFromMicros(s.startUs), tsFromMicros(s.endUs), s.n))
          } else {
            val sorted = rows.map(_._3).toArray.sorted
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            for (t <- sorted) open match {
              case Some(s) if t - s.endUs <= gapUs =>
                open = Some(s.copy(endUs = math.max(s.endUs, t), n = s.n + 1))
              case Some(s) =>
                closed += Session(userId, tsFromMicros(s.startUs), tsFromMicros(s.endUs), s.n)
                open = Some(OpenSession(t, t, 1))
              case None =>
                open = Some(OpenSession(t, t, 1))
            }
            open.foreach { s =>
              state.update(s)
              // the engine rejects timeouts at/behind the current watermark;
              // clamping forward closes an already-expired session on the
              // next micro-batch instead of crashing the query
              state.setTimeoutTimestamp(
                math.max((s.endUs + gapUs) / 1000L, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  case class PathTotal(user_id: Long, n_points: Long, path_fp: Long)

  /** Streaming per-user traveled distance — the traj1 measure LIVE
    * (fleet dashboards, trajectory-length quotas): typed state is the
    * last point plus the running fixed-point total (⌊step·2¹⁰⌋ per hop,
    * traj1's idiom), each batch sorts its own rows by (ts, event_id)
    * before folding (the sessionize disorder contract), and a row at or
    * behind the state's last point is DROPPED as cross-batch-late —
    * time-ordered sources (time-partitioned file drops, Kafka per-key
    * order) lose nothing, and the spec gates streaming ≡ the batch
    * window plan EXACTLY on such a source. Geodesic steps go through
    * [[graft.functions.SpatialOps.pointDistGeodesicScala]], the bitwise
    * twin of the Column form, so the integer totals match the batch
    * plan's. Update-mode emissions are monotone (n and fp only grow) —
    * runToCompletion's max-struct collapse applies.
    */
  def pathDistanceStream(events: DataFrame,
      watermark: String = "2 hours"): Dataset[PathTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    val ev = col("event_id")
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"), col("event_id"),
        ((ev * 37 % 3000).cast("double") / lit(100.0) - lit(15.0)).as("lon"),
        ((ev * 53 % 2000).cast("double") / lit(100.0) + lit(40.0)).as("lat"))
      .as[(Long, java.sql.Timestamp, Long, Long, Double, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (userId: Long,
         rows: Iterator[(Long, java.sql.Timestamp, Long, Long, Double, Double)],
         state: GroupState[PathPoint]) =>
          val sorted = rows.toArray.sortBy(r => (r._3, r._4))
          var st = state.getOption.orNull
          for (r <- sorted) {
            val (_, _, us, eid, lon, lat) = r
            st = st match {
              case null => PathPoint(us, eid, lon, lat, 1L, 0L)
              case s if us > s.lastUs || (us == s.lastUs && eid > s.lastEvent) =>
                val step = graft.functions.SpatialOps
                  .pointDistGeodesicScala(s.lastLon, s.lastLat, lon, lat) * 1024.0
                PathPoint(us, eid, lon, lat, s.n + 1, s.fp + math.floor(step).toLong)
              case s => s // at-or-behind the cursor: cross-batch late, dropped
            }
          }
          state.update(st)
          PathTotal(userId, st.n, st.fp)
      }
  }

  /** The batch twin of [[pathDistanceStream]] — the traj1 derivation as
    * one per-user window plan (lag + fixed-point step sum). */
  def pathDistanceBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = col("event_id")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("ts"), col("event_id"),
        ((ev * 37 % 3000).cast("double") / lit(100.0) - lit(15.0)).as("lon"),
        ((ev * 53 % 2000).cast("double") / lit(100.0) + lit(40.0)).as("lat"))
      .withColumn("plon", lag("lon", 1).over(w))
      .withColumn("plat", lag("lat", 1).over(w))
      .withColumn("step_fp", when(col("plon").isNull, lit(0L)).otherwise(
        floor(graft.functions.SpatialOps.pointDistGeodesic(
          col("plon"), col("plat"), col("lon"), col("lat")) * lit(1024.0)).cast("long")))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_points"), sum(col("step_fp")).as("path_fp"))
  }

  /** Streaming exact dedup: drop repeat `keyCols` arrivals whose event
    * times fall within the watermark horizon of the first occurrence — the
    * incremental twin of `Dedup.dedupExact` for at-least-once sources
    * (retried file batches, replayed logs). State is one row per key and,
    * unlike a plain `dropDuplicates` on a stream, is EVICTED once the
    * watermark passes (bounded memory at 100 TB/day ingest; a duplicate
    * arriving later than the horizon is by definition watermark-late and
    * already outside the correctness contract).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-static enrichment: the event stream joined against a STATIC
    * dimension (user → nation-style lookup). The static side is planned
    * as a broadcast build once per micro-batch — the stream is never
    * shuffled and no join state accumulates (unlike stream-stream joins,
    * a static side needs no watermark). Left join: events with no
    * dimension row pass through with NULLs, the enrich-don't-drop
    * contract. This is the streaming face of J1/J2 (broadcast lookup +
    * fallback coalesce).
    */
  def enrichStream(
      events: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      defaults: Map[String, org.apache.spark.sql.Column] = Map.empty): DataFrame = {
    val joined = events.join(broadcast(dim), keys, "left")
    defaults.foldLeft(joined) { case (df, (c, d)) =>
      df.withColumn(c, coalesce(col(c), d))
    }
  }

  /** Stream-stream interval join (event-time bounded): every left event
    * pairs with right events of the same user whose time falls in
    * [l_ts, l_ts + horizonSec]. Both inputs carry watermarks and the join
    * condition bounds each side's event time relative to the other — the
    * two facts the engine needs to evict buffered join state as watermarks
    * advance. Without the time bound a stream-stream join buffers its
    * entire history; with it, state is O(watermark × rate) regardless of
    * stream length — the only join shape that survives unbounded inputs.
    * Append-mode output; batch twin = the j6 range join.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, horizonSec: Long,
      watermark: String = "2 hours"): DataFrame = {
    val l = left.select(col("user_id").as("l_user"), col("ts").as("l_ts"),
      col("event_id").as("l_id")).withWatermark("l_ts", watermark)
    val r = right.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
      col("event_id").as("r_id")).withWatermark("r_ts", watermark)
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizonSec SECONDS"))
  }

  /** LEFT OUTER stream-stream interval join: like `intervalJoin`, but a
    * left event with no right match within the horizon still emits (null
    * right side) — the "purchase with no follow-up click" shape. The
    * null-padded row can only be produced once the right-side watermark
    * has passed `l_ts + horizonSec` (before that a match could still
    * arrive), so outer results trail the watermark by design — the
    * batch twin converges to the same frame once the source drains.
    */
  def intervalJoinOuter(left: DataFrame, right: DataFrame, horizonSec: Long,
      watermark: String = "2 hours"): DataFrame = {
    val l = left.select(col("user_id").as("l_user"), col("ts").as("l_ts"),
      col("event_id").as("l_id")).withWatermark("l_ts", watermark)
    val r = right.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
      col("event_id").as("r_id")).withWatermark("r_ts", watermark)
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizonSec SECONDS"),
      "leftOuter")
  }

  /** Batch twin of `intervalJoinOuter` (the st6 oracle surface). */
  def intervalJoinOuterBatch(left: DataFrame, right: DataFrame,
      horizonSec: Long): DataFrame = {
    val l = left.select(col("user_id").as("l_user"), col("ts").as("l_ts"),
      col("event_id").as("l_id"))
    val r = right.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
      col("event_id").as("r_id"))
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizonSec SECONDS"),
      "left")
  }

  /** Batch twin of `intervalJoin` — identical projection and predicate,
    * no watermarks: the frame the streaming job converges to, and the
    * oracle surface for the driver gate (st4).
    */
  def intervalJoinBatch(left: DataFrame, right: DataFrame, horizonSec: Long): DataFrame = {
    val l = left.select(col("user_id").as("l_user"), col("ts").as("l_ts"),
      col("event_id").as("l_id"))
    val r = right.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
      col("event_id").as("r_id"))
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizonSec SECONDS"))
  }

  /** J7's in-place read-modify-write as a streaming sink
    * (pixel_classifier_stream.py:166-175's cross-batch merge): each
    * micro-batch upserts its per-key latest (ts, value) into a keyed
    * parquet directory — read current table, unionByName the batch,
    * re-reduce with max_by(ts), swap directories. The merge is
    * idempotent (max_by over a replayed batch reproduces the same
    * state), so a restart that re-delivers a micro-batch converges to
    * the same table — the exactly-once story file sinks can't give for
    * UPDATE-shaped output. The swap is write-to-`.next` + rename, so
    * readers never observe a half-written table. At real scale the same
    * foreachBatch body targets a table format's MERGE INTO; the
    * directory swap is the dependency-free local stand-in.
    */
  def upsertLatestToDir(events: DataFrame, dir: String): Unit = {
    val q = events
      .select(col("user_id"), col("ts"), col("value"))
      .writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val latest = batch
          .groupBy("user_id")
          .agg(max_by(struct(col("ts"), col("value")), col("ts")).as("_s"))
          .select(col("user_id"), col("_s.ts").as("ts"), col("_s.value").as("value"))
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val cur = new org.apache.hadoop.fs.Path(dir)
        val next = new org.apache.hadoop.fs.Path(dir + ".next")
        val merged =
          if (fs.exists(cur))
            spark.read.parquet(dir).unionByName(latest)
              .groupBy("user_id")
              .agg(max_by(struct(col("ts"), col("value")), col("ts")).as("_s"))
              .select(col("user_id"), col("_s.ts").as("ts"), col("_s.value").as("value"))
          else latest
        merged.write.mode("overwrite").parquet(next.toString)
        fs.delete(cur, true)
        fs.rename(next, cur)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Batch-mode sessionization with identical semantics (gaps-and-islands:
    * lag → gap flag → running session index → group). The oracle-checkable
    * twin of `sessionize`; EventStreamSpec proves closed-session
    * equivalence between the two.
    */
  def sessionizeBatch(events: DataFrame, gapSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("_prev", lag(col("ts"), 1).over(byUser))
      .withColumn("_new", when(col("_prev").isNull ||
        col("ts").cast("double") - col("_prev").cast("double") > gapSec, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
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
