package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming results must converge to the batch answers (the J7 invariant:
  * per-batch merge ≡ one-shot aggregate — SURVEY.md §7 hard part e).
  */
class EventStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Stage the events table as a multi-file stream source (3 parquet files
    * → 3 micro-batches with maxFilesPerTrigger=1).
    */
  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    Tables.events(spark, sf)
      .repartition(3, col("user_id"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming tumbling agg converges to the batch st1 answer") {
    val stream = EventStream.readEvents(spark, streamDir)
    // unordered micro-batches: widen the watermark past the data span so
    // the convergence check sees every row (lateness-drop is separate)
    val got = EventStream.runToCompletion(
      EventStream.tumblingAgg(stream, watermark = "400 days"), "t_tumbling")
      // Update mode emits refinements; keep the last emit per key
      .groupBy("window_start", "event_type")
      .agg(max(struct(col("n"), col("sum_val"))).as("m"))
      .select(col("window_start"), col("event_type"), col("m.n").as("n"), col("m.sum_val").as("sum_val"))
    val batch = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_val"))
    assert(got.count() == batch.count())
    val joined = got.join(batch, Seq("window_start", "event_type"))
    assert(joined.count() == batch.count())
    // counts all agree (sum compare needs tolerance; count is exact)
    val gotN = got.orderBy("window_start", "event_type").select("n").as[Long].collect().toSeq
    val batchN = batch.orderBy("window_start", "event_type").select("n").as[Long].collect().toSeq
    assert(gotN == batchN)
  }

  test("streaming HLL/CMS sketch state converges to the batch sketch per window") {
    import graft.operators.Sketches
    val stream = EventStream.readEvents(spark, streamDir)
    // HLL: per-window register table == batch hllRegisters of the window
    val gotHll = EventStream.runToCompletion(
      Sketches.streamingHllRegisters(stream, col("user_id"), watermark = "400 days", p = 6),
      "t_shll", finalKeys = Seq("window_start", "register"))
    val batchHll = Sketches.hllRegisters(
      Tables.events(spark, sf).withColumn("window_start", date_trunc("hour", col("ts"))),
      col("user_id"), Seq("window_start"), p = 6)
    def hKey(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getLong(1), r.getLong(2))
    val gh = gotHll.select("window_start", "register", "max_rho").collect().map(hKey).toSet
    val bh = batchHll.select("window_start", "register", "max_rho").collect().map(hKey).toSet
    assert(gh == bh, s"HLL register tables differ: ${gh.diff(bh).take(3)} / ${bh.diff(gh).take(3)}")
    // CMS: per-window counter table == batch countMin of the window
    val gotCms = EventStream.runToCompletion(
      Sketches.streamingCountMin(stream, col("event_type"),
        watermark = "400 days", depth = 4, width = 64),
      "t_scms", finalKeys = Seq("window_start", "row", "bucket"))
    def cKey(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getInt(1), r.getLong(2), r.getLong(3))
    val gc = gotCms.select("window_start", "row", "bucket", "cnt").collect().map(cKey).toSet
    val batchCms = Tables.events(spark, sf)
      .withColumn("window_start", date_trunc("hour", col("ts")))
      .collect()  // small fixture; group windows driver-side for the oracle
    val bcExpected = {
      val byWin = batchCms.groupBy(_.getAs[java.sql.Timestamp]("window_start"))
      byWin.iterator.flatMap { case (w, rows) =>
        val df = spark.createDataFrame(spark.sparkContext.parallelize(rows.toIndexedSeq),
          Tables.events(spark, sf).withColumn("window_start", date_trunc("hour", col("ts"))).schema)
        Sketches.countMin(df, col("event_type"), depth = 4, width = 64)
          .collect().map(r => (w, r.getInt(0), r.getLong(1), r.getLong(2)))
      }.toSet
    }
    assert(gc == bcExpected, "CMS counter tables differ")
  }

  test("streaming bottom-k quantile state converges to the batch sketch per window") {
    import graft.operators.Sketches
    val stream = EventStream.readEvents(spark, streamDir)
    // Complete mode: bottom-k EVICTS rows as smaller hashes arrive, so
    // Update-mode refinements cannot be collapsed by max -- the memory
    // sink's Complete snapshot IS the final state
    val got = EventStream.runToCompletion(
      Sketches.streamingQuantileState(stream, col("value"), col("event_id"),
        watermark = "400 days", k = 64),
      "t_sqs", mode = org.apache.spark.sql.streaming.OutputMode.Complete())
    val batch = Sketches.quantileSketch(
      Tables.events(spark, sf).withColumn("window_start", date_trunc("hour", col("ts"))),
      col("value"), col("event_id"), Seq("window_start"), k = 64)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[java.sql.Timestamp]("window_start"), r.getAs[Long]("h"), r.getAs[Double]("v"))
    val g = got.select("window_start", "h", "v").collect().map(key).toSet
    val b = batch.select("window_start", "h", "v").collect().map(key).toSet
    assert(g == b, s"quantile states differ: extra=${g.diff(b).take(3)} missing=${b.diff(g).take(3)}")
    assert(g.nonEmpty)
  }

  test("streaming quantile estimates end-to-end: live window states feed quantileEstimate") {
    // the composition the state law promises (r14 stretch, wired r15):
    // estimates computed FROM the streaming snapshot equal the batch
    // quantileSketch -> quantileEstimate chain on the same windows, so a
    // live dashboard reads real quantiles mid-stream
    import graft.operators.Sketches
    val stream = EventStream.readEvents(spark, streamDir)
    val snapshot = EventStream.runToCompletion(
      Sketches.streamingQuantileState(stream, col("value"), col("event_id"),
        watermark = "400 days", k = 64),
      "t_sqe", mode = org.apache.spark.sql.streaming.OutputMode.Complete())
    val live = Sketches.quantileEstimate(snapshot, Seq(0.5, 0.9), Seq("window_start"))
    val batch = Sketches.quantileEstimate(
      Sketches.quantileSketch(
        Tables.events(spark, sf).withColumn("window_start", date_trunc("hour", col("ts"))),
        col("value"), col("event_id"), Seq("window_start"), k = 64),
      Seq(0.5, 0.9), Seq("window_start"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[java.sql.Timestamp]("window_start"), r.getAs[Double]("q"),
        r.getAs[Double]("est"), r.getAs[Long]("m"))
    val l = live.collect().map(key).toSet
    val b2 = batch.collect().map(key).toSet
    assert(l == b2, s"estimates differ: extra=${l.diff(b2).take(3)} missing=${b2.diff(l).take(3)}")
    assert(l.nonEmpty)
  }

  test("stateful latestPerUser matches the batch max_by merge (J7)") {
    val stream = EventStream.readEvents(spark, streamDir)
    val got = EventStream.runToCompletion(
      EventStream.latestPerUser(stream).toDF("user_id", "ts", "value"), "t_latest")
      .groupBy("user_id")
      .agg(max(struct(col("ts"), col("value"))).as("m"))
      .select(col("user_id"), col("m.value").as("last_val"))
    val batch = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
      .select(col("user_id"), col("m.value").as("last_val"))
    val g = got.orderBy("user_id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = batch.orderBy("user_id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // ts ties can resolve differently (no event_id in the stream state) —
    // compare user sets exactly and values on tie-free users
    assert(g.map(_._1) == b.map(_._1))
    val tied = Tables.events(spark, sf).groupBy("user_id", "ts").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select("user_id").distinct().as[Long].collect().toSet
    g.zip(b).foreach { case ((u, gv), (_, bv)) =>
      if (!tied(u)) assert(gv == bv, s"user $u: stream=$gv batch=$bv")
    }
  }

  test("latestPerUser stateTtl evicts idle users once the watermark passes (J7 TTL)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val src = mem.toDF().toDF("user_id", "ts", "value")
    val out = EventStream.latestPerUser(src, stateTtl = Some("10 minutes"))
      .toDF("user_id", "ts", "value")
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("t_ttl").start()
    // offset from epoch: the initial watermark is 0, and rows at or before
    // the watermark are dropped before the stateful operator
    def ts(min: Int) = new java.sql.Timestamp((1440L + min) * 60000L)
    try {
      mem.addData((1L, ts(0), 100.0), (2L, ts(0), 5.0))
      q.processAllAvailable()
      // user 2 keeps talking; watermark advances to 60-10 = 50 min,
      // far past user 1's timeout at 0+10
      mem.addData((2L, ts(60), 6.0))
      q.processAllAvailable()
      // timeouts fire on the batch AFTER the watermark advanced: user 1's
      // state re-emits its latest row once and is removed
      mem.addData((2L, ts(61), 7.0))
      q.processAllAvailable()
    } finally q.stop()
    val u1Emits = spark.table("t_ttl").filter(col("user_id") === 1L).collect()
    // one emit from the data batch + exactly one from the timeout eviction
    assert(u1Emits.length == 2, s"expected data emit + timeout emit, got ${u1Emits.toSeq}")
    assert(u1Emits.forall(r => r.getDouble(2) == 100.0))
    // the still-active user never timed out: one emit per micro-batch it
    // appeared in, no extras
    assert(spark.table("t_ttl").filter(col("user_id") === 2L).count() == 3)
  }

  test("foreachBatch upsert sink converges to the batch max_by table (J7 sink)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString + "/state"
    val stream = EventStream.readEvents(spark, streamDir) // 3 micro-batches
    EventStream.upsertLatestToDir(stream, dir)
    val got = spark.read.parquet(dir)
      .select(col("user_id"), col("ts"), col("value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toSet
    val want = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(max_by(struct(col("ts"), col("value")), col("ts")).as("s"))
      .select(col("user_id"), col("s.ts").as("ts"), col("s.value").as("value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toSet
    assert(got == want)
    // idempotence: replaying the whole stream over the existing state dir
    // converges to the same table (restart-after-uncommitted-batch story)
    EventStream.upsertLatestToDir(EventStream.readEvents(spark, streamDir), dir)
    val again = spark.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toSet
    assert(again == want)
  }

  test("watermark drops events later than the threshold across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(java.sql.Timestamp, String, Double)]
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val agg = EventStream.tumblingAgg(
      source.toDF().toDF("ts", "event_type", "value"), watermark = "1 minute")
    val q = agg.writeStream.outputMode("update").format("memory").queryName("t_late").start()
    // batch 1: recent event advances the watermark to 11:59
    source.addData((ts("2024-06-01 12:00:00"), "click", 1.0))
    q.processAllAvailable()
    // batch 2: an event 3 hours late (window end 10:00 < watermark) + one in-window
    source.addData(
      (ts("2024-06-01 09:30:00"), "click", 1.0),
      (ts("2024-06-01 12:05:00"), "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val windows = spark.table("t_late")
      .select(col("window_start").cast("string"), col("event_type")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(windows.contains(("2024-06-01 12:00:00", "click")))
    assert(windows.contains(("2024-06-01 12:00:00", "view")))   // in-window late row kept
    assert(!windows.exists(_._1 == "2024-06-01 09:00:00"))      // beyond-watermark row dropped
  }

  test("streaming sessionize emits exactly the batch data-closed sessions") {
    val gap = 1800L
    val stream = EventStream.readEvents(spark, streamDir)
    // wide watermark: nothing is late-dropped (batch files are not globally
    // time-ordered), so no event-time timeouts fire either — the emitted
    // set must be exactly the DATA-closed sessions: every batch session
    // except each user's last (which stays open forever without a
    // successor event).
    val got = EventStream.runToCompletion(
      EventStream.sessionize(stream, gapSec = gap, watermark = "400 days").toDF(),
      "t_sessions", mode = org.apache.spark.sql.streaming.OutputMode.Append())
      .select("user_id", "session_start", "session_end", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet

    val batchAll = EventStream.sessionizeBatch(Tables.events(spark, sf), gap)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val lastPerUser = batchAll.groupBy(_._1).view.mapValues(_.maxBy(_._2.getTime)).values.toSet
    val expected = batchAll -- lastPerUser

    assert(got == expected,
      s"streamed ${got.size} vs expected ${expected.size}; " +
        s"extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")
    assert(got.nonEmpty)
  }

  test("streaming dedup drops within-watermark duplicates, keeps one per key") {
    // duplicate every event across two files: the second arrival of each
    // event_id must be dropped even when it lands in a later micro-batch
    val dir = java.nio.file.Files.createTempDirectory("graft_dups").toString
    val ev = Tables.events(spark, sf).limit(500).cache()
    ev.coalesce(1).write.mode("overwrite").parquet(dir)
    ev.coalesce(1).write.mode("append").parquet(dir) // same rows again
    val got = EventStream.runToCompletion(
      EventStream.dedupStream(EventStream.readEvents(spark, dir),
        keyCols = Seq("event_id"), watermark = "400 days"),
      "t_dedup", mode = org.apache.spark.sql.streaming.OutputMode.Append())
    assert(got.count() == ev.count())
    assert(got.select("event_id").distinct().count() == ev.count())
    ev.unpersist()
  }

  test("stream-stream interval join matches the batch range join") {
    val clicks = EventStream.readEvents(spark, streamDir)
      .filter(col("event_type") === "click")
    val errors = EventStream.readEvents(spark, streamDir)
      .filter(col("event_type") === "error")
    val got = EventStream.runToCompletion(
      EventStream.intervalJoin(clicks, errors, horizonSec = 300, watermark = "400 days"),
      "t_ivjoin", mode = org.apache.spark.sql.streaming.OutputMode.Append())
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val ev = Tables.events(spark, sf)
    val batch = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("l_ts"), col("event_id").as("l_id"))
      .join(ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts").as("r_ts"), col("event_id").as("r_id")),
        Seq("user_id"))
      .filter(col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr("INTERVAL 300 SECONDS"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(got == batch)
  }

  test("stream-stream LEFT OUTER interval join converges to the batch twin") {
    // Outer rows only emit once the watermark passes l_ts + horizon, so
    // this needs (a) TIME-ORDERED micro-batches — a tight watermark over
    // the user-bucketed streamDir would drop interleaved arrivals — and
    // (b) a far-future sentinel pair to flush the tail out of join state.
    val ev = Tables.events(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_ostream").toString
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))
    val bucketed = ev.withColumn("__b", ntile(3).over(w)).persist()
    val far = java.sql.Timestamp.valueOf("2030-01-01 00:00:00")
    val sentinel = Seq(
      (-1L, far, -999L, "purchase", 0.0, "{}"),
      (-2L, far, -999L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    for (i <- 1 to 4) {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_ob$i").toString
      val slice = if (i <= 3) bucketed.filter(col("__b") === i).drop("__b") else sentinel
      slice.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, f"b$i%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      // mod-time order = processing order for the file source
      assert(dst.setLastModified(1700000000000L + i * 60000L))
    }
    bucketed.unpersist()
    val src = EventStream.readEvents(spark, dir)
    val got = EventStream.runToCompletion(
      EventStream.intervalJoinOuter(
        src.filter(col("event_type") === "purchase"),
        src.filter(col("event_type") === "click"),
        horizonSec = 300, watermark = "1 second"),
      "t_ojoin", mode = org.apache.spark.sql.streaming.OutputMode.Append())
      .filter(col("l_user") =!= -999L)
      .select("l_id", "r_id").as[(Long, Option[Long])].collect().toSet
    val batch = EventStream.intervalJoinOuterBatch(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "click"), horizonSec = 300)
      .select("l_id", "r_id").as[(Long, Option[Long])].collect().toSet
    assert(batch.exists(_._2.isEmpty), "expected unmatched purchases")
    assert(got == batch)
  }

  test("qualityGate applies unchanged to a stream (stateless curation ≡ batch)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      (1L, "the and of to in is that", "en"),
      (2L, "zz yy", "en"),
      (3L, "the and of to in is that", "de"),
      (4L, "the and the and the and the and", "en"))
    val mem = MemoryStream[(Long, String, String)]
    val src = mem.toDF().toDF("doc_id", "text", "lang")
    val gated = graft.operators.Curation.qualityGate(src)
      .select("doc_id", "keep", "reason")
    val q = gated.writeStream.outputMode("append").format("memory")
      .queryName("t_gate").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("t_gate").orderBy("doc_id")
      .as[(Long, Boolean, String)].collect().toSeq
    val batch = graft.operators.Curation.qualityGate(
        docs.toDF("doc_id", "text", "lang"))
      .select("doc_id", "keep", "reason").orderBy("doc_id")
      .as[(Long, Boolean, String)].collect().toSeq
    assert(streamed == batch && streamed.length == 4)
  }

  test("stream-static enrichment equals the batch broadcast join, with defaults") {
    val dim = Seq((0L, "segA"), (1L, "segB"))
      .toDF("seg_key", "segment") // covers user_id % 3 ∈ {0,1}; 2 is missing
    val stream = EventStream.readEvents(spark, streamDir)
      .withColumn("seg_key", col("user_id") % 3)
    val got = EventStream.runToCompletion(
      EventStream.enrichStream(stream, dim, Seq("seg_key"),
        defaults = Map("segment" -> lit("unknown"))), "t_enrich")
      .groupBy("segment").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val want = Tables.events(spark, sf)
      .withColumn("seg_key", col("user_id") % 3)
      .join(dim, Seq("seg_key"), "left")
      .withColumn("segment", coalesce(col("segment"), lit("unknown")))
      .groupBy("segment").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got === want)
    assert(got.contains("unknown")) // the fallback path actually fired
  }

  test("sliding windows emit one row per covering window") {
    val stream = EventStream.readEvents(spark, streamDir)
    val got = EventStream.runToCompletion(
      EventStream.slidingAgg(stream, watermark = "400 days"), "t_sliding")
    // every event lies in 12 sliding windows (1h window, 5min slide)
    assert(got.count() > 0)
    val n = got.groupBy("window_start", "event_type")
      .agg(max("n").as("n")).agg(sum("n")).as[Long].head()
    val events = Tables.events(spark, sf).count()
    assert(n == events * 12)
  }

  test("streaming path distance == the batch window plan on a time-ordered source") {
    import org.apache.spark.sql.expressions.Window
    // the geodesic scala port is BITWISE the Column form (the premise of
    // the integer-total equality below)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val (a, b, c, d) = (rnd.nextDouble() * 30 - 15, rnd.nextDouble() * 20 + 40,
        rnd.nextDouble() * 30 - 15, rnd.nextDouble() * 20 + 40)
      val viaCol = Seq((a, b, c, d)).toDF("a", "b", "c", "d")
        .select(graft.functions.SpatialOps.pointDistGeodesic($"a", $"b", $"c", $"d"))
        .head.getDouble(0)
      val viaScala = graft.functions.SpatialOps.pointDistGeodesicScala(a, b, c, d)
      assert(java.lang.Double.doubleToLongBits(viaCol) ==
        java.lang.Double.doubleToLongBits(viaScala), s"($a,$b,$c,$d)")
    }
    // a TIME-ordered multi-batch source: three sequential appends of
    // ascending (ts, event_id) slices (distinct mtimes → ordered
    // micro-batches under maxFilesPerTrigger=1)
    val dir = java.nio.file.Files.createTempDirectory("graft_path").toString
    val base = Tables.events(spark, sf)
    val w = Window.orderBy(col("ts"), col("event_id"))
    val ranked = base.withColumn("__rn", row_number().over(w)).cache()
    val n = ranked.count()
    for (slice <- 0 until 3) {
      ranked.filter(col("__rn") > slice * n / 3 && col("__rn") <= (slice + 1) * n / 3)
        .drop("__rn")
        .coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(1100) // FileStreamSource orders batches by mtime
    }
    val got = EventStream.runToCompletion(
      EventStream.pathDistanceStream(
        EventStream.readEvents(spark, dir), watermark = "400 days").toDF(),
      "t_pathdist", finalKeys = Seq("user_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = EventStream.pathDistanceBatch(base)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want,
      s"streaming totals must equal the batch plan exactly (got ${got.size}/${want.size} users)")
    ranked.unpersist()
  }
}
