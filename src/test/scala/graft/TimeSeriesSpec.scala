package graft

import graft.operators.TimeSeries
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("resampleCarryForward densifies the span and forward-fills gaps") {
    val df = Seq(
      (1L, ts("2024-01-01 00:10:00"), 2.0),
      (1L, ts("2024-01-01 00:40:00"), 3.0), // same hour → sum 5.0
      (1L, ts("2024-01-01 03:05:00"), 7.0)  // hours 1,2 are gaps
    ).toDF("k", "t", "v")
    val r = TimeSeries.resampleCarryForward(df, "k", "t", "v", "hour")
      .orderBy("bucket").collect()
      .map(x => (x.getTimestamp(1).toString, x.getDouble(2), x.getBoolean(3)))
    assert(r.toSeq === Seq(
      ("2024-01-01 00:00:00.0", 5.0, false),
      ("2024-01-01 01:00:00.0", 5.0, true),
      ("2024-01-01 02:00:00.0", 5.0, true),
      ("2024-01-01 03:00:00.0", 7.0, false)))
  }

  test("keys resample independently (no cross-key fill)") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (2L, ts("2024-01-01 05:00:00"), 9.0)
    ).toDF("k", "t", "v")
    val r = TimeSeries.resampleCarryForward(df, "k", "t", "v", "hour").collect()
    assert(r.length === 2) // each key's span is a single hour
  }

  test("rejects unknown units") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException](
      TimeSeries.resampleCarryForward(df, "k", "t", "v", "fortnight"))
  }

  test("ewmaSmooth matches the hand-computed truncated filter per key") {
    val df = Seq(
      (1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0),
      (2L, 1L, 100.0)
    ).toDF("k", "seq", "v")
    val out = TimeSeries.ewmaSmooth(df, "k", "seq", "seq", "v",
        alpha = 0.5, taps = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(math.abs(out((1L, 1L)) - 0.5 * 10.0) < 1e-12)
    assert(math.abs(out((1L, 2L)) - (0.5 * 20.0 + 0.25 * 10.0)) < 1e-12)
    assert(math.abs(out((1L, 3L)) - (0.5 * 30.0 + 0.25 * 20.0 + 0.125 * 10.0)) < 1e-12)
    assert(math.abs(out((2L, 1L)) - 0.5 * 100.0) < 1e-12) // keys independent
    intercept[IllegalArgumentException](
      TimeSeries.ewmaSmooth(df, "k", "seq", "seq", "v", alpha = 0.0))
  }

  test("funnel stageTimes enforces strict ordering") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: purchase BEFORE the first view must not count
      (2L, 5L, "purchase"), (2L, 10L, "view"), (2L, 20L, "click"),
      // user 3: never viewed → absent entirely
      (3L, 10L, "click"), (3L, 20L, "purchase"),
      // user 4: click at the same instant as view counts (>=)
      (4L, 10L, "view"), (4L, 10L, "click")
    ).toDF("user_id", "ts", "event_type")
    val out = operators.Funnel.stageTimes(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(r.fieldIndex("depth"))).toMap
    assert(out == Map(1L -> 3, 2L -> 2, 4L -> 2))
  }

  test("retentionCohorts: hand-built matrix with exact ppm") {
    // users 1,2 start day 1 (cohort A); user 3 starts day 2 (cohort B).
    // day 2: user 1 returns (A offset 1); day 3: users 1,3 active.
    val df = Seq(
      (1L, ts("2024-03-01 10:00:00")), (1L, ts("2024-03-01 11:00:00")),
      (2L, ts("2024-03-01 09:00:00")),
      (3L, ts("2024-03-02 08:00:00")),
      (1L, ts("2024-03-02 12:00:00")),
      (1L, ts("2024-03-03 07:00:00")), (3L, ts("2024-03-03 06:00:00"))
    ).toDF("user_id", "ts")
    val r = TimeSeries.retentionCohorts(df)
      .orderBy("cohort_day", "day_offset")
      .collect()
      .map(x => (x.getDate(0).toString, x.getInt(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5)))
    assert(r.toSeq === Seq(
      ("2024-03-01", 0, 2L, 3L, 2L, 1000000L), // both users, 3 raw events
      ("2024-03-01", 1, 1L, 1L, 2L, 500000L),
      ("2024-03-01", 2, 1L, 1L, 2L, 500000L),
      ("2024-03-02", 0, 1L, 1L, 1L, 1000000L),
      ("2024-03-02", 1, 1L, 1L, 1L, 1000000L)))
  }
  // ---- intervalCoverage ----

  test("intervalCoverage merges overlaps, nests, and touching intervals") {
    import spark.implicits._
    // key a: [0,10] [5,20] (overlap) [20,25] (touching -> same island)
    //        [30,40] [32,35] (nested) ; [50,60] disjoint
    // key b: single interval
    val df = Seq(
      ("a", 0L, 10L), ("a", 5L, 20L), ("a", 20L, 25L),
      ("a", 30L, 40L), ("a", 32L, 35L), ("a", 50L, 60L),
      ("b", 100L, 107L)
    ).toDF("k", "s", "e")
    val got = graft.operators.TimeSeries.intervalCoverage(df, Seq("k"), "s", "e")
      .orderBy("k").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", 45L, 3L, 6L), ("b", 7L, 1L, 1L)))
  }

  test("intervalCoverage matches a brute-force number-line union on random sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val ivs = (1 to 400).map { i =>
      val k = s"k${i % 5}"
      val s0 = rnd.nextInt(1000).toLong
      (k, s0, s0 + 1 + rnd.nextInt(60))
    }
    val got = graft.operators.TimeSeries.intervalCoverage(
        ivs.toDF("k", "s", "e"), Seq("k"), "s", "e")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ivs.groupBy(_._1).view.mapValues { g =>
      val covered = Array.fill(1100)(false)
      // half-open cells: [s, e) marks cells s..e-1 — the union length of
      // closed intervals over integers equals the half-open cell count
      g.foreach { case (_, s0, e0) =>
        (s0.toInt until e0.toInt).foreach(covered(_) = true)
      }
      covered.count(identity).toLong
    }.toMap
    assert(got == exact)
  }

  test("intervalCoverage fail-closes on inverted intervals") {
    import spark.implicits._
    val bad = Seq(("a", 10L, 3L), ("a", 4L, 8L)).toDF("k", "s", "e")
    val err = intercept[Exception](
      graft.operators.TimeSeries.intervalCoverage(bad, Seq("k"), "s", "e").collect())
    assert(err.getMessage.contains("inverted interval") ||
      Option(err.getCause).exists(_.getMessage.contains("inverted interval")))
  }

  test("intervalCoverage fail-closes without keys") {
    import spark.implicits._
    intercept[IllegalArgumentException](
      graft.operators.TimeSeries.intervalCoverage(
        Seq((1L, 2L)).toDF("s", "e"), Nil, "s", "e"))
  }
}
