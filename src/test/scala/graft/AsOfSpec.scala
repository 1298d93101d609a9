package graft

import graft.operators.AsOf
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asofJoin attaches the latest prior-or-simultaneous right row per key") {
    val trades = Seq(
      (1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 5L, "t0"),
      (2L, 15L, "t3")
    ).toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, 8L, 100.0), (1L, 10L, 101.0), (1L, 18L, 102.0),
      (2L, 99L, 500.0) // only AFTER the trade → no match
    ).toDF("k", "ts", "px")
    val out = AsOf.asofJoin(trades, quotes, "k", "ts", Seq("px"))
      .select("trade", "asof_px").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out("t0").isEmpty)            // before any quote
    assert(out("t1").contains(101.0))    // simultaneous quote wins (<=)
    assert(out("t2").contains(102.0))    // latest prior
    assert(out("t3").isEmpty)            // right side only in the future
  }

  private def fixture = {
    val trades = Seq(
      (1L, 10L, "t1"), (1L, 30L, "t2"), (2L, 50L, "t3")
    ).toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, 8L, 100.0), (1L, 12L, 101.0), (1L, 29L, 102.0),
      (2L, 10L, 500.0)
    ).toDF("k", "ts", "px")
    (trades, quotes)
  }

  test("forward direction attaches the earliest subsequent right row") {
    val (trades, quotes) = fixture
    val out = AsOf.asofJoin(trades, quotes, "k", "ts", Seq("px"), direction = "forward")
      .select("trade", "asof_px").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out("t1").contains(101.0)) // next quote at 12
    assert(out("t2").isEmpty)         // no quote at/after 30 for k=1
    assert(out("t3").isEmpty)         // k=2's only quote is in the past
  }

  test("nearest direction picks the closer side, ties prefer backward") {
    val (trades, quotes) = fixture
    val out = AsOf.asofJoin(trades, quotes, "k", "ts", Seq("px"), direction = "nearest")
      .select("trade", "asof_px").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("t1") == 100.0) // gaps 2 (bwd) vs 2 (fwd) → tie → backward
    assert(out("t2") == 102.0) // only backward exists
    assert(out("t3") == 500.0) // nearest has no direction cutoff
  }

  test("tolerance nulls matches beyond the gap in every direction") {
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val (t0, q0) = fixture
    val trades = t0.withColumn("ts", timestamp_seconds(col("ts")))
    val quotes = q0.withColumn("ts", timestamp_seconds(col("ts")))
    def m(direction: String, tol: Long) =
      AsOf.asofJoin(trades, quotes, "k", "ts", Seq("px"),
          direction = direction, toleranceSec = Some(tol))
        .select("trade", "asof_px").collect()
        .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val bwdTight = m("backward", 1L)
    assert(bwdTight("t1").isEmpty && bwdTight("t2").contains(102.0)) // gaps 2 vs 1
    val fwdTight = m("forward", 2L)
    assert(fwdTight("t1").contains(101.0)) // gap exactly 2 (<=)
    val nearTight = m("nearest", 1L)
    assert(nearTight("t1").isEmpty)        // both sides at gap 2 > 1
    assert(nearTight("t2").contains(102.0))
  }

  test("a matched right row's NULL value comes back NULL — never a stale older row") {
    import spark.implicits._
    val left = Seq((1L, 20L, "t")).toDF("k", "ts", "trade")
    val right = Seq(
      (1L, 5L, Some(100.0), "a"),
      (1L, 15L, None: Option[Double], "b") // the backward match; px is NULL here
    ).toDF("k", "ts", "px", "src")
    val r = AsOf.asofJoin(left, right, "k", "ts", Seq("px", "src")).collect()(0)
    // pandas merge_asof semantics: the matched row (ts=15) supplies ALL
    // value columns — px NULL, src "b". Per-column ignoreNulls carry would
    // mix rows (px from ts=5, src from ts=15).
    assert(r.isNullAt(r.fieldIndex("asof_px")))
    assert(r.getString(r.fieldIndex("asof_src")) == "b")
  }

  test("tolerance applies to the matched row's gap even when its value is NULL") {
    import spark.implicits._
    val left = Seq((1L, 20L, "t")).toDF("k", "ts", "trade")
    val right = Seq(
      (1L, 5L, Some(100.0)), // outside tolerance 6
      (1L, 15L, None: Option[Double]) // the match, gap 5 — within tolerance
    ).toDF("k", "ts", "px")
    val r = AsOf.asofJoin(left, right, "k", "ts", Seq("px"), toleranceSec = Some(6L)).collect()(0)
    assert(r.isNullAt(r.fieldIndex("asof_px"))) // matched row's NULL, not 100.0 from outside the gap
  }
}
