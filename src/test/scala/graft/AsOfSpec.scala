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
}
