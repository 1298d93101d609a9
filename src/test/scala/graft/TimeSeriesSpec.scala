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
}
