package graft

import org.scalatest.funsuite.AnyFunSuite

/** t1 smoke (SURVEY.md §5.1): every declared query runs at sf0.001 and the
  * flagship returns rows. Oracle keys must be a subset of query keys and
  * column names must line up with the oracle SQL aliases (the driver's
  * compare sorts columns by name).
  */
class EntrySmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("events fixture dtype canary: loader normalizes ts to TimestampType") {
    // The fixture's physical ts type has drifted between rounds (nanos-long
    // → timestamp[us]). This canary names the drift at test time instead of
    // letting it surface as dozens of cascading query failures.
    import org.apache.spark.sql.types.TimestampType
    val loaded = Tables.events(spark, sf).schema("ts").dataType
    assert(loaded == TimestampType,
      s"Tables.events must normalize the fixture's ts to TimestampType; got $loaded — " +
        "the testdata fixture dtype likely changed; update Tables.events' branch")
    val raw = spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
    info(s"raw fixture ts dtype: $raw")
  }

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
