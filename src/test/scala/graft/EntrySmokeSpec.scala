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
