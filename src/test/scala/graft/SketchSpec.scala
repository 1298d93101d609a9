package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-aggregate surface (the 100 TB substitutes for exact distinct /
  * exact percentiles): error stays within the configured bounds on real
  * testdata. These are Catalyst built-ins (HLL++ and KLL-style quantiles)
  * — the engine's job is picking parameters, not reimplementing them.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct (HLL++) within rsd bound on orderkeys") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0).toDouble
    val approx = li.select(approx_count_distinct(col("l_orderkey"), rsd = 0.02))
      .head().getLong(0).toDouble
    // 0.02 rsd → generous 4-sigma acceptance
    assert(math.abs(approx - exact) / exact < 0.08,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx converges to exact percentile as accuracy grows") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(expr("percentile(l_extendedprice, 0.5)")).head().getDouble(0)
    val loose = li.select(expr("percentile_approx(l_extendedprice, 0.5, 100)")).head().getDouble(0)
    val tight = li.select(expr("percentile_approx(l_extendedprice, 0.5, 10000)")).head().getDouble(0)
    assert(math.abs(tight - exact) <= math.abs(loose - exact) + 1e-9)
    // median of a dense price distribution: tight sketch lands within 1%
    assert(math.abs(tight - exact) / exact < 0.01, s"tight=$tight exact=$exact")
  }
}
