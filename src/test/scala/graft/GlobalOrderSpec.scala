package graft

import graft.operators.GlobalOrder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two-pass partition-offset global ordering: must agree exactly with the
  * single-partition window it replaces, at any partition count.
  */
class GlobalOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("withGlobalRank matches row_number over the total order") {
    val df = spark.range(0, 10000).select(
      (col("id") * 37 % 1000).as("k"), col("id").as("tie"))
    val ranked = GlobalOrder.withGlobalRank(df, Seq(col("k"), col("tie")), "r", 8)
    val expected = df.withColumn("r",
      row_number().over(Window.orderBy("k", "tie")).cast("long"))
    assert(ranked.count() == 10000)
    assert(ranked.select(countDistinct(col("r"))).head.getLong(0) == 10000)
    assert(ranked.except(expected).isEmpty && expected.except(ranked).isEmpty)
  }

  test("withGlobalRank is stable across repeated evaluations") {
    val df = spark.range(0, 5000).select((col("id") * 13 % 500).as("k"), col("id").as("tie"))
    val ranked = GlobalOrder.withGlobalRank(df, Seq(col("k"), col("tie")), "r", 7)
    val a = ranked.orderBy("r").collect()
    val b = ranked.orderBy("r").collect()
    assert(a.sameElements(b))
  }

  test("prefixSum matches the running-total window (decimal-exact)") {
    val df = spark.range(1, 2001).select(col("id").as("k"),
      ((col("id") % 97) + lit(0.25)).cast("decimal(18,2)").as("v"))
    val got = GlobalOrder.prefixSum(df, Seq(col("k")), col("v"), "rt", 8)
      .select(col("k"), col("rt").cast("double").as("rt"))
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.select(col("k"), sum(col("v")).over(w).cast("double").as("rt"))
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("prefixSum over longs and empty partitions") {
    val df = Seq((1L, 5L), (2L, 7L), (3L, 11L)).toDF("k", "v")
    val got = GlobalOrder.prefixSum(df, Seq(col("k")), col("v"), "rt", 16)
      .select("k", "rt").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 5L), (2L, 12L), (3L, 23L)))
  }

  test("prefixSum rejects float values") {
    val df = Seq((1L, 0.5)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      GlobalOrder.prefixSum(df, Seq(col("k")), col("v"))
    }
    assert(e.getMessage.contains("integral or decimal"))
  }
}
