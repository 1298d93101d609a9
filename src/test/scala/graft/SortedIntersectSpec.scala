package graft

import graft.functions.SortedIntersectExpr
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SortedIntersectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("merge-walk count equals size(array_intersect) on sorted distinct arrays") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      val a = (0 until rnd.nextInt(20)).map(_ => s"t${rnd.nextInt(30)}").distinct.sorted
      val b = (0 until rnd.nextInt(20)).map(_ => s"t${rnd.nextInt(30)}").distinct.sorted
      (i, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val bad = df
      .withColumn("fused", SortedIntersectExpr.sortedIntersectCount(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))).cast("long"))
      .filter(col("fused") =!= col("ref"))
      .count()
    assert(bad === 0L)
  }

  test("non-ASCII elements: consistent with sort_array ordering") {
    // é (2-byte UTF-8) vs z: UTF8String binary order puts 'z' (0x7a)
    // before 'é' (0xc3a9) — sort_array and the kernel must agree.
    val df = Seq((1, Seq("a", "z", "é"), Seq("é", "z"))).toDF("id", "a0", "b0")
      .select(col("id"), sort_array(col("a0")).as("a"), sort_array(col("b0")).as("b"))
    val r = df.select(
      SortedIntersectExpr.sortedIntersectCount(col("a"), col("b")).as("fused"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref")).head()
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(0) === 2L)
  }

  test("interpreted eval matches codegen result") {
    val a = Seq("a", "b", "c", "x")
    val b = Seq("b", "c", "d")
    val df = Seq((a, b)).toDF("a", "b")
    val viaPlan = df.select(
      SortedIntersectExpr.sortedIntersectCount(col("a"), col("b"))).head().getLong(0)
    assert(viaPlan === 2L)
    // interpreted path directly
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val expr = graft.functions.SortedIntersectCountExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(
        ArrayData.toArrayData(a.map(UTF8String.fromString).toArray),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal(
        ArrayData.toArrayData(b.map(UTF8String.fromString).toArray),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))
    assert(expr.eval(null) === 2L)
  }
}
