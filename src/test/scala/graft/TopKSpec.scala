package graft

import graft.plans.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int = 5): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default.withSize(40), Seed(7L + i)))

  private val rowsGen: Gen[List[(Long, Long, Double)]] =
    Gen.listOf(for {
      key <- Gen.choose(0L, 5L)
      id <- Gen.choose(0L, 500L)
      v <- Gen.choose(-100.0, 100.0)
    } yield (key, id, v))

  test("property: TopK.perKey == window row_number under a total order") {
    samples(rowsGen).foreach { rows =>
      val df = rows.toDF("key", "id", "v").distinct()
      for (k <- Seq(1, 3)) {
        val got = TopK.perKey(df, Seq(col("key")), Seq(col("v").desc, col("id").asc), k)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val w = Window.partitionBy("key").orderBy(col("v").desc, col("id").asc)
        val expect = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
          .drop("rn").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(got == expect, s"k=$k rows=${rows.size}")
      }
    }
  }

  test("rows stream out ascending in the sort order within each key") {
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 9.0), (1L, 12L, 1.0), (2L, 20L, 3.0))
      .toDF("key", "id", "v")
    val got = TopK.perKey(df, Seq(col("key")), Seq(col("v").desc), 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val byKey = got.groupBy(_._1).view.mapValues(_.map(_._2).toList).toMap
    assert(byKey(1L) == List(9.0, 5.0))
    assert(byKey(2L) == List(3.0))
  }

  test("plan: partial + final with one exchange, no sort operator") {
    val df = Tables.orders(spark, "/root/testdata/sf0.001")
    val q = TopK.perKey(df, Seq(col("o_custkey")), Seq(col("o_totalprice").desc), 3)
    val plan = q.queryExecution.executedPlan.toString
    assert("TopKPerKey \\d".r.findAllIn(plan).size == 2, s"plan:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, s"plan:\n$plan")
    assert(!plan.contains("Sort "), s"unexpected sort:\n$plan")
  }

  test("null keys group together; duplicate values at the k boundary keep k rows") {
    val df = Seq((Some(1L), 1L, 5.0), (None, 2L, 4.0), (None, 3L, 6.0), (None, 4L, 6.0))
      .toDF("key", "id", "v")
    val got = TopK.perKey(df, Seq(col("key")), Seq(col("v").desc, col("id").asc), 2)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1)))
    assert(got.count(_._1 == -1L) == 2)
    assert(got.filter(_._1 == -1L).map(_._2).toSet == Set(3L, 4L))
  }
}
