package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 90% of rows share one hot key. */
  private def skewed = (1 to 1000).map { i =>
    (if (i <= 900) "hot" else s"k${i % 17}", i.toDouble, i.toLong)
  }.toDF("k", "v", "id")

  test("saltedAgg equals the direct aggregation (avg via sum/count)") {
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("c"))
      .withColumn("avg", col("s") / col("c"))
      .select("k", "avg").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedAgg(skewed, Seq("k"), col("id"), salts = 16,
      partials = Seq(sum(col("v")).as("s"), count(lit(1)).as("c")),
      combine = Seq(sum(col("s")).as("s"), sum(col("c")).as("c")))
      .withColumn("avg", col("s") / col("c"))
      .select("k", "avg").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, v) => assert(math.abs(v - direct(k)) < 1e-9) }
  }

  test("saltedJoin equals the plain join") {
    val dims = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "name")
    val plain = skewed.join(dims, Seq("k")).select("id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(skewed, dims, "k", salts = 8, probeSaltSource = col("id"))
      .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
    // left join preserves unmatched probe rows exactly once
    val leftPlain = skewed.join(dims, Seq("k"), "left").count()
    val leftSalted = Skew.saltedJoin(skewed, dims, "k", 8, col("id"), "left").count()
    assert(leftSalted == leftPlain)
  }

  test("salting actually spreads the hot key across partitions") {
    val salted = skewed.withColumn("_salt", pmod(hash(col("id")), lit(16)))
    val spreads = salted.filter(col("k") === "hot")
      .groupBy("_salt").count().collect().map(_.getLong(1))
    assert(spreads.length > 8)            // hot key hits most salt buckets
    assert(spreads.max < 900)             // no single bucket holds it all
  }

  test("keySkewProfile surfaces the hot key with its share") {
    val top = Skew.keySkewProfile(skewed, "k", topN = 3).collect()
    assert(top(0).getString(0) == "hot")
    assert(top(0).getDouble(2) == 0.9)
  }
}
