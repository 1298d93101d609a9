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

  test("kmvDistinct is exact below sketch capacity") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i % 7, i)).toDF("g", "v")
    val sk = operators.Sketches.kmvDistinct(df, col("v"), Seq("g"), k = 256)
      .orderBy("g").collect()
    assert(sk.length == 7)
    sk.foreach { r =>
      // every group has < 256 distinct values → est is the exact count
      assert(r.getAs[Double]("est_distinct") == r.getAs[Long]("n_min").toDouble)
    }
    assert(sk.map(_.getAs[Long]("n_min")).sum == 100L)
  }

  test("kmvDistinct estimate within expected error above capacity") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0).toDouble
    val est = operators.Sketches.kmvDistinct(li, col("l_orderkey"), Nil, k = 256)
      .head().getAs[Double]("est_distinct")
    // KMV rse ≈ 1/sqrt(k-2) ≈ 6.3% at k=256; accept 4 sigma
    assert(math.abs(est - exact) / exact < 0.25, s"est=$est exact=$exact")
  }

  test("kmvDistinct is mergeable: sketch of union == merged sketches") {
    import spark.implicits._
    val a = (1L to 5000L).toDF("v")
    val b = (2500L to 7500L).toDF("v")
    val k = 64
    def sketch(df: org.apache.spark.sql.DataFrame) =
      operators.Sketches.kmvDistinct(df, col("v"), Nil, k)
    // merge = union the kept hash sets, re-cap to the k smallest: rebuild
    // from the two sketches' value domains via their defining property
    val direct = sketch(a.union(b)).head()
    // the sketch keeps the k smallest distinct hashes; merging two k-sets
    // and re-capping reproduces exactly the k smallest of the union
    val ha = a.select(graft.functions.TextOps.hexVal(md5(col("v").cast("string")), 15).as("h"))
      .distinct().orderBy("h").limit(k)
    val hb = b.select(graft.functions.TextOps.hexVal(md5(col("v").cast("string")), 15).as("h"))
      .distinct().orderBy("h").limit(k)
    val mergedKth = ha.union(hb).distinct().orderBy("h").limit(k)
      .agg(max(col("h"))).head().getLong(0)
    assert(direct.getAs[Long]("kth_hash") == mergedKth,
      "k-th smallest of merged k-sets must equal the union's sketch bound")
  }

  test("kmvDistinct per-group matches per-group exact ordering of magnitude") {
    val li = Tables.lineitem(spark, sf)
    val sk = operators.Sketches.kmvDistinct(li, col("l_partkey"), Seq("l_returnflag"), k = 128)
    val exact = li.groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("x"))
    val j = sk.join(exact, Seq("l_returnflag")).collect()
    j.foreach { r =>
      val est = r.getAs[Double]("est_distinct"); val x = r.getAs[Long]("x").toDouble
      assert(math.abs(est - x) / x < 0.4, s"flag=${r.get(0)} est=$est exact=$x")
    }
  }
}
