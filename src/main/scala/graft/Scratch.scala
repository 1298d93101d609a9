package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// throwaway stage profiler — not part of the library surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val li = Tables.lineitem(spark, sfDir)
    val proj = li.select(col("l_extendedprice").as("__v"),
      col("l_orderkey").as("__t0"), col("l_linenumber").as("__t1"))
    for (round <- 1 to 2) {
      println(s"[scratch] --- round $round ---")
      time("scan+count")(proj.count())
      time("pctl_approx 31 cuts acc10000") {
        proj.agg(percentile_approx(col("__v"),
          array((1 until 32).map(i => lit(i / 32.0)): _*), lit(10000))).head()
      }
      time("pctl_approx 31 cuts acc1000") {
        proj.agg(percentile_approx(col("__v"),
          array((1 until 32).map(i => lit(i / 32.0)): _*), lit(1000))).head()
      }
      val cuts = proj.agg(percentile_approx(col("__v"),
        array((1 until 32).map(i => lit(i / 32.0)): _*), lit(10000)).as("cuts"))
        .head().getSeq[Any](0).filter(_ != null)
      val bucketed = proj.withColumn("__gob",
        when(col("__v").isNull, lit(0)).otherwise(
          size(filter(array(cuts.map(lit): _*), b => b < col("__v")))))
      time("bucket counts groupBy")(bucketed.groupBy("__gob").count().collect())
      time("pass2 sort+window+agg") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__gob")).orderBy(col("__v"), col("__t0"), col("__t1"))
        bucketed.withColumn("__rank", row_number().over(w))
          .groupBy("__gob").agg(min("__v"), max("__v"), count(lit(1))).collect()
      }
      time("groupBy __v runs count") {
        proj.groupBy("__v").agg(count(lit(1))).count()
      }
      time("old full equiDepth-shaped chain") {
        val (ranked, _) = operators.GlobalOrder.withGlobalRankAndTotal(
          proj, Seq(col("__v"), col("__t0"), col("__t1")), "__rank")
        ranked.groupBy((col("__rank") % 10).as("b"))
          .agg(min("__v"), max("__v"), count(lit(1))).collect()
      }
      time("new equiDepthHistogram") {
        operators.Profiling.equiDepthHistogram(li, col("l_extendedprice"),
          Seq(col("l_orderkey")), 10).collect()
      }
    }
    spark.stop()
  }
}
