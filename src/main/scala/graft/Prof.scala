package graft

import org.apache.spark.sql.SparkSession

/** Dev-only repeat-timer: `runMain graft.Prof <sfDir> <n> q1,q2,...`
  * runs each named query `n` times in one session and prints per-run
  * seconds — separates cold (codegen/planning) cost from warm data cost.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args(2).split(",").toSeq else Seq("e7_jaccard_verify")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (name <- names; i <- 1 to n) {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[prof] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($rows rows)")
    }
    spark.stop()
  }
}
