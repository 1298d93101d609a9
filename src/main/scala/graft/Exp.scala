package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only decomposition experiments (not part of the engine surface). */
object Exp {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, d)
    val q = Dedup.fuzzyDupPairs(docs, 0.0)
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    println("[exp] scans: " + "FileScan|Scan parquet".r.findAllIn(plan).size)
    println("[exp] reused: " + "ReusedExchange".r.findAllIn(plan).size)
    println("[exp] bcast-exch: " + "BroadcastExchange".r.findAllIn(plan).size)
    println("[exp] shuffle-exch: " + "Exchange (hashpartitioning|RoundRobin)".r.findAllIn(plan).size)
    println("[exp] bhj: " + "BroadcastHashJoin".r.findAllIn(plan).size)
    println("[exp] smj: " + "SortMergeJoin".r.findAllIn(plan).size)
    spark.stop()
  }
}
