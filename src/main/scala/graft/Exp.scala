package graft

import graft.operators.{Dedup, Graph}
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
    spark.range(1000).selectExpr("sum(id)").collect()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[exp] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val docs = Tables.documents(spark, d)
    val edges = Dedup.minhashCandidatePairs(docs, 8, 2).cache()
    time("edges materialize")(edges.count())
    time("cc on cached edges")(Graph.connectedComponents(edges).count())
    time("cc again")(Graph.connectedComponents(edges).count())
    spark.stop()
  }
}
