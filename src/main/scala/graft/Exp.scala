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
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[exp] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.documents(spark, d)
    t("warm scan")(docs.count())
    t("pairs.count (e2b shape)")(
      Dedup.fuzzyDupPairs(docs, threshold = 0.5, numHashes = 8, rowsPerBand = 2).count())
    t("pairs.count again")(
      Dedup.fuzzyDupPairs(docs, threshold = 0.5, numHashes = 8, rowsPerBand = 2).count())
    val edges = Dedup.fuzzyDupPairs(docs, threshold = 0.5, numHashes = 8, rowsPerBand = 2)
    t("pairs.take(4M+1)")(
      edges.select(col("a").as("x"), col("b").as("y")).take((1 << 22) + 1))
    t("cc total")(
      operators.Graph.connectedComponents(
        Dedup.fuzzyDupPairs(docs, threshold = 0.5, numHashes = 8, rowsPerBand = 2)).count())
    t("e10 anti-join tail") {
      val drops = operators.Graph.connectedComponents(
          Dedup.fuzzyDupPairs(docs, threshold = 0.5, numHashes = 8, rowsPerBand = 2))
        .filter(col("node") =!= col("component")).select(col("node").as("doc_id"))
      docs.join(drops, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("n_chars")).orderBy("doc_id").count()
    }
    spark.stop()
  }
}
