package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{functions => gf}

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
    val docs = operators.Partitioning.spread(Tables.documents(spark, sfDir))
    def toks = gf.TextOps.tokens(col("text"))
    import operators.Curation
    for (round <- 1 to 2) {
      println(s"[scratch] --- round $round ---")
      val passKeep = Curation.passageDupStats(docs, ngramK = 5)
        .filter(col("dup_passage_frac") <= lit(0.5))
        .select("doc_id")
      time("passKeep count")(passKeep.count())
      val clean = Curation.qualityGate(docs).filter(col("keep"))
        .join(passKeep, Seq("doc_id"), "left_semi")
      time("clean count")(clean.count())
      val withSplit = clean.withColumn("split", Curation.hashSplit(clean, "doc_id"))
      val packed = Curation.packByTokenBudget(withSplit,
        gf.TextOps.tokenCount(col("text")), "doc_id", budget = 2048, shardCol = Some("split"))
      time("packed count")(packed.count())
      time("pipe2 full") {
        SparkEntry.queries("pipe2_curation_v2")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
