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
    import operators.MlOps
    val li = Tables.lineitem(spark, sfDir)
    val feats = Seq("l_quantity", "l_discount", "l_tax")
    for (round <- 1 to 2) {
      println(s"[scratch] --- round $round ---")
      var model: org.apache.spark.ml.PipelineModel = null
      time("rf fit (2% sample)") {
        val train = li.filter(col("l_orderkey") % 50 === 0)
          .withColumn("label", when(col("l_returnflag") === "R", 1).otherwise(0))
          .repartition(4)
        model = MlOps.trainRf(train, feats, "label", numTrees = 16, maxDepth = 6)
      }
      time("forestRules + write") {
        MlOps.forestRules(model, feats)
          .write.mode("overwrite").parquet("/tmp/graft_m1b_rules")
      }
      val rules = spark.read.parquet("/tmp/graft_m1b_rules")
      val census = MlOps.classifyFromRules(rules, li, feats)
        .groupBy("pred_label").agg(count(lit(1)).as("n"))
      time("census build+first action")(census.count())
      time("census SAME df again")(census.count())
      if (round == 1) {
        val plan = census.queryExecution.executedPlan.toString
        println("[scratch] plan has codegen stars: " +
          plan.linesIterator.filter(_.contains("Project")).take(3).mkString(" || "))
        val cl = MlOps.classifyFromRules(rules, li, feats)
        println("[scratch] pred expr size: " + cl.queryExecution.analyzed.expressions
          .map(e => e.collect { case x => x }.size).sum)
      }
      time("m1b full") {
        SparkEntry.queries("m1b_frozen_forest")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
