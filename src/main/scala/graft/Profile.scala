package graft

import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Stage profiler for heavy queries: times sub-plans of a pipeline in one
  * warmed session so the expensive stage is attributable
  * (run: sbt "runMain graft.Profile [sfDir]"). Bisection companion to
  * Bench's SPARK_GRAFT_BENCH_FILTER/REPEAT knobs.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      // warm once, then measure
      f
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$n)")
    }

    val docs = Tables.documents(spark, sf)
    time("docs scan+count")(docs.count())
    time("tokens explode")(
      docs.select(explode(TextOps.tokens(col("text")))).count())
    time("shingles spread(32) (sum sizes)")(
      docs.repartition(32)
        .select(size(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("n"))
        .agg(sum("n")).collect()(0).getLong(0))
    time("langid all docs (e5 core)")(
      docs.select(TextOps.langGuessFromTokens(TextOps.tokens(col("text"))).as("lg"))
        .groupBy("lg").count().count())
    time("shingles only (sum sizes)")(
      docs.select(size(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("n"))
        .agg(sum("n")).collect()(0).getLong(0))
    time("shingles distinct (sum sizes)")(
      docs.select(size(array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 3))).as("n"))
        .agg(sum("n")).collect()(0).getLong(0))
    time("explode shingles (no distinct)")(
      docs.select(col("doc_id"),
        explode(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("g")).count())
    time("explode staged distinct")(
      docs.select(col("doc_id"),
          array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("arr"))
        .select(col("doc_id"), explode(col("arr")).as("g")).count())
    val grams = docs.select(col("doc_id"),
      explode(array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 3))).as("g"))
    time("gram explode")(grams.count())
    val evalGrams = docs.filter(col("doc_id") % 97 === 0)
      .select(explode(array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 3))).as("g"))
      .distinct()
    time("eval grams distinct")(evalGrams.count())
    time("semi join")(grams.join(evalGrams, Seq("g"), "left_semi").count())
    time("contaminated distinct")(
      grams.join(evalGrams, Seq("g"), "left_semi").select("doc_id").distinct().count())
    time("full decontaminate")(
      operators.Curation.decontaminate(docs, docs.filter(col("doc_id") % 97 === 0), 3).count())
    time("e11 query")(SparkEntry.queries("e11_decontaminate")(spark, sf).count())
    time("pipe1 query")(SparkEntry.queries("pipe1_curation")(spark, sf).count())
    locally {
      val scored = operators.Partitioning.spread(docs)
        .select(col("doc_id"), col("text"), TextOps.tokens(col("text")).as("_toks"))
        .select(col("doc_id"), col("text"),
          size(col("_toks")).cast("long").as("n_tokens"),
          TextOps.stopwordHits(col("_toks"), TextOps.AllStopwords).cast("double").as("_hits"),
          TextOps.langGuessFromTokens(col("_toks")).as("lang_guess"))
        .withColumn("quality",
          least(col("n_tokens") / lit(100.0), lit(1.0)) * lit(0.5) +
            least(col("_hits") / col("n_tokens") * lit(4.0), lit(1.0)) * lit(0.5))
        .filter(col("quality") >= lit(0.3))
      time("pipe1 scored")(scored.count())
      import org.apache.spark.sql.expressions.Window
      val dedupW = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val deduped = scored
        .withColumn("_rn", row_number().over(dedupW))
        .filter(col("_rn") === 1)
        .select("doc_id", "text", "n_tokens", "lang_guess")
      time("pipe1 deduped")(deduped.count())
      val clean = operators.Curation.decontaminate(
        deduped, docs.filter(col("doc_id") % 97 === 0), ngramK = 3)
      time("pipe1 clean")(clean.count())
    }
    spark.stop()
  }
}
