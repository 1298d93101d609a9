package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{functions => gf}

// throwaway stage profiler — not part of the library surface
// r16: tfidf2 bisect — which exchange/stage carries the 2.9 s warm cost
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
      f // warm
      val t0 = System.nanoTime(); f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // noop sink: forces EVERY column (count() prunes unreferenced agg
    // expressions — the r16 first bisect mis-attributed collect_list's
    // cost to the stage above it)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    import org.apache.spark.sql.types.DecimalType
    val D38 = DecimalType(38, 0)
    val docs = Tables.documents(spark, sfDir)
    val docTerm = operators.Partitioning.spread(docs)
      .select(col("doc_id"),
        explode(gf.TextOps.shingles(gf.TextOps.tokens(col("text")), 3)).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    time("1 docTerm (shingle explode + tf agg)")(noop(docTerm))
    val nDocs = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val dfw = docTerm
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .filter(col("df").between(2, 20))
    time("2 + df window + filter")(noop(dfw))
    val weighted = dfw
      .crossJoin(broadcast(nDocs))
      .withColumn("__w", col("tf") *
        floor(log(col("n_docs").cast("double") / col("df")) * (1L << 20)).cast("long"))
      .withColumn("__nsq", sum((col("__w") * col("__w")).cast(D38))
        .over(Window.partitionBy(col("doc_id"))))
    time("3 + w + nsq window")(noop(weighted))
    val postings = weighted
      .groupBy("term")
      .agg(sort_array(collect_list(struct(col("doc_id").as("d"), col("__w").as("w"),
        col("__nsq").as("nsq")))).as("__lst"))
    time("4 + postings collect")(noop(postings))
    val pairs = postings.select(explode(flatten(
      transform(col("__lst"), (x, i) => transform(
        slice(col("__lst"), i + 2, size(col("__lst"))),
        y => struct(x.getField("d").as("a"), y.getField("d").as("b"),
          (x.getField("w") * y.getField("w")).as("p"),
          x.getField("nsq").as("na"), y.getField("nsq").as("nb")))))).as("pr"))
    time("5 + pair explode")(noop(pairs))
    time("6 full tfidf2")(
      SparkEntry.queries("tfidf2_pair_similarity")(spark, sfDir).count())
    // planning-vs-execution split: does Catalyst analysis/optimization of
    // the big expression trees dominate the warm numbers?
    for (n <- Seq("g11_wkt_reproject", "g13_vector_reproject",
        "g14_epsg_reproject", "b1_bucketed_join", "s22_geoparquet_roundtrip",
        "q7b_volume_shipping", "bpe2_bpe_train", "fz2_segment_match",
        "cc2_components_distributed", "hn1_hard_negatives")) {
      SparkEntry.queries(n)(spark, sfDir).count() // warm
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      println(f"[scratch] $n%-28s build ${(t1 - t0) / 1e9}%.3f  " +
        f"plan ${(t2 - t1) / 1e9}%.3f  count(re-plans too) ${(t3 - t2) / 1e9}%.3f")
    }
    spark.stop()
  }
}
