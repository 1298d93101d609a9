package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway probe counter (r13, the j13/fz2 "count the answer" discipline):
// candidate/vocab counts that adjudicate the ~sf1 wall ratios of
// j19/j20/e16/dsir1 as candidate- or vocab-bound rather than plan defects.
// Run by temp-copying into src/main/scala/graft/ (tools/ is not compiled):
//   SPARK_GRAFT_SF_DIR=<dir> sbt -batch "runMain graft.ProbeCounts"
object ProbeCounts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.SpatialOps

    def polys(radius: Double) = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), SparkEntry.arrowWkt(col("s_suppkey"), withHole = true).as("geom"))
      .select(col("s_suppkey"), SpatialOps.wktRings(col("geom")).as("_r"))
      .withColumn("env", {
        val e = SpatialOps.ringsEnvelope(col("_r"))
        SpatialOps.bbox(e.getField("xmin") - radius, e.getField("ymin") - radius,
          e.getField("xmax") + radius, e.getField("ymax") + radius)
      })
    val c = col("c_custkey")
    val pts = Tables.customer(spark, sfDir).select(c,
        ((c % 93).cast("double") + (c % 3).cast("double") * lit(0.5)).as("px"),
        ((c % 83).cast("double") + (c % 7).cast("double") * lit(0.25)).as("py"))
      .withColumn("env_r", SpatialOps.bbox(col("px"), col("py"), col("px"), col("py")))
    println("[probe] j19 bbox candidates (r=1.5): " +
      operators.SpatialJoin.bboxJoin(polys(1.5), pts, "env", "env_r", cellSize = 8.0).count())
    println("[probe] j20 bbox candidates (r=3.0): " +
      operators.SpatialJoin.bboxJoin(polys(3.0), pts, "env", "env_r", cellSize = 8.0).count())

    val emb = Tables.embeddings(spark, sfDir)
    val cent = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("centroid"))
    val sizes = operators.Similarity.assignCells(emb, cent).groupBy("cell").count()
    val candPairs = sizes.agg(sum(col("count") * (col("count") - 1) / 2)).head.getDouble(0).toLong
    println("[probe] e16 within-cell pairs: " + candPairs)

    val docs = Tables.documents(spark, sfDir)
    val v = docs.select(explode(graft.functions.TextOps.tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t")).as("v"), count(lit(1)).as("n")).head
    println(s"[probe] dsir vocab=${v.getLong(0)} tokens=${v.getLong(1)} docs=${docs.count()}")
    spark.stop()
  }
}
