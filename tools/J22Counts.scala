package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway j22 probe counter (the j13 "count the answer" discipline).
object J22Counts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.SpatialOps
    val a = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), SparkEntry.arrowWkt(col("s_suppkey"), withHole = true).as("geom"))
      .select(col("s_suppkey"), SpatialOps.wktRings(col("geom")).as("_ra"))
      .withColumn("env", SpatialOps.ringsEnvelope(col("_ra")))
    val c = col("c_custkey")
    val cx = (c % 88).cast("double") + lit(2.0)
    val cy = (c % 78).cast("double") + lit(2.0)
    val r = lit(1.0) + (c % 3).cast("double") * lit(0.5)
    def pt(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      concat(x.cast("string"), lit(" "), y.cast("string"))
    val diamond = concat(lit("POLYGON (("),
      concat_ws(", ", pt(cx, cy - r), pt(cx + r, cy), pt(cx, cy + r),
        pt(cx - r, cy), pt(cx, cy - r)), lit("))"))
    val b = Tables.customer(spark, sfDir)
      .select(c, diamond.as("geom_b"))
      .select(col("c_custkey"),
        element_at(SpatialOps.wktRings(col("geom_b")), 1).as("_rc"),
        SpatialOps.ringsEnvelope(SpatialOps.wktRings(col("geom_b"))).as("env_r"))
    val cand = operators.SpatialJoin.bboxJoin(a, b, "env", "env_r", cellSize = 8.0)
    val nCand = cand.count()
    val nOut = cand.withColumn("ia",
        graft.functions.ClipExprs.clipAreaPoly(col("_ra"), col("_rc")))
      .filter(col("ia") > 0.0).count()
    println(s"J22COUNTS dir=$sfDir candidates=$nCand out=$nOut")
    spark.stop()
  }
}
