package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway j23 probe counter (the j13/j22 "count the answer"
// discipline): candidates, survivors, and the wall of the measure step
// for the ear-clipping general kernel. Run at two SFs to get the
// candidate-bound exponent.
object J23Counts {
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
      struct(x.as("x"), y.as("y"))
    val dart = array(pt(cx, cy + r), pt(cx - r, cy - r),
      pt(cx, cy - lit(0.5) * r), pt(cx + r, cy - r), pt(cx, cy + r))
    val b = Tables.customer(spark, sfDir)
      .select(c, dart.as("_rc"),
        SpatialOps.bbox(cx - r, cy - r, cx + r, cy + r).as("env_r"))
    val cand = operators.SpatialJoin.bboxJoin(a, b, "env", "env_r", cellSize = 8.0)
    val nCand = cand.count()
    val t0 = System.nanoTime()
    val nOut = cand.withColumn("ia",
        graft.functions.ClipExprs.clipAreaGeneralCol(col("_ra"), col("_rc")))
      .filter(col("ia") > 0.0).count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"J23COUNTS dir=$sfDir candidates=$nCand out=$nOut measure_s=$wall%.3f " +
      f"clips_per_s=${nCand / wall}%.0f")
    spark.stop()
  }
}
