package graft

import graft.operators.{GeoSink, Segmentation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeoSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Polygons from a real polygonize run over a 3-region 12×12 grid. */
  private def polys = {
    val cells = (for { r <- 0 until 12; c <- 0 until 12 } yield {
      val label = (c / 4).toLong // three 4-wide vertical strips
      (r, c, label)
    }).toDF("px_row", "px_col", "seg_id")
    Segmentation.polygonize(cells)
  }

  test("bbox read returns exactly the intersecting polygons, deduplicated") {
    val dir = java.nio.file.Files.createTempDirectory("graft_geo").toString + "/polys"
    GeoSink.writePolygons(polys, dir, tileSize = 4.0)
    // query box over strip 0 and the left edge of strip 1
    val got = GeoSink.readPolygons(spark, dir, 4.0, 0.0, 0.0, 4.5, 12.0)
      .select("seg_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(0L, 1L))
    // full-extent read returns every polygon exactly once
    val all = GeoSink.readPolygons(spark, dir, 4.0, 0.0, 0.0, 12.0, 12.0)
    assert(all.count() == polys.count())
    // narrow box inside strip 2 only
    val right = GeoSink.readPolygons(spark, dir, 4.0, 9.0, 1.0, 10.0, 2.0)
      .select("seg_id").as[Long].collect()
    assert(right.toSeq == Seq(2L))
  }

  test("partition pruning reaches the scan (PartitionFilters on gtile)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_geo2").toString + "/polys"
    GeoSink.writePolygons(polys, dir, tileSize = 4.0)
    val q = spark.read.parquet(dir)
      .filter(col("gtile_x").between(0, 0) && col("gtile_y").between(0, 0))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("gtile_x"),
      s"expected partition filters in:\n$plan")
  }
}
