package graft.operators

import graft.functions.SpatialOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GeoParquet-style vector sink/source (SURVEY.md §2.1 S6 + §4 spatial
  * item): polygons as WKT rows with an envelope struct, partitioned into a
  * spatial tile grid so bbox queries prune at the directory level before
  * any geometry math runs.
  *
  * Multi-tile geometries are written once per overlapped tile (the sink
  * analog of the halo transform's bounded duplication) and deduplicated on
  * read — reads touch only the tiles intersecting the query bbox, which is
  * what makes a 100 TB polygon store queryable: partition pruning first,
  * envelope filter second, exact geometry predicate last.
  */
object GeoSink {

  /** Write polygons (must carry `wkt`; key columns preserved) spatially
    * partitioned by `tileSize`-sized grid cells overlapped by each
    * polygon's envelope.
    */
  def writePolygons(polys: DataFrame, path: String, tileSize: Double): Unit = {
    val withEnv = polys.withColumn("env", SpatialOps.wktEnvelope(col("wkt")))
    withEnv
      .withColumn("gtile_x",
        explode(sequence(
          floor(col("env.xmin") / tileSize).cast("int"),
          floor(col("env.xmax") / tileSize).cast("int"))))
      .withColumn("gtile_y",
        explode(sequence(
          floor(col("env.ymin") / tileSize).cast("int"),
          floor(col("env.ymax") / tileSize).cast("int"))))
      .write.mode("overwrite")
      .partitionBy("gtile_x", "gtile_y")
      .parquet(path)
  }

  /** Read polygons intersecting the query bbox. Tile-range predicates on
    * the partition columns prune directories; the envelope predicate then
    * filters rows; duplicates from multi-tile writes collapse on the key
    * columns.
    */
  def readPolygons(
      spark: SparkSession,
      path: String,
      tileSize: Double,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double,
      keyCols: Seq[String] = Seq("seg_id", "part")): DataFrame = {
    val df = spark.read.parquet(path)
    val queryBox = SpatialOps.bbox(lit(xmin), lit(ymin), lit(xmax), lit(ymax))
    df.filter(
        col("gtile_x").between(math.floor(xmin / tileSize).toInt, math.floor(xmax / tileSize).toInt) &&
        col("gtile_y").between(math.floor(ymin / tileSize).toInt, math.floor(ymax / tileSize).toInt))
      .filter(SpatialOps.bboxIntersects(col("env"), queryBox))
      .dropDuplicates(keyCols)
      .drop("gtile_x", "gtile_y")
  }
}
