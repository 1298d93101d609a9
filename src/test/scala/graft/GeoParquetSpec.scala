package graft

import graft.operators.GeoParquet
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeoParquetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def features = Seq(
    (1L, "POINT (3.5 -2.25)", "a"),
    (2L, "LINESTRING (0 0, 4.5 1.25, 6 -3)", "b"),
    (3L, "POLYGON ((0 0, 10 0, 10 5, 0 5, 0 0), (2 1, 3 1, 3 2, 2 2, 2 1))", "c"),
    (4L, null.asInstanceOf[String], "d")
  ).toDF("fid", "geom", "tag")

  test("roundtrip: write -> read is the identity on WKT + attributes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gpq").toString + "/store"
    GeoParquet.writeGeoParquet(features, dir, geomCol = "geom")
    val back = GeoParquet.readGeoParquet(spark, dir)
      .select("fid", "geom", "tag").orderBy("fid").collect()
    val want = features.orderBy("fid").collect()
    assert(back.length == want.length)
    back.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0))
      // canonical WKT spelling comes back: doubles re-print shortest-form
      if (w.isNullAt(1)) assert(g.isNullAt(1))
      else {
        val norm = "(-?\\d+(?:\\.\\d+)?)".r
        def nums(s: String) = norm.findAllIn(s).map(_.toDouble).toSeq
        assert(nums(g.getString(1)) == nums(w.getString(1)), g.getString(1))
        assert(g.getString(1).takeWhile(_ != ' ') == w.getString(1).takeWhile(_ != ' '))
      }
      assert(g.getString(2) == w.getString(2))
    }
  }

  test("external shape: the geo footer entry is spec-shaped JSON on every part-file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gpq2").toString + "/store"
    GeoParquet.writeGeoParquet(features.repartition(3), dir, geomCol = "geom")
    val json = GeoParquet.geoMetadata(dir).get
    // the exact keys geopandas/GDAL look for
    assert(json.contains("\"version\":\"1.0.0\""))
    assert(json.contains("\"primary_column\":\"geom\""))
    assert(json.contains("\"encoding\":\"WKB\""))
    assert(json.contains("\"geometry_types\":[\"LineString\",\"Point\",\"Polygon\"]"))
    assert(json.contains("\"crs\":null"))
    // bbox spans all features: x in [0,10], y in [-3,5]
    assert(json.contains("\"bbox\":[0.0,-3.0,10.0,5.0]"), json)
    // EVERY part-file footer carries it (a reader may open any file first)
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = new org.apache.hadoop.conf.Configuration()
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    assert(parts.length > 1) // repartition(3) with 4 rows → >1 part
    parts.foreach { f =>
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try {
        val kv = r.getFooter.getFileMetaData.getKeyValueMetaData
        assert(kv.get("geo") == json, f.getName)
        // Spark's own schema entry survives the footer rewrite
        assert(kv.containsKey("org.apache.spark.sql.parquet.row.metadata"), f.getName)
      } finally r.close()
    }
    // the store is still plain-parquet readable, geometry as binary WKB
    val raw = spark.read.parquet(dir)
    assert(raw.schema("geom").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(raw.count() == 4)
  }

  test("crs passes through verbatim; plain parquet and non-WKB fail closed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gpq3").toString + "/store"
    val projjson = """{"type":"GeographicCRS","name":"WGS 84"}"""
    GeoParquet.writeGeoParquet(features.limit(1), dir, "geom", Some(projjson))
    assert(GeoParquet.geoMetadata(dir).get.contains(s""""crs":$projjson"""))
    // plain parquet rejects descriptively
    val plain = java.nio.file.Files.createTempDirectory("graft_gpq4").toString + "/p"
    features.limit(1).write.parquet(plain)
    val e = intercept[IllegalArgumentException](GeoParquet.readGeoParquet(spark, plain))
    assert(e.getMessage.contains("no GeoParquet"), e.getMessage)
    // a geo footer naming a non-binary column rejects descriptively
    val bad = java.nio.file.Files.createTempDirectory("graft_gpq5").toString + "/b"
    features.limit(1).write.parquet(bad)
    val badJson = """{"version":"1.0.0","primary_column":"geom","columns":{"geom":{"encoding":"WKB","geometry_types":[],"crs":null}}}"""
    new java.io.File(bad).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach(f => GeoParquet.addGeoFooter(f.getAbsolutePath, badJson))
    val e2 = intercept[IllegalArgumentException](GeoParquet.readGeoParquet(spark, bad))
    assert(e2.getMessage.contains("not binary WKB"), e2.getMessage)
  }
}
