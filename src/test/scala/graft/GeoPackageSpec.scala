package graft

import graft.operators.GeoPackage
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GeoPackage reader invariants (object_classifier.py:193-213 interchange
  * shape): the synth writer and the SQLite b-tree walker must agree, the
  * geometry blobs must decode to WKT, and the many-files path must scale
  * by file.
  */
class GeoPackageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def feats(n: Int, offset: Int = 0) = (0 until n).map { i =>
    val x = (i + offset).toDouble
    val ring = Seq((x, 0.0), (x + 1.0, 0.0), (x + 1.0, 1.0), (x, 1.0), (x, 0.0))
    (i.toLong + 1, GeoPackage.gpkgPolygonBlob(ring), s"f$i", i * 0.5)
  }

  test("single-leaf round trip: schema, rowid alias, WKT decode") {
    val gpkg = GeoPackage.synthGpkg("layer_a", feats(5))
    assert(GeoPackage.layersOf(gpkg) == Seq("layer_a"))
    val df = GeoPackage.readLayer(spark, gpkg, "layer_a")
    assert(df.schema.fieldNames.toSeq == Seq("fid", "geom", "name", "value"))
    val rows = df.orderBy("fid").collect()
    assert(rows.length == 5)
    assert(rows(0).getLong(0) == 1L) // fid via INTEGER PRIMARY KEY rowid alias
    assert(rows(0).getString(1) ==
      "POLYGON ((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 1.0, 0.0 0.0))")
    assert(rows(2).getString(2) == "f2" && rows(2).getDouble(3) == 1.0)
  }

  test("multi-leaf b-tree (interior page) reads back every feature") {
    val n = 120 // ~120-byte cells: forces several 4096-byte leaves
    val gpkg = GeoPackage.synthGpkg("big", feats(n))
    val df = GeoPackage.readLayer(spark, gpkg, "big")
    assert(df.count() == n)
    assert(df.agg(min("fid"), max("fid")).head() ==
      org.apache.spark.sql.Row(1L, n.toLong))
    // spot-check a row from a non-first leaf
    val r77 = df.filter(col("fid") === 77).head()
    assert(r77.getString(2) == "f76" && r77.getDouble(3) == 76 * 0.5)
  }

  test("readLayerFiles: one task per file, union of all features") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gpkg").toString
    for (f <- 0 until 3) {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/tile_$f.gpkg"),
        GeoPackage.synthGpkg("tiles", feats(4, offset = 10 * f)))
    }
    val df = GeoPackage.readLayerFiles(spark, dir)
    assert(df.count() == 12)
    // per-tile x offsets survive: 3 distinct first-corner x values per fid 1
    val firsts = df.filter(col("fid") === 1).select("geom").as[String].collect()
    assert(firsts.toSet.size == 3)
  }

  test("non-SQLite payloads and missing layers fail loudly") {
    intercept[IllegalArgumentException] {
      GeoPackage.readLayer(spark, "not a database".getBytes("UTF-8"), "x")
    }
    val gpkg = GeoPackage.synthGpkg("real", feats(2))
    val e = intercept[IllegalArgumentException] {
      GeoPackage.readLayer(spark, gpkg, "ghost")
    }
    assert(e.getMessage.contains("ghost") && e.getMessage.contains("real"))
    assert(GeoPackage.layersOf(GeoPackage.synthGpkg("l", feats(1))) == Seq("l"))
  }
}
