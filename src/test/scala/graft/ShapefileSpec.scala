package graft

import graft.operators.Shapefile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shapefile + dBase reader invariants (the reference's per-tile vector
  * write, image_segmentation.py:153-162): the synth writers and the
  * record walkers must agree for every supported shape type, and the
  * .dbf attribute pairing must line up 1:1 with shape records.
  */
class ShapefileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val poly = "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 3.0, 0.0 0.0))"
  private val holed = "POLYGON ((0.0 0.0, 10.0 0.0, 10.0 10.0, 0.0 10.0, 0.0 0.0), " +
    "(2.0 2.0, 3.0 2.0, 3.0 3.0, 2.0 2.0))"
  private val line = "LINESTRING (0.0 0.0, 1.5 2.5, 3.0 0.0)"
  private val mline = "MULTILINESTRING ((0.0 0.0, 1.0 1.0), (2.0 2.0, 3.0 3.0, 4.0 2.0))"
  private val point = "POINT (4.5 -1.25)"

  test("every supported WKT kind round-trips through the .shp codec") {
    val wkts = Seq(poly, holed, line, mline, point, null)
    val recs = Shapefile.shpRecords(Shapefile.synthShp(wkts))
    assert(recs.map(_._1) == Seq(1, 2, 3, 4, 5, 6)) // record numbers are 1-based
    assert(recs.map(_._2) == wkts)
  }

  test("dbf round-trips typed attributes including nulls and deleted-row skip") {
    val fields = Seq(("DN", 'N', 8, 0), ("score", 'N', 10, 3), ("name", 'C', 12, 0),
      ("ok", 'L', 1, 0))
    val rows = Seq(
      Seq[Any](42L, 1.25, "water", true),
      Seq[Any](null, null, null, null),
      Seq[Any](-7L, -0.125, "x", false))
    val dbf = Shapefile.synthDbf(fields, rows)
    val (schema, got) = Shapefile.dbfRows(dbf)
    assert(schema.map(_.name) == Seq("DN", "score", "name", "ok"))
    assert(schema.map(_.dataType.simpleString) == Seq("bigint", "double", "string", "boolean"))
    assert(got == rows)
  }

  test("readFeatures pairs shapes with attributes in record order") {
    val shp = Shapefile.synthShp(Seq(poly, point))
    val dbf = Shapefile.synthDbf(Seq(("DN", 'N', 6, 0)), Seq(Seq[Any](3L), Seq[Any](9L)))
    val df = Shapefile.readFeatures(spark, shp, Some(dbf)).orderBy("rec_no")
    assert(df.columns.toSeq == Seq("rec_no", "geom", "DN"))
    val rows = df.collect()
    assert(rows(0).getString(1) == poly && rows(0).getLong(2) == 3L)
    assert(rows(1).getString(1) == point && rows(1).getLong(2) == 9L)
    // record-count mismatch fails loudly
    val badDbf = Shapefile.synthDbf(Seq(("DN", 'N', 6, 0)), Seq(Seq[Any](1L)))
    intercept[IllegalArgumentException](
      Shapefile.readFeatures(spark, shp, Some(badDbf)).collect())
  }

  test("readFeatureFiles unions per-tile pairs with one task per file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shp").toString
    for (t <- 0 until 3) {
      val wkts = (0 until 4).map(i => s"POINT (${t * 10 + i}.0 ${i}.0)")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/tile_$t.shp"),
        Shapefile.synthShp(wkts))
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/tile_$t.dbf"),
        Shapefile.synthDbf(Seq(("DN", 'N', 6, 0)),
          (0 until 4).map(i => Seq[Any](t * 100L + i))))
    }
    val df = Shapefile.readFeatureFiles(spark, dir)
    assert(df.count() == 12)
    assert(df.agg(sum("DN")).head().getLong(0) == (0 until 3).flatMap(t =>
      (0 until 4).map(i => t * 100L + i)).sum)
  }

  test("writeFeatureFiles shards one pair per key and round-trips through the reader") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_shp_w").toString
    val src = (1 to 18).map { i =>
      (s"tile_${i % 3}", s"POINT (${i}.0 ${i * 2}.0)", i.toLong, i * 0.125, s"f$i")
    }.toDF("tile", "geom", "dn", "score", "name")
    Shapefile.writeFeatureFiles(src, dir, keyCol = "tile")
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.toSeq == Seq("tile_0.dbf", "tile_0.shp", "tile_1.dbf", "tile_1.shp",
      "tile_2.dbf", "tile_2.shp"))
    val back = Shapefile.readFeatureFiles(spark, dir)
    assert(back.count() == 18)
    assert(back.columns.toSeq == Seq("rec_no", "geom", "dn", "score", "name"))
    assert(back.agg(org.apache.spark.sql.functions.sum("dn")).head().getLong(0)
      == (1 to 18).map(_.toLong).sum)
    // eighths survive the %.6f fixed-width round trip exactly
    val s5 = back.filter(org.apache.spark.sql.functions.col("dn") === 5L).head()
    assert(s5.getString(1) == "POINT (5.0 10.0)" && s5.getDouble(3) == 0.625)
  }

  test("malformed payloads fail closed") {
    intercept[IllegalArgumentException](Shapefile.shpRecords("junk".getBytes))
    // bad file code
    val shp = Shapefile.synthShp(Seq(point))
    val bad = shp.clone(); bad(3) = 1 // file code 9994 lives in bytes 0-3 BE
    intercept[IllegalArgumentException](Shapefile.shpRecords(bad))
  }
}
