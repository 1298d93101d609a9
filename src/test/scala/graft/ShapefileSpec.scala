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
    assert(files.toSeq == Seq(
      "tile_0.dbf", "tile_0.shp", "tile_0.shx",
      "tile_1.dbf", "tile_1.shp", "tile_1.shx",
      "tile_2.dbf", "tile_2.shp", "tile_2.shx"))
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

  test("multi-outer-ring polygon records decode as MULTIPOLYGON and round-trip") {
    // ESRI orientation: outer rings clockwise, holes counter-clockwise
    val mp = "MULTIPOLYGON (((0.0 0.0, 0.0 1.0, 1.0 1.0, 1.0 0.0, 0.0 0.0), " +
      "(0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2)), " +
      "((5.0 5.0, 5.0 6.0, 6.0 6.0, 6.0 5.0, 5.0 5.0)))"
    val recs = Shapefile.shpRecords(Shapefile.synthShp(Seq(mp)))
    assert(recs.map(_._2) == Seq(mp))
    // single-outer records (any hole count) stay plain POLYGON
    assert(Shapefile.shpRecords(Shapefile.synthShp(Seq(holed))).head._2 == holed)
  }

  test("readFeatureFiles fails loudly on per-file shp/dbf misalignment") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shp_bad").toString
    def pair(name: String, n: Int, nAttrs: Int): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name.shp"),
        Shapefile.synthShp((0 until n).map(i => s"POINT ($i.0 0.0)")))
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name.dbf"),
        Shapefile.synthDbf(Seq(("DN", 'N', 6, 0)), (0 until nAttrs).map(i => Seq[Any](i.toLong))))
    }
    pair("a_good", 3, 3)
    pair("b_short", 3, 2) // .dbf narrower than .shp → must not silently shift
    val e = intercept[org.apache.spark.SparkException] {
      Shapefile.readFeatureFiles(spark, dir).count()
    }
    assert(e.getMessage.contains("b_short") || Option(e.getCause).exists(_.getMessage.contains("b_short")))
  }

  test("readFeatureFiles fails loudly when a non-first pair is missing its .dbf") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shp_nodbf").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a_full.shp"),
      Shapefile.synthShp(Seq("POINT (1.0 1.0)")))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a_full.dbf"),
      Shapefile.synthDbf(Seq(("DN", 'N', 6, 0)), Seq(Seq[Any](1L))))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b_bare.shp"),
      Shapefile.synthShp(Seq("POINT (2.0 2.0)")))
    val e = intercept[org.apache.spark.SparkException] {
      Shapefile.readFeatureFiles(spark, dir).count()
    }
    assert(e.getMessage.contains("b_bare") || Option(e.getCause).exists(_.getMessage.contains("b_bare")))
  }

  test("writeFeatureFiles: keys colliding after sanitization get distinct files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_shp_col").toString
    val src = Seq(
      ("a b", "POINT (1.0 1.0)", 1L),
      ("a_b", "POINT (2.0 2.0)", 2L),
      ("a|b", "POINT (3.0 3.0)", 3L) // sanitizes to a_b too — third distinct file
    ).toDF("tile", "geom", "dn")
    Shapefile.writeFeatureFiles(src, dir, keyCol = "tile")
    val shps = new java.io.File(dir).listFiles().map(_.getName).filter(_.endsWith(".shp"))
    assert(shps.length == 3, s"expected 3 files, got ${shps.mkString(", ")}")
    assert(shps.contains("a_b.shp")) // the clean key keeps its plain name
    val back = Shapefile.readFeatureFiles(spark, dir)
    assert(back.agg(sum("dn")).head().getLong(0) == 6L) // no row lost to overwrites
  }

  test("per-key sinks stream runs: a task never buffers more than one key's rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_shp_run").toString
    // 40 keys x 5 rows; 32 shuffle partitions → several keys share a partition
    val src = (0 until 200).map { i =>
      (s"k${i % 40}", s"POINT (${i}.0 0.0)", i.toLong)
    }.toDF("tile", "geom", "dn")
    graft.operators.KeyedFileSink.resetMaxRunRows()
    Shapefile.writeFeatureFiles(src, dir, keyCol = "tile")
    assert(graft.operators.KeyedFileSink.maxRunRows.get() == 5L,
      s"a run buffered ${graft.operators.KeyedFileSink.maxRunRows.get()} rows; per-key max is 5")
    val back = Shapefile.readFeatureFiles(spark, dir)
    assert(back.count() == 200 && back.agg(sum("dn")).head().getLong(0) == (0 until 200).map(_.toLong).sum)
  }

  test("CRS sidecar: .prj round-trips as a crs column; mixed-CRS directories rejected") {
    import spark.implicits._
    val crs = "PROJCS[\"WGS 84 / UTM zone 54N\"]"
    val dir = java.nio.file.Files.createTempDirectory("graft_prj").toString
    val src = (0 until 12).map(i => (s"t${i % 2}", s"POINT ($i.0 0.0)", i.toLong))
      .toDF("tile", "geom", "dn")
    Shapefile.writeFeatureFiles(src, dir, keyCol = "tile", crsWkt = Some(crs))
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".prj")) == 2)
    val back = Shapefile.readFeatureFiles(spark, dir)
    assert(back.columns.contains("crs"))
    assert(back.select("crs").distinct().collect().map(_.getString(0)).toSeq == Seq(crs))
    // prj-less directories keep the old schema (no crs column)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_noprj").toString
    Shapefile.writeFeatureFiles(src, dir2, keyCol = "tile")
    assert(!Shapefile.readFeatureFiles(spark, dir2).columns.contains("crs"))
    // mixing CRSs (or presence) fails loudly
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "t0.prj"),
      "PROJCS[\"other\"]".getBytes("US-ASCII"))
    val e = intercept[Exception](Shapefile.readFeatureFiles(spark, dir).count())
    def mentions(t: Throwable): Boolean =
      t != null && (String.valueOf(t.getMessage).contains("mixed-CRS") || mentions(t.getCause))
    assert(mentions(e))
  }

  test(".shx index: entry count, offsets, and content lengths match the written records") {
    val wkts = Seq(poly, holed, line, mline, point, null)
    val shp = Shapefile.synthShp(wkts)
    val shx = Shapefile.synthShx(shp)
    val entries = Shapefile.shxEntries(shx)
    assert(entries.length == wkts.length)
    // re-derive the ground truth by the sequential walk and compare 1:1
    var off = 100
    entries.zipWithIndex.foreach { case ((o, len), i) =>
      assert(o == off, s"record $i: shx offset $o != sequential $off")
      // content length must equal the .shp record header's own claim
      val hdrLen = ((shp(off + 4) & 0xff) << 24 | (shp(off + 5) & 0xff) << 16 |
        (shp(off + 6) & 0xff) << 8 | (shp(off + 7) & 0xff)) * 2
      assert(len == hdrLen, s"record $i: shx length $len != header $hdrLen")
      off += 8 + len
    }
    assert(off == shp.length, "index does not cover the full file")
    // the index-driven walk decodes identically to the sequential one
    assert(Shapefile.shpRecordsIndexed(shp, shx) == Shapefile.shpRecords(shp))
    // the shx header records its OWN length (100 + 8·n bytes, in words)
    val hdrWords = ((shx(24) & 0xff) << 24 | (shx(25) & 0xff) << 16 |
      (shx(26) & 0xff) << 8 | (shx(27) & 0xff))
    assert(hdrWords * 2 == shx.length)
  }

  test(".shx that disagrees with the .shp fails closed in the indexed walk") {
    val shp = Shapefile.synthShp(Seq(point, line))
    val shx = Shapefile.synthShx(shp)
    // corrupt the second entry's content length (word at offset 108+4)
    val bad = shx.clone(); bad(115) = (bad(115) + 1).toByte
    intercept[IllegalArgumentException](Shapefile.shpRecordsIndexed(shp, bad))
    intercept[IllegalArgumentException](Shapefile.shxEntries("junk".getBytes))
  }

  test("writeFeatureFiles rejects strings wider than the dBase field instead of truncating") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_shp_wide").toString
    val src = Seq(("t0", "POINT (1.0 1.0)", "x" * 65)).toDF("tile", "geom", "name")
    val e = intercept[org.apache.spark.SparkException] {
      Shapefile.writeFeatureFiles(src, dir, keyCol = "tile")
    }
    def mentions(t: Throwable): Boolean =
      t != null && (t.getMessage.contains("64-char") || mentions(t.getCause))
    assert(mentions(e))
  }
}
