package graft.operators

import graft.functions.SpatialOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

/** GeoParquet interop — the `geo` parquet file-metadata contract that
  * makes the engine's vector frames readable as SPATIAL data by
  * geopandas/GDAL/DuckDB-spatial, and their GeoParquet artifacts
  * ingestable here. The reference's vector artifacts are its stage-2/3
  * outputs (image_segmentation.py:153-162, object_classifier.py:193-213
  * write per-tile vector files); its published approach line pairs them
  * with "Parquet/GeoParquet" storage — this operator is the
  * parquet-native half next to the GPKG/SHP codecs.
  *
  * Write: WKT geometry column → WKB binary (the GeoParquet 1.0 encoding)
  * via the engine's own WKB bridge, a one-pass stats aggregation for the
  * file-level bbox + geometry_types, a normal distributed parquet write,
  * then a per-file footer rewrite appending the `geo` key-value entry
  * (parquet-mr `ParquetFileWriter.appendFile` — row groups are copied
  * byte-for-byte, only the footer changes). The rewrite runs ON THE
  * EXECUTORS (one task per part-file), so a 100 TB store never routes
  * bytes through the driver; the driver sees only file names.
  *
  * Read: the `geo` footer of one part-file names the primary geometry
  * column and its encoding (driver-side, one footer — O(KB)); the scan
  * itself is a normal distributed parquet read with WKB → WKT decoded
  * per row. Files without `geo` metadata reject descriptively — reading
  * a plain parquet store as spatial would silently fabricate geometry
  * semantics.
  */
object GeoParquet {

  /** GeoParquet 1.0.0 `geo` metadata JSON (hand-emitted — keys ordered,
    * all strings escaped; the repo's Verify JSON rules).
    */
  private def geoJson(
      geomCol: String,
      geometryTypes: Seq[String],
      bbox: Option[(Double, Double, Double, Double)],
      crsProjjson: Option[String]): String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val types = geometryTypes.sorted.map(q).mkString("[", ",", "]")
    val bb = bbox.map { case (x0, y0, x1, y1) => s""","bbox":[$x0,$y0,$x1,$y1]""" }
      .getOrElse("")
    // crs is PROJJSON per spec; absent/null means OGC:CRS84 — the caller
    // passes a ready PROJJSON document verbatim (building PROJJSON from
    // WKT is out of scope; null is the spec's documented default)
    val crs = crsProjjson.map(j => s""","crs":$j""").getOrElse(""","crs":null""")
    s"""{"version":"1.0.0","primary_column":${q(geomCol)},"columns":{${q(geomCol)}:{"encoding":"WKB","geometry_types":$types$bb$crs}}}"""
  }

  /** WKT string → WKB bytes as a column (null-propagating). */
  private[graft] def wktToWkbCol(wkt: Column): Column = {
    val f = udf((s: String) => if (s == null) null else GeoPackage.wktToWkb(s))
    f(wkt)
  }

  /** WKB bytes → WKT string as a column (null-propagating). */
  private[graft] def wkbToWktCol(wkb: Column): Column = {
    val f = udf((b: Array[Byte]) => if (b == null) null else GeoPackage.wkbToWkt(b, 0))
    f(wkb)
  }

  /** Write `df` as GeoParquet: `geomCol` (WKT strings) becomes a WKB
    * binary column and every part-file footer carries the `geo` entry.
    * Stats (bbox + geometry_types) cost ONE extra aggregation pass over
    * the two envelope columns — the scan is column-pruned to the
    * geometry column only.
    */
  def writeGeoParquet(
      df: DataFrame,
      path: String,
      geomCol: String = "geom",
      crsProjjson: Option[String] = None,
      /** CRS as WKT1/WKT2 text (a `.prj` string): emitted as PROJJSON
        * through the engine's own CRS front door (r11 — projected-CRS
        * stores stop defaulting to null/CRS84). A ready `crsProjjson`
        * document wins when both are given.
        */
      crsWkt: Option[String] = None): Unit = {
    require(df.schema(geomCol).dataType == StringType,
      s"$geomCol must be WKT strings, got ${df.schema(geomCol).dataType.simpleString}")
    val crsJson = crsProjjson.orElse(crsWkt.map(CrsWkt.toProjjson))
    val stats = df.select(
        SpatialOps.wktEnvelope(col(geomCol)).as("env"),
        upper(regexp_extract(col(geomCol), "^\\s*([A-Za-z]+)", 1)).as("t"))
      .agg(min(col("env.xmin")).as("x0"), min(col("env.ymin")).as("y0"),
        max(col("env.xmax")).as("x1"), max(col("env.ymax")).as("y1"),
        collect_set(col("t")).as("types"))
      .head()
    val bbox = if (stats.isNullAt(0)) None
      else Some((stats.getDouble(0), stats.getDouble(1),
        stats.getDouble(2), stats.getDouble(3)))
    // WKT word → the six spec spellings, fail-closed: a value whose first
    // word the regex couldn't extract (empty string) or that isn't one of
    // the spec's geometry types must not pass through in a non-spec
    // spelling — readers key dispatch on these strings.
    val types = stats.getSeq[String](4).filter(_.nonEmpty).map {
      case "POINT" => "Point"; case "LINESTRING" => "LineString"
      case "POLYGON" => "Polygon"; case "MULTIPOINT" => "MultiPoint"
      case "MULTILINESTRING" => "MultiLineString"
      case "MULTIPOLYGON" => "MultiPolygon"
      case other => throw new IllegalArgumentException(
        s"$geomCol carries WKT type '$other' — GeoParquet geometry_types " +
          "admits only the six simple-features types")
    }
    val json = geoJson(geomCol, types, bbox, crsJson)
    df.withColumn(geomCol, wktToWkbCol(col(geomCol)))
      .write.mode("overwrite").parquet(path)
    // footer rewrite, one executor task per part-file (Hadoop FS listing —
    // the store can live on HDFS/S3, not just a local directory)
    val spark = df.sparkSession
    val files = partFiles(path)
    spark.sparkContext.parallelize(files, math.max(1, files.size))
      .foreach(f => addGeoFooter(f, json))
  }

  /** Data part-files of a parquet store directory (names only — O(files)
    * driver memory, never file contents).
    */
  private def partFiles(path: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet") &&
        !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.toString).sorted
  }

  /** Rewrite one parquet file appending the `geo` key-value footer entry.
    * Row groups are copied untouched (`appendFile`); Spark's own schema
    * entry is preserved so `spark.read.parquet` sees the identical frame.
    */
  private[graft] def addGeoFooter(file: String, json: String): Unit = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
    import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new Path(file)
    val in = HadoopInputFile.fromPath(p, conf)
    val (schema, kv) = {
      val r = ParquetFileReader.open(in)
      try {
        val m = r.getFooter.getFileMetaData
        (m.getSchema, new java.util.HashMap[String, String](m.getKeyValueMetaData))
      } finally r.close()
    }
    kv.put("geo", json)
    val fs = p.getFileSystem(conf)
    val tmp = new Path(file + ".geo.tmp")
    try {
      val w = new ParquetFileWriter(HadoopOutputFile.fromPath(tmp, conf), schema,
        ParquetFileWriter.Mode.OVERWRITE, 128L * 1024 * 1024, 8 * 1024 * 1024)
      w.start()
      w.appendFile(in)
      w.end(kv)
    } catch {
      case e: Throwable =>
        try fs.delete(tmp, false) catch { case _: Throwable => }
        throw e
    }
    // Swap via rename-aside (never delete-then-rename): a crash at any
    // point leaves a COMPLETE file at a deterministic path — the original
    // at `file`, or mid-swap at `file + ".geo.old"`, or post-swap the
    // rewrite at `file` — so recovery is a rename, never a data loss
    // (delete-then-rename had a window where the only copy was the .tmp).
    val old = new Path(file + ".geo.old")
    if (fs.exists(old)) fs.delete(old, false)
    require(fs.rename(p, old), s"footer rewrite: cannot park original $file")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // roll back: original returns to its path
      throw new IllegalStateException(s"footer rewrite swap failed for $file")
    }
    fs.delete(old, false)
  }

  /** The `geo` footer JSON of a GeoParquet store (first part-file), or
    * None when the store carries no GeoParquet metadata.
    */
  def geoMetadata(path: String): Option[String] = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = new org.apache.hadoop.conf.Configuration()
    partFiles(path).headOption.flatMap { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
      try Option(r.getFooter.getFileMetaData.getKeyValueMetaData.get("geo"))
      finally r.close()
    }
  }

  /** Read a GeoParquet store: recognizes the `geo` footer, decodes the
    * primary WKB geometry column back to the engine's WKT spelling.
    * Fails closed on plain parquet (no `geo` entry) and on non-WKB
    * encodings.
    */
  def readGeoParquet(spark: SparkSession, path: String): DataFrame = {
    val json = geoMetadata(path).getOrElse(throw new IllegalArgumentException(
      s"$path carries no GeoParquet 'geo' footer metadata — read it as plain " +
        "parquet, or write it through writeGeoParquet"))
    val primary = "\"primary_column\"\\s*:\\s*\"([^\"]+)\"".r
      .findFirstMatchIn(json).map(_.group(1))
      .getOrElse(throw new IllegalArgumentException(
        s"malformed geo metadata (no primary_column): ${json.take(200)}"))
    val enc = ("\"" + java.util.regex.Pattern.quote(primary) +
      "\"\\s*:\\s*\\{[^}]*\"encoding\"\\s*:\\s*\"([^\"]+)\"").r
      .findFirstMatchIn(json).map(_.group(1))
    require(enc.contains("WKB"),
      s"geometry encoding ${enc.getOrElse("<missing>")} unsupported (WKB only)")
    val df = spark.read.parquet(path)
    require(df.schema(primary).dataType == BinaryType,
      s"primary geometry column $primary is ${df.schema(primary).dataType.simpleString}, not binary WKB")
    df.withColumn(primary, wkbToWktCol(col(primary)))
  }
}
