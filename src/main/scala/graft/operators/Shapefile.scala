package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal ESRI Shapefile (+ dBase III attribute table) vector reader —
  * the OTHER interchange format the reference writes (per-tile segment
  * shapefiles, image_segmentation.py:153-162, each with a DN attribute
  * column). Together with [[GeoPackage]] this closes every vector format
  * the reference touches.
  *
  * Implemented from the public ESRI Shapefile Technical Description and
  * the dBase III file layout: .shp 100-byte header + (BE record header,
  * LE shape payload) records for Null/Point/PolyLine/Polygon; .dbf
  * fixed-width records with C/N/F/L field descriptors. No library —
  * pure byte arithmetic, executor-safe.
  *
  * Scale shape: one .shp file is a sequential record stream (records
  * carry lengths, not offsets — splitting needs the .shx index, which
  * the reference doesn't rely on), so a FILE is the parallelism unit:
  * `readFeatureFiles` maps one task per .shp/.dbf pair, exactly the
  * per-tile sharding the reference writes. Geometry surfaces as WKT so
  * SpatialOps (wktRings / envelopes / spatial joins) composes directly.
  */
object Shapefile {

  // ---- byte helpers (shp mixes big- and little-endian by design) ----

  private def i32be(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def i32le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def i16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def f64le(b: Array[Byte], off: Int): Double = {
    var bits = 0L
    var i = 0
    while (i < 8) { bits |= (b(off + i) & 0xffL) << (8 * i); i += 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  // ---- .shp geometry records → WKT ----

  /** Decode one shape payload (starting at its LE shape-type int) to WKT.
    * Null shapes (type 0) → null. Parts of a PolyLine/Polygon become the
    * WKT groups in file order (the spec stores polygon holes as
    * counter-clockwise parts of the same record).
    */
  /** Twice the signed ring area (shoelace). ESRI convention: outer rings
    * are CLOCKWISE (negative shoelace in y-up coordinates), holes CCW.
    */
  private def ringArea2(pts: IndexedSeq[(Double, Double)]): Double = {
    var s = 0.0
    var i = 0
    while (i < pts.length) {
      val (x1, y1) = pts(i)
      val (x2, y2) = pts((i + 1) % pts.length)
      s += x1 * y2 - x2 * y1
      i += 1
    }
    s
  }

  private def shapeToWkt(b: Array[Byte], off0: Int): String = {
    def pt(off: Int): String = s"${f64le(b, off)} ${f64le(b, off + 8)}"
    i32le(b, off0) match {
      case 0 => null // Null shape: a placeholder record
      case 1 => s"POINT (${pt(off0 + 4)})"
      case t @ (3 | 5) =>
        // bbox (4 doubles) skipped; then numParts, numPoints, parts, points
        val nParts = i32le(b, off0 + 36)
        val nPoints = i32le(b, off0 + 40)
        // corrupt counts must reject before they index anything: the
        // part/point arrays have to fit the remaining payload
        require(nParts >= 0 && nPoints >= 0 &&
          off0 + 44L + 4L * nParts + 16L * nPoints <= b.length,
          s"shape record declares $nParts parts / $nPoints points beyond the payload")
        val partsOff = off0 + 44
        val pointsOff = partsOff + 4 * nParts
        val starts = (0 until nParts).map(i => i32le(b, partsOff + 4 * i))
        require(starts.forall(s0 => s0 >= 0 && s0 <= nPoints),
          s"part offsets $starts outside 0..$nPoints")
        val bounds = starts :+ nPoints
        val partPts: IndexedSeq[IndexedSeq[(Double, Double)]] =
          (0 until nParts).map { p =>
            (bounds(p) until bounds(p + 1))
              .map(i => (f64le(b, pointsOff + 16 * i), f64le(b, pointsOff + 16 * i + 8)))
          }
        val groups = partPts.map(
          _.map { case (x, y) => s"$x $y" }.mkString("(", ", ", ")"))
        if (t == 3) {
          if (nParts == 1) s"LINESTRING ${groups.head}"
          else s"MULTILINESTRING ${groups.mkString("(", ", ", ")")}"
        } else {
          // One record may hold SEVERAL outer (clockwise) rings — a
          // multipolygon (ESRI spec). Decide by ring orientation; each
          // outer ring groups with the hole rings that follow it.
          val isOuter = partPts.map(ringArea2(_) <= 0.0)
          if (isOuter.count(identity) <= 1)
            s"POLYGON ${groups.mkString("(", ", ", ")")}"
          else {
            require(isOuter.head,
              "polygon record starts with a counter-clockwise (hole) ring")
            val polys = scala.collection.mutable.ArrayBuffer.empty[List[String]]
            groups.indices.foreach { i =>
              if (isOuter(i)) polys += List(groups(i))
              else polys(polys.length - 1) = polys.last :+ groups(i)
            }
            s"MULTIPOLYGON ${polys.map(_.mkString("(", ", ", ")")).mkString("(", ", ", ")")}"
          }
        }
      case other =>
        throw new IllegalArgumentException(s"shape type $other unsupported")
    }
  }

  /** Walk a .shp byte payload → (record number, WKT|null) in file order. */
  def shpRecords(shp: Array[Byte]): Seq[(Int, String)] = {
    require(shp.length >= 100 && i32be(shp, 0) == 9994,
      "not a shapefile (bad file code)")
    require(i32le(shp, 28) == 1000, "unsupported shapefile version")
    val fileLen = i32be(shp, 24) * 2 // header stores 16-bit words
    require(fileLen <= shp.length, s"truncated shapefile: $fileLen > ${shp.length}")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    var off = 100
    while (off + 8 <= fileLen) {
      val recNo = i32be(shp, off)
      // Long arithmetic: a corrupt 32-bit length would otherwise wrap the
      // bounds check negative and walk the cursor off the array
      val contentLen = i32be(shp, off + 4).toLong * 2
      require(contentLen >= 0 && off + 8 + contentLen <= fileLen,
        s"record $recNo overruns the file")
      out += recNo -> shapeToWkt(shp, off + 8)
      off = (off + 8 + contentLen).toInt
    }
    out.toSeq
  }

  // ---- .shx record index ----

  /** Parse a .shx index → (record offset, content length) pairs in BYTES
    * (the file stores both in 16-bit words). The offset addresses the
    * record HEADER in the .shp; content length excludes that header.
    */
  def shxEntries(shx: Array[Byte]): Seq[(Int, Int)] = {
    require(shx.length >= 100 && i32be(shx, 0) == 9994,
      "not a shapefile index (bad file code)")
    require(i32le(shx, 28) == 1000, "unsupported shx version")
    val fileLen = i32be(shx, 24) * 2
    require(fileLen <= shx.length, s"truncated shx: $fileLen > ${shx.length}")
    // a corrupt declared length must not silently yield ZERO entries (a
    // shapefile's records would vanish from the read) nor let a
    // misaligned tail read past the declared end
    require(fileLen >= 100 && (fileLen - 100) % 8 == 0,
      s"malformed shx length $fileLen (header + whole 8-byte entries required)")
    (100 until fileLen by 8).map(o => (i32be(shx, o) * 2, i32be(shx, o + 4) * 2))
  }

  /** Build the .shx index for a .shp payload in the same record-framing
    * walk the reader uses: the .shp's own 100-byte header (with the
    * index's length patched into word 24), then one BE (offset, content
    * length) pair per record, both in 16-bit words. External consumers
    * (OGR/ArcGIS) require the index to open a shapefile at all — the
    * engine's own reader frames sequentially and never needed it, but
    * interop artifacts missing it are rejected wholesale.
    */
  def synthShx(shp: Array[Byte]): Array[Byte] = {
    require(shp.length >= 100 && i32be(shp, 0) == 9994,
      "not a shapefile (bad file code)")
    val fileLen = i32be(shp, 24) * 2
    require(fileLen <= shp.length, s"truncated shapefile: $fileLen > ${shp.length}")
    val entries = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var off = 100
    while (off + 8 <= fileLen) {
      val contentLen = i32be(shp, off + 4) * 2
      require(off + 8 + contentLen <= fileLen, "record overruns the file")
      entries += ((off, contentLen))
      off += 8 + contentLen
    }
    val buf = java.nio.ByteBuffer.allocate(100 + 8 * entries.length) // BE default
    buf.put(java.util.Arrays.copyOfRange(shp, 0, 100))
    buf.putInt(24, (100 + 8 * entries.length) / 2) // the shx's OWN word length
    entries.foreach { case (o, l) => buf.putInt(o / 2).putInt(l / 2) }
    buf.array()
  }

  /** Walk records through the .shx index (random-access framing — the
    * splittable-at-scale path, and the one an index-bearing external
    * shapefile exercises). Yields exactly what [[shpRecords]] yields on a
    * consistent pair.
    */
  def shpRecordsIndexed(shp: Array[Byte], shx: Array[Byte]): Seq[(Int, String)] = {
    val entries = shxEntries(shx)
    // the index must account for the .shp's full declared extent — a
    // short (or empty) index would silently drop the tail records
    val shpLen = i32be(shp, 24) * 2
    val end = entries.map { case (o, l) => o + 8 + l }.foldLeft(100)(math.max)
    require(end == shpLen,
      s"shx covers $end bytes but the shp declares $shpLen — index out of date")
    entries.map { case (off, len) =>
      require(off >= 100 && off + 8 + len <= shp.length,
        s"shx entry ($off,$len) overruns the shp (${shp.length} bytes)")
      require(i32be(shp, off + 4) * 2 == len,
        s"shx content length $len disagrees with the record header at $off")
      (i32be(shp, off), shapeToWkt(shp, off + 8))
    }
  }

  // ---- .dbf attribute table ----

  private final case class DbfField(name: String, typ: Char, len: Int, dec: Int)

  private def dbfFields(dbf: Array[Byte]): (Seq[DbfField], Int, Int, Int) = {
    require(dbf.length >= 33, "not a dBase file")
    val nRec = i32le(dbf, 4)
    val hdrSize = i16le(dbf, 8)
    val recSize = i16le(dbf, 10)
    // corrupt header fields must reject before they drive any record read
    require(nRec >= 0 && hdrSize >= 33 && recSize >= 1 &&
      hdrSize <= dbf.length && hdrSize + nRec.toLong * recSize <= dbf.length,
      s"dbf header declares $nRec records of $recSize bytes after a " +
        s"$hdrSize-byte header — beyond the ${dbf.length}-byte file")
    val fields = scala.collection.mutable.ArrayBuffer.empty[DbfField]
    var off = 32
    while (off + 32 <= hdrSize && dbf(off) != 0x0d) {
      val nameEnd = (off until off + 11).find(dbf(_) == 0).getOrElse(off + 11)
      fields += DbfField(
        new String(dbf, off, nameEnd - off, "US-ASCII"),
        dbf(off + 11).toChar, dbf(off + 16) & 0xff, dbf(off + 17) & 0xff)
      off += 32
    }
    // corrupt field widths must not walk a record read past its bounds:
    // the declared widths (plus the deletion flag) have to fit recSize
    require(1 + fields.map(_.len).sum <= recSize,
      s"dbf fields declare ${fields.map(_.len).sum} bytes inside $recSize-byte records")
    (fields.toSeq, nRec, hdrSize, recSize)
  }

  private def sparkTypeOfDbf(f: DbfField): DataType = f.typ match {
    case 'N' if f.dec == 0 => LongType
    case 'N' | 'F' => DoubleType
    case 'L' => BooleanType
    case _ => StringType // C and anything else: text
  }

  /** Decode .dbf records (fixed-width ASCII; deleted rows '*' skipped). */
  def dbfRows(dbf: Array[Byte]): (StructType, Seq[Seq[Any]]) = {
    val (fields, nRec, hdrSize, recSize) = dbfFields(dbf)
    val schema = StructType(fields.map(f => StructField(f.name, sparkTypeOfDbf(f))))
    val rows = (0 until nRec).flatMap { r =>
      val base = hdrSize + r * recSize
      if (dbf(base) == '*'.toByte) None // deleted
      else {
        var off = base + 1
        Some(fields.map { f =>
          val raw = new String(dbf, off, f.len, "US-ASCII").trim
          off += f.len
          val v: Any =
            if (raw.isEmpty) null
            else f.typ match {
              case 'N' if f.dec == 0 => raw.toLong
              case 'N' | 'F' => raw.toDouble
              case 'L' => "YyTt".contains(raw.head)
              case _ => raw
            }
          v
        })
      }
    }
    (schema, rows)
  }

  /** One .shp (+ optional .dbf) pair → DataFrame: rec_no, geom (WKT),
    * then the attribute columns. Attribute row i belongs to shape record
    * i+1 (the spec's implicit 1:1 order pairing).
    */
  def readFeatures(spark: SparkSession, shp: Array[Byte],
      dbf: Option[Array[Byte]] = None): DataFrame = {
    val shapes = shpRecords(shp)
    val (attrSchema, attrs) = dbf.map(dbfRows)
      .getOrElse((StructType(Nil), Seq.empty[Seq[Any]]))
    if (dbf.isDefined) require(attrs.length == shapes.length,
      s"dbf has ${attrs.length} records, shp has ${shapes.length}")
    val schema = StructType(
      StructField("rec_no", IntegerType, nullable = false) +:
      StructField("geom", StringType) +: attrSchema.fields.toSeq)
    val rows = shapes.zipWithIndex.map { case ((no, wkt), i) =>
      Row.fromSeq(no +: wkt +: (if (dbf.isDefined) attrs(i) else Nil))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Directory of per-tile .shp/.dbf(.prj) pairs → one DataFrame, one task
    * per pair (schema from the first pair — the reference writes
    * homogeneous tiles). The `.prj` sidecar (WKT CRS text — the reference
    * writes one per tile via fiona's crs kwarg,
    * image_segmentation.py:153-162) surfaces as a constant `crs` column
    * (NULL when absent); a directory mixing CRSs — or mixing with/without
    * `.prj` — is rejected per file, exactly where reprojection would
    * otherwise silently combine incompatible coordinates.
    */
  def readFeatureFiles(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, regexp_replace}
    // Sidecars load through the SAME binaryFile source as the .shp files
    // (Hadoop FileSystem of the path's scheme), paired by path stem — no
    // executor task ever assumes a driver-local filesystem, so the reader
    // works unchanged on hdfs:// / s3a:// deployments. The .dbf payloads
    // ride one small equi-join keyed on the stem (one row per FILE, not
    // per record — file-count scale, not data scale).
    // Globs resolve to explicit file lists BEFORE the load (Fs.resolveGlob):
    // a literal glob path trips FileStreamSink's metadata probe, whose
    // caught FileNotFoundException logs a WARN stack on every sidecar load.
    def loadSidecars(ext: String, as: String = "__side"): DataFrame = {
      val found = Fs.resolveGlob(spark, path + "/*" + ext)
      if (found.isEmpty) // no files matching the glob → empty frame, same shape
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Seq(
          StructField("__stem", StringType), StructField(as, BinaryType))))
      else spark.read.format("binaryFile").load(found: _*)
        .select(regexp_replace(col("path"), "\\.[^./]+$", "").as("__stem"),
          col("content").as(as))
    }
    val shpPaths = Fs.resolveGlob(spark, path + "/*.shp")
    require(shpPaths.nonEmpty, s"no .shp files under $path")
    val files = spark.read.format("binaryFile").load(shpPaths: _*)
      .select(regexp_replace(col("path"), "\\.[^./]+$", "").as("__stem"),
        col("path"), col("content"))
    // .prj sidecars are tiny (one WKT line per tile): census them on the
    // driver to pin the directory's expected CRS for the per-file reject
    val prjByStem: Map[String, String] = loadSidecars(".prj").collect()
      .map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1), "US-ASCII").trim)
      .toMap
    val first = files.limit(1).collect()
    require(first.nonEmpty, s"no .shp files under $path")
    val firstStem = first(0).getString(0)
    val expectedCrs = prjByStem.get(firstStem)
    val firstDbf = loadSidecars(".dbf").filter(col("__stem") === firstStem)
      .collect().headOption.map(_.getAs[Array[Byte]](1))
    val schema = readFeatures(spark, first(0).getAs[Array[Byte]]("content"), firstDbf).schema
    // Fail-closed alignment doctrine, per file: deleted/truncated .dbf rows
    // or a missing/narrower .dbf on a non-first pair must error loudly, not
    // silently shift or narrow the attribute association.
    val attrNames = schema.fields.drop(2).map(_.name).toSeq
    val paired = files.join(loadSidecars(".dbf", "__dbf"), Seq("__stem"), "left")
      .join(loadSidecars(".shx", "__shx"), Seq("__stem"), "left")
    val rdd = paired.rdd.flatMap { r =>
      val stem = r.getString(0)
      val path = r.getString(1)
      val shp = r.getAs[Array[Byte]](2)
      val dbf = Option(r.getAs[Array[Byte]](3))
      val shx = Option(r.getAs[Array[Byte]](4))
      val crs = prjByStem.get(stem)
      require(crs == expectedCrs,
        s"$path: CRS sidecar ${crs.getOrElse("<absent>")} != the directory's " +
          s"${expectedCrs.getOrElse("<absent>")} — mixed-CRS directories are rejected")
      // with a .shx sidecar, frame via the index (cross-validates the two
      // files and exercises the random-access path); sequential otherwise
      val shapes = shx.map(shpRecordsIndexed(shp, _)).getOrElse(shpRecords(shp))
      val attrs = dbf match {
        case Some(d) =>
          val (s, rows) = dbfRows(d)
          require(rows.length == shapes.length,
            s"$path: .dbf has ${rows.length} live records, .shp has ${shapes.length}")
          require(s.fieldNames.toSeq == attrNames,
            s"$path: .dbf columns ${s.fieldNames.mkString(",")} != first pair's ${attrNames.mkString(",")}")
          rows
        case None =>
          require(attrNames.isEmpty,
            s"$path: missing .dbf but the directory schema expects attribute columns ${attrNames.mkString(",")}")
          Seq.fill(shapes.length)(Seq.empty[Any])
      }
      shapes.zipWithIndex.map { case ((no, wkt), i) =>
        Row.fromSeq(no +: wkt +: attrs(i))
      }
    }
    val df = spark.createDataFrame(rdd, schema)
    // surface the CRS only when the directory carries one (keeps the
    // prj-less schema unchanged; mixed presence is rejected above)
    expectedCrs.fold(df)(c => df.withColumn("crs", lit(c)))
  }

  // ---- synth writers (the encode half, for tests/oracles — mm3 pattern) ----

  /** Serialize WKT shapes (null → Null shape) as a valid .shp payload. */
  def synthShp(wkts: Seq[String]): Array[Byte] = {
    val payloads = wkts.map(w => if (w == null) nullShape() else wktToShape(w))
    val total = 100 + payloads.map(8 + _.length).sum
    val buf = java.nio.ByteBuffer.allocate(total)
    buf.putInt(9994).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    buf.putInt(total / 2) // BE length in 16-bit words
    buf.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(1000)
    // header shape type: first non-null record's (0 when all null)
    buf.putInt(payloads.collectFirst {
      case p if i32le(p, 0) != 0 => i32le(p, 0)
    }.getOrElse(0))
    for (_ <- 0 until 8) buf.putDouble(0.0) // bbox left zero (readers ignore)
    payloads.zipWithIndex.foreach { case (p, i) =>
      buf.order(java.nio.ByteOrder.BIG_ENDIAN)
      buf.putInt(i + 1).putInt(p.length / 2)
      buf.order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(p)
    }
    buf.array()
  }

  private def nullShape(): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(0); b.array()
  }

  private def wktToShape(wkt: String): Array[Byte] = {
    val s = wkt.trim
    val open = s.indexOf('(')
    val kind = s.substring(0, open).trim.toUpperCase
    def pts(group: String): Seq[(Double, Double)] =
      group.split(',').toSeq.map { p =>
        val nums = p.trim.split("\\s+")
        (nums(0).toDouble, nums(1).toDouble)
      }
    def groups(body: String): Seq[Seq[(Double, Double)]] = {
      val inner = body.trim.stripPrefix("(").stripSuffix(")")
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var depth = 0; val cur = new StringBuilder
      inner.foreach {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) { out += cur.toString; cur.clear() }
        case c if depth > 0 => cur += c
        case _ =>
      }
      out.toSeq.map(pts)
    }
    def le(cap: Int) = java.nio.ByteBuffer.allocate(cap)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val body = s.substring(open)
    def multi(shapeType: Int, parts: Seq[Seq[(Double, Double)]]): Array[Byte] = {
      val all = parts.flatten
      val b = le(4 + 32 + 8 + 4 * parts.length + 16 * all.length)
      b.putInt(shapeType)
      b.putDouble(all.map(_._1).min).putDouble(all.map(_._2).min)
      b.putDouble(all.map(_._1).max).putDouble(all.map(_._2).max)
      b.putInt(parts.length).putInt(all.length)
      parts.scanLeft(0)(_ + _.length).dropRight(1).foreach(b.putInt)
      all.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
      b.array()
    }
    kind match {
      case "POINT" =>
        val Seq((x, y)) = pts(body.stripPrefix("(").stripSuffix(")"))
        le(4 + 16).putInt(1).putDouble(x).putDouble(y).array()
      case "LINESTRING" => multi(3, Seq(pts(body.stripPrefix("(").stripSuffix(")"))))
      case "MULTILINESTRING" => multi(3, groups(body))
      case "POLYGON" => multi(5, groups(body))
      case "MULTIPOLYGON" =>
        // one type-5 record, all rings in file order (outer CW rings mark
        // polygon starts on read — caller supplies spec orientation)
        val inner = body.trim.stripPrefix("(").stripSuffix(")")
        val polyBodies = scala.collection.mutable.ArrayBuffer.empty[String]
        var depth = 0; val cur = new StringBuilder
        inner.foreach {
          case '(' => depth += 1; cur += '('
          case ')' => depth -= 1; cur += ')'
          case ',' if depth == 0 => polyBodies += cur.toString; cur.clear()
          case c => cur += c
        }
        if (cur.nonEmpty) polyBodies += cur.toString
        multi(5, polyBodies.toSeq.flatMap(p => groups(p.trim)))
      case other => throw new IllegalArgumentException(s"WKT type $other unsupported")
    }
  }

  /** Distributed shapefile sink: one .shp/.dbf pair per `keyCol` value
    * under `dir` — the reference's per-tile segment write
    * (image_segmentation.py:153-162) as a Spark job, mirroring
    * [[GeoPackage.writeLayerFiles]]: keys hash-shuffle across executors,
    * each task serializes its keys' pairs locally; nothing rides the
    * driver. `geomCol` holds WKT; every other column becomes a dBase
    * field (N/F/C derived from the Spark type, fixed widths).
    */
  def writeFeatureFiles(df: DataFrame, dir: String,
      keyCol: String, geomCol: String = "geom",
      crsWkt: Option[String] = None): Unit = {
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val geomIdx = schema.fieldIndex(geomCol)
    require(schema(geomIdx).dataType == StringType,
      s"geometry column '$geomCol' must be WKT strings")
    val attrIdx = schema.fields.indices.filterNot(i => i == keyIdx || i == geomIdx)
    val fields = attrIdx.map { i =>
      val f = schema(i)
      f.dataType match {
        case LongType | IntegerType | ShortType | ByteType => (f.name.take(10), 'N', 18, 0)
        case DoubleType | FloatType => (f.name.take(10), 'N', 18, 6)
        case BooleanType => (f.name.take(10), 'L', 1, 0)
        case StringType => (f.name.take(10), 'C', 64, 0)
        case other => throw new IllegalArgumentException(
          s"shapefile writer: unsupported column type $other")
      }
    }
    // dBase caps field names at 10 chars: refuse silently-colliding columns
    val dup = fields.map(_._1).groupBy(identity).collect { case (n, v) if v.size > 1 => n }
    require(dup.isEmpty,
      s"column names collide after the dBase 10-char truncation: ${dup.mkString(", ")}")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    KeyedFileSink.foreachKeyRun(df, keyCol) { (key, rows) =>
      val safe = KeyedFileSink.safeName(key)
      val shp = synthShp(rows.map(r =>
        if (r.isNullAt(geomIdx)) null else r.getString(geomIdx)))
      val dbf = synthDbf(fields, rows.map { r =>
        attrIdx.map { i =>
          if (r.isNullAt(i)) null
          else r.get(i) match {
            case v: Long => v
            case v: Int => v.toLong
            case v: Short => v.toLong
            case v: Byte => v.toLong
            case v: Double => v
            case v: Float => v.toDouble
            case v: Boolean => v
            case v: String =>
              // explicit, not a silent take(64): dBase C fields are 64 wide
              require(v.length <= 64,
                s"dbf string value exceeds the 64-char field width (${v.length} chars)")
              v
            case other => throw new IllegalArgumentException(s"dbf value $other")
          }
        }
      })
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, s"$safe.shp"), shp)
      // external consumers (OGR/ArcGIS) refuse a shapefile without its index
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, s"$safe.shx"), synthShx(shp))
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, s"$safe.dbf"), dbf)
      crsWkt.foreach(c => java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"$safe.prj"), c.getBytes("US-ASCII")))
    }
  }

  /** Serialize a dBase III table: fields as (name, 'C'|'N'|'F'|'L', len,
    * dec); values null, Long, Double, Boolean, String.
    */
  def synthDbf(fields: Seq[(String, Char, Int, Int)],
      rows: Seq[Seq[Any]]): Array[Byte] = {
    val hdrSize = 32 + 32 * fields.length + 1
    val recSize = 1 + fields.map(_._3).sum
    val buf = java.nio.ByteBuffer.allocate(hdrSize + rows.length * recSize + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(0x03.toByte).put(24.toByte).put(1.toByte).put(1.toByte) // v3, date
    buf.putInt(rows.length)
    buf.putShort(hdrSize.toShort).putShort(recSize.toShort)
    buf.position(32)
    fields.foreach { case (name, typ, len, dec) =>
      require(name.length <= 10, s"dbf field name too long: $name")
      val pos0 = buf.position()
      buf.put(name.getBytes("US-ASCII")).put(0.toByte)
      buf.position(pos0 + 11)
      buf.put(typ.toByte)
      buf.position(pos0 + 16)
      buf.put(len.toByte).put(dec.toByte)
      buf.position(pos0 + 32)
    }
    buf.put(0x0d.toByte)
    rows.foreach { r =>
      buf.put(' '.toByte) // not deleted
      r.zip(fields).foreach { case (v, (_, _, len, dec)) =>
        val str = v match {
          case null => " " * len // all-blank field reads back as NULL
          case x: Long => x.toString.reverse.padTo(len, ' ').reverse // right-justified
          case x: Double => s"%.${dec}f".format(x).reverse.padTo(len, ' ').reverse
          case x: Boolean => (if (x) "T" else "F").padTo(len, ' ')
          case x: String => x.padTo(len, ' ')
          case other => throw new IllegalArgumentException(s"dbf value $other")
        }
        require(str.length == len, s"field overflow: '$str' vs width $len")
        buf.put(str.getBytes("US-ASCII"))
      }
    }
    buf.put(0x1a.toByte) // EOF marker
    buf.array()
  }
}
