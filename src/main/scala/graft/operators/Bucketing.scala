package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities (SURVEY.md §1.3/§4: the Spark mapping of the
  * reference's tiled, block-aligned storage — feature_stacking.py:227-229 —
  * when the goal is JOIN co-location rather than halo stencils).
  *
  * Writing both sides of a recurring equi-join bucketed (and sorted) by the
  * join key with the same bucket count lets Catalyst plan a sort-merge join
  * with NO shuffle exchange on either side — at 100 TB that's the
  * difference between re-shuffling the fact table every run and reading it
  * join-ready. The stacked-band join (J3) keyed by pixel/tile and the
  * segment-feature join (Stage 3) are the natural users.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (overwrites).
    *
    * Idempotent across sessions: a managed-table LOCATION can survive from
    * a previous session whose in-memory catalog is gone, and saveAsTable
    * then refuses the "new" table name (LOCATION_ALREADY_EXISTS) — so drop
    * the table AND clear any orphaned location first.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      buckets: Int,
      keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // Resolve the orphan location the way the catalog would place the
    // managed table: <warehouse>/<table> in the default database,
    // <warehouse>/<db>.db/<table> otherwise — a naive <warehouse>/<table>
    // would miss the real orphan AND could delete an unrelated dataset
    // that happens to share the name at the warehouse root.
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val db = spark.catalog.currentDatabase
    val base = if (db == "default") new org.apache.hadoop.fs.Path(wh)
      else new org.apache.hadoop.fs.Path(wh, s"$db.db")
    val loc = new org.apache.hadoop.fs.Path(base, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) {
      // Only clear the location if it is verifiably an orphaned
      // managed-table dir (flat parquet output: part files + commit
      // markers). An unrelated dataset that happens to live at the
      // derived path must NOT be silently destroyed.
      val entries = fs.listStatus(loc)
      val orphanLike = entries.forall { st =>
        val n = st.getPath.getName
        // _temporary / .spark-staging subdirectories are this writer's own
        // crashed-run scratch — refusing on them would make the location
        // permanently "foreign" after one failed write (no self-heal)
        (st.isDirectory && (n == "_temporary" || n.startsWith(".spark-staging"))) ||
        (st.isFile && (n.endsWith(".parquet") || n == "_SUCCESS" ||
          n.startsWith("_committed") || n.startsWith("_started") ||
          n.startsWith(".") || n.endsWith(".crc")))
      }
      require(orphanLike,
        s"refusing to overwrite $loc: contents do not look like an " +
          "orphaned managed parquet table (found subdirectories or " +
          "foreign files) — move or remove it explicitly")
      fs.delete(loc, true)
    }
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two co-bucketed tables on their bucket keys. With matching
    * bucket specs this plans shuffle-free (verified by BucketingSpec
    * against the executed plan).
    */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String],
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
