package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max data skipping ("zone maps") for plain parquet
  * directories — the metastore-free analog of Iceberg/Delta file statistics,
  * and the unpartitioned-file complement of directory partition pruning
  * (s5) and the IVF index's partition-filter probes.
  *
  * Scale shape: the index has ONE ROW PER FILE — at 100 TB / 128 MB files
  * that is ~800k tiny rows, safely collectible on the driver (it is the
  * same cardinality every metastore-backed planner materializes to plan a
  * scan). `build` is a single distributed pass over the data; `prunedRead`
  * collects only the MATCHING file names and hands Spark an explicit file
  * list, so the skipped files are never opened — not even their footers.
  *
  * The payoff requires files with tight value ranges: write sorted or
  * range-repartitioned by the skip column (see zm1: `repartitionByRange`
  * on ship date → a 3-month predicate opens ~1/8 of the files).
  *
  * Reference analog: the tiled GeoTIFF layout (feature_stacking.py:227-229)
  * reads only the blocks a window touches; zone maps are the columnar
  * equivalent for value predicates instead of spatial windows.
  */
object ZoneMap {

  /** One distributed pass over `dir`: per file, row count plus min/max for
    * each of `cols`. Output columns: `file`, `n_rows`, `<c>_min`, `<c>_max`.
    * min/max ignore NULLs (SQL semantics) — a file whose column is all-NULL
    * gets NULL bounds, which `prune` treats as "cannot match a range
    * predicate" (correct: NULL never satisfies one).
    */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to index")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose [min, max] interval intersects [lo, hi). NULL bounds
    * (all-NULL file) never intersect a range predicate.
    */
  def prune(index: DataFrame, colName: String, lo: Any, hi: Any): DataFrame =
    index.filter(col(s"${colName}_max") >= lit(lo) && col(s"${colName}_min") < lit(hi))

  /** Read only the files the index cannot rule out for `lo <= c < hi`,
    * then apply the exact residual filter (zone maps prune files, they
    * don't evaluate predicates). Result ≡ full read + filter, by
    * construction; zm1 proves it under the DuckDB hash gate.
    */
  def prunedRead(
      spark: SparkSession,
      dir: String,
      index: DataFrame,
      colName: String,
      lo: Any,
      hi: Any): DataFrame = {
    val files = prune(index, colName, lo, hi)
      .select("file").collect().map(_.getString(0))
    val residual: Column = col(colName) >= lit(lo) && col(colName) < lit(hi)
    if (files.isEmpty)
      // keep the directory's schema without opening any data: an
      // always-false filter over the (footer-only) scan
      spark.read.parquet(dir).filter(lit(false))
    else
      // basePath keeps Spark's key=value partition-column inference for
      // explicit leaf-file reads — without it a partitioned layout would
      // return a DIFFERENT schema from the empty-files branch (and from
      // the contract's full read + filter)
      spark.read.option("basePath", dir)
        .parquet(files.toIndexedSeq: _*).filter(residual)
  }
}
