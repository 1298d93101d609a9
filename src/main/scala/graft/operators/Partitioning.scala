package graft.operators

import org.apache.spark.sql.DataFrame

/** Partition-layout helpers shared by the CPU-heavy operators. */
object Partitioning {

  /** Spread a small-partition-count input across the cluster before a
    * CPU-heavy per-row map. A single parquet file scans as one partition,
    * which would serialize tokenize/shingle/hash work onto one core;
    * inputs that are already well-partitioned (the 100 TB case) pass
    * through untouched. `inputFiles` is metadata-only (no physical
    * planning, unlike `.rdd.getNumPartitions`); a many-file input is
    * already spread, and a single parquet file is exactly the case that
    * needs the repartition. Non-file inputs (memory relations, post-shuffle
    * frames) report zero files and zero-file frames are left alone unless
    * they are file scans — a post-shuffle frame already has the session's
    * shuffle parallelism.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val files = try df.inputFiles.length catch { case _: Throwable => 0 }
    if (files > 0 && files < target) df.repartition(target) else df
  }
}
