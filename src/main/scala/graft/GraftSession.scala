package graft

import org.apache.spark.sql.SparkSession

/** Session factory with scale-appropriate defaults.
  *
  * Design notes (SURVEY.md §4): the reference hand-tunes parallelism
  * (ProcessPoolExecutor, cpu_count-2 workers — feature_stacking.py:45,186) and
  * memory bounds (15-model batches, 256-row strips — pixel_classifier_stream.py:42-43).
  * On Spark these become cluster-level knobs: AQE for runtime re-planning
  * (skew joins, partition coalescing), zstd parquet, and a shuffle-partition
  * count matched to the local core count rather than the 200 default.
  * At real cluster scale the same code runs with `spark.sql.shuffle.partitions`
  * sized to ~2-3× total cores and AQE coalescing down from there.
  */
object GraftSession {

  def builder(
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Non-ANSI mode: div-by-zero → NULL, overflow wraps — matches the
      // DuckDB oracle's double semantics and the reference's NaN-tolerant
      // NumPy kernels (SURVEY.md §7 hard part d).
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
      // INT64 micros instead of the legacy INT96 default: INT96 is
      // deprecated by parquet-format and carries NO column statistics, so
      // every timestamp-keyed store was unskippable (ZoneMap.build had to
      // re-scan data its own write just produced). Spark timestamps are
      // micros internally — the roundtrip is value-exact either way
      // (dual-SF parity green across the registry).
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
