package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's testdata tables (TESTDATA.md).
  *
  * Each table is one parquet file per scale-factor directory. Reads are plain
  * `spark.read.parquet` so Catalyst gets full pushdown (column pruning,
  * predicate pushdown into row-group stats) — the Spark-native equivalent of
  * the reference's windowed band reads (feature_stacking.py:114-115,150).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts has drifted across fixture generations: parquet
    * TIMESTAMP(NANOS) (which Spark 4 only reads via the nanos-as-long shim)
    * and plain timestamp[us]. Branch on the dtype Spark actually loads so
    * either generation normalizes to a session-TZ µs TimestampType, keeping
    * oracle parity with DuckDB's naive TIMESTAMP values.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => // nanos fixture: truncate to µs (lossless, no sub-µs data)
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => // µs fixture: same wall clock in the session TZ (UTC)
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events.ts: unexpected fixture dtype $other — update Tables.events")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view named after itself (events goes
    * through its nanos-normalizing loader).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
