package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Globally-ordered computations WITHOUT a single-partition window.
  *
  * `Window.orderBy(...)` with no partition — the natural spelling of a
  * running total or a global rank — funnels the whole table through ONE
  * task: the classic 100 TB scale-killer (and the source of Spark's "No
  * Partition Defined for Window operation" warning). The scale-correct
  * plan is the textbook two-pass partition-offset pattern:
  *
  *   1. compute ORDER-KEY BUCKET BOUNDARIES once (`percentile_approx`
  *      cuts on the leading order column — one scan, collected once, so
  *      every later step sees the same boundaries);
  *   2. pass 1: per-bucket count/sum — a tiny aggregate (≤ #buckets rows
  *      to the driver), prefix-scanned into per-bucket OFFSETS;
  *   3. pass 2: shuffle on the bucket id, sort each partition by
  *      (bucket, order), and stream per-bucket running values seeded
  *      from the broadcast offsets — embarrassingly parallel; no task
  *      ever holds more than its buckets.
  *
  * Why not `repartitionByRange` + per-partition offsets: RangePartitioner
  * seeds its boundary sampling with the RDD id, so two evaluations of the
  * same plan draw DIFFERENT boundaries — pass-1 offsets would not line up
  * with pass-2 partitions (observed: duplicate ranks). Explicit buckets
  * computed once make both passes see one deterministic assignment, and
  * hash-partitioning bucket ids is deterministic by construction.
  *
  * Contracts: the leading order column must be numeric (boundary cuts);
  * ties on it stay in one bucket (strict `<` against the cut), remaining
  * order columns break ties inside the within-partition sort — pass a
  * unique tie-break key for full determinism, exactly as for a window.
  * Boundary quality only affects BALANCE, never correctness.
  */
object GlobalOrder {

  private def numParts(df: DataFrame, requested: Int): Int =
    if (requested > 0) requested
    else df.sparkSession.sessionState.conf.numShufflePartitions

  /** Deterministic bucket id (0..buckets-1) for the leading order column:
    * `percentile_approx` cuts, counted with a strict-< filter HOF (O(#cuts)
    * per row — fine for partition-scale bucket counts). NULLs (sorted
    * first by Spark's asc) land in bucket 0.
    */
  private def withBucket(df: DataFrame, first: Column, buckets: Int): DataFrame = {
    if (buckets <= 1) return df.withColumn("__gob", lit(0))
    val cutsRow = df
      .agg(percentile_approx(
        first, array((1 until buckets).map(i => lit(i.toDouble / buckets)): _*),
        lit(10000)).as("cuts"))
      .head()
    val cuts: Seq[Any] =
      if (cutsRow.isNullAt(0)) Nil else cutsRow.getSeq[Any](0).filter(_ != null)
    if (cuts.isEmpty) df.withColumn("__gob", lit(0))
    else df.withColumn("__gob",
      // count of cuts strictly below the value, as a codegen'd when-sum:
      // the previous size(filter(array(...), lambda)) spelling is an
      // array HOF, which whole-stage codegen does NOT compile — an
      // interpreted 31-comparison lambda per row, paid in BOTH rank
      // passes (measured ~2x on the hist2 bucket-derivation stages)
      when(first.isNull, lit(0)).otherwise(
        cuts.map(b => when(lit(b) < first, 1).otherwise(0)).reduce(_ + _)))
  }

  /** Append `outCol` = 1-based global rank (row_number over the total
    * order of `orderCols`) without a global sort or single-task window.
    */
  def withGlobalRank(
      df: DataFrame,
      orderCols: Seq[Column],
      outCol: String = "rank",
      numPartitions: Int = 0): DataFrame =
    withGlobalRankAndTotal(df, orderCols, outCol, numPartitions)._1

  /** [[withGlobalRank]] plus the table's total row count, FREE from the
    * pass-1 bucket counts (their sum) — callers that also need the count
    * (equi-depth ntile arithmetic) save a whole extra scan.
    */
  def withGlobalRankAndTotal(
      df: DataFrame,
      orderCols: Seq[Column],
      outCol: String = "rank",
      numPartitions: Int = 0): (DataFrame, Long) = {
    require(orderCols.nonEmpty, "withGlobalRank needs at least one order column")
    val n = numParts(df, numPartitions)
    val bucketed = withBucket(df, orderCols.head, n)
    val counts = bucketed.groupBy(col("__gob")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap // ≤ n rows
    val offsets = (0 until n).scanLeft(0L)((acc, i) => acc + counts.getOrElse(i, 0L))
    // pass 2: row_number WITHIN each bucket (a PARTITIONED window — each of
    // the n buckets sorts independently, nothing global) plus the bucket's
    // broadcast offset, looked up from a literal array. Staying in Catalyst
    // (no RDD hop) keeps the pipeline codegen'd and skips two
    // InternalRow<->Row conversions per row.
    val offArr = array(offsets.take(n).map(lit(_)): _*)
    val ranked = bucketed
      .withColumn(outCol,
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("__gob")).orderBy(orderCols: _*))
          .cast(LongType) + element_at(offArr, col("__gob") + 1))
      .drop("__gob")
    (ranked, counts.valuesIterator.sum)
  }

  /** Append `outCol` = running sum of `valueCol` over the total order of
    * `orderCols` (window frame UNBOUNDED PRECEDING..CURRENT ROW), without
    * a single-task window. `valueCol` must be integral or decimal — the
    * per-bucket partials are summed EXACTLY (BigDecimal / Long), so the
    * result is independent of partitioning and task order; float running
    * sums are order-defined and belong in a per-key window.
    */
  def prefixSum(
      df: DataFrame,
      orderCols: Seq[Column],
      valueCol: Column,
      outCol: String = "run_total",
      numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "prefixSum needs at least one order column")
    val spark = df.sparkSession
    val n = numParts(df, numPartitions)
    val withV = df.withColumn("__psv", valueCol)
    val (outType, scale) = withV.schema("__psv").dataType match {
      case d: DecimalType => (DecimalType(DecimalType.MAX_PRECISION, d.scale), d.scale)
      case ByteType | ShortType | IntegerType | LongType => (LongType, 0)
      case t => throw new IllegalArgumentException(
        s"prefixSum needs an integral or decimal value column, got $t")
    }
    val bucketed = withBucket(withV, orderCols.head, n)
    val vIdx = bucketed.schema.fieldIndex("__psv")
    val bIdx = bucketed.schema.fieldIndex("__gob")

    def valueOf(r: Row): java.math.BigDecimal =
      if (r.isNullAt(vIdx)) java.math.BigDecimal.ZERO
      else r.get(vIdx) match {
        case d: java.math.BigDecimal => d
        case d: BigDecimal => d.bigDecimal
        case x: java.lang.Number => java.math.BigDecimal.valueOf(x.longValue())
      }

    // exact per-bucket partials: decimal sums through Spark's decimal agg
    val partials = bucketed.groupBy(col("__gob"))
      .agg(sum(col("__psv")).as("s"))
      .collect()
      .map { r =>
        val s = r.get(1) match {
          case null => java.math.BigDecimal.ZERO
          case d: java.math.BigDecimal => d
          case d: BigDecimal => d.bigDecimal
          case x: java.lang.Number => java.math.BigDecimal.valueOf(x.longValue())
        }
        r.getInt(0) -> s
      }.toMap // ≤ n rows
    val offsets = (0 until n).scanLeft(java.math.BigDecimal.ZERO.setScale(scale))(
      (acc, i) => acc.add(partials.getOrElse(i, java.math.BigDecimal.ZERO)))
    val bc = spark.sparkContext.broadcast(offsets.toArray)
    val keepIdx = bucketed.schema.fields.zipWithIndex
      .collect { case (f, i) if f.name != "__psv" && f.name != "__gob" => i }
    val outSchema = StructType(keepIdx.map(bucketed.schema.fields(_)).toSeq :+
      StructField(outCol, outType, nullable = false))
    val sorted = bucketed
      .repartition(n, col("__gob"))
      .sortWithinPartitions(col("__gob") +: orderCols: _*)
    val rdd = sorted.rdd.mapPartitions { it =>
      var bucket = -1
      var acc = java.math.BigDecimal.ZERO
      it.map { r =>
        val b = r.getInt(bIdx)
        if (b != bucket) { bucket = b; acc = bc.value(b) }
        acc = acc.add(valueOf(r))
        val out: Any = outType match {
          case _: DecimalType => acc
          case _ => acc.longValueExact()
        }
        Row.fromSeq(keepIdx.map(r.get).toSeq :+ out)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
