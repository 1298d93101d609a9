package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operators — the "look at the table before training on
  * it" surface a corpus store needs (the reference's only profiling is
  * eyeballing rasterio metadata, feature_stacking.py:79-84; a 100 TB
  * corpus needs it as a query).
  *
  * Scale shapes: `tableProfile` is ONE aggregation pass (count-distinct
  * expands to one extra shuffle per distinct column in exact mode; the
  * `exact=false` path swaps in HLL sketches and stays single-pass).
  * `histogram` is a plain groupBy on a derived integer key — pre-agg
  * combines per partition, so the exchange carries at most one row per
  * (partition, bucket).
  */
object Profiling {

  /** One-row profile: row count plus per-column null count, distinct
    * count, min, max. Exact distincts cost a shuffle per column (Spark
    * plans multi-distinct via Expand); `exact = false` uses
    * approx_count_distinct (HLL++, single pass) — the 100 TB default.
    */
  def tableProfile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "tableProfile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"${c}_distinct"),
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"))
    }
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Pearson correlation and covariance from EXACT moments: the naive
    * co-moment accumulation (`corr`/`covar_pop`) is partition-order-
    * nondeterministic in double; summing each moment as DECIMAL is exact
    * and commutative, and the closed forms then evaluate once on
    * bit-identical inputs — the same run-to-run reproducibility trick as
    * the fixed-point centroids, for second-order statistics. One
    * aggregation pass, map-side partials.
    */
  def exactCorr(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val d2 = "decimal(18,2)"
    def m(c: Column, name: String) = sum(c).cast("double").as(name)
    df.agg(
        count(lit(1)).as("n"),
        m(xCol.cast(d2), "sx"), m(yCol.cast(d2), "sy"),
        m(xCol.cast(d2) * yCol.cast(d2), "sxy"),
        m(xCol.cast(d2) * xCol.cast(d2), "sx2"),
        m(yCol.cast(d2) * yCol.cast(d2), "sy2"))
      .select(col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sx2") - col("sx") * col("sx")) *
            (col("n") * col("sy2") - col("sy") * col("sy"))), 6).as("corr"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) / col("n"), 6).as("covar"))
  }

  /** Equi-width histogram of an integral column: bucket lower bound →
    * count. Buckets are derived keys (integer division), so the groupBy
    * pre-aggregates map-side; no sort, no window.
    */
  def histogram(df: DataFrame, c: Column, width: Long): DataFrame = {
    require(width > 0, s"histogram width must be positive, got $width")
    // bucket_lo = x - (x mod width) with floor semantics (pmod), so
    // negative values land in their floor bucket — matches SQL `//`.
    df.groupBy((c.cast("long") - pmod(c.cast("long"), lit(width))).as("bucket_lo"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket_lo")
  }

  /** Equi-DEPTH histogram: `buckets` rank-quantile buckets over the value
    * order — deterministic bucket membership even on heavily tied data,
    * which is exactly where equi-depth matters (equi-width piles ties
    * into one bar). Bucket assignment replicates SQL ntile EXACTLY
    * (first n mod b buckets get the extra row) but runs through
    * GlobalOrder.withGlobalRank — the two-pass partition-offset rank —
    * so no single-task window sort exists anywhere in the plan: the
    * whole column never funnels through one task, and the plan survives
    * 100×. (The rank stays < 2^53, so the floor-division below is exact
    * in double.)
    *
    * `tieCols` is retained for interface stability but NOT sorted on:
    * the output (bucket, lo, hi, n) depends only on the MULTISET of
    * values — permuting rows of equal value within a rank range is
    * invisible to per-bucket min/max/count — so ranking over the value
    * alone is provably equivalent, halves the shuffled row width, and
    * drops two comparator keys from the per-bucket sorts. (An r7
    * value-run rewrite that compressed via groupBy(value) first measured
    * SLOWER at sf0.1 — l_extendedprice is 97% distinct, so the
    * compression bought nothing and the extra prefix-sum passes cost
    * ~0.5 s; the rank plan below is the measured floor.)
    */
  def equiDepthHistogram(df: DataFrame, c: Column, tieCols: Seq[Column],
      buckets: Int): DataFrame = {
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    val proj = df.select(c.as("__v"))
    // total comes free from the rank's pass-1 bucket counts — no extra scan
    val (ranked, total) =
      GlobalOrder.withGlobalRankAndTotal(proj, Seq(col("__v")), "__rank")
    val q = total / buckets
    val r = total % buckets
    // exact integer floor division: (a - a mod b) / b with a a multiple of b
    def idiv(a: Column, b: Long): Column = ((a - pmod(a, lit(b))) / lit(b)).cast("long")
    val zeroBased = col("__rank") - 1
    val bucket =
      if (q == 0) col("__rank") // fewer rows than buckets: bucket = rank
      else when(col("__rank") <= lit((q + 1) * r), idiv(zeroBased, q + 1) + 1)
        .otherwise(lit(r) + idiv(zeroBased - lit((q + 1) * r), q) + 1)
    ranked
      .withColumn("bucket", bucket.cast("int"))
      .groupBy("bucket")
      .agg(min(col("__v")).as("lo"), max(col("__v")).as("hi"), count(lit(1)).as("n"))
      .orderBy("bucket")
  }
}
