package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter sketch plumbing over Spark's native codegen'd bloom
  * expressions (the same pair Catalyst injects for runtime join
  * filters — BloomFilterAggregate / BloomFilterMightContain; neither is
  * SQL-registered, so this is the public Column face).
  *
  * Scale shape: the build is a distributed single-pass aggregate (each
  * partition fills a local filter, partials OR together — commutative,
  * so partitioning never changes the result); only the finished bitmap
  * (~1.2 bytes/item at 1% fpp) crosses to the driver, like a broadcast
  * side. The probe is a pure projection predicate — codegen'd, no
  * shuffle, usable right at the scan.
  */
object Sketches {

  /** Build a bloom filter over `keyCol` (hashed with xxhash64, matching
    * what [[mightContain]] probes). One distributed aggregation; returns
    * the serialized bitmap.
    */
  def buildBloom(keys: DataFrame, keyCol: Column, expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    // optimal bit count for the target false-positive rate
    val numBits = math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong.max(64L)
    // BloomFilterAggregate silently CLAMPS both parameters to the runtime-
    // filter session confs (defaults: 4M items / 64M bits) — at corpus
    // scale the filter would saturate and the real fpp silently approach
    // 1. Raise the caps for the duration of THIS build only and restore
    // them after: leaving a 10^9-item cap behind would let Catalyst's own
    // injected runtime join filters build multi-GB driver-side blooms in
    // unrelated queries for the rest of the session.
    val spark = keys.sparkSession
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> expectedItems,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> numBits
    ).map { case (key, needed) =>
      val old = spark.conf.getOption(key)
      if (old.forall(_.toLong < needed)) spark.conf.set(key, needed.toString)
      key -> old
    }
    try {
      val agg = new BloomFilterAggregate(
        GraftBridge.toCatalyst(xxhash64(keyCol)),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression()
      keys.select(GraftBridge.column(agg).as("bf")).head().getAs[Array[Byte]]("bf")
    } finally saved.foreach {
      case (key, Some(v)) => spark.conf.set(key, v)
      case (key, None) => spark.conf.unset(key)
    }
  }

  /** Membership probe against a serialized filter from [[buildBloom]].
    * No false negatives; false positives at ~the build fpp — callers
    * that need exactness verify survivors with an exact join.
    */
  def mightContain(bloom: Array[Byte], keyCol: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      GraftBridge.toCatalyst(xxhash64(keyCol))))

  /** KMV (k-minimum-values) distinct-count sketch, per group: keep the k
    * smallest distinct 60-bit md5-derived hashes of `key`; with h(k) the
    * k-th smallest hash on the 2^60 scale, the estimate is
    * (k-1) · 2^60 / h(k) (Bar-Yossef et al. 2002). Groups holding fewer
    * than k distinct keys report the EXACT count (the sketch is lossless
    * below capacity).
    *
    * Unlike HyperLogLog this sketch is RNG-free and fully deterministic
    * (md5 of the value), so two engines agree bit-for-bit — which is what
    * makes it oracle-checkable. It is also mergeable: the union of two
    * sketches' hash sets, re-capped to the k smallest, is exactly the
    * sketch of the unioned inputs, so partials combine across
    * partitions, stores, or days like any mergeable agg state.
    *
    * Scale shape: one distinct shuffle on (group, hash) with map-side
    * partial dedup, then the k-cap runs through the bounded-heap
    * [[graft.plans.TopK]] physical operator — the post-distinct exchange
    * carries at most k rows per group, so the reduce side is O(k·groups)
    * regardless of input distinct cardinality.
    *
    * Output: group columns + `n_min` (hashes kept, = min(k, distinct)),
    * `kth_hash` (the sketch bound), `est_distinct`.
    */
  def kmvDistinct(
      df: DataFrame,
      key: Column,
      groupCols: Seq[String] = Nil,
      k: Int = 256): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    // 15 hex chars = 60 bits: exact in a BIGINT in both engines, and
    // (k-1)·2^60 stays exactly representable as a double for any sane k
    val h = graft.functions.TextOps.hexVal(md5(key.cast("string")), 15)
    val gcols = if (groupCols.isEmpty) Seq("__g") else groupCols
    val base =
      if (groupCols.isEmpty) df.select(lit(1).as("__g"), h.as("__h"))
      else df.select(groupCols.map(col) :+ h.as("__h"): _*)
    val top = graft.plans.TopK.perKey(
      base.distinct(), gcols.map(col), Seq(col("__h").asc), k)
    val est = top
      .groupBy(gcols.map(col): _*)
      .agg(count(lit(1)).as("n_min"), max(col("__h")).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("n_min") < k, col("n_min").cast("double"))
          .otherwise(round(
            lit((k - 1).toDouble * math.pow(2.0, 60)) / col("kth_hash").cast("double"), 6)))
    if (groupCols.isEmpty) est.drop("__g") else est
  }
}
