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
}
