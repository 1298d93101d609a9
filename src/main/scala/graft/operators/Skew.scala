package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4 / the 100 TB design stance).
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles most runtime
  * skew; these are the explicit tools for the two shapes AQE can't fix:
  * a hot GROUP BY key, and a join where one specific key dominates and the
  * other side is too large to broadcast.
  *
  * Determinism note: salts derive from stable row content (a hash of the
  * provided expression), never from rand() — retries and stage re-runs
  * produce identical partitioning (the same discipline as segment ids,
  * SURVEY.md §7 hard part a).
  */
object Skew {

  /** Two-phase aggregation for hot group keys: aggregate on (key, salt)
    * first — spreading a hot key over `salts` reducers — then combine the
    * partials. Works for any algebraic aggregate expressed as (partial,
    * combine) column pairs.
    *
    * Example (sum, count → avg):
    * {{{
    * saltedAgg(df, Seq("k"), col("v"), 16,
    *   partials = Seq(sum(col("v")).as("s"), count(lit(1)).as("c")),
    *   combine  = Seq(sum(col("s")).as("s"), sum(col("c")).as("c")))
    * }}}
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltSource: Column,
      salts: Int,
      partials: Seq[Column],
      combine: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(saltSource), lit(salts)))
    salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(combine.head, combine.tail: _*)
  }

  /** Skewed equi-join: replicate the build side `salts` times, salt the
    * probe side by stable row hash, join on (key, salt). Spreads one hot
    * key across `salts` tasks at the cost of a `salts`× build-side
    * replication — use with a small-ish build side that still exceeds the
    * broadcast threshold, or pre-filtered hot keys.
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      salts: Int,
      probeSaltSource: Column,
      joinType: String = "inner"): DataFrame = {
    val saltedProbe = probe.withColumn("_salt", pmod(hash(probeSaltSource), lit(salts)))
    val replicatedBuild = build.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedProbe.join(replicatedBuild, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Key-frequency sketch for choosing salting targets: top-N keys by
    * count with their share of the table. Cheap (one aggregation) — run it
    * on a sample at real scale.
    */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 20): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .withColumn("share", col("n") / total)
      .orderBy(col("n").desc, col(key))
      .limit(topN)
  }
}
