package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked approximate string matching (record linkage / entity
  * resolution): find right-side rows within a bounded edit distance of
  * each left-side probe WITHOUT the quadratic all-pairs comparison.
  *
  * Blocking contract (standard in record linkage, stated explicitly
  * because it bounds recall, not just cost): a candidate pair must agree
  * on the first `blockPrefix` characters AND differ in length by at most
  * `maxDist`. Edits inside the prefix therefore cannot match — callers
  * that need prefix-robust recall run a second pass with a different
  * blocking key (e.g. reversed strings or a phonetic code) and union the
  * results, the classic multi-pass blocking scheme.
  *
  * Scale shape: the right side is replicated into the 2·maxDist+1
  * length bands that could contain a match, then the join is a pure
  * EQUI-join on (prefix, band) — hash-partitionable, AQE-broadcastable,
  * skew-splittable, never a cartesian or theta join. The O(len²)
  * Levenshtein DP runs only on survivors of the equi-join, and the
  * length filter is free because it is baked into the band key.
  */
object FuzzyJoin {

  /** Join `left` to `right` where
    * levenshtein(left.`leftCol`, right.`rightCol`) <= `maxDist`, under
    * the blocking contract above. Output: all left columns + all right
    * columns + `edit_dist`. Column names must not collide across sides.
    */
  def blockedLevenshtein(
      left: DataFrame,
      right: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDist: Int,
      blockPrefix: Int = 2): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(blockPrefix >= 1, s"blockPrefix must be >= 1, got $blockPrefix")
    val clash = left.columns.intersect(right.columns)
    require(clash.isEmpty,
      s"left/right column names must be disjoint; shared: ${clash.mkString(",")}")
    val l = left
      .withColumn("__blk", substring(col(leftCol), 1, blockPrefix))
      .withColumn("__band", length(col(leftCol)))
    // one copy of every right row per reachable length band; a real pair
    // matches in exactly one band (band = left length), so no dedup pass
    val r = right
      .withColumn("__blk", substring(col(rightCol), 1, blockPrefix))
      .withColumn("__band",
        explode(sequence(length(col(rightCol)) - maxDist, length(col(rightCol)) + maxDist)))
    l.join(r, Seq("__blk", "__band"))
      .withColumn("edit_dist", levenshtein(col(leftCol), col(rightCol)))
      .filter(col("edit_dist") <= maxDist)
      .drop("__blk", "__band")
  }
}
