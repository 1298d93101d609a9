package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface plan audit: every driver-visible query is planned and
  * checked for the scale-killers — cartesian products and nested-loop
  * joins — so a regression in ANY query (not just the ones with dedicated
  * plan specs) fails CI. The allowlist names the queries whose SEMANTICS
  * are an all-pairs scorer; each entry documents why that is the intended
  * shape, not an accident.
  */
class QueryAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Queries whose intended semantics are all-pairs (or a deliberate
    * 1-row broadcast cross):
    * - e3/e3b: brute-force cosine top-k IS query×corpus by definition
    *   (e3b's KMeans cells shrink the per-pair work, but the full-probe
    *   oracle form scores all pairs); the bucketed/indexed variants are
    *   the scale path and are plan-asserted in SimilaritySpec.
    * - e8: exact pair scan (bits=0) — the RHP-bucketed form (bits>0) is
    *   the scale path, spec'd in DedupSpec.
    * - tfidf1/pipe1: crossJoin(broadcast(<1-row N table>)) — a scalar
    *   broadcast, not a data×data cross.
    */
  /** - e3c: corpus × 8-row-centroid broadcast cross is the quantizer
    *   assignment itself — the small side is index METADATA (≤ nLists
    *   rows), so the "cross" is a per-row argmin over a constant table,
    *   not a data×data product.
    */
  private val allPairsByDesign = Set(
    "e3_cosine_topk", "e3b_ivf_topk", "e3c_ivf_pruned", "e8_embedding_neardup",
    "tfidf1_top_terms", "pipe1_curation")

  test("no query plans a cartesian or nested-loop join unless all-pairs by design") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan
      val cartesian = plan.collect { case c: CartesianProductExec => c }
      val nlj = plan.collect { case b: BroadcastNestedLoopJoinExec => b }
      if ((cartesian.nonEmpty || nlj.nonEmpty) && !allPairsByDesign(name)) Some(name)
      else None
    }
    assert(offenders.isEmpty,
      s"unexpected cartesian/nested-loop join in: ${offenders.mkString(", ")}")
  }

  test("no query plans a single-partition (global) window") {
    // Window.orderBy with no partitionBy funnels the whole input through
    // ONE task — the 100 TB scale-killer GlobalOrder.prefixSum /
    // withGlobalRank exist to avoid. Catching it at plan level keeps a
    // future query from reintroducing it by accident. No allowlist: since
    // round 5 every global-order computation goes through the two-pass
    // partition-offset operator.
    import org.apache.spark.sql.execution.window.WindowExec
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan
      val globalWindows = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      if (globalWindows.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"single-partition window in: ${offenders.mkString(", ")}")
  }

  test("every query's initial plan stays under the session's partition budget") {
    // A query whose first-stage plan explodes into thousands of tasks at
    // sf0.001 has a partitioning bug (e.g. an accidental per-row
    // repartition). AQE coalesces at runtime; this bounds the static shape.
    val cap = 256
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val parts = fn(spark, sf).rdd.getNumPartitions
      assert(parts <= cap, s"$name plans $parts partitions at sf0.001")
    }
  }
}
