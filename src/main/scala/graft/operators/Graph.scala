package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an edge table — the canonical
  * "collapse near-duplicate clusters to one keeper" step that follows
  * LSH/Jaccard pair generation (reference analog: the cross-batch merge of
  * pixel_classifier_stream.py:166-175 unions overlapping label regions;
  * here the general graph form).
  *
  * Algorithm: min-label propagation to fixpoint. Each node starts with
  * label = its own id; every round each node takes the min label over
  * itself and its neighbors (one shuffle for the edge join, one for the
  * min-agg). Rounds needed = graph diameter, which for dedup clusters is
  * tiny (near-dup groups are dense quasi-cliques, diameter ≲ 3); the
  * driver-side loop checks convergence with a cheap count and is bounded
  * by `maxIter`. For adversarial high-diameter graphs (long chains) swap
  * in the large-star/small-star alternation — same join/agg shuffle
  * pattern per round, O(log n) rounds — which this implementation's
  * structure accommodates without changing callers.
  *
  * Scale notes: state is one (node, label) row per node — shuffles key on
  * node id and AQE handles skew (a viral near-dup cluster salts through
  * the min-agg's partial aggregation). Edges are re-read each round;
  * persist `edges` before calling when they are expensive to recompute.
  */
object Graph {

  /** Components of the undirected graph given by (`srcCol`, `dstCol`).
    * Returns (node, component) where component = min node id reachable.
    * Only nodes incident to an edge appear; union isolated nodes yourself
    * if the domain is larger.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String = "a",
      dstCol: String = "b",
      maxIter: Int = 20): DataFrame = {
    // undirected edges in both directions PLUS a self-loop per node: the
    // min over a node's in-neighbors' labels then includes its own label,
    // so each round is ONE join + ONE aggregation (no second join to merge
    // the old label back in)
    val fwd = edges.select(col(srcCol).as("x"), col(dstCol).as("y"))
    val nodes = fwd.select(col("x")).union(fwd.select(col("y"))).distinct()
    // pre-partition by x: the per-round groupBy(x) then reuses this
    // partitioning (when AQE broadcasts the small labels side, the join
    // preserves the streamed side's distribution → zero shuffles per round;
    // with a huge label table it degrades to a plain shuffled join)
    val und = fwd
      .union(fwd.select(col("y").as("x"), col("x").as("y")))
      .union(nodes.select(col("x"), col("x").as("y")))
      .distinct()
      .repartition(col("x"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    und.count()
    try {
      var labels = und.select(col("x").as("node")).distinct()
        .withColumn("label", col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // labels only ever decrease (min-propagation is monotone), so an
      // unchanged checksum ⟺ a fixpoint; computing it over the fresh cache
      // also materializes ALL partitions before the old cache is dropped
      // (a limit()-style early-out would leave the cache partial and force
      // full lineage recomputation every round — quadratic blowup).
      def checksum(df: DataFrame): java.math.BigDecimal =
        df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
      var prev = checksum(labels)
      var converged = false
      var it = 0
      while (!converged && it < maxIter) {
        val next = und
          .join(labels.select(col("node").as("y"), col("label").as("nl")), Seq("y"))
          .groupBy(col("x").as("node"))
          .agg(min(col("nl")).as("label"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val s = checksum(next)
        labels.unpersist()
        labels = next
        converged = s.compareTo(prev) == 0
        prev = s
        it += 1
      }
      labels.select(col("node"), col("label").as("component"))
    } finally und.unpersist()
  }

  /** Component summary: keeper (= component id = min member) and size. */
  def componentSummary(components: DataFrame): DataFrame =
    components
      .groupBy(col("component").as("keep_id"))
      .agg(count(lit(1)).as("n_members"))
}
