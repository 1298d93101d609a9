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
    // undirected: both directions, plus self-loops so min-agg sees own label
    val fwd = edges.select(col(srcCol).as("x"), col(dstCol).as("y"))
    val und = fwd.union(fwd.select(col("y").as("x"), col("x").as("y"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = und.select(col("x").as("node")).distinct()
        .withColumn("label", col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var converged = false
      var it = 0
      while (!converged && it < maxIter) {
        // neighbor labels: edge (x,y) contributes label(y) to node x
        val next = und
          .join(labels.withColumnRenamed("node", "y").withColumnRenamed("label", "nl"), Seq("y"))
          .groupBy(col("x").as("node"))
          .agg(min(col("nl")).as("neighbor_min"))
          .join(labels, Seq("node"))
          .select(col("node"), least(col("label"), col("neighbor_min")).as("label"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("node"))
          .filter(col("label") < col("old")).limit(1).count()
        labels.unpersist()
        labels = next
        converged = changed == 0
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
