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
  * Algorithm: min-label propagation with pointer jumping, to fixpoint.
  * Each node starts with label = its own id; every round each node takes
  * the min label over itself and its neighbors (one shuffle for the edge
  * join, one for the min-agg), then jumps: label ← label's label (one more
  * equi-join). Propagation alone needs diameter rounds; the interleaved
  * jump compresses label chains geometrically, so convergence is
  * O(log diameter) — dense dedup quasi-cliques finish in 2-3 rounds and
  * adversarial long chains in tens, not millions. The driver-side loop
  * detects the fixpoint via a label checksum and is bounded by `maxIter`.
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
      maxIter: Int = 20,
      localThreshold: Long = 1L << 22): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    // The edge input is cached up front: everything downstream (the local
    // take, or the 3-way union building `und`) re-references it, and
    // without a cache the whole upstream pipeline — e.g. LSH + Jaccard
    // verify — would execute once per reference (no plan-level subtree
    // reuse across union branches).
    val fwd = edges.select(col(srcCol).as("x"), col(dstCol).as("y"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Broadcast-threshold-style hybrid: a graph whose edge list fits on
    // the driver resolves in one union-find pass (each distributed round
    // costs whole shuffle jobs — pure overhead at this size). Dedup-pair
    // graphs are ≪ corpus size, so this is the common case even at 100 TB;
    // the iterative path below is the unbounded-scale fallback.
    // ONE action decides the path AND, in the common case, already
    // delivers the payload: take(threshold+1) short-circuits once it has
    // enough rows, so a small graph pays a single materialization of the
    // upstream pipeline — no separate count barrier, no undirected
    // expansion, no distinct/repartition shuffle (union-find is direction-
    // and duplicate-insensitive).
    val takeN = (localThreshold.max(0L) + 1L).min(Int.MaxValue.toLong).toInt
    val head = fwd.take(takeN)
    // head.length < takeN ⟺ take() exhausted the input, so `head` IS the
    // complete edge list. (Comparing against localThreshold directly would
    // silently union-find a TRUNCATED sample when the threshold exceeds
    // Int.MaxValue and the clamp kicks in.)
    if (head.length < takeN) {
      try return localComponents(head, edges.sparkSession)
      finally fwd.unpersist()
    }
    // Over threshold: fully materialize the cache before fanning out into
    // the union (take() may have left partitions uncomputed).
    fwd.count()
    // Distributed path: undirected edges in both directions PLUS a
    // self-loop per node — the min over a node's in-neighbors' labels then
    // includes its own label, so each round is ONE join + ONE aggregation
    // (no second join to merge the old label back in). No distinct: the
    // min-aggregation is duplicate-insensitive, so deduplicating the
    // undirected expansion would spend a whole extra edge-list shuffle to
    // save nothing (the r7→r8 cc2 audit measured the distinct as pure
    // overhead at every scale — min over a multiset IS min over its set).
    val nodes = fwd.select(col("x")).union(fwd.select(col("y"))).distinct()
    // pre-partition by x: the per-round groupBy(x) then reuses this
    // partitioning (when AQE broadcasts the small labels side, the join
    // preserves the streamed side's distribution → zero shuffles per round;
    // with a huge label table it degrades to a plain shuffled join).
    val und = fwd
      .union(fwd.select(col("y").as("x"), col("x").as("y")))
      .union(nodes.select(col("x"), col("x").as("y")))
      .repartition(col("x"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // labels only ever decrease (min-propagation is monotone), so an
      // unchanged checksum ⟺ a pointwise fixpoint; computing it over the
      // fresh cache also materializes ALL partitions before the old cache
      // is dropped (a limit()-style early-out would leave the cache
      // partial and force full lineage recomputation every round), AND —
      // because `prop` feeds the jump under TWO different join keys —
      // eager materialization stops the AQE exchange race that would
      // execute the join+agg subtree twice (the inc1 lesson). One action
      // per frame does all three jobs: materialize, race-fence, converge.
      def checksum(df: DataFrame): java.math.BigDecimal =
        Option(df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0))
          .getOrElse(java.math.BigDecimal.ZERO) // sum over zero rows is NULL
      // pointer jump: label ← label's label. Every label value is itself
      // a node (self-loops put all nodes in `prop`), and labels only
      // decrease, so the jump is always valid and monotone. Propagation
      // alone needs diameter rounds (a 1M-node chain = 1M shuffles);
      // interleaving one jump per round compresses label chains
      // geometrically → O(log diameter) rounds, one extra equi-join each.
      def jump(prop: DataFrame): DataFrame = prop
        .join(prop.select(col("node").as("label"), col("label").as("ll")),
          Seq("label"), "left")
        .select(col("node"), coalesce(col("ll"), col("label")).as("label"))
      // ROUND 1 FUSED: against identity labels the propagation join is the
      // identity on the neighbor side, so min-over-neighbors collapses to
      // a plain groupBy(x).min(y) — its action also materializes `und`
      // (replacing the separate und.count barrier) and delivers both round
      // 1's pre-jump checksum and the identity sum in one job, so an
      // already-converged (edge-free) graph is detected with zero extra
      // identity-labels materialization.
      val prop1 = und.groupBy(col("x").as("node")).agg(min(col("y")).as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val r1 = prop1.agg(
        sum(col("label").cast("decimal(38,0)")),
        sum(col("node").cast("decimal(38,0)"))).head()
      fwd.unpersist() // und is now fully cached; the loop reads only und
      def dec(i: Int): java.math.BigDecimal =
        Option(r1.getDecimal(i)).getOrElse(java.math.BigDecimal.ZERO)
      if (dec(0).compareTo(dec(1)) == 0)
        return prop1.select(col("node"), col("label").as("component"))
      // LINEAGE TRUNCATION: the jump references prop twice, so the
      // logical plan DOUBLES per round — exponential in iterations (a
      // 64-chain's ~7 rounds already produce plan strings big enough to
      // OOM AQE's explain). Re-wrapping each materialized cache as a
      // LogicalRDD keeps the SQL plan flat every round (the standard
      // iterative-graph fix — GraphFrames checkpoints for the same
      // reason); the RDD still reads the persisted blocks.
      def flat(df: DataFrame): DataFrame =
        df.sparkSession.createDataFrame(df.rdd, df.schema)
      var labelsCached = jump(prop1).persist(StorageLevel.MEMORY_AND_DISK)
      var prev = checksum(labelsCached)
      var labels = flat(labelsCached)
      prop1.unpersist()
      var it = 1
      var converged = false
      while (!converged && it < maxIter) {
        // neighbor-min propagation: one join + one agg; its checksum IS
        // the convergence test (prop == previous labels ⟺ fixpoint, by
        // monotonicity), so the FINAL confirming round costs one
        // propagation job and no jump/checksum pair.
        val prop = und
          .join(labels.select(col("node").as("y"), col("label").as("nl")), Seq("y"))
          .groupBy(col("x").as("node"))
          .agg(min(col("nl")).as("label"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val s = checksum(prop)
        if (s.compareTo(prev) == 0) {
          converged = true
          prop.unpersist() // labels already hold the fixpoint
        } else {
          val next = jump(flat(prop)).persist(StorageLevel.MEMORY_AND_DISK)
          prev = checksum(next)
          prop.unpersist()
          labelsCached.unpersist()
          labelsCached = next
          labels = flat(next)
        }
        it += 1
      }
      labels.select(col("node"), col("label").as("component"))
    } finally { und.unpersist(); fwd.unpersist() }
  }

  /** Driver-side union-find over a collected edge list (small-graph path).
    * Path-halving + union-by-min keeps it near-linear; labels are
    * canonicalized to the component's min id to match the distributed
    * path exactly. Accepts the raw directed edge rows — union-find is
    * direction- and duplicate-insensitive, and both endpoints of every
    * edge are registered, so no undirected/self-loop expansion is needed.
    */
  private def localComponents(
      rows: Array[org.apache.spark.sql.Row],
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    def asLong(v: Any): Long = v match {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(s"non-numeric node id: $other")
    }
    val es = rows.map(r => (asLong(r.get(0)), asLong(r.get(1))))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(a: Long): Long = {
      var r = a
      while (parent.getOrElse(r, r) != r) {
        val p = parent(r)
        parent(r) = parent.getOrElse(p, p) // path halving
        r = parent(r)
      }
      r
    }
    for ((x, y) <- es) {
      parent.getOrElseUpdate(x, x)
      parent.getOrElseUpdate(y, y)
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) { // union by min: root stays the smaller id
        if (rx < ry) parent(ry) = rx else parent(rx) = ry
      }
    }
    parent.keys.toSeq.sorted
      .map(n => (n, find(n)))
      .toDF("node", "component")
  }

  /** FIXED-POINT PageRank over the undirected candidate graph — the
    * centrality signal for dup clusters (which documents anchor a
    * near-dup neighborhood). Ranks are 2^20-scaled BIGINTs and the
    * recurrence is pure integer arithmetic per step (integer-div
    * contributions, integer sums, one floor after the damping multiply),
    * so the trajectory is bit-identical under any partitioning and in
    * the oracle's recursive-CTE twin — the same determinism doctrine as
    * the fixed-point centroids, applied to an iterative algorithm.
    *
    * Scale shape: the classic join-agg PageRank round (edges ⋈ ranks →
    * per-target integer sum), each round persisted and materialized
    * before the previous cache drops (the connectedComponents pattern —
    * an unpersisted loop would replay the whole lineage every round).
    * Undirected symmetric edges mean every node has degree ≥ 1: no
    * dangling mass.
    */
  def pageRankFixed(
      pairs: DataFrame,
      iters: Int = 10,
      damping: Double = 0.85,
      localThreshold: Long = 4000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val baseFp = math.floor((1 - damping) * 1048576).toLong
    val edges = pairs.select(col("a").cast("long").as("src"), col("b").cast("long").as("dst"))
      .union(pairs.select(col("b").cast("long").as("src"), col("a").cast("long").as("dst")))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = edges.count()
    try {
      if (nEdges <= localThreshold) {
        // hybrid small-graph path (the connectedComponents pattern): ten
        // distributed rounds on a candidate-pair graph are pure scheduler
        // overhead — run the SAME integer recurrence on the driver
        // (bounded by the threshold; identical result by construction,
        // GraphSpec asserts the equivalence)
        val spark = pairs.sparkSession
        val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
        val deg = es.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
        var rank: Map[Long, Long] = deg.map { case (k, _) => k -> 1048576L }.toMap
        for (_ <- 1 to iters) {
          val totals = scala.collection.mutable.LongMap.empty[Long].withDefaultValue(0L)
          es.foreach { case (src, dst) => totals(dst) += rank(src) / deg(src) }
          rank = rank.keysIterator
            .map(n => n -> (baseFp + math.floor(damping * totals(n)).toLong)).toMap
        }
        import spark.implicits._
        rank.toSeq.toDF("node", "rank_fp")
      } else {
        val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        deg.count()
        try {
          var rank = deg.select(col("src").as("node"), lit(1048576L).as("rank_fp"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          rank.count()
          for (_ <- 1 to iters) {
            val next = edges
              .join(rank.withColumnRenamed("node", "src"), Seq("src"))
              .join(deg, Seq("src"))
              .select(col("dst"), expr("rank_fp div deg").as("__contrib"))
              .groupBy(col("dst"))
              .agg(sum(col("__contrib")).as("__total"))
              .select(col("dst").as("node"),
                (lit(baseFp) + floor(lit(damping) * col("__total")).cast("long")).as("rank_fp"))
              .persist(StorageLevel.MEMORY_AND_DISK)
            next.count()
            rank.unpersist()
            rank = next
          }
          rank
        } finally deg.unpersist()
      }
    } finally edges.unpersist()
  }

  /** Component summary: keeper (= component id = min member) and size. */
  def componentSummary(components: DataFrame): DataFrame =
    components
      .groupBy(col("component").as("keep_id"))
      .agg(count(lit(1)).as("n_members"))

  /** Canonical undirected edge list: (a, b) with a < b, self-loops and
    * duplicates (either orientation) dropped.
    */
  def canonicalEdges(edges: DataFrame, srcCol: String = "a",
      dstCol: String = "b"): DataFrame =
    edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") < col("b"))
      .distinct()

  /** Triangle triples (a < b < c) of the undirected graph — the cohesion
    * census of dup clusters (LSH candidate graphs are quasi-cliques; a
    * low triangle count per edge flags chains of borderline matches that
    * CC would still merge). Standard two-join enumeration over the
    * canonical a<b list: every triangle is produced exactly once because
    * each join step only extends upward. Shuffle cost = two equi-joins on
    * node ids; wedge fan-out is bounded by the max degree, and dedup-pair
    * graphs keep degrees near cluster size (AQE skew-splits viral nodes).
    */
  def triangles(edges: DataFrame, srcCol: String = "a",
      dstCol: String = "b"): DataFrame = {
    val e = canonicalEdges(edges, srcCol, dstCol)
    val wedge = e.select(col("a").as("x"), col("b").as("y"))
      .join(e.select(col("a").as("y"), col("b").as("z")), Seq("y"))
    wedge.join(e.select(col("a").as("x"), col("b").as("z")), Seq("x", "z"))
      .select(col("x").as("a"), col("y").as("b"), col("z").as("c"))
  }

  /** Node degrees of the undirected graph (canonicalized first). */
  def degrees(edges: DataFrame, srcCol: String = "a",
      dstCol: String = "b"): DataFrame = {
    val e = canonicalEdges(edges, srcCol, dstCol)
    e.select(col("a").as("node")).unionAll(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
  }
}
