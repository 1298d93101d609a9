package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, NullsFirst, NullsLast, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** Whole-operator custom plan: top-k rows per key by a sort order —
  * `SELECT * ... ROW_NUMBER() OVER (PARTITION BY keys ORDER BY ord) <= k`
  * without the window's full per-partition sort.
  *
  * Physical shape mirrors partial/final aggregation: a map-side pass keeps
  * a bounded heap (size k) per key seen in the partition, the exchange
  * then moves AT MOST k rows per (key, input-partition) — not the full
  * input — and the reduce side merges heaps. Work is O(n log k) and
  * shuffle volume is capped by k·keys·partitions: at 100 TB this is the
  * difference between shuffling the corpus and shuffling the result.
  *
  * Ties at the k-boundary keep whichever row arrives first, so give the
  * operator a TOTAL order (e.g. score DESC, id ASC) for deterministic
  * output — the same contract window ranking has.
  *
  * Memory: the map-side pass holds k rows per DISTINCT KEY seen in the
  * partition. That is the right trade for top-k workloads (keys ≪ rows —
  * queries, users, tiles); for pathological key cardinality where k·keys
  * approaches partition size, a window sort is the safer plan.
  *
  * This is the SURVEY.md §2 "custom operators" tier (c): LogicalPlan +
  * SparkStrategy + SparkPlan, installed by GraftExtensions'
  * injectPlannerStrategy.
  */
case class TopKPerKey(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans TopKPerKey as partial(map-side) → [exchange] → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      val partial = TopKPerKeyExec(k, keys, order, planLater(child), partial = true)
      TopKPerKeyExec(k, keys, order, partial, partial = false) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // the final pass must see all rows of a key together; EnsureRequirements
  // inserts the hash exchange between the two passes
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override def outputPartitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = output
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // identity projection normalizes any InternalRow implementation the
      // child emits (LocalTableScan rows, generators, ...) to UnsafeRow;
      // applied only to the ≤ k rows per key that are actually kept
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap on the sort order: root = current worst of the best k
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val heap = heaps.getOrElseUpdate(keyProj.apply(row).copy(),
          mutable.PriorityQueue.empty[InternalRow](ord))
        if (heap.size < kk) heap.enqueue(toUnsafe.apply(row).copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(toUnsafe.apply(row).copy())
        }
      }
      // emit each key's survivors in ascending sort order (deterministic)
      heaps.valuesIterator.flatMap(h => h.dequeueAll.reverseIterator)
    }, preservesPartitioning = true)
  }
}

/** Column-level API + install hook. */
object TopK {

  /** Top `k` rows per `keys` group, "top" = first in `order` (give a
    * total order for determinism). Pure narrow+exchange pipeline; no
    * global or per-partition full sort.
    */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    // self-install: sessions built without GraftExtensions (plain
    // spark-submit mains, notebooks) still plan the node
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    // Columns are lazy ColumnNode trees in Spark 4; resolve them the way
    // the Dataset API does — through an analyzed projection — then point
    // the custom node at the resolved helper attributes and drop the
    // helpers on the way out.
    val ordInfo = order.map(GraftBridge.sortInfo)
    val tagged = df.select(
      df.columns.map(df.col).toSeq ++
        keys.zipWithIndex.map { case (c, i) => c.as(s"__graft_k$i") } ++
        ordInfo.zipWithIndex.map { case ((c, _, _), i) => c.as(s"__graft_o$i") }: _*)
    val child = tagged.queryExecution.analyzed
    val out = child.output
    val keyAttrs: Seq[Expression] =
      keys.indices.map(i => out.find(_.name == s"__graft_k$i").get)
    val orderSO = ordInfo.zipWithIndex.map { case ((_, asc, nullsFirst), i) =>
      val a = out.find(_.name == s"__graft_o$i").get
      SortOrder(a,
        if (asc) Ascending else Descending,
        if (nullsFirst) NullsFirst else NullsLast,
        Seq.empty)
    }
    val topk = GraftBridge.ofRows(spark, TopKPerKey(k, keyAttrs, orderSO, child))
    topk.select(df.columns.map(topk.col).toSeq: _*)
  }
}
