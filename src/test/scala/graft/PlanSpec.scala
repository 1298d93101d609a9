package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions for the round-2 operators: the plan shape IS
  * the scale contract (one shuffle where one is expected, sharded windows
  * instead of single-reducer sorts, AQE broadcasting the small side).
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def shuffles(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).size

  test("j24 kNN join: bounded-heap TopK pair, no window, no global sort before it") {
    val plan = SparkEntry.queries("j24_knn_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("TopKPerKey \\d".r.findAllIn(plan).size == 2,
      s"expected partial+final TopKPerKeyExec pair in:\n$plan")
    assert(!plan.contains("Window"), s"kNN must not fall back to a window sort:\n$plan")
    // exchanges: the bbox equi-join's two sides + the TopK partial->final
    // hash exchange + the output ordering's range exchange — nothing else
    assert(shuffles(plan) <= 3, s"expected <= 3 hash exchanges in:\n$plan")
  }

  test("cube aggregates in one Expand + one shuffle") {
    val plan = Tables.lineitem(spark, sf)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(plan).size == 1, s"expected 1 Expand in:\n$plan")
    assert(shuffles(plan) == 1, s"expected 1 shuffle in:\n$plan")
  }

  test("sharded packByTokenBudget partitions by shard, no single-reducer sort") {
    val docs = (1L to 100L).map(i => (i, i % 4, "a b c")).toDF("doc_id", "shard", "text")
    val plan = Curation.packByTokenBudget(docs,
        graft.functions.TextOps.tokenCount(col("text")), "doc_id", budget = 10,
        shardCol = Some("shard"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(shard"), s"window not shard-partitioned:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"), s"single-reducer window:\n$plan")
  }

  test("event-time RANGE frame window costs exactly one shuffle") {
    val plan = SparkEntry.queries("w4_range_frame")(spark, sf)
      .queryExecution.executedPlan.toString
    // one hash exchange for the per-user window; the final orderBy adds a
    // range exchange, which is output formatting, not compute
    assert(shuffles(plan) == 1, s"expected 1 hash shuffle in:\n$plan")
  }

  test("tfidf document-frequency side ends up broadcast under AQE") {
    val q = Curation.topTfidfTerms(Tables.documents(spark, sf), k = 3)
    q.collect() // finalize adaptive plan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in final plan:\n$plan")
  }

  test("hashSplit adds no shuffle (pure per-row projection)") {
    val docs = Tables.documents(spark, sf)
    val plan = docs.withColumn("split", Curation.hashSplit(docs, "doc_id"))
      .queryExecution.executedPlan.toString
    assert(shuffles(plan) == 0 && !plan.contains("Exchange"), s"unexpected exchange:\n$plan")
  }

  test("g1 geometry scan reads only the two key columns") {
    val plan = SparkEntry.queries("g1_wkt_measures")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint>"),
      s"geometry query must prune to the two source columns:\n$plan")
  }

  test("decontaminate eval-gram side broadcasts under AQE (corpus never re-shuffled by gram)") {
    val docs = Tables.documents(spark, sf)
    val q = Curation.decontaminate(docs, docs.filter(col("doc_id") % 97 === 0), ngramK = 3)
    q.collect() // finalize adaptive plan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"eval grams should broadcast into a semi join:\n$plan")
  }

  test("regridNearest: aux raster broadcasts under AQE, master side never shuffles") {
    val q = SparkEntry.queries("g2_regrid_nearest")(spark, sf)
    q.collect() // finalize adaptive plan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small aux raster should broadcast into the master scan:\n$plan")
  }

  test("regridBilinear: one re-aggregation shuffle collapses the 4x tap inflation") {
    val master = (for { r <- 0 until 8; c <- 0 until 8 } yield (r, c))
      .toDF("px_row", "px_col")
    val aux = (for { r <- 0 until 4; c <- 0 until 4 } yield (r, c, 1.0))
      .toDF("px_row", "px_col", "v")
    import graft.operators.Regrid
    val q = Regrid.regridBilinear(master, aux,
      Regrid.GridDef(0, 8, 1, 1), Regrid.GridDef(0, 8, 2, 2), Seq("v"))
    q.collect()
    // AQE's toString prints Final AND Initial plans — count the final only
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // partial_ then final aggregation: the tap explosion is combined
    // map-side before the single hash exchange on the master key
    assert(plan.contains("partial_"), s"expected map-side partial agg:\n$plan")
    assert(shuffles(plan) <= 1, s"expected at most one hash exchange:\n$plan")
  }

  test("spread repartitions a single-file scan and passes through a many-partition frame") {
    val docs = Tables.documents(spark, sf)
    val spreadPlan = graft.operators.Partitioning.spread(docs)
      .queryExecution.executedPlan.toString
    assert(spreadPlan.contains("Exchange RoundRobinPartitioning") ||
      spreadPlan.contains("roundrobin"), s"single-file scan must spread:\n$spreadPlan")
    val shuffled = docs.repartition(64, col("doc_id"))
    val passPlan = graft.operators.Partitioning.spread(shuffled)
      .queryExecution.executedPlan.toString
    assert(!passPlan.toLowerCase.contains("roundrobin"),
      s"already-shuffled frame must pass through untouched:\n$passPlan")
  }

  test("qualityGate is a zero-shuffle projection (repetition fold included)") {
    val plan = Curation.qualityGate(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(shuffles(plan) == 0, s"gate must not shuffle:\n$plan")
  }

  test("rep1 repetition metrics stay shuffle-free up to the output sort") {
    val plan = SparkEntry.queries("rep1_ngram_repetition")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(shuffles(plan) == 0, s"per-row fold must not hash-shuffle:\n$plan")
  }

  test("skew1 salted agg is two aggregation exchanges, no more") {
    val plan = SparkEntry.queries("skew1_salted_agg")(spark, sf)
      .queryExecution.executedPlan.toString
    // (key,salt) agg + key agg; the orderBy range exchange is output format
    assert(shuffles(plan) == 2, s"expected exactly 2 hash shuffles in:\n$plan")
  }

  test("gate filter pushes to the scan with each signal evaluated ONCE") {
    // Alias substitution during filter pushdown (and CollapseProject's
    // extract-only struct collapsing) re-inlines a staged expression once
    // per REFERENCE — the gate is safe only because every signal is a
    // single-reference scalar (dupFraction computes dup/tot INSIDE the
    // fold's finish lambda). One fold and one lang-vote array in the
    // pushed predicate is the contract; two would mean the struct
    // extraction crept back.
    // select only doc_id: a pruned consumer (pipe2's shape) must leave
    // the fold in the pushed filter alone — keeping `reason` in the
    // output would legitimately evaluate it a second time for display
    val plan = Curation.qualityGate(Tables.documents(spark, sf))
      .filter(col("keep")).select("doc_id").queryExecution.executedPlan.toString
    assert("aggregate\\(".r.findAllIn(plan).size == 1,
      s"repetition fold must appear exactly once in:\n$plan")
    assert("array_sort\\(array\\(struct".r.findAllIn(plan).size <= 2,
      s"lang-vote array duplicated in:\n$plan")
  }

  test("emb1 centroid table broadcasts; corpus side never re-shuffles") {
    val q = SparkEntry.queries("emb1_label_cohesion")(spark, sf)
    q.collect() // finalize adaptive plan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"centroid join must broadcast:\n$plan")
  }

  test("j6 banded range join is an equi-join on (user, bucket) — no NLJ") {
    val plan = SparkEntry.queries("j6_range_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"banded join degenerated to all-pairs:\n$plan")
    assert(plan.contains("bkt"), s"bucket key missing from the join:\n$plan")
  }

  test("e13 bloom probe is a scan-side predicate (before the verify semi join)") {
    val docs = Tables.documents(spark, sf)
    val q = Curation.decontaminateBloom(docs, docs.filter(col("doc_id") % 97 === 0), ngramK = 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom predicate missing from the physical plan:\n$plan")
    // the probe must sit under the semi join (tree rendering: children
    // print BELOW their parent), not applied to the join's output — a
    // hoisted probe would defeat the scan-side prefilter entirely
    val filterIdx = plan.indexOf("might_contain")
    val semiIdx = plan.indexOf("LeftSemi")
    assert(filterIdx >= 0 && semiIdx >= 0,
      s"expected both bloom filter and semi join in:\n$plan")
    assert(filterIdx > semiIdx,
      s"bloom probe rendered above the semi join — no longer scan-side:\n$plan")
  }

  test("w8 windowed distinct: both windows share one exchange on l_partkey") {
    val plan = SparkEntry.queries("w8_window_distinct")(spark, sf)
      .queryExecution.executedPlan.toString
    // dense_rank and max windows share the same partitioning; the
    // distinct and output sort add their own exchanges, but only ONE
    // hashpartitioning(l_partkey) pair feeds the two windows
    assert("Exchange hashpartitioning\\(l_partkey".r.findAllIn(plan).size == 1,
      s"window partition duplicated in:\n$plan")
  }

  test("ts1 gap-fill: windows and joins stay keyed per user (no single partition)") {
    val plan = SparkEntry.queries("ts1_gapfill_resample")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition, ENSURE"),
      s"gap-fill collapsed to a single reducer:\n$plan")
  }

  test("q6b: all three predicates reach the parquet scan") {
    val qe = SparkEntry.queries("q6b_forecast_revenue")(spark, sf).queryExecution
    // the rendered plan truncates PushedFilters at 100 chars — read the
    // scan node's metadata instead
    val pushed = qe.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metadata("PushedFilters")
    }.mkString
    for (c <- Seq("GreaterThanOrEqual(l_shipdate", "LessThanOrEqual(l_discount", "LessThan(l_quantity"))
      assert(pushed.contains(c), s"$c not pushed; $pushed")
    val plan = qe.executedPlan.toString
    assert(shuffles(plan) == 0, s"single-scan agg should not hash-shuffle:\n$plan")
  }

  test("q7b: both nation aliases and the dims broadcast; one fact shuffle pair at most") {
    val plan = SparkEntry.queries("q7b_volume_shipping")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4,
      s"expected >=4 broadcast joins (supplier, nation x2, customer):\n$plan")
    assert(!plan.contains("SortMergeJoin") ||
      "SortMergeJoin".r.findAllIn(plan).size <= 1,
      s"more than the lineitem-orders join merged:\n$plan")
  }

  test("o4 keyset page: the seek prefix conjunct reaches the scan; limited sort") {
    val qe = SparkEntry.queries("o4_keyset_page")(spark, sf).queryExecution
    val pushed = qe.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metadata("PushedFilters")
    }.mkString
    assert(pushed.contains("GreaterThanOrEqual(o_orderdate"),
      s"seek prefix not pushed: $pushed")
    // pagination must plan as TakeOrderedAndProject, not a full global sort
    assert(qe.executedPlan.toString.contains("TakeOrderedAndProject"),
      s"expected top-k plan:\n${qe.executedPlan}")
  }

  test("pmi1: totals broadcast as single-row relations, vocabulary joins stay keyed") {
    val plan = SparkEntry.queries("pmi1_collocations")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size == 2,
      s"expected exactly the two single-row total cross joins:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unbroadcast cross join:\n$plan")
  }

  test("e3d/e3e: the ADC table rides a broadcast join, codes are never re-shuffled wide") {
    for (q <- Seq("e3d_pq_adc", "e3e_ivfpq")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$q: ADC lookup table must broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q: cartesian in plan:\n$plan")
    }
  }

  test("pipe4: container ingest feeds one keyed stack — no cartesian, keyed mask join") {
    val plan = SparkEntry.queries("pipe4_tiff_stack")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"pipe4 must join mask and bands on keys only:\n$plan")
  }

  test("bm25: corpus occurrences are broadcast-restricted to query terms BEFORE any exchange") {
    val q = SparkEntry.queries("bm25_1_ranked_retrieval")(spark, sf)
    q.collect() // finalize adaptive plan
    val plan = q.queryExecution.executedPlan.toString
    // the query-vocabulary restriction and the df/qterm lookups are all
    // broadcast joins; the only wide exchanges are the post-restriction
    // aggregations and the k-capped ranking — never the raw corpus
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      s"vocab/df/qterm joins must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in bm25 plan:\n$plan")
    // the documents scan must feed a broadcast join before reaching any
    // hash exchange: no exchange may carry the full tokenized corpus —
    // check that no SortMergeJoin appears anywhere (corpus-side merge
    // join would mean the posting table shuffled pre-restriction)
    assert(!plan.contains("SortMergeJoin"), s"corpus-side merge join:\n$plan")
  }

  test("qc1 margin scoring is a zero-shuffle projection up to the census agg") {
    val docs = Tables.documents(spark, sf)
    val scored = Curation.hashedLinearScore(docs)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"inference must not shuffle:\n$plan")
    // margin must be evaluated ONCE: the staging projection survives
    // CollapseProject (non-cheap fold referenced twice)
    assert("aggregate\\(".r.findAllIn(plan.toLowerCase).size <= 2,
      s"margin fold inlined more than once:\n$plan")
  }

  test("passageDupStats: exactly two hash exchanges (gram window + per-doc agg)") {
    val plan = Curation.passageDupStats(Tables.documents(spark, sf), ngramK = 5)
      .queryExecution.executedPlan.toString
    assert(shuffles(plan) == 2, s"expected exactly 2 shuffles:\n$plan")
    // both window functions share the gram exchange AND its sort: at most
    // one Sort below the windows
    assert("Sort ".r.findAllIn(plan).size <= 1,
      s"second window must reuse the (gram, doc) sort:\n$plan")
  }

  test("stripBoilerplateLines: exactly two hash exchanges, no distinct expand") {
    val lined = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.expr("replace(text, ' the ', char(10))").as("text"))
    val plan = Curation.stripBoilerplateLines(lined, minDocFreq = 3)
      .queryExecution.executedPlan.toString
    assert(shuffles(plan) == 2, s"expected exactly 2 shuffles:\n$plan")
    assert(!plan.contains("Expand"), s"distinct expand crept in:\n$plan")
    // both windows share the norm exchange AND its (norm, doc) sort
    assert("Sort ".r.findAllIn(plan).size <= 1,
      s"second window must reuse the (norm, doc) sort:\n$plan")
  }

  test("retentionCohorts: no countDistinct expand, windows stay cohort-partitioned") {
    val plan = SparkEntry.queries("cohort1_retention")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"distinct expand crept in:\n$plan")
    assert(!plan.contains("Exchange SinglePartition") ||
      plan.contains("rangepartitioning"), s"single-reducer window:\n$plan")
  }
}
