package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches within maxDist under the blocking contract") {
    val probes = Seq((1L, "chocolate"), (2L, "vanilla"), (3L, "straberry"))
      .toDF("pid", "pname")
    val cands = Seq((10L, "chocolate"), (11L, "chocolates"), (12L, "strawberry"),
      (13L, "vanilla"), (14L, "vanillla"), (15L, "pistachio"))
      .toDF("cid", "cname")
    val m = FuzzyJoin.blockedLevenshtein(probes, cands, "pname", "cname", maxDist = 2)
      .select("pid", "cid", "edit_dist").orderBy("pid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(m == Seq((1L, 10L, 0), (1L, 11L, 1), (2L, 13L, 0), (2L, 14L, 1),
      (3L, 12L, 1)))
  }

  test("edits inside the blocking prefix do not match (documented recall bound)") {
    val probes = Seq((1L, "Xhocolate")).toDF("pid", "pname") // first char edited
    val cands = Seq((10L, "chocolate")).toDF("cid", "cname")
    val m = FuzzyJoin.blockedLevenshtein(probes, cands, "pname", "cname", maxDist = 2)
    assert(m.count() == 0, "prefix-breaking edit must fall outside the block")
  }

  test("length difference beyond maxDist is excluded by the band key") {
    val probes = Seq((1L, "abc")).toDF("pid", "pname")
    val cands = Seq((10L, "abcdef")).toDF("cid", "cname") // dist 3, len diff 3
    val m = FuzzyJoin.blockedLevenshtein(probes, cands, "pname", "cname", maxDist = 2)
    assert(m.count() == 0)
  }

  test("each matching pair appears exactly once despite band replication") {
    val probes = Seq((1L, "abcd")).toDF("pid", "pname")
    val cands = Seq((10L, "abcd"), (11L, "abcde"), (12L, "abc")).toDF("cid", "cname")
    val m = FuzzyJoin.blockedLevenshtein(probes, cands, "pname", "cname", maxDist = 2)
    assert(m.count() == 3)
    assert(m.select("cid").distinct().count() == 3)
  }

  test("rejects colliding column names") {
    val df = Seq((1L, "a")).toDF("id", "name")
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.blockedLevenshtein(df, df, "name", "name", maxDist = 1)
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("the join is an equi-join on the block key (no cartesian in the plan)") {
    val probes = Seq((1L, "abcd")).toDF("pid", "pname")
    val cands = Seq((10L, "abcf")).toDF("cid", "cname")
    val plan = FuzzyJoin.blockedLevenshtein(probes, cands, "pname", "cname", maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"expected a hash/merge equi-join, got:\n$plan")
  }
}
