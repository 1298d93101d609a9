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

  test("segmentLevenshtein equals brute force (complete recall, incl. prefix edits)") {
    val probes = Seq((1L, "chocolate"), (2L, "vanilla"), (3L, "straberry"),
      (4L, "Xhocolate") // first-char edit: the blocked form misses this by contract
    ).toDF("pid", "pname")
    val cands = Seq((10L, "chocolate"), (11L, "chocolates"), (12L, "strawberry"),
      (13L, "vanilla"), (14L, "vanillla"), (15L, "pistachio"), (16L, "vanillllla"))
      .toDF("cid", "cname")
    val got = FuzzyJoin.segmentLevenshtein(probes, cands, "pname", "cname", maxDist = 2)
      .select("pid", "cid", "edit_dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force reference on the driver
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val pm = Map(1L -> "chocolate", 2L -> "vanilla", 3L -> "straberry", 4L -> "Xhocolate")
    val cm = Map(10L -> "chocolate", 11L -> "chocolates", 12L -> "strawberry",
      13L -> "vanilla", 14L -> "vanillla", 15L -> "pistachio", 16L -> "vanillllla")
    val brute = (for { (p, ps) <- pm; (c, cs) <- cm; d = lev(ps, cs) if d <= 2 }
      yield (p, c, d)).toSet
    assert(got == brute)
    assert(got.contains((4L, 10L, 1)), "prefix edit must be recalled by segments")
  }

  test("segmentLevenshtein: randomized brute-force equivalence sweep") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcd" // small alphabet forces many near-matches
    def word() = (0 until (3 + rnd.nextInt(10))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val ls = (0 until 60).map(i => (i.toLong, word()))
    val rs = (0 until 60).map(i => (1000L + i, word()))
    val lDf = ls.toDF("pid", "pname")
    val rDf = rs.toDF("cid", "cname")
    for (k <- Seq(1, 2, 3)) {
      val got = FuzzyJoin.segmentLevenshtein(lDf, rDf, "pname", "cname", maxDist = k)
        .select("pid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lev = (a: String, b: String) => {
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val brute = (for { (p, ps) <- ls; (c, cs) <- rs if lev(ps, cs) <= k }
        yield (p, c)).toSet
      assert(got == brute, s"k=$k: missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    }
  }

  test("segmentLevenshtein: tiny probes (shorter than maxDist+1) still match") {
    val probes = Seq((1L, "ab"), (2L, "x")).toDF("pid", "pname")
    val cands = Seq((10L, "abcd"), (11L, "a"), (12L, "xy"), (13L, "abcde")).toDF("cid", "cname")
    val got = FuzzyJoin.segmentLevenshtein(probes, cands, "pname", "cname", maxDist = 2)
      .select("pid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ab: abcd(d2), a(d1), xy(d2); x: a(d1), xy(d1)
    assert(got == Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 11L), (2L, 12L)))
  }

  test("segmentLevenshtein joins are equi-joins (no cartesian in the plan)") {
    val probes = Seq((1L, "abcd")).toDF("pid", "pname")
    val cands = Seq((10L, "abcf")).toDF("cid", "cname")
    val plan = FuzzyJoin.segmentLevenshtein(probes, cands, "pname", "cname", maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"expected hash/merge equi-joins, got:\n$plan")
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
