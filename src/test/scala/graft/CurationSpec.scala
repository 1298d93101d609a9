package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hashSplit is a stable pure function of the id") {
    val docs = (1L to 500L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val a = docs.withColumn("split", Curation.hashSplit(docs, "doc_id"))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // same ids in a different frame (different order, extra rows) → same split
    val docs2 = (500L to 1L by -1L).map(i => (i, "other")).toDF("doc_id", "text")
    val b = docs2.withColumn("split", Curation.hashSplit(docs2, "doc_id"))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // rough proportions (md5 uniformity): train ≈ 80%
    val train = a.values.count(_ == "train")
    assert(train > 340 && train < 460, s"train=$train of 500")
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("packByTokenBudget cuts the virtual token stream at the budget") {
    // docs of 60 tokens each, budget 100: first-token offsets 0,60,120,...
    // → bins 0,0,1,1,2,2,3,... (doc k starts at 60k; bin = floor(60k/100))
    val docs = (0L to 9L).map(i => (i, Seq.fill(60)("w").mkString(" "))).toDF("doc_id", "text")
    val got = Curation.packByTokenBudget(docs,
        graft.functions.TextOps.tokenCount(col("text")), "doc_id", budget = 100)
      .select("doc_id", "bin_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = (0L to 9L).map(k => k -> (60 * k / 100)).toMap
    assert(got == expect)
  }

  test("packByTokenBudget with shardCol packs each shard independently") {
    val docs = (0L to 9L).map(i => (i, i % 2, Seq.fill(60)("w").mkString(" ")))
      .toDF("doc_id", "shard", "text")
    val got = Curation.packByTokenBudget(docs,
        graft.functions.TextOps.tokenCount(col("text")), "doc_id", budget = 100,
        shardCol = Some("shard"))
      .select("doc_id", "bin_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each shard holds 5 docs at offsets 0,60,...,240 → bins 0,0,1,1,2
    val perShardBin = Seq(0L, 0L, 1L, 1L, 2L)
    val expect = (0L to 9L).map(k => k -> perShardBin((k / 2).toInt)).toMap
    assert(got == expect)
  }

  test("topTfidfTerms ranks distinctive terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "common apple apple apple"),
      (2L, "common banana banana"),
      (3L, "common cherry")).toDF("doc_id", "text")
    val got = Curation.topTfidfTerms(docs, k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    // 'common' appears in every doc → idf = ln(1) = 0 → never top-ranked
    assert(got.filter(_._2 == 1).map(t => t._1 -> t._3).toMap ==
      Map(1L -> "apple", 2L -> "banana", 3L -> "cherry"))
    assert(!got.exists { case (_, r, term) => r == 1 && term == "common" })
  }
}
