package graft

import graft.operators.{Curation, Profiling}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-order-proofness: the float-bearing aggregations that claim
  * determinism under any partitioning (fixed-point / decimal-exact
  * moment tricks) must return IDENTICAL rows when the input arrives in
  * different partition layouts — not merely close.
  */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def invariant(name: String)(f: DataFrame => DataFrame)(src: DataFrame): Unit = {
    val a = rowsOf(f(src.repartition(3)))
    val b = rowsOf(f(src.repartition(13)))
    assert(a === b, s"$name differs across partition layouts")
    assert(a.nonEmpty, s"$name produced no rows — vacuous invariance")
  }

  test("deterministicShuffle is a true permutation, invariant across layouts, seed-keyed") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    invariant("shuffle")(d =>
      Curation.deterministicShuffle(d, "e1").orderBy("doc_id"))(docs)
    val out = Curation.deterministicShuffle(docs, "e1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // positions are exactly 1..N (a permutation, no gaps or dups)
    assert(out.values.toSeq.sorted == (1L to out.size).toSeq)
    // a different seed is a different permutation (astronomically sure)
    val out2 = Curation.deterministicShuffle(docs, "e2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out != out2)
  }

  test("unigramLogprobScore is identical across partition layouts") {
    invariant("lm")(d => Curation.unigramLogprobScore(d).orderBy("doc_id"))(
      Tables.documents(spark, sf))
  }

  test("exactCorr is identical across partition layouts") {
    invariant("corr")(d => Profiling.exactCorr(d, col("l_quantity"), col("l_extendedprice")))(
      Tables.lineitem(spark, sf))
  }

  test("repeatedSpanStats is identical across partition layouts") {
    invariant("span")(d => Curation.repeatedSpanStats(d, ngramK = 5).orderBy("doc_id"))(
      Tables.documents(spark, sf))
  }

  test("capPerGroup ranking is identical across partition layouts") {
    invariant("cap") { d =>
      val scored = d.select(col("doc_id"), col("source"),
        functions.TextOps.qualityScore(col("text")).as("q"))
      Curation.capPerGroup(scored, Seq(col("source")), col("q"), col("doc_id"), k = 5)
        .select("source", "doc_id", "rn")
    }(Tables.documents(spark, sf))
  }
}
