package graft

import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 incremental-ingest surface: repeated-span census and the
  * persisted dedup index probe.
  */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- repeatedSpanStats -------------------------------------------------

  test("repeatedSpanStats finds the shared span in both docs") {
    // docs share the 5-gram "a b c d e" (tokens 0-4 in doc 1, 2-6 in doc 2)
    val docs = Seq(
      (1L, "a b c d e x1 y1 z1 w1"),
      (2L, "p2 q2 a b c d e r2 s2")
    ).toDF("doc_id", "text")
    val r = Curation.repeatedSpanStats(docs, ngramK = 5).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getAs[Long]("n_spans"), x.getAs[Long]("repeated_tokens")))
    assert(r.toSeq === Seq((1L, 1L, 5L), (2L, 1L, 5L)))
  }

  test("repeatedSpanStats merges overlapping repeats and splits at gap > k") {
    // doc 10 repeats doc 11's full text twice with a large unique middle:
    // two separate spans, each 6 tokens (two overlapping 5-grams).
    val shared = "a b c d e f" // two 5-grams, starts 0 and 1 → one merged 6-token span
    val docs = Seq(
      (10L, s"$shared u1 u2 u3 u4 u5 u6 u7 $shared"),
      (11L, shared)
    ).toDF("doc_id", "text")
    val r = Curation.repeatedSpanStats(docs, ngramK = 5).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getAs[Long]("n_spans"), x.getAs[Long]("repeated_tokens")))
    assert(r.toSeq === Seq((10L, 2L, 12L), (11L, 1L, 6L)))
  }

  test("repeatedSpanStats emits nothing for an all-unique corpus") {
    val docs = Seq((1L, "a b c d e"), (2L, "f g h i j")).toDF("doc_id", "text")
    assert(Curation.repeatedSpanStats(docs, ngramK = 5).count() === 0L)
  }

  // --- dedup index -------------------------------------------------------

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_incspec").toString + "/idx"

  test("dedupAgainstIndex drops exact and fuzzy corpus duplicates, keeps novel docs") {
    val corpus = Seq(
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (4L, "completely different corpus content with many unique words here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // exact dup of 2
      (3L, "the quick brown fox jumps over the lazy dog tonight"), // fuzzy dup of 2
      (5L, "novel text that shares nothing at all with anything indexed")
    ).toDF("doc_id", "text")
    val dir = tmpDir()
    Dedup.writeDedupIndex(corpus, dir)
    val kept = Dedup.dedupAgainstIndex(spark, batch, dir, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(5L))
  }

  test("index probe decision matches the from-scratch cross-side dedup") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val dir = tmpDir()
    Dedup.writeDedupIndex(corpus, dir)
    val viaIndex = Dedup.dedupAgainstIndex(spark, batch, dir, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // from scratch: candidates from the union-side LSH restricted to
    // batch×corpus pairs, then the same verify threshold
    val pairs = Dedup.fuzzyDupPairs(docs, threshold = 0.5)
    val crossDropped = pairs
      .select(col("a"), col("b"))
      .unionByName(pairs.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") % 2 === 1 && col("b") % 2 === 0)
      .select(col("a").as("doc_id")).distinct()
    val exactDropped = batch.alias("n")
      .join(corpus.alias("c"), col("n.text") === col("c.text"), "left_semi")
      .select(col("doc_id"))
    val expected = batch.join(crossDropped.unionByName(exactDropped).distinct(),
        Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(viaIndex === expected)
  }

  test("appendToDedupIndex closes the loop: admitted docs block the next batch") {
    val corpus = Seq((2L, "original corpus document with plenty of distinct words")).toDF("doc_id", "text")
    val batch1 = Seq((5L, "a freshly admitted document nothing like the corpus")).toDF("doc_id", "text")
    val batch2 = Seq(
      (9L, "a freshly admitted document nothing like the corpus"), // exact dup of admitted 5
      (11L, "still another novel document unlike anything before")
    ).toDF("doc_id", "text")
    val dir = tmpDir()
    Dedup.writeDedupIndex(corpus, dir)
    val admitted = Dedup.dedupAgainstIndex(spark, batch1, dir, threshold = 0.5)
    assert(admitted.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(5L))
    Dedup.appendToDedupIndex(admitted, dir)
    val kept2 = Dedup.dedupAgainstIndex(spark, batch2, dir, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept2 === Seq(11L)) // 9 now blocked by the admitted batch-1 doc
  }

  test("dedupAgainstIndex keeps within-batch duplicates (documented contract)") {
    val corpus = Seq((2L, "indexed corpus content only")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "same new text appearing twice in one batch"),
      (3L, "same new text appearing twice in one batch")
    ).toDF("doc_id", "text")
    val dir = tmpDir()
    Dedup.writeDedupIndex(corpus, dir)
    val kept = Dedup.dedupAgainstIndex(spark, batch, dir, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(1L, 3L)) // batch self-dedup is a separate op
  }
}
