package graft

import graft.operators.{Curation, Profiling, Sketches}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfilingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("tableProfile counts rows, nulls, distincts, min/max in one pass") {
    val df = Seq(
      (1L, Some("en"), 10), (2L, Some("de"), 20), (3L, None, 20), (4L, Some("en"), 30)
    ).toDF("id", "lang", "n")
    val r = Profiling.tableProfile(df, Seq("lang", "n")).head()
    assert(r.getAs[Long]("n_rows") === 4L)
    assert(r.getAs[Long]("lang_nulls") === 1L)
    assert(r.getAs[Long]("lang_distinct") === 2L) // countDistinct skips NULL
    assert(r.getAs[String]("lang_min") === "de")
    assert(r.getAs[String]("lang_max") === "en")
    assert(r.getAs[Long]("n_nulls") === 0L)
    assert(r.getAs[Long]("n_distinct") === 3L)
    assert(r.getAs[Int]("n_min") === 10)
    assert(r.getAs[Int]("n_max") === 30)
  }

  test("tableProfile approx path stays single-aggregate and close to exact") {
    val docs = Tables.documents(spark, sf)
    val exact = Profiling.tableProfile(docs, Seq("source")).head().getAs[Long]("source_distinct")
    val approx = Profiling.tableProfile(docs, Seq("source"), exact = false)
      .head().getAs[Long]("source_distinct")
    assert(math.abs(approx - exact).toDouble / exact < 0.1, s"approx=$approx exact=$exact")
  }

  test("histogram uses floor buckets (negatives land below zero)") {
    val df = Seq(-51L, -50L, -1L, 0L, 49L, 50L, 99L).toDF("v")
    val r = Profiling.histogram(df, col("v"), 50).collect()
      .map(x => x.getAs[Long]("bucket_lo") -> x.getAs[Long]("n")).toMap
    assert(r === Map(-100L -> 1L, -50L -> 2L, 0L -> 2L, 50L -> 2L))
  }

  test("histogram rejects non-positive width") {
    val df = Seq(1L).toDF("v")
    intercept[IllegalArgumentException](Profiling.histogram(df, col("v"), 0))
  }

  test("equiDepthHistogram: balanced buckets, ties split deterministically") {
    // 100 rows, 60 of them the tied value 5 — equi-width piles them in
    // one bar; equi-depth must split the tie run across buckets, with
    // membership fixed by the (value, id) total order
    val df = ((1 to 40).map(i => (i.toLong, i.toDouble * 10)) ++
      (41 to 100).map(i => (i.toLong, 5.0))).toDF("id", "v")
    val h = graft.operators.Profiling
      .equiDepthHistogram(df, col("v"), Seq(col("id")), buckets = 10)
      .collect()
    assert(h.length == 10)
    assert(h.forall(_.getAs[Long]("n") == 10L)) // 100 rows / 10 buckets exactly
    // the 60 tied rows fill the first 6 buckets: lo = hi = 5.0
    assert(h.take(6).forall(r => r.getAs[Double]("lo") == 5.0 && r.getAs[Double]("hi") == 5.0))
    // rerun is bit-identical (deterministic tie order)
    val h2 = graft.operators.Profiling
      .equiDepthHistogram(df.repartition(7), col("v"), Seq(col("id")), buckets = 10)
      .collect()
    assert(h.map(_.toSeq).toSeq == h2.map(_.toSeq).toSeq)
  }

  test("bloom filter has no false negatives over real grams") {
    val docs = Tables.documents(spark, sf).limit(50)
    val grams = docs.select(explode(functions.TextOps.shingles(
      functions.TextOps.tokens(col("text")), 3)).as("g")).distinct()
    val n = grams.count()
    val bloom = Sketches.buildBloom(grams, col("g"), n, fpp = 0.01)
    val misses = grams.filter(!Sketches.mightContain(bloom, col("g"))).count()
    assert(misses === 0L, s"bloom dropped $misses of $n inserted grams")
  }

  test("decontaminateBloom result is identical to exact decontaminate") {
    val docs = Tables.documents(spark, sf)
    val eval = docs.filter(col("doc_id") % 97 === 0)
    val exact = Curation.decontaminate(docs, eval, ngramK = 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val sketch = Curation.decontaminateBloom(docs, eval, ngramK = 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(sketch === exact)
  }

  test("capPerGroup keeps at most k per group, best-first, deterministic ties") {
    val df = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.9), ("a", 3L, 0.5), ("a", 4L, 0.1),
      ("b", 5L, 0.7)
    ).toDF("g", "id", "q")
    val kept = Curation.capPerGroup(df, Seq(col("g")), col("q"), col("id"), k = 2)
      .select("g", "id", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    // tie at q=0.9 breaks to the lower id first
    assert(kept === Seq(("a", 1L, 1), ("a", 2L, 2), ("b", 5L, 1)))
  }
}
