package graft

import graft.functions.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token/bpeish counts and mean length (E4)") {
    val df = Seq("hello world abc", "x").toDF("t")
    val out = df.select(
      TextOps.tokenCount($"t").as("n"),
      TextOps.bpeishCount($"t").as("b"),
      TextOps.meanTokenLen($"t").as("m")).collect()
    assert(out(0).getInt(0) == 3)
    assert(out(0).getInt(1) == 3)
    assert(out(0).getDouble(2) == (15.0 - 2) / 3)
    assert(out(1).getInt(0) == 1 && out(1).getDouble(2) == 1.0)
  }

  test("bpeish splits mixed alnum/symbol runs") {
    val df = Seq("abc123 x-y!").toDF("t")
    // abc, 123, x, -, y, !
    assert(df.select(TextOps.bpeishCount($"t")).as[Int].head() == 6)
  }

  test("fingerprint is permutation- and multiplicity-invariant (E1b)") {
    val df = Seq("a b c", "c b a a", "a b d").toDF("t")
    val fps = df.select(TextOps.fingerprint($"t")).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("simhash16 stays in 16-bit range and is deterministic (E6)") {
    val df = Seq("spark scala engine", "spark scala engine", "other words here").toDF("t")
    val hs = df.select(TextOps.simhash16($"t")).as[Long].collect()
    assert(hs.forall(h => h >= 0 && h < 65536))
    assert(hs(0) == hs(1))
  }

  test("langGuess picks max stopword hits, tie → lexicographically first lang (E5)") {
    val en = Seq("the cat and the dog is here").toDF("t")
    assert(en.select(TextOps.langGuess($"t")).as[String].head() == "en")
    val de = Seq("der hund und die katze ist hier").toDF("t")
    assert(de.select(TextOps.langGuess($"t")).as[String].head() == "de")
    // no stopwords at all → all scores 0 → 'de' (first lang code)
    val none = Seq("xyzzy plugh").toDF("t")
    assert(none.select(TextOps.langGuess($"t")).as[String].head() == "de")
  }

  test("shingles: k-grams in order; short docs collapse to whole text (E2)") {
    val df = Seq("a b c d", "a b").toDF("t")
    val out = df.select(TextOps.shingles(TextOps.tokens($"t")).as("s")).as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq("a b"))
  }

  test("hexVal parses hex prefixes like the oracle formula") {
    val df = Seq("ff00", "0a1b").toDF("h")
    val out = df.select(TextOps.hexVal($"h", 4).as("v")).as[Long].collect()
    assert(out(0) == 0xff00L)
    assert(out(1) == 0x0a1bL)
  }

  test("qualityScore in [0,1] and monotone in stopword signal (E4)") {
    val df = Seq("the of and in to is that", "zz yy xx ww vv uu tt").toDF("t")
    val q = df.select(TextOps.qualityScore($"t")).as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(1))
  }

  test("repetitionCounts: hand-computed runs over sorted bigrams") {
    // "a b a b a" → bigrams [a b, b a, a b, b a]: both grams repeat (len 3,
    // count 2 → 6 chars each); tot=12, dup=12, best=6.
    // "x y z w" → 3 unique bigrams: tot=9, dup=0, best=3.
    // "q q q q" → "q q"×3: tot=9, dup=9, best=9.
    // "solo" (shorter than n) → whole text as the single gram: tot=4.
    val df = Seq("a b a b a", "x y z w", "q q q q", "solo").toDF("t")
    val out = df
      .select(sort_array(TextOps.shingles(TextOps.tokens($"t"), 2)).as("g"))
      .select(TextOps.repetitionCounts($"g").as("r"))
      .select($"r.dup", $"r.best", $"r.tot")
      .as[(Long, Long, Long)].collect()
    assert(out(0) == ((12L, 6L, 12L)))
    assert(out(1) == ((0L, 3L, 9L)))
    assert(out(2) == ((9L, 9L, 9L)))
    assert(out(3) == ((0L, 4L, 4L)))
  }

  test("repetitionCounts matches explode+groupBy on arbitrary docs") {
    val docs = Seq(
      "the cat sat on the mat the cat sat again",
      "a a a b b c d e f a a a",
      "one two three four five").zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val fold = docs
      .select($"id", sort_array(TextOps.shingles(TextOps.tokens($"t"), 2)).as("g"))
      .select($"id", TextOps.repetitionCounts($"g").as("r"))
      .select($"id", $"r.dup", $"r.best", $"r.tot")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val relational = docs
      .select($"id", explode(TextOps.shingles(TextOps.tokens($"t"), 2)).as("g"))
      .groupBy($"id", $"g").agg(count(lit(1)).as("c"))
      .groupBy($"id")
      .agg(
        sum(when($"c" >= 2, $"c" * length($"g")).otherwise(0L)).as("dup"),
        max($"c" * length($"g")).as("best"),
        sum($"c" * length($"g")).as("tot"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(fold.toSeq == relational.toSeq)
  }

  test("ShinglesExpr matches the HOF spelling on non-null inputs; NULL array stays NULL") {
    import org.apache.spark.sql.functions._
    // the reference spelling ShinglesExpr replaced — the semantic
    // contract for non-null inputs (short doc -> one joined shingle;
    // null ELEMENTS skipped by concat_ws). For a NULL ARRAY the old
    // spelling emitted [''] (legacy size(NULL) = -1 takes the short-doc
    // branch); the expression deliberately propagates NULL instead,
    // matching the DuckDB oracles' string_split(NULL) -> no rows.
    def hofShingles(toks: org.apache.spark.sql.Column, k: Int) =
      when(size(toks) < k, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*)))
    val rows = Seq(
      "a b c d e", "a", "", "x y", "a b b a",
      "one two three four five six seven").toDF("t")
      .select(split($"t", " ").as("toks"))
      .union(spark.sql("SELECT array('a', CAST(NULL AS STRING), 'c') AS toks"))
    for (k <- Seq(1, 2, 3, 5, 8)) {
      val got = rows.select(TextOps.shingles($"toks", k)).collect()
        .map(_.getSeq[String](0).toList)
      val want = rows.select(hofShingles($"toks", k)).collect()
        .map(_.getSeq[String](0).toList)
      assert(got.toSeq == want.toSeq, s"k=$k")
      val nullRow = spark.sql("SELECT CAST(NULL AS ARRAY<STRING>) AS toks")
        .select(TextOps.shingles($"toks", k)).collect()
      assert(nullRow.head.isNullAt(0), s"k=$k: NULL array must stay NULL")
    }
  }
}
