package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bigramPmi: exact fixed-point PMI; 1-token and empty docs add no bigrams") {
    val docs = Seq("new york is big", "new york wins", "big apple", "solo", "")
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val out = Curation.bigramPmi(docs, minCount = 2).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) == ("new", "york", 2L))
    // unigrams: 4+3+2+1+1 (split("") is [""]) = 11; bigrams: 3+2+1 = 6
    val expect = math.floor(
      math.log((2.0 * 11 * 11) / (6.0 * 2 * 2)) * 1048576).toLong
    assert(r.getLong(3) == expect)
  }

  test("gramNovelty: fraction of distinct grams unseen in the reference") {
    val ref = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c x"),   // grams {a b c, b c x} → 1 of 2 novel
      (2L, "z z z z"),   // distinct grams {z z z} → fully novel
      (3L, "a b c d"),   // identical to the reference → 0 novel
      (4L, "hi")         // short doc: one whole-text gram, novel
    ).toDF("doc_id", "text")
    val out = Curation.gramNovelty(docs, ref, ngramK = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((1L, 1L, 1.0)))
    assert(out(3L) == ((2L, 0L, 0.0)))
    assert(out(4L) == ((1L, 1L, 1.0)))
  }

  test("tokenEntropy: zero for constant docs, max for all-distinct, layout-proof") {
    val docs = Seq(
      (1L, "x x x x"),       // one token type → entropy 0
      (2L, "a b c d"),       // uniform over 4 → entropy = ln 4 (fixed-pointed)
      (3L, "a a b b")        // uniform over 2 → ln 2
    ).toDF("doc_id", "text")
    val out = Curation.tokenEntropy(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((4L, 0L)))
    val lp4 = math.floor(math.log(0.25) * 1048576).toLong
    assert(out(2L) == ((4L, -4L * lp4)))
    val lp2 = math.floor(math.log(0.5) * 1048576).toLong
    assert(out(3L) == ((4L, -4L * lp2)))
    // integer arithmetic ⇒ identical under any partition layout
    val re = Curation.tokenEntropy(docs.repartition(5))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(re == out)
  }

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

  test("decontaminate drops exactly the docs sharing an n-gram with the eval set") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),     // shares "quick brown fox" with eval
      (2L, "a slow brown fox sits"),          // no shared 3-gram
      (3L, "the quick brown cat sleeps"),     // "the quick brown" shared
      (4L, "completely unrelated words here") // clean
    ).toDF("doc_id", "text")
    val evalSet = Seq((100L, "quick brown fox and the quick brown dog"))
      .toDF("doc_id", "text")
    val kept = Curation.decontaminate(docs, evalSet, ngramK = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L))
  }

  test("decontaminate with the eval set drawn from docs drops the eval members") {
    val docs = (1L to 20L).map(i => (i, s"unique text body number $i")).toDF("doc_id", "text")
    val kept = Curation.decontaminate(docs, docs.filter($"doc_id" % 5 === 0), ngramK = 3)
      .select("doc_id").as[Long].collect().toSet
    // docs share the "unique text body" gram with eval members → all dropped
    assert(kept.isEmpty)
    // fully distinct texts: only the eval members themselves drop
    val docs2 = (1L to 20L).map(i => (i, s"a$i b$i c$i d$i")).toDF("doc_id", "text")
    val kept2 = Curation.decontaminate(docs2, docs2.filter($"doc_id" % 5 === 0), ngramK = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == (1L to 20L).filterNot(_ % 5 == 0).toSet)
  }

  test("stratifiedSample is deterministic and respects 0/100 rates") {
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "A" else "B")).toDF("id", "s")
    val a = Curation.stratifiedSample(df, $"id", $"s", Map("A" -> 0), defaultPct = 100)
      .select("id").as[Long].collect().toSet
    assert(a == (1L to 400L).filter(_ % 2 == 1).toSet) // A all dropped, B all kept
    val b1 = Curation.stratifiedSample(df, $"id", $"s", Map("A" -> 30), defaultPct = 70)
      .select("id").as[Long].collect().toSet
    val b2 = Curation.stratifiedSample(df.orderBy($"id".desc), $"id", $"s", Map("A" -> 30), defaultPct = 70)
      .select("id").as[Long].collect().toSet
    assert(b1 == b2) // row order / partitioning can't move the sample
    val aRate = b1.count(_ % 2 == 0) / 200.0
    val bRate = b1.count(_ % 2 == 1) / 200.0
    assert(aRate > 0.15 && aRate < 0.45, s"A rate $aRate far from 30%")
    assert(bRate > 0.55 && bRate < 0.85, s"B rate $bRate far from 70%")
  }

  test("qualityGate: each rule fires, first-failing-rule precedence") {
    val okText = "the and of to in is that" // ratio 1 → quality 0.535, guess en
    val docs = Seq(
      (1L, okText, "en"),                          // passes everything
      (2L, "zz yy", "en"),                         // quality 0.01 → low_quality
      (3L, okText, "de"),                          // guess en ≠ de → lang_mismatch
      (4L, "the and the and the and the and", "en"), // dup2 = 1 → repetitive
      (5L, "zz yy", "de"),                         // fails quality AND lang; quality wins
      (6L, null, "en"),                            // NULL text fails closed
      (7L, okText, null)                           // NULL lang cannot match any guess
    ).toDF("doc_id", "text", "lang")
    val out = Curation.qualityGate(docs).select("doc_id", "keep", "reason")
      .orderBy("doc_id").as[(Long, Boolean, String)].collect()
    assert(out(0) == ((1L, true, "ok")))
    assert(out(1) == ((2L, false, "low_quality")))
    assert(out(2) == ((3L, false, "lang_mismatch")))
    assert(out(3) == ((4L, false, "repetitive")))
    assert(out(4) == ((5L, false, "low_quality")))
    assert(out(5) == ((6L, false, "low_quality")))
    assert(out(6) == ((7L, false, "lang_mismatch")))
  }

  test("chunkByTokens: boundaries, overlap, and the kept partial tail") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "a b"))
      .toDF("doc_id", "text")
    val out = Curation.chunkByTokens(docs, chunkTokens = 4, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Int, String, Long)].collect()
    // doc 1: starts 0,3,6,9 → windows of 4 tokens, last is the 1-token tail
    assert(out(0) == ((1L, 0, "t1 t2 t3 t4", 4L)))
    assert(out(1) == ((1L, 1, "t4 t5 t6 t7", 4L)))
    assert(out(2) == ((1L, 2, "t7 t8 t9 t10", 4L)))
    assert(out(3) == ((1L, 3, "t10", 1L)))
    // doc 2 shorter than one chunk: single partial chunk
    assert(out(4) == ((2L, 0, "a b", 2L)))
    assert(out.length == 5)
  }

  test("passageDupStats: shared passages counted once, multiplicity in frac") {
    val docs = Seq(
      (1L, "a b c d e f"),             // grams: [a b c d e], [b c d e f]
      (2L, "a b c d e x"),             // shares "a b c d e" with 1 and 4
      (3L, "p q r s t u"),             // fully private
      (4L, "a b c d e a b c d e")      // "a b c d e" occurs twice (pos 1, 6)
    ).toDF("doc_id", "text")
    val out = Curation.passageDupStats(docs, ngramK = 5)
      .orderBy("doc_id")
      .as[(Long, Double, Long)].collect()
    assert(out(0) == ((1L, 0.5, 1L)))       // 1 of 2 occurrences shared
    assert(out(1) == ((2L, 0.5, 1L)))
    assert(out(2) == ((3L, 0.0, 0L)))
    assert(out(3)._1 == 4L)
    assert(out(3)._2 == 2.0 / 6.0)          // 2 shared occurrences of 6
    assert(out(3)._3 == 1L)                 // but only one distinct shared gram
  }

  test("stripRepeatedSpans removes exactly the covered tokens, keeps order") {
    val docs = Seq(
      (1L, "a b c d e x y z"),   // shares gram [a b c d e] with doc 2
      (2L, "p a b c d e q r"),   // same gram at pos 1
      (3L, "u v w x y z t s")    // private text, untouched
    ).toDF("doc_id", "text")
    val out = Curation.stripRepeatedSpans(docs, ngramK = 5)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    // doc 1: positions 0-4 covered → "x y z" survives
    assert(out(0) == ((1L, "x y z", 3L, 5L)))
    // doc 2: positions 1-5 covered → "p q r" survives
    assert(out(1) == ((2L, "p q r", 3L, 5L)))
    assert(out(2) == ((3L, "u v w x y z t s", 8L, 0L)))
  }

  test("stripRepeatedSpans keeps fully-stripped docs as empty rows") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e")          // exact dup of 1 → both fully covered
    ).toDF("doc_id", "text")
    val out = Curation.stripRepeatedSpans(docs, ngramK = 5)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, "", 0L, 5L), (2L, "", 0L, 5L)))
  }

  test("stripRepeatedSpans merges overlapping repeated grams into one span") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // grams [a..e] (pos0) and [b..f] (pos1) repeated
      (2L, "a b c d e f z z z z")  // shares both grams
    ).toDF("doc_id", "text")
    val out = Curation.stripRepeatedSpans(docs, ngramK = 5)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    // doc1: pos 0-5 covered (union of [0,4] and [1,5]) → "g h i j"
    assert(out(0) == ((1L, "g h i j", 4L, 6L)))
    assert(out(1)._4 == 6L)
  }

  test("weightedSample rejects zero/negative/null weights instead of silently inverting") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = Seq((1L, 2.0, "s"), (2L, 0.0, "s"), (3L, 5.0, "s"))
      .toDF("id", "w", "src")
    def mentions(t: Throwable): Boolean =
      t != null && (String.valueOf(t.getMessage).contains("weight must be > 0") || mentions(t.getCause))
    val e = intercept[Exception] {
      Curation.weightedSample(docs, col("id"), col("w"), Seq(col("src")), k = 2).collect()
    }
    assert(mentions(e))
    val neg = Seq((1L, 2.0, "s"), (2L, -1.0, "s")).toDF("id", "w", "src")
    val e2 = intercept[Exception] {
      Curation.weightedSample(neg, col("id"), col("w"), Seq(col("src")), k = 1).collect()
    }
    assert(mentions(e2))
    // all-positive weights still sample fine
    val ok = Curation.weightedSample(docs.filter(col("w") > 0), col("id"),
      col("w"), Seq(col("src")), k = 1).collect()
    assert(ok.length == 1)
  }

  test("stripBoilerplateLines: cross-doc lines drop, blanks and order survive") {
    val docs = Seq(
      (1L, "unique one\nCookie Notice\n\nbody text a\nall rights reserved"),
      (2L, "cookie notice \nbody text b\nAll Rights Reserved"),
      (3L, "COOKIE NOTICE\nunique three\nall rights reserved"),
      (4L, "totally unique\n\n")
    ).toDF("doc_id", "text")
    val out = Curation.stripBoilerplateLines(docs, minDocFreq = 3)
      .orderBy("doc_id").collect()
    // "cookie notice" (3 docs, case/space-insensitive) and "all rights
    // reserved" (3 docs) are boilerplate; everything else survives in order
    assert(out(0).getString(1) == "unique one\n\nbody text a")
    assert(out(0).getLong(2) == 2)
    assert(out(1).getString(1) == "body text b")
    assert(out(1).getLong(2) == 2)
    assert(out(2).getString(1) == "unique three")
    assert(out(2).getLong(2) == 2)
    // blanks are never boilerplate even though they appear in 2+ docs
    assert(out(3).getString(1) == "totally unique\n\n")
    assert(out(3).getLong(2) == 0)
  }

  test("hashedLinearScore: margin equals the sum of per-token hash weights, keeps caller columns") {
    import graft.functions.TextOps
    val docs = Seq((1L, "alpha beta alpha", "s0"), (2L, "gamma", "s1"))
      .toDF("doc_id", "text", "source")
    val out = Curation.hashedLinearScore(docs).orderBy("doc_id").collect()
    // caller columns survive (the qualityGate convention)
    assert(out.head.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "source", "margin", "predicted_keep"))
    // replicate the weights independently: w(t) = H_7(t) % 2001 - 1000
    def w(t: String): Long = {
      val h = docs.sparkSession.range(1)
        .select(TextOps.seededHash(lit(t), 7)).head().getLong(0)
      h % 2001 - 1000
    }
    assert(out(0).getAs[Long]("margin") == 2 * w("alpha") + w("beta"))
    assert(out(1).getAs[Long]("margin") == w("gamma"))
    out.foreach(r =>
      assert(r.getAs[Boolean]("predicted_keep") == (r.getAs[Long]("margin") >= 0)))
  }

  test("hashedLinearScore: NULL text coalesces to margin 0 / keep=true (the oracle contract)") {
    // the qc1 oracle coalesces list_sum(NULL) to 0 — a NULL document must
    // score margin 0 / keep=true, not NULL. ("" is NOT special: both
    // engines tokenize it to [''] and score that token's hash weight.)
    val docs = Seq((1L, null: String, "s0"), (2L, "alpha", "s0"))
      .toDF("doc_id", "text", "source")
    val out = Curation.hashedLinearScore(docs).orderBy("doc_id").collect()
    assert(!out(0).isNullAt(out(0).fieldIndex("margin")))
    assert(out(0).getAs[Long]("margin") == 0L)
    assert(out(0).getAs[Boolean]("predicted_keep"))
  }

  test("dsirResample: weights match a local replay; selection is deterministic") {
    val docs = Seq(
      (1L, "ml training data pipeline", "en"),
      (2L, "ml ml models training", "en"),
      (3L, "der hund und die katze", "de"),
      (4L, "la casa de la playa", "es"),
      (5L, "training data for ml", "en"),
      (6L, "und der baum und der wald", "de")
    ).toDF("doc_id", "text", "lang")
    val got = Curation.dsirResample(docs, col("lang") === "en", k = 3)
      .orderBy("doc_id").collect()
    assert(got.length == 3)
    // local replay of the weight arithmetic (same smoothing, same 2^20 floor)
    val rows = Seq(
      1L -> ("ml training data pipeline", true),
      2L -> ("ml ml models training", true),
      3L -> ("der hund und die katze", false),
      4L -> ("la casa de la playa", false),
      5L -> ("training data for ml", true),
      6L -> ("und der baum und der wald", false))
    val terms = rows.flatMap { case (id, (t, tgt)) => t.split(" ", -1).map(w => (id, tgt, w)) }
    val tr = terms.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tt = terms.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nRaw = terms.size.toLong
    val nTgt = terms.count(_._2).toLong
    val v = tr.size.toLong
    val lrFp = tr.map { case (term, raw) =>
      term -> math.floor((math.log((tt.getOrElse(term, 0L) + 1).toDouble / (nTgt + v)) -
        math.log(raw.toDouble / nRaw)) * 1048576L).toLong
    }
    val wFp = rows.map { case (id, (t, _)) =>
      id -> t.split(" ", -1).map(lrFp).sum
    }.toMap
    got.foreach { r =>
      assert(r.getAs[Long]("w_fp") == wFp(r.getLong(0)), s"doc ${r.getLong(0)}")
      assert(r.getAs[Long]("key_fp") == r.getAs[Long]("w_fp") + r.getAs[Long]("gumbel_fp"))
    }
    // deterministic under repartition + rerun
    val again = Curation.dsirResample(docs.repartition(5), col("lang") === "en", k = 3)
      .orderBy("doc_id").collect()
    assert(again.map(_.getLong(0)).toSeq == got.map(_.getLong(0)).toSeq)
    assert(again.map(_.getAs[Long]("key_fp")).toSeq == got.map(_.getAs[Long]("key_fp")).toSeq)
    // k caps the sample; k must be positive
    assert(Curation.dsirResample(docs, col("lang") === "en", k = 100).count() == 6)
    intercept[IllegalArgumentException] {
      Curation.dsirResample(docs, col("lang") === "en", k = 0)
    }
  }
}
