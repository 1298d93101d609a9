package graft

import graft.operators.MlOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MlOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Linearly separable 2-class data: label 1 iff x > 5. */
  private def separable = (1 to 200).map { i =>
    val x = (i % 10).toDouble
    (x, (i % 7).toDouble, if (x > 5) 1 else 0)
  }.toDF("x", "y", "label")

  test("trainRf + classify recovers a separable rule with high confidence (M1/M2)") {
    val model = MlOps.trainRf(separable, Seq("x", "y"), "label", numTrees = 20, maxDepth = 5)
    val out = MlOps.classify(model, separable)
    val acc = out.filter(col("pred_label") === col("label")).count().toDouble / out.count()
    assert(acc == 1.0)
    val confs = out.select("confidence").as[Double].collect()
    assert(confs.forall(c => c >= 0.0 && c <= 1.0))
    assert(confs.sum / confs.length > 0.9)
  }

  test("forestRules freeze + classifyFromRules replays native inference exactly") {
    // noisy, non-separable labels so leaves carry mixed class counts (the
    // gini inversion actually exercises fractional probabilities)
    val noisy = (1 to 500).map { i =>
      val x = (i % 13).toDouble; val y = (i % 7).toDouble
      (x, y, if ((x + y * 2 + i % 3) > 12) 1 else 0)
    }.toDF("x", "y", "label")
    val model = MlOps.trainRf(noisy, Seq("x", "y"), "label", numTrees = 8, maxDepth = 4)
    val rules = MlOps.forestRules(model, Seq("x", "y"))
    // every tree's leaves partition feature space: each row matches one leaf
    val nTrees = rules.select("tree_id").distinct().count()
    assert(nTrees == 8)
    val native = MlOps.classify(model, noisy).select("x", "y", "label", "pred_label")
    val frozen = MlOps.classifyFromRules(rules, noisy, Seq("x", "y"))
      .select("x", "y", "label", "pred_label")
    assert(frozen.except(native).isEmpty && native.except(frozen).isEmpty)
  }

  test("forestRules rejects non-binary forests") {
    val tri = (1 to 90).map(i => ((i % 9).toDouble, (i % 5).toDouble, i % 3))
      .toDF("x", "y", "label")
    val model = MlOps.trainRf(tri, Seq("x", "y"), "label", numTrees = 3, maxDepth = 3)
    val e = intercept[IllegalArgumentException] {
      MlOps.forestRules(model, Seq("x", "y"))
    }
    assert(e.getMessage.contains("binary"))
  }

  test("trainingFilter drops invalid labels and imputes nulls (M3)") {
    val df = Seq(
      (Some(1.0), 5),   // kept
      (None, 7),        // kept, x imputed to 0
      (Some(2.0), 0),   // dropped: label 0
      (Some(3.0), 300)  // dropped: label > 255
    ).toDF("x", "label")
    val out = MlOps.trainingFilter(df, "label", Seq("x"))
    assert(out.count() == 2)
    assert(out.filter(col("x").isNull).count() == 0)
  }

  test("classifyWithRules applies P8 rewrites on top of inference (M1+P8)") {
    // one feature, labels are 12 (solar) everywhere → low-conf solar becomes urban
    val df = (1 to 60).map(i => ((i % 2).toDouble, 12)).toDF("x", "label")
    val model = MlOps.trainRf(df, Seq("x"), "label", numTrees = 5, maxDepth = 3)
    val out = MlOps.classifyWithRules(model, df)
    // trained on pure class-12 data → confidence 1.0 → label stays 12
    assert(out.select("pred_label").as[Int].collect().forall(_ == 12))
  }

  test("dispatchByCombo routes rows to per-combo models, labels each row once (J4)") {
    val df = Seq(
      (Some(1.0), Some(1.0), 1), (Some(2.0), Some(2.0), 2),
      (Some(8.0), Some(8.0), 1), (Some(9.0), Some(9.0), 2),
      (Some(1.5), None: Option[Double], 1), (Some(8.5), None: Option[Double], 2),
      (Some(2.5), None: Option[Double], 1), (Some(9.5), None: Option[Double], 2)
    ).toDF("B1", "B2", "label")
    val out = MlOps.dispatchByCombo(df, df, Seq("B1", "B2"), "label")
    assert(out.count() == 8) // every row labeled exactly once
    assert(out.select("combo").distinct().collect().map(_.getString(0)).toSet ==
      Set("B1_B2", "B1"))
  }

  test("dispatchByCombo round-trips band names containing underscores (J4)") {
    // Stage-0 emits columns like ndvi_m6 / win_B4: the routing key must not
    // split on '_' or these combos dissolve into nonexistent column names.
    val df = Seq(
      (Some(1.0), Some(1.0), 1), (Some(9.0), Some(9.0), 2),
      (Some(1.5), None: Option[Double], 1), (Some(8.5), None: Option[Double], 2)
    ).toDF("ndvi_m6", "win_B4", "label")
    val out = MlOps.dispatchByCombo(df, df, Seq("ndvi_m6", "win_B4"), "label")
    assert(out.count() == 4)
    assert(out.select("combo").distinct().collect().map(_.getString(0)).toSet ==
      Set("ndvi_m6_win_B4", "ndvi_m6"))
  }

  test("withFallback prefers lookup, then backup model, then 0 (J2)") {
    val feats = Seq((1L, 0.0), (2L, 0.0), (3L, 10.0)).toDF("seg_id", "x")
    // backup model: predicts 1 iff x > 5 (trained on clean data)
    val train = (1 to 100).map(i => (if (i % 2 == 0) 10.0 else 0.0, i % 2 match {
      case 0 => 1; case _ => 0
    })).toDF("x", "label")
    val backup = MlOps.trainRf(train, Seq("x"), "label", numTrees = 5, maxDepth = 3)
    val lookup = Seq((1L, 7)).toDF("seg_id", "main_pred")
    val out = MlOps.withFallback(feats, lookup, backup, "seg_id")
      .select("seg_id", "final_pred").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(1L) == 7) // lookup wins even though backup would predict 0
    assert(out(2L) == 0) // no lookup → backup predicts 0 for x=0
    assert(out(3L) == 1) // no lookup → backup predicts 1 for x=10
  }

  test("classifyFromRulesBatched == per-key classifyFromRules; unrouted keys drop (r13)") {
    import spark.implicits._
    def fp(p: Double) = math.rint(p * MlOps.RuleProbScale).toLong
    // 18 synthetic single-tree models (the j4b fixture family)
    val rules = (0 until 18).map { k =>
      val a = (10 + k % 13).toDouble; val b = (25 + k % 17).toDouble
      k -> Seq(
        (0, 0, -1e18, a, fp(if (k % 2 == 0) 0.25 else 0.75)),
        (0, 1, a, b, fp(if (k % 3 == 0) 0.75 else 0.25)),
        (0, 2, b, 1e18, fp(if (k % 5 == 0) 0.875 else 0.125)))
        .toDF("tree_id", "leaf_id", "q_lo", "q_hi", "p1_fp")
    }
    // keys 0..19: 18 and 19 have NO model and must drop (unrouted combos)
    val df = (1 to 400).map(i => (i.toLong, i % 20, (i % 50).toDouble))
      .toDF("row_id", "mk", "q")
    def collectPreds(out: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      out.select("row_id", "pred_label").as[(Long, Int)].collect().toMap
    val batched = collectPreds(
      MlOps.classifyFromRulesBatched(rules, df, "mk", Seq("q"), batchSize = 5))
    // reference: each key's rows through the plain single-model replay
    val expect = rules.flatMap { case (k, r) =>
      collectPreds(MlOps.classifyFromRules(r, df.filter($"mk" === k), Seq("q")))
    }.toMap
    assert(batched == expect && batched.nonEmpty)
    assert(!batched.keySet.exists(id => id % 20 == 18 || id % 20 == 19))
    // batch size is semantics-invisible (1 model/plan vs all in one)
    assert(collectPreds(MlOps.classifyFromRulesBatched(rules, df, "mk", Seq("q"),
      batchSize = 1)) == batched)
    assert(collectPreds(MlOps.classifyFromRulesBatched(rules, df, "mk", Seq("q"),
      batchSize = 100)) == batched)
    // duplicate model keys reject
    val e = intercept[IllegalArgumentException] {
      MlOps.classifyFromRulesBatched(rules :+ rules.head, df, "mk", Seq("q"))
    }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
  }
}
