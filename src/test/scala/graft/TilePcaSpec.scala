package graft

import graft.operators.{MlOps, TilePca}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TilePcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("principalEigenvector recovers the dominant axis of a known covariance (A8)") {
    // variance 9 along (1,1)/√2, variance 1 along (1,-1)/√2
    val cov = Array(Array(5.0, 4.0), Array(4.0, 5.0))
    val v = TilePca.principalEigenvector(cov)
    val expected = 1.0 / math.sqrt(2)
    assert(math.abs(math.abs(v(0)) - expected) < 1e-9)
    assert(math.abs(v(0) - v(1)) < 1e-9) // same sign, equal components
    assert(v(0) > 0)                     // sign convention
  }

  test("withPca1 projects onto the per-tile principal axis (A8)") {
    // tile A: points along y = x (pc1 ∝ (1,1)); tile B: along y = -x
    val rows =
      (0 until 50).map(i => ("A", i.toDouble, i.toDouble + (if (i % 2 == 0) 0.1 else -0.1))) ++
      (0 until 50).map(i => ("B", i.toDouble, -i.toDouble))
    val df = rows.toDF("tile", "f1", "f2")
    val out = TilePca.withPca1(df, Seq("tile"), Seq("f1", "f2"))
    assert(out.count() == 100)
    // projection variance along pc1 ≈ total variance for near-collinear data
    val stats = out.groupBy("tile").agg(
      (variance(col("pca1")) / (variance(col("f1")) + variance(col("f2")))).as("ratio"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(stats("A") > 0.99 && stats("B") > 0.99)
    // deterministic across runs
    val again = TilePca.withPca1(df, Seq("tile"), Seq("f1", "f2"))
      .orderBy("tile", "f1").select("pca1").as[Double].collect()
    val first = out.orderBy("tile", "f1").select("pca1").as[Double].collect()
    assert(first.toSeq == again.toSeq)
  }

  test("model artifact store: save/load round-trip preserves predictions (S7)") {
    val train = (1 to 100).map(i => ((i % 10).toDouble, if (i % 10 > 5) 1 else 0)).toDF("x", "label")
    val model = MlOps.trainRf(train, Seq("x"), "label", numTrees = 5, maxDepth = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_models").toString
    val longKey = "B" * 150
    MlOps.saveModel(model, dir, longKey)
    assert(MlOps.modelExists(spark, dir, longKey))
    assert(!MlOps.modelExists(spark, dir, "missing"))
    val loaded = MlOps.loadModel(dir, longKey)
    val a = MlOps.classify(model, train).select("pred_label").as[Int].collect().toSeq
    val b = MlOps.classify(loaded, train).select("pred_label").as[Int].collect().toSeq
    assert(a == b)
  }
}
