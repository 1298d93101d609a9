package graft

import graft.functions.ScalarOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScalarOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("nullifNoData maps sentinel and NaN to NULL, keeps valid values (P3)") {
    val df = Seq(-9999.0f, -9998.995f, Float.NaN, 0.42f, -9990.0f).toDF("v")
    val out = df.select(ScalarOps.nullifNoData($"v").as("n")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getFloat(0)))
    assert(out(0).isEmpty)            // exact sentinel
    assert(out(1).isEmpty)            // within atol=1e-2
    assert(out(2).isEmpty)            // NaN normalized too
    assert(out(3).contains(0.42f))
    assert(out(4).isDefined)          // outside tolerance stays
  }

  test("normalizedDiffNull yields NULL on zero denominator, matches (a-b)/(a+b) otherwise (P5)") {
    val df = Seq((2.0, 1.0), (0.0, 0.0), (1.0, -1.0)).toDF("a", "b")
    val out = df.select(ScalarOps.normalizedDiffNull($"a", $"b").as("nd")).collect()
    assert(out(0).getDouble(0) === (2.0 - 1.0) / 3.0)
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0)) // a+b == 0
  }

  test("ruleRewrite truth table (P8, pixel_classifier_stream.py:154-161 semantics)") {
    val df = Seq(
      (12, 0.59), (12, 0.60), (12, 0.61), // solar below/at/above threshold
      (16, 0.99),                         // shadow always rewritten
      (5, 0.10)                           // untouched class
    ).toDF("label", "conf")
    val out = df.select(ScalarOps.ruleRewrite($"label", $"conf").as("l")).as[Int].collect()
    assert(out.toSeq == Seq(2, 12, 12, 2, 5))
  }

  test("comboKey names non-null bands in order (P9)") {
    val df = Seq(
      (Some(1.0f), None: Option[Float], Some(3.0f)),
      (None: Option[Float], None: Option[Float], None: Option[Float])
    ).toDF("B1", "B2", "B3")
    val key = ScalarOps.comboKey(Seq("B1" -> $"B1", "B2" -> $"B2", "B3" -> $"B3"))
    val out = df.select(key.as("k")).as[String].collect()
    assert(out(0) == "B1_B3")
    assert(out(1) == "")
  }

  test("stableKey switches to md5 only above maxLen (P10)") {
    val shortK = "x" * 100
    val longK = "x" * 101
    val df = Seq(shortK, longK).toDF("k")
    val out = df.select(ScalarOps.stableKey($"k").as("s")).as[String].collect()
    assert(out(0) == shortK)
    assert(out(1).length == 32 && out(1) != longK)
  }

  test("clamp and stretch8bit bound values (P7/M8)") {
    val df = Seq(-5.0, 0.5, 99.0).toDF("v")
    val out = df.select(
      ScalarOps.clamp($"v", lit(0.0), lit(1.0)).as("c"),
      ScalarOps.stretch8bit($"v", lit(0.0), lit(10.0)).as("s")).collect()
    assert(out.map(_.getDouble(0)).toSeq == Seq(0.0, 0.5, 1.0))
    assert(out(0).getDouble(1) == 0.0)
    assert(out(1).getDouble(1) == 0.5 / 10.0 * 255.0)
    assert(out(2).getDouble(1) == 255.0)
  }
}
