package graft

import graft.functions.NormExprs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NormSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(s: String, form: String = "NFC", strip: Boolean = false): String =
    Seq(s).toDF("t")
      .select(NormExprs.unicodeNorm(col("t"), form, strip).as("n"))
      .head().getString(0)

  test("NFC composes decomposed sequences; NFD decomposes them back") {
    val decomposed = "Café" // e + combining acute
    val composed = "Café"    // precomposed é
    assert(norm(decomposed, "NFC") == composed)
    assert(norm(composed, "NFD") == decomposed)
    assert(norm(composed, "NFC") == composed, "NFC is idempotent on composed text")
  }

  test("NFKC folds compatibility characters (ligatures, fullwidth)") {
    assert(norm("ﬁle", "NFKC") == "file")       // ﬁ ligature
    assert(norm("Ｈｉ", "NFKC") == "Hi")     // fullwidth HI
    assert(norm("ﬁle", "NFC") == "ﬁle", "NFC must NOT fold compatibility forms")
  }

  test("accent folding: NFD-drop-marks-recompose, in any requested form") {
    assert(norm("Café naïve Ångström", "NFC", strip = true)
      == "Cafe naive Angstrom")
    assert(norm("Café", "NFC", strip = true) == "Cafe",
      "decomposed input folds identically")
    // requested NFD stays decomposed after folding (no marks remain anyway)
    assert(norm("été", "NFD", strip = true) == "ete")
  }

  test("ASCII is a fixed point; null propagates; empty survives") {
    val texts = Seq(Some("plain ascii text 123"), Some(""), None)
    val got = texts.toDF("t")
      .select(NormExprs.unicodeNorm(col("t"), "NFC", stripAccents = true).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == texts)
  }

  test("fail-closed: bad form at construction, non-string input at analysis") {
    intercept[IllegalArgumentException](NormExprs.unicodeNorm(col("t"), "NFX"))
    val e = intercept[Exception](
      Seq(1).toDF("t").select(NormExprs.unicodeNorm(col("t"), "NFC")).collect())
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
