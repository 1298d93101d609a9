package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for curation keys — the step every dedup /
  * matching pipeline runs before fingerprinting so that "Café", "Café"
  * (decomposed) and "Cafe" can be made to collide on purpose: canonical
  * (NFC) or compatibility (NFKC) normalization per the Unicode standard
  * (java.text.Normalizer implements UAX #15), plus optional accent
  * folding defined as NFD → drop combining marks (\p{Mn}) → NFC (the
  * documented algorithm, equal to DuckDB's strip_accents on Latin text —
  * norm1 composes both engines' pipelines and hash-gates the result).
  *
  * Spark has no built-in for any of this; the expression is one static
  * call per row inside whole-stage codegen. Case folding and whitespace
  * collapsing intentionally stay OUTSIDE (compose with the engine's own
  * `lower`/`regexp_replace`, which both engines already share).
  */
case class UnicodeNormExpr(child: Expression, form: String, stripAccents: Boolean)
    extends UnaryExpression {
  require(form == "NFC" || form == "NFKC" || form == "NFD" || form == "NFKD",
    s"normalization form must be NFC/NFKC/NFD/NFKD, got '$form'")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"unicode_norm needs a string, got $t")
  }

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NormExprs.normalize(input.asInstanceOf[UTF8String], form, stripAccents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.NormExprs.normalize($c, "$form", $stripAccents);""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormExprs {

  private val MarkPattern = java.util.regex.Pattern.compile("\\p{Mn}+")

  /** Static kernel (also the codegen target). */
  def normalize(s: UTF8String, form: String, stripAccents: Boolean): UTF8String = {
    var t = Normalizer.normalize(s.toString, Normalizer.Form.valueOf(form))
    if (stripAccents) {
      val d = Normalizer.normalize(t, Normalizer.Form.NFD)
      val bare = MarkPattern.matcher(d).replaceAll("")
      // renormalize so the result stays in the requested form
      t = Normalizer.normalize(bare, Normalizer.Form.valueOf(form))
    }
    UTF8String.fromString(t)
  }

  def unicodeNorm(text: Column, form: String = "NFC",
      stripAccents: Boolean = false): Column =
    GraftBridge.column(UnicodeNormExpr(
      GraftBridge.expression(text), form, stripAccents))
}
