package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k-token shingles of a token array — the hot kernel under EVERY text
  * operator (LSH/minhash dedup, passage dedup, the quality gate's bigram
  * repetition, n-gram decontamination, PMI, novelty…).
  *
  * The Column-HOF spelling (`transform(sequence(0, n-k), i ->
  * concat_ws(' ', element_at(toks, i+1), …))`) has two structural costs
  * Catalyst cannot remove: higher-order functions never enter
  * whole-stage codegen (interpreted lambda per element), and when the
  * token array is itself an expression (`split(text)` after
  * CollapseProject re-inlines the alias) the lambda body re-evaluates it
  * PER ELEMENT — an O(tokens²) re-tokenize per row, measured at ~0.5 ms
  * per 300-char document in pushed-down filter position. This expression
  * evaluates its child ONCE and builds the windows in a tight loop,
  * inside codegen.
  *
  * Semantics are bit-identical to the HOF spelling on every non-null
  * input (oracle-checked by every shingle-based query, and asserted
  * edge-by-edge in TextOpsSpec): fewer than k tokens → ONE shingle
  * joining all tokens; null ELEMENTS are skipped by the join exactly as
  * concat_ws does. A NULL input array → NULL — a deliberate divergence
  * from the old HOF spelling, which under the legacy sizeOfNull default
  * (size(NULL) = −1 with ANSI off) took the short-doc branch and emitted
  * [""]: every DuckDB oracle splits with string_split, where a NULL text
  * yields NULL → `unnest` emits nothing — so NULL-propagation is the
  * behavior the oracle contract actually specifies for NULL documents
  * (current fixtures have none; this closes the latent divergence).
  */
case class ShinglesExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingles requires array<string> input, got $t")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShinglesExpr.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShinglesExpr.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShinglesExpr {
  private val Sep = UTF8String.fromString(" ")

  /** Shared kernel for interpreted eval and generated code (static
    * forwarder — callable from Janino output). Never sees null (the
    * expression is null-intolerant via nullSafeEval/nullSafeCodeGen).
    */
  def compute(ad: ArrayData, k: Int): ArrayData = {
    val n = ad.numElements()
    if (n < k) {
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i < n) {
        parts(i) = if (ad.isNullAt(i)) null else ad.getUTF8String(i)
        i += 1
      }
      new GenericArrayData(Array[Any](UTF8String.concatWs(Sep, parts: _*)))
    } else {
      val out = new Array[Any](n - k + 1)
      val parts = new Array[UTF8String](k)
      var i = 0
      while (i <= n - k) {
        var j = 0
        while (j < k) {
          parts(j) = if (ad.isNullAt(i + j)) null else ad.getUTF8String(i + j)
          j += 1
        }
        out(i) = UTF8String.concatWs(Sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Column-API entry point. */
  def shingles(toks: Column, k: Int): Column =
    GraftBridge.column(ShinglesExpr(GraftBridge.expression(toks), k))
}
