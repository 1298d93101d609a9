package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** All ORDERED index pairs (i < j) of an array's elements, as
  * `array<struct<l: elem, r: elem>>` — the posting-list pair enumeration
  * of the sparse-similarity operators (tfidf2's
  * `Similarity.sparseTfidfPairs`), lifted out of its higher-order-function
  * spelling.
  *
  * Why an expression (the ShinglesExpr rationale, r16 measured): the HOF
  * form `flatten(transform(lst, (x, i) => transform(slice(lst, i + 2,
  * size(lst)), y => …)))` is INTERPRETED — per posting list it evaluates
  * a nested lambda tree, materializes one sliced copy of the tail per
  * element (O(k²) element copies per list just for the slices), and boxes
  * every intermediate. The stage bisect (tools/Scratch.scala) put the
  * enumeration at +1.8 s of tfidf2's 2.9 s warm. This kernel is one
  * static JVM loop per list inside whole-stage codegen: k struct copies
  * + k(k−1)/2 two-field rows.
  *
  * The emitted pair MULTISET and order (i ascending, then j from i+1) are
  * exactly the HOF form's flatten order; every downstream consumer
  * aggregates over the exploded pairs, so results are bit-identical
  * (SimilaritySpec gates the equivalence on a literal fixture).
  */
case class OrderedPairsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_ordered_pairs needs an array input, got $other")
  }

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType
  private def elemNullable: Boolean = child.dataType.asInstanceOf[ArrayType].containsNull

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("l", elemType, elemNullable),
    StructField("r", elemType, elemNullable))), containsNull = false)

  override protected def nullSafeEval(arr: Any): Any =
    OrderedPairsExpr.pairs(arr.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elemType,
      classOf[DataType].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.OrderedPairsExpr.pairs($a, $et);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OrderedPairsExpr {

  /** Static kernel (also the codegen target): copy each element once
    * (UnsafeArrayData accessors return views into the backing buffer —
    * `InternalRow.copyValue` detaches them), then emit the i<j pairs in
    * the HOF flatten order. */
  def pairs(arr: ArrayData, elemType: DataType): ArrayData = {
    val n = arr.numElements()
    val elems = new Array[Any](n)
    var i = 0
    while (i < n) {
      elems(i) =
        if (arr.isNullAt(i)) null
        else InternalRow.copyValue(arr.get(i, elemType))
      i += 1
    }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](elems(i), elems(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column entry. */
  def orderedPairs(arr: Column): Column =
    GraftBridge.column(OrderedPairsExpr(GraftBridge.expression(arr)))
}
