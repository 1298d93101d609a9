package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused intersection count over two SORTED string arrays — the Jaccard
  * verify hot kernel (e7/e10/e12/inc1 score |A∩B| for every LSH candidate
  * pair).
  *
  * `size(array_intersect(a, b))` materializes the intersection array and
  * probes a hash set per element; for the verify path only the COUNT is
  * needed, and the shingle sets arrive sorted (Dedup.shingleSets applies
  * sort_array), so a two-pointer merge walk computes it with zero
  * allocation inside whole-stage codegen. Comparison uses UTF8String
  * binary order — the same ordering sort_array applies — so the count is
  * exactly `|distinct(a) ∩ distinct(b)|` when the inputs are sorted
  * distinct arrays. Inputs NOT sorted ascending are a contract violation
  * (the count would silently undercount); both in-repo callers sort at
  * the shared shingle projection.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  // Expensive-kernel marker (guide §4.4, the ClipAreaExpr.deterministic
  // mechanism): every verify caller projects the count and then filters
  // (`inter > 0`, jaccard/containment thresholds) — deterministic, the
  // pushed filter lands the merge walk in the candidate JOIN CONDITION
  // and the projection re-runs it per survivor (2-4 evaluations per
  // candidate pair). Pure function; the flag only pins one evaluation
  // in the projection. Callers must keep it in Project/Filter shapes.
  override lazy val deterministic: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count requires array<string> inputs, got ${left.dataType} / ${right.dataType}")
    }
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0L
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    java.lang.Long.valueOf(n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0;
         |${ev.value} = 0L;
         |while ($i < $na && $j < $nb) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { ${ev.value}++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectExpr {
  /** Column-API entry point: requires both arrays sorted ascending. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftBridge.column(
      SortedIntersectCountExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
}
