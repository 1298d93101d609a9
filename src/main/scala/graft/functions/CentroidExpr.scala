package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftBridge

/** Area-weighted polygon centroid as a CODEGEN kernel (r16) — the
  * shoelace first-moment formula over the st_rings layout:
  * cx = Σ(xᵢ+xᵢ₊₁)·wᵢ / (3·Σwᵢ), wᵢ = xᵢ·yᵢ₊₁ − xᵢ₊₁·yᵢ, every ring's
  * edges in order, rings summed in order (holes wound opposite the
  * outer subtract their moment automatically; a globally reversed
  * polygon negates numerator AND denominator, so the quotient is
  * BITWISE orientation-invariant). Fold order is the kernel convention
  * the oracles replay: per edge one wᵢ term (p − q grouped), terms
  * left-assoc summed — NOT SpatialOps.ringsCentroid's Column grouping
  * ((acc + p) − q), which is ulp-close and spec-gated as such. A
  * zero-signed-area polygon has no centroid → fail-closed.
  *
  * Reference anchor: the reference emits per-feature centroids in its
  * polygonize stage (image_segmentation.py:153-162 carries feature
  * properties); this is the exact planar form.
  */
case class CentroidExpr(child: Expression) extends UnaryExpression {

  private def ringsTypeOk(t: DataType): Boolean = t match {
    case ArrayType(ArrayType(s: StructType, _), _) =>
      s.length == 2 && s.fields.forall(_.dataType == DoubleType) &&
        s.fields(0).name == "x" && s.fields(1).name == "y"
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!ringsTypeOk(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"st_centroid needs array<array<struct<x:double,y:double>>> rings, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = CentroidExprs.centroidType

  override protected def nullSafeEval(rings: Any): Any =
    CentroidExprs.centroid(rings.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, r =>
      s"${ev.value} = graft.functions.CentroidExprs.centroid($r);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CentroidExprs {

  val centroidType: DataType = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))

  /** Column entry. */
  def centroidCol(rings: Column): Column =
    GraftBridge.column(CentroidExpr(GraftBridge.expression(rings)))

  /** Static kernel (also the codegen target). Fail-closed on structural
    * nulls and zero signed area — a degenerate polygon has no centroid.
    */
  def centroid(rings: ArrayData): InternalRow = {
    val nr = rings.numElements()
    var a2 = 0.0
    var sx = 0.0
    var sy = 0.0
    var ri = 0
    while (ri < nr) {
      if (rings.isNullAt(ri))
        throw new IllegalArgumentException(s"null ring at index $ri (malformed WKT?)")
      val r = rings.getArray(ri)
      val n = r.numElements()
      val xs = new Array[Double](n)
      val ys = new Array[Double](n)
      var i = 0
      while (i < n) {
        if (r.isNullAt(i))
          throw new IllegalArgumentException(s"null point at ring $ri index $i (malformed WKT?)")
        val p = r.getStruct(i, 2)
        if (p.isNullAt(0) || p.isNullAt(1))
          throw new IllegalArgumentException(s"null coordinate at ring $ri index $i (malformed WKT?)")
        xs(i) = p.getDouble(0)
        ys(i) = p.getDouble(1)
        i += 1
      }
      // per-ring subtotals, rings added left-assoc — the oracle's
      // (cross(ring0) + cross(ring1)) grouping, NOT one flat fold over
      // concatenated edges (different rounding sequence)
      var la2 = 0.0
      var lsx = 0.0
      var lsy = 0.0
      i = 0
      while (i < n - 1) {
        val w = xs(i) * ys(i + 1) - xs(i + 1) * ys(i)
        la2 += w
        lsx += (xs(i) + xs(i + 1)) * w
        lsy += (ys(i) + ys(i + 1)) * w
        i += 1
      }
      a2 += la2
      sx += lsx
      sy += lsy
      ri += 1
    }
    if (a2 == 0.0)
      throw new IllegalArgumentException(
        "zero-signed-area polygon has no centroid (degenerate or malformed rings)")
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](sx / (3.0 * a2), sy / (3.0 * a2)))
  }
}
