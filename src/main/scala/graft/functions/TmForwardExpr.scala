package graft.functions

import graft.operators.Regrid.TmParams
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructField, StructType}

/** Forward transverse-Mercator over a parsed ring set — the codegen
  * twin of mapping [[graft.operators.Regrid.TransverseMercatorFromGeographic]]
  * through `transform(rings, r => transform(r, p => ...))` (r17,
  * guide §4: higher-order functions are CodegenFallback, so the Snyder
  * series ran INTERPRETED per vertex with per-element lambda binding —
  * the g13/g13b hot path). The arithmetic below is `apply`'s VERBATIM
  * (same left-associated op order, same `java.lang.Math` calls, same
  * driver-precomputed [[TmParams]] constants), so every emitted double
  * is bit-identical to the HOF path — RegridSpec gates kernel ≡ Column
  * chain on a domain scan, and the g13/g13b oracles re-prove it
  * end-to-end.
  *
  * NULL semantics match the Column algebra: a NULL ring stays NULL; a
  * NULL point, or one with either coordinate NULL, maps to a PRESENT
  * (NULL, NULL) struct — `transform`'s lambda runs on null elements and
  * `struct(...)` is never null, and both output formulas consume both
  * inputs.
  */
case class TmForwardRingsExpr(child: Expression, p: TmParams)
    extends UnaryExpression {

  private def ringsTypeOk(t: DataType): Boolean = t match {
    case ArrayType(ArrayType(s: StructType, _), _) =>
      s.length == 2 && s.fields.forall(_.dataType == DoubleType) &&
        s.fields(0).name == "x" && s.fields(1).name == "y"
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!ringsTypeOk(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"tm_forward_rings needs array<array<struct<x:double,y:double>>>, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(ArrayType(
    StructType(Seq(StructField("x", DoubleType), StructField("y", DoubleType)))))

  // pure function of (input, driver-constant TmParams): keep
  // constant-folding on literal rings as the Column algebra did
  override def foldable: Boolean = child.foldable

  override protected def nullSafeEval(rings: Any): Any =
    TmForward.mapRings(rings.asInstanceOf[ArrayData], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("tmParams", p, classOf[TmParams].getName)
    defineCodeGen(ctx, ev, r => s"graft.functions.TmForward.mapRings($r, $pRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TmForward {
  import graft.operators.Regrid.Utm.Deg2Rad

  def col(rings: Column, p: TmParams): Column =
    GraftBridge.column(TmForwardRingsExpr(GraftBridge.expression(rings), p))

  /** One point, `TransverseMercatorFromGeographic.apply`'s algebra
    * verbatim (Scala and the Column tree share left-assoc `*`/`/`;
    * `sin`/`cos`/`tan`/`sqrt` are `java.lang.Math` in both Spark's
    * interpreted and codegen paths). Returns (easting, northing).
    */
  def point(lon: Double, lat: Double, p: TmParams): (Double, Double) = {
    val phi = lat * Deg2Rad
    val dlam = (lon - p.lon0Deg) * Deg2Rad
    val sinPhi = math.sin(phi); val cosPhi = math.cos(phi); val tanPhi = math.tan(phi)
    val n = p.a / math.sqrt(1.0 - p.e2 * sinPhi * sinPhi)
    val t = tanPhi * tanPhi
    val c = p.ep2 * cosPhi * cosPhi
    val aa = dlam * cosPhi
    val m = p.a * (p.m0c * phi - p.m2c * math.sin(2.0 * phi) +
      p.m4c * math.sin(4.0 * phi) - p.m6c * math.sin(6.0 * phi))
    val easting = p.falseEasting + p.k0 * n * (aa +
      (1.0 - t + c) * aa * aa * aa / 6.0 +
      (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * p.ep2) *
        aa * aa * aa * aa * aa / 120.0)
    val northing = p.falseNorthing + p.k0 * (m - p.m0Arc +
      n * tanPhi * (aa * aa / 2.0 +
        (5.0 - t + 9.0 * c + 4.0 * c * c) *
          aa * aa * aa * aa / 24.0 +
        (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * p.ep2) *
          aa * aa * aa * aa * aa * aa / 720.0))
    (easting, northing)
  }

  /** Static kernel (also the codegen target): map every ring vertex. */
  def mapRings(rings: ArrayData, p: TmParams): ArrayData = {
    val nr = rings.numElements()
    val out = new Array[Any](nr)
    var i = 0
    while (i < nr) {
      if (!rings.isNullAt(i)) {
        val r = rings.getArray(i)
        val n = r.numElements()
        val pts = new Array[Any](n)
        var j = 0
        while (j < n) {
          // a NULL point element ALSO maps to a non-null (NULL, NULL)
          // struct: `transform` applies the lambda to null elements, and
          // struct(getField(null), getField(null)) is a present struct
          // with null fields, never a null element
          if (r.isNullAt(j)) {
            pts(j) = InternalRow(null, null)
          } else {
            val s = r.getStruct(j, 2)
            if (s.isNullAt(0) || s.isNullAt(1)) {
              // either coordinate NULL -> both outputs NULL (each output
              // formula consumes both inputs in the Column chain)
              pts(j) = InternalRow(null, null)
            } else {
              val (x, y) = point(s.getDouble(0), s.getDouble(1), p)
              pts(j) = InternalRow(x, y)
            }
          }
          j += 1
        }
        out(i) = new GenericArrayData(pts)
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
