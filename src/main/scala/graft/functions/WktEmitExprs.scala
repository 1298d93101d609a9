package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass WKT coordinate emission — the codegen twin of the
  * string-concat Column chains in [[SpatialOps.ringsToWkt]] /
  * `ringsToWktBody` / the MULTIPOINT re-emit (r17, guide §4: those
  * chains run `transform` higher-order functions whose lambdas are
  * interpreted per ring/vertex, with one intermediate UTF8String
  * allocation per concat node). Each mode builds the identical string
  * in one StringBuilder walk; doubles render via
  * `StringBuilder.append(double)` = `Double.toString`, the same
  * shortest-round-trip formatter Spark's double→string cast uses, so
  * every emitted byte matches the chain (WktEmitSpec gates kernel ≡
  * chain per mode on a generated domain).
  *
  * Modes and their replicated NULL semantics (all three chains bottom
  * out in `concat_ws`/`array_join`, which SKIP null elements):
  *   - `body`: rings → `"(x y, …), (…)"`. A null or empty ring still
  *     renders `"()"` (the chain's per-ring lambda wraps a skipped-empty
  *     join in parens); a null point or null coordinate is skipped.
  *   - `polygon`: rings → full `"POLYGON ((…))"` with null/empty rings
  *     DROPPED first and `"POLYGON EMPTY"` when none survive —
  *     [[SpatialOps.ringsToWkt]]'s contract; null points/coords skipped.
  *   - `mpoints`: flat point array → `"(x y), (x y)"` (the MULTIPOINT
  *     body); null points/coords skipped.
  * A NULL input column returns NULL from the expression; the `body` /
  * `mpoints` Column wrappers coalesce that to `""` because their chains
  * end in total `concat_ws` (never null). `polygon`'s chain propagates
  * NULL, so its wrapper does not coalesce.
  */
case class WktEmitExpr(child: Expression, mode: String) extends UnaryExpression {
  require(WktEmit.Modes.contains(mode), s"unknown wkt emit mode '$mode'")

  private def ptsTypeOk(t: DataType): Boolean = t match {
    case s: StructType =>
      s.length == 2 && s.fields.forall(_.dataType == DoubleType) &&
        s.fields(0).name == "x" && s.fields(1).name == "y"
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (mode, child.dataType) match {
      case ("mpoints", ArrayType(e, _)) => ptsTypeOk(e)
      case (_, ArrayType(ArrayType(e, _), _)) => ptsTypeOk(e)
      case _ => false
    }
    if (!ok) TypeCheckResult.TypeCheckFailure(
      s"wkt_emit('$mode') needs ${if (mode == "mpoints") "array<struct<x:double,y:double>>"
        else "array<array<struct<x:double,y:double>>>"}, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StringType

  // pure function of the input: keep constant-folding on literal rings
  // as the concat chains did
  override def foldable: Boolean = child.foldable

  override protected def nullSafeEval(in: Any): Any = {
    val a = in.asInstanceOf[ArrayData]
    val s = mode match {
      case "body" => WktEmit.emitBody(a)
      case "polygon" => WktEmit.emitPolygon(a)
      case "mpoints" => WktEmit.emitMPoints(a)
    }
    UTF8String.fromString(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = mode match {
      case "body" => "emitBody"
      case "polygon" => "emitPolygon"
      case "mpoints" => "emitMPoints"
    }
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.WktEmit.$fn($a))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WktEmit {
  val Modes: Set[String] = Set("body", "polygon", "mpoints")

  private def expr(c: Column, mode: String): Column =
    GraftBridge.column(WktEmitExpr(GraftBridge.expression(c), mode))

  /** Rings → WKT body `"(x y, …), (…)"` — `ringsToWktBody`'s twin.
    * Coalesced to "" on NULL input (concat_ws is total).
    */
  def body(rings: Column): Column = coalesce(expr(rings, "body"), lit(""))

  /** Rings → `"POLYGON ((…))"` / `"POLYGON EMPTY"` —
    * [[SpatialOps.ringsToWkt]]'s twin (NULL propagates, as the chain's
    * final concat does).
    */
  def polygon(rings: Column): Column = expr(rings, "polygon")

  /** Flat points → `"(x y), (x y)"` (MULTIPOINT body). Coalesced to ""
    * on NULL input.
    */
  def mpoints(pts: Column): Column = coalesce(expr(pts, "mpoints"), lit(""))

  /** Append "x y" for every present point with both coords present,
    * ", "-joined — the inner `concat_ws(", ", transform(r, p =>
    * concat(x, ' ', y)))`, whose null elements (null point / null
    * coord) are skipped.
    */
  private def appendRingPts(sb: java.lang.StringBuilder, r: ArrayData): Unit = {
    val n = r.numElements()
    var j = 0
    var first = true
    while (j < n) {
      if (!r.isNullAt(j)) {
        val s = r.getStruct(j, 2)
        if (!s.isNullAt(0) && !s.isNullAt(1)) {
          if (!first) sb.append(", ")
          sb.append(s.getDouble(0)).append(' ').append(s.getDouble(1))
          first = false
        }
      }
      j += 1
    }
  }

  /** Static kernel (also the codegen target): rings → body. */
  def emitBody(rings: ArrayData): String = {
    val nr = rings.numElements()
    val sb = new java.lang.StringBuilder(nr * 24 + 8)
    var i = 0
    while (i < nr) {
      if (i > 0) sb.append(", ")
      sb.append('(')
      // a NULL ring renders "()" — the chain's lambda wraps
      // concat_ws(", ", transform(null)) = "" in parens
      if (!rings.isNullAt(i)) appendRingPts(sb, rings.getArray(i))
      sb.append(')')
      i += 1
    }
    sb.toString
  }

  /** Static kernel: rings → full POLYGON WKT (null/empty rings dropped,
    * all-dropped → POLYGON EMPTY).
    */
  def emitPolygon(rings: ArrayData): String = {
    val nr = rings.numElements()
    val sb = new java.lang.StringBuilder(nr * 24 + 16)
    sb.append("POLYGON (")
    var kept = 0
    var i = 0
    while (i < nr) {
      // filter(rings, r => size(r) > 0): size(null) is NULL -> dropped
      if (!rings.isNullAt(i)) {
        val r = rings.getArray(i)
        if (r.numElements() > 0) {
          if (kept > 0) sb.append(", ")
          sb.append('(')
          appendRingPts(sb, r)
          sb.append(')')
          kept += 1
        }
      }
      i += 1
    }
    if (kept == 0) return "POLYGON EMPTY"
    sb.append(')')
    sb.toString
  }

  /** Static kernel: flat points → MULTIPOINT body "(x y), (x y)". */
  def emitMPoints(pts: ArrayData): String = {
    val n = pts.numElements()
    val sb = new java.lang.StringBuilder(n * 24)
    var j = 0
    var first = true
    while (j < n) {
      if (!pts.isNullAt(j)) {
        val s = pts.getStruct(j, 2)
        if (!s.isNullAt(0) && !s.isNullAt(1)) {
          if (!first) sb.append(", ")
          sb.append('(').append(s.getDouble(0)).append(' ')
            .append(s.getDouble(1)).append(')')
          first = false
        }
      }
      j += 1
    }
    sb.toString
  }
}
