package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Parsed rings → WKT with the GEOMETRY-TYPE decision made FOR the
  * caller — the writer [[SpatialOps.ringsToWkt]] cannot be for
  * multi-outer ring sets (a dissolve of disconnected regions emits
  * several CCW outers; spelling them as one POLYGON's ring list is
  * wrong WKT): rings are grouped into polygons by winding — every ring
  * wound like the DOMINANT orientation (the sign of the total signed
  * area, so holes-subtract conventions survive) is an outer, every
  * opposite-wound ring a hole assigned to the FIRST outer (in input
  * order) that strictly contains its first vertex (even-odd test; a
  * hole no outer contains fails loudly — malformed geometry must not
  * silently re-parent). Emits `POLYGON` for one outer, `MULTIPOLYGON`
  * for several, `POLYGON EMPTY` for none. Coordinates render via
  * Java's shortest-round-trip double formatting — the SAME formatter
  * Spark's cast-to-string uses, so `wktRings` re-parses bitwise.
  */
case class RingsToWktAutoExpr(child: Expression) extends UnaryExpression {

  private def ringsTypeOk(t: DataType): Boolean = t match {
    case ArrayType(ArrayType(s: StructType, _), _) =>
      s.length == 2 && s.fields.forall(_.dataType == DoubleType) &&
        s.fields(0).name == "x" && s.fields(1).name == "y"
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!ringsTypeOk(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"st_rings_wkt_auto needs array<array<struct<x:double,y:double>>> rings, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType

  override protected def nullSafeEval(rings: Any): Any =
    UTF8String.fromString(RingsWkt.toWktAuto(rings.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, r =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.RingsWkt.toWktAuto($r))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RingsWkt {

  /** Column entry. */
  def ringsToWktAuto(rings: Column): Column =
    GraftBridge.column(RingsToWktAutoExpr(GraftBridge.expression(rings)))

  /** Static kernel (also the codegen target). */
  def toWktAuto(rings: ArrayData): String = {
    val nr = rings.numElements()
    val xs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val ys = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var i = 0
    while (i < nr) {
      if (rings.isNullAt(i))
        throw new IllegalArgumentException(s"null ring at index $i (malformed WKT?)")
      val r = rings.getArray(i)
      val n = r.numElements()
      if (n > 0) {
        val rx = new Array[Double](n)
        val ry = new Array[Double](n)
        var j = 0
        while (j < n) {
          if (r.isNullAt(j))
            throw new IllegalArgumentException(s"null point at ring $i index $j")
          val p = r.getStruct(j, 2)
          if (p.isNullAt(0) || p.isNullAt(1))
            throw new IllegalArgumentException(s"null coordinate at ring $i index $j")
          rx(j) = p.getDouble(0)
          ry(j) = p.getDouble(1)
          j += 1
        }
        xs += rx; ys += ry
      }
      i += 1
    }
    def signed(k: Int): Double = {
      val rx = xs(k); val ry = ys(k)
      var acc = 0.0
      var j = 0
      while (j < rx.length - 1) {
        acc += rx(j) * ry(j + 1) - rx(j + 1) * ry(j)
        j += 1
      }
      acc
    }
    val signs = xs.indices.map(signed)
    val total = signs.sum
    // dominant orientation = outer winding (holes subtract, so the net
    // signed area carries the outers' sign); zero-signed-area rings
    // (degenerate clip slivers — the S-H emitter documents them) carry
    // no region and are DROPPED, never emitted as spurious members
    val outerPositive = if (total != 0.0) total > 0.0
      else signs.find(_ != 0.0).forall(_ > 0.0)
    val live = xs.indices.filter(k => signs(k) != 0.0)
    if (live.isEmpty) return "POLYGON EMPTY"
    val isOuter = xs.indices.map(k => (signs(k) > 0.0) == outerPositive)
    val outers = live.filter(isOuter)
    val holes = live.filterNot(isOuter)
    if (outers.isEmpty)
      throw new IllegalArgumentException(
        "no outer ring under the dominant winding — malformed ring set")
    def inRing(k: Int, px: Double, py: Double): Boolean = {
      val rx = xs(k); val ry = ys(k)
      var in = false
      var j = 0
      while (j < rx.length - 1) {
        if ((ry(j) > py) != (ry(j + 1) > py) &&
            px < rx(j) + (py - ry(j)) * (rx(j + 1) - rx(j)) / (ry(j + 1) - ry(j)))
          in = !in
        j += 1
      }
      in
    }
    // a hole belongs to the SMALLEST containing outer — the innermost
    // container, so an island-in-a-lake's pond nests under the island,
    // not the enclosing landmass (first-match picked the outermost)
    val assigned = scala.collection.mutable.Map.empty[Int, List[Int]]
    holes.foreach { h =>
      val containers = outers.filter(o => inRing(o, xs(h)(0), ys(h)(0)))
      if (containers.isEmpty)
        throw new IllegalArgumentException(
          s"hole ring $h lies in no outer ring — malformed ring set")
      val owner = containers.minBy(o => (math.abs(signs(o)), o))
      assigned(owner) = assigned.getOrElse(owner, Nil) :+ h
    }
    def ringStr(k: Int): String = {
      val rx = xs(k); val ry = ys(k)
      val sb = new StringBuilder("(")
      var j = 0
      while (j < rx.length) {
        if (j > 0) sb.append(", ")
        sb.append(rx(j)).append(' ').append(ry(j))
        j += 1
      }
      sb.append(')').toString
    }
    def polyStr(o: Int): String =
      (ringStr(o) +: assigned.getOrElse(o, Nil).map(ringStr)).mkString("(", ", ", ")")
    if (outers.length == 1) s"POLYGON ${polyStr(outers.head)}"
    else outers.map(polyStr).mkString("MULTIPOLYGON (", ", ", ")")
  }
}
