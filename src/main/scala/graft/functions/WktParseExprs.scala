package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass WKT coordinate PARSING — the codegen twin of
  * [[SpatialOps.wktRings]] / `ringPts` (r17, guide §4). The chain
  * spelling runs `regexp_extract_all` (a regex Matcher per row) feeding
  * nested `transform`/`filter` higher-order functions whose lambdas are
  * interpreted per ring segment and per vertex, with two `split` +
  * two `trim` + two string→double casts per vertex, each allocating an
  * intermediate UTF8String. wktRings is the single most shared parse in
  * the engine (every clip join, every WKT measure, every reproject runs
  * it — g13 twice), so the kernel walks the string once per step with
  * no lambda dispatch.
  *
  * Each stage is a SEMANTIC TWIN of the chain's operator, so every
  * value — including every malformed-input null — is identical
  * (WktEmitSpec gates kernel ≡ chain on a fuzz domain; the dual-SF
  * oracle parity re-proves every consumer end-to-end):
  *   - innermost groups: the regex `\(([^()]+)\)` under Matcher.find
  *     semantics (left-to-right, non-overlapping; a match must start at
  *     `(`, so the scan jumps are exact);
  *   - `split(g, ",", -1)` keeps empty segments; the filter drops
  *     segments whose space-trim (ASCII 0x20 ONLY — Spark's `trim`) is
  *     empty;
  *   - tokens: `split(trim(p), " +", -1)` = runs of 0x20;
  *   - `element_at(toks, i)` out of bounds → NULL (non-ANSI);
  *   - string→double cast: `Double.valueOf`, then Spark's own
  *     `Cast.processFloatingPointSpecialLiterals` fallback
  *     ("inf"/"infinity"/"nan", signed, case-insensitive, trimmed),
  *     else NULL — the exact non-ANSI castToDouble body.
  *
  * Modes: `rings` (string → array<array<struct<x,y>>>, wktRings) and
  * `pts` (one group string → array<struct<x,y>>, ringPts). NULL input →
  * NULL (both chains propagate).
  */
case class WktParseExpr(child: Expression, mode: String) extends UnaryExpression {
  require(mode == "rings" || mode == "pts", s"unknown wkt parse mode '$mode'")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"wkt_parse('$mode') needs a string, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  private def ptsType = ArrayType(
    StructType(Seq(StructField("x", DoubleType), StructField("y", DoubleType))))

  override def dataType: DataType =
    if (mode == "rings") ArrayType(ptsType) else ptsType

  // pure function of the input: a literal WKT (a constant clip window,
  // say) must keep constant-folding as the regex/HOF chain did
  override def foldable: Boolean = child.foldable

  override protected def nullSafeEval(in: Any): Any = {
    val s = in.asInstanceOf[UTF8String].toString
    if (mode == "rings") WktParse.rings(s) else WktParse.pts(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (mode == "rings") "rings" else "pts"
    defineCodeGen(ctx, ev, s => s"graft.functions.WktParse.$fn($s.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WktParse {

  /** Column entry: [[SpatialOps.wktRings]]'s kernel twin. */
  def ringsCol(wkt: Column): Column =
    GraftBridge.column(WktParseExpr(GraftBridge.expression(wkt), "rings"))

  /** Column entry: `ringPts`'s kernel twin (one coordinate group). */
  def ptsCol(group: Column): Column =
    GraftBridge.column(WktParseExpr(GraftBridge.expression(group), "pts"))

  /** Static kernel (also the codegen target): all innermost
    * `\(([^()]+)\)` groups, each parsed as a ring.
    */
  def rings(s: String): GenericArrayData = {
    val len = s.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    var i = 0
    while (i < len) {
      if (s.charAt(i) == '(') {
        var j = i + 1
        var c: Char = 0
        while (j < len && { c = s.charAt(j); c != '(' && c != ')' }) j += 1
        if (j < len && c == ')' && j > i + 1) {
          // a match: capture group 1 = the run between the parens
          out += pts(s.substring(i + 1, j))
          i = j + 1
        } else if (j < len && c == '(') {
          // no match can start strictly between i and j (a match starts
          // at '('); resume at the nested '('
          i = j
        } else {
          // empty "()" or unclosed tail: no match here, next possible
          // start is past j
          i = if (j < len) j + 1 else j
        }
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Static kernel: one group string → array of (x, y) structs. */
  def pts(g: String): GenericArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    val glen = g.length
    var segStart = 0
    var k = 0
    // split(g, ",", -1) keeps empty segments; the filter's trim-empty
    // check then drops whitespace-only ones, so empties never emit
    while (k <= glen) {
      if (k == glen || g.charAt(k) == ',') {
        // segment [segStart, k): space-trim (0x20 only, Spark trim)
        var a = segStart
        var b = k
        while (a < b && g.charAt(a) == ' ') a += 1
        while (b > a && g.charAt(b - 1) == ' ') b -= 1
        if (b > a) {
          // tokens = runs of non-space within the trimmed segment
          // (split(trimmed, " +", -1): no leading/trailing empties
          // because the segment is trimmed)
          var t = a
          var x: Any = null
          var y: Any = null
          var idx = 0
          while (t < b && idx < 2) {
            while (t < b && g.charAt(t) == ' ') t += 1
            if (t < b) {
              val ts = t
              while (t < b && g.charAt(t) != ' ') t += 1
              if (idx == 0) x = castDouble(g.substring(ts, t))
              else y = castDouble(g.substring(ts, t))
              idx += 1
            }
          }
          // fewer than 2 tokens: element_at past the end is NULL
          out += InternalRow(x, y)
        }
        segStart = k + 1
      }
      k += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Non-ANSI string→double cast, verbatim: Double.valueOf (accepts the
    * full Java literal grammar incl. leading/trailing whitespace, hex
    * floats, trailing d/f), falling back to Spark's special-literal
    * parser, else null.
    */
  private def castDouble(tok: String): Any =
    try java.lang.Double.valueOf(tok) catch {
      case _: NumberFormatException =>
        org.apache.spark.sql.catalyst.expressions.Cast
          .processFloatingPointSpecialLiterals(tok, isFloat = false)
    }
}
