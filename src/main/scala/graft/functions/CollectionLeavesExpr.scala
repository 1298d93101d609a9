package graft.functions

import java.util.Locale

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** GEOMETRYCOLLECTION → its LEAF geometries as standalone WKT strings,
  * through arbitrary nesting (r12 — closes the last documented WKT
  * reject; the flat surface [[SpatialOps.collectionMembers]] keeps its
  * loud nested reject for callers that want the one-level contract).
  *
  * Nesting cannot be split by the flat surface's keyword-lookahead regex:
  * a member that is itself `GEOMETRYCOLLECTION(...)` contains inner
  * member commas that the lookahead cannot tell from outer ones — only a
  * parenthesis-depth walk can. Regex/Column algebra has no depth counter,
  * so this is a custom codegen expression (the ShinglesExpr shape): one
  * child eval, one linear scan per nesting level, inside whole-stage
  * codegen.
  *
  * Semantics (the flat surface's contract, extended through depth):
  *   - non-collection input → one-element array (ONE surface for both
  *     layouts, same as the flat form)
  *   - `GEOMETRYCOLLECTION EMPTY` and the nonstandard-but-seen `()` /
  *     `( )` spellings → zero leaves, at ANY depth — a nested EMPTY
  *     contributes nothing and later siblings' leaf indices shift left
  *   - leaves emit depth-first in textual order, trimmed, original case
  *   - `Z`/`M`/`ZM` designators reject loudly at any depth (2D only,
  *     matching the flat surface and the measures)
  *   - unbalanced parentheses, trailing garbage, EMPTY MEMBERS (stray
  *     or double commas), and empty input reject loudly (fail closed —
  *     silently mis-splitting or index-shifting one geometry re-keys
  *     downstream joins worse than any crash)
  *   - nesting deeper than [[CollectionLeavesExpr.MaxDepth]] rejects
  *     loudly (a one-line hostile input can spell unbounded depth;
  *     recursion must not become the stack-overflow surface)
  *   - NULL input → NULL (null-intolerant, like every scalar here)
  *
  * Reference anchor: the reference reads vector members via fiona/OGR,
  * which flattens nested collections the same leaf-order way
  * (pipeline.py:61 loads features; OGR's GetGeometryRef recursion).
  */
case class CollectionLeavesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"collection_leaves requires string input, got $t")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    CollectionLeavesExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CollectionLeavesExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CollectionLeavesExpr {
  /** Depth cap: real data nests 1-2 deep; 32 is "any legitimate file"
    * headroom while keeping a hostile one-liner from driving recursion
    * to a StackOverflowError (which would kill the task, not the row).
    */
  val MaxDepth = 32

  private val Keyword = "GEOMETRYCOLLECTION"

  /** Shared kernel for interpreted eval and generated code (static
    * forwarder — callable from Janino output). Never sees null.
    */
  def compute(s: UTF8String): ArrayData = {
    val full = s.toString
    if (full.trim.isEmpty)
      fail("empty WKT string", full)
    val out = new ArrayBuffer[Any]
    walk(full, full, 1, out)
    new GenericArrayData(out.toArray)
  }

  private def fail(what: String, full: String): Nothing =
    throw new IllegalArgumentException(s"$what: $full")

  private def walk(g: String, full: String, depth: Int, out: ArrayBuffer[Any]): Unit = {
    val t = g.trim
    // an empty MEMBER means a stray/double comma — reject (fail closed:
    // silently skipping one shifts every later sibling's leaf index,
    // re-keying downstream joins); the whitespace-only BODY of the
    // nonstandard 'GEOMETRYCOLLECTION ()' spelling never reaches here
    // (the body parse short-circuits it to zero members)
    if (t.isEmpty)
      fail("malformed GEOMETRYCOLLECTION (empty member — stray comma)", full)
    if (depth > MaxDepth)
      fail(s"GEOMETRYCOLLECTION nesting exceeds depth $MaxDepth", full)
    if (!t.regionMatches(true, 0, Keyword, 0, Keyword.length)) {
      // a leaf geometry: pass through trimmed, original spelling intact
      out += UTF8String.fromString(t)
      return
    }
    var i = Keyword.length
    while (i < t.length && Character.isWhitespace(t.charAt(i))) i += 1
    if (i >= t.length)
      fail("malformed GEOMETRYCOLLECTION (no body)", full)
    val restUp = t.substring(i).toUpperCase(Locale.ROOT)
    if (restUp.matches("^(Z|M|ZM)\\b.*") || restUp.matches("^(Z|M|ZM)\\(.*"))
      fail("3D/measured GEOMETRYCOLLECTION unsupported (2D only)", full)
    if (restUp == "EMPTY") return // zero leaves at any depth
    if (t.charAt(i) != '(')
      fail("malformed GEOMETRYCOLLECTION (expected '(' or EMPTY)", full)
    // find the matching close paren with a depth counter
    var pd = 0
    var j = i
    var close = -1
    while (j < t.length && close < 0) {
      val c = t.charAt(j)
      if (c == '(') pd += 1
      else if (c == ')') { pd -= 1; if (pd == 0) close = j }
      j += 1
    }
    if (close < 0)
      fail("malformed GEOMETRYCOLLECTION (unbalanced parentheses)", full)
    if (t.substring(close + 1).trim.nonEmpty)
      fail("malformed GEOMETRYCOLLECTION (content after close)", full)
    // split the body on top-level commas, recurse each member
    val body = t.substring(i + 1, close)
    if (body.trim.isEmpty) return // the nonstandard '()' spelling: zero members
    var start = 0
    var k = 0
    var bd = 0
    while (k < body.length) {
      val c = body.charAt(k)
      if (c == '(') bd += 1
      else if (c == ')') {
        bd -= 1
        if (bd < 0) fail("malformed GEOMETRYCOLLECTION (unbalanced parentheses)", full)
      } else if (c == ',' && bd == 0) {
        walk(body.substring(start, k), full, depth + 1, out)
        start = k + 1
      }
      k += 1
    }
    if (bd != 0)
      fail("malformed GEOMETRYCOLLECTION (unbalanced parentheses)", full)
    walk(body.substring(start), full, depth + 1, out)
  }

  /** Column-API entry point. */
  def collectionLeaves(wkt: Column): Column =
    GraftBridge.column(CollectionLeavesExpr(GraftBridge.expression(wkt)))
}
