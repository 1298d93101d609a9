package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Wide SimHash from a bound token-hash array — the corpus-scale twin of
  * [[TextOps.simhash16FromHashes]] (r12, the sf1 probe finding).
  *
  * The 16-bit signature's pigeonhole bands have a key space of at most
  * 2^6, so band-bucket occupancy grows linearly with corpus size and the
  * candidate join goes quadratic past ~10^5 docs (probe-measured: 22× at
  * 10× data). A 60-bit signature puts each radius-2 band at 2^20 keys —
  * bucket occupancy stays O(near-dup density) and the join is linear.
  * 60 bits (not 64) because the token hashes ride `conv(hex, 16, 10)`
  * into a SIGNED long: 15 hex chars = 60 bits is the widest value both
  * engines hold exactly.
  *
  * Vote semantics are bit-for-bit the 16-bit form's: bit j of each
  * distinct token's hash votes +1/−1, signature bit j is 1 iff the sum
  * is positive. The 16-bit form spells that as 16 HOF `aggregate` folds
  * (fine at 16); at 60 lanes the HOF spelling walks the array 60 times
  * interpreted, so this expression makes ONE pass with a counter array,
  * inside whole-stage codegen (the ShinglesExpr shape).
  */
case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 60, s"simhash bits in [1,60], got $bits")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash requires array<bigint> input, got $t")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashExpr.compute($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashExpr {
  /** Shared kernel for interpreted eval and generated code. A null
    * ELEMENT casts no votes (the HOF form's `aggregate` would propagate
    * a null element to a null signature; token hashes are md5-derived
    * and never null, so the branch is defensive, not semantic).
    */
  def compute(ad: ArrayData, bits: Int): Long = {
    val n = ad.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (!ad.isNullAt(i)) {
        val h = ad.getLong(i)
        var j = 0
        while (j < bits) {
          votes(j) += (((h >>> j) & 1L).toInt << 1) - 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Column-API entry point. */
  def simhash(hashes: Column, bits: Int): Column =
    GraftBridge.column(SimHashExpr(GraftBridge.expression(hashes), bits))
}
