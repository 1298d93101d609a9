package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All band buckets of a banded RHP-LSH signature in ONE pass (r12).
  *
  * The Column spelling ([[VectorOps.rhpBucketSeeded]] per band) is a
  * bands × bandBits × dim expression tree — at 4 × 8 × 64 that is a
  * 2048-node projection whose Janino compile dominates the query
  * (measured: 11.9 s driver-cold at sf0.1, nearly all codegen). This
  * expression is a tight loop over a precomputed ±1 sign table; the
  * generated code is one static call.
  *
  * Bit-for-bit the Column form's semantics (spec-asserted): the sign
  * table is the same [[VectorOps.rhpSign]] md5 parity, each projection
  * accumulates left-to-right over dimensions (the chain's left-assoc
  * order), bucket bit t of band b is `proj(b·bandBits + t) > 0`.
  * Returns array<long> of length `bands`. NULL input → NULL; a vector
  * shorter than `dim` rejects descriptively (the chain's element_at
  * would null-poison silently — fail closed instead).
  */
case class RhpBucketsExpr(child: Expression, bands: Int, bandBits: Int, dim: Int)
    extends UnaryExpression {
  require(bands >= 1 && bandBits >= 1 && bandBits <= 63, s"bad bands/bandBits: $bands/$bandBits")
  require(dim >= 1, s"dim must be >= 1, got $dim")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rhp_buckets requires array<float|double> input, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // dataType is only legal on a RESOLVED child — a constructor-time val
  // here throws UnresolvedException inside copy()/withNewChildInternal
  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    RhpBucketsExpr.compute(input.asInstanceOf[ArrayData], bands, bandBits, dim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RhpBucketsExpr.compute($c, $bands, $bandBits, $dim, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RhpBucketsExpr {
  // sign tables are tiny (planes × dim doubles) and shared across rows;
  // keyed by the geometry so distinct operators coexist in one JVM
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  private def signs(planes: Int, dim: Int): Array[Double] =
    signCache.computeIfAbsent((planes, dim), { _ =>
      val a = new Array[Double](planes * dim)
      var j = 0
      while (j < planes) {
        var i = 0
        while (i < dim) {
          a(j * dim + i) = VectorOps.rhpSign(j, i)
          i += 1
        }
        j += 1
      }
      a
    })

  /** Shared kernel for interpreted eval and generated code. */
  def compute(ad: ArrayData, bands: Int, bandBits: Int, dim: Int, isFloat: Boolean): ArrayData = {
    val n = ad.numElements()
    require(n >= dim, s"vector has $n elements, rhp buckets need $dim")
    // fail closed on null ELEMENTS (ADVICE r12): parquet list elements are
    // nullable by default, so checkInputDataTypes cannot reject
    // containsNull=true without breaking every real source; an unchecked
    // getFloat/getDouble on a null slot silently reads 0.0 (UnsafeArrayData)
    // and diverges from the Column form, whose element_at chain null-poisons
    // the whole projection — match the short-vector reject instead.
    var k = 0
    while (k < dim) {
      if (ad.isNullAt(k))
        throw new IllegalArgumentException(
          s"rhp buckets: null element at index $k (need $dim non-null values)")
      k += 1
    }
    val planes = bands * bandBits
    val s = signs(planes, dim)
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var t = 0
      while (t < bandBits) {
        val p = b * bandBits + t
        var proj = 0.0
        var i = 0
        while (i < dim) {
          val v = if (isFloat) ad.getFloat(i).toDouble else ad.getDouble(i)
          proj += v * s(p * dim + i)
          i += 1
        }
        if (proj > 0) bucket |= 1L << t
        t += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point: array<long> of the `bands` band buckets. */
  def rhpBuckets(vec: Column, bands: Int, bandBits: Int, dim: Int): Column =
    GraftBridge.column(RhpBucketsExpr(GraftBridge.expression(vec), bands, bandBits, dim))
}
