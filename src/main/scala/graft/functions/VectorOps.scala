package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector expression catalog (extension surface E2 of SURVEY.md
  * §2.6 — similarity search over `embeddings.embedding: array<float>`).
  *
  * Dot products are strict left folds in index order with a 0.0 initial
  * accumulator, so the identical bit pattern is reproducible by any engine
  * that folds left (DuckDB `list_reduce`) — which keeps cosine scores
  * oracle-hashable without tolerance hacks.
  */
object VectorOps {

  /** Ordered-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NULL when either norm is zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === lit(0.0), lit(null)).otherwise(dot(a, b) / denom)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(l2DistanceSq(a, b))

  /** Squared L2 — the in-order left fold from 0.0 (bit-identical across
    * engines when the oracle folds in the same order). Monotonic with
    * [[l2Distance]], so argmin rankings agree without the sqrt.
    */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** Symmetric int8 quantization of a float vector: scale = max|x|/127,
    * q_i = floor(x_i/max|x| · 127) clamped to [-127,127] (floor, not
    * round — no half-even ambiguity between engines; reconstruction error
    * ≤ scale). Every step is deterministic IEEE double arithmetic, so the
    * quantized codes are oracle-exact. Zero vectors quantize to zeros.
    * 4× storage cut for ANN candidate scoring; rescore survivors fp32.
    */
  def quantize8(v: Column): Column = {
    val amax = array_max(transform(v, x => abs(x.cast("double"))))
    when(amax === lit(0.0), transform(v, _ => lit(0L)))
      .otherwise(transform(v, x =>
        greatest(least(floor(x.cast("double") / amax * lit(127.0)), lit(127.0)), lit(-127.0))
          .cast("long")))
  }

  /** The dequantization scale paired with `quantize8`. */
  def quantize8Scale(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double")))) / lit(127.0)

  /** Random-hyperplane LSH bucket id with `bits` planes. Plane j's normal is
    * a deterministic md5-derived ±1 vector (seeded by (plane, dim index)), so
    * the same bucket ids are computable in the oracle — and, at scale, the
    * bucketing turns an O(N²) ANN search into a per-bucket local search.
    */
  def rhpBucket(v: Column, bits: Int, dim: Int): Column =
    (0 until bits)
      .map { j =>
        val proj = (0 until dim)
          .map { i =>
            val sign =
              when(TextOps.hexVal(md5(lit(s"$j|$i")), 1) % 2 === 0, lit(1.0)).otherwise(lit(-1.0))
            element_at(v, i + 1).cast("double") * sign
          }
          .reduce(_ + _)
        when(proj > 0, lit(1L << j)).otherwise(lit(0L))
      }
      .reduce(_ + _)

  /** The ±1 normal-component of RHP plane `j` at dimension `i` — the SAME
    * md5 parity `rhpBucket` folds in-plan, computed driver-side so (a)
    * band variants seed DISTINCT plane families via a plane offset and
    * (b) oracles interpolate the identical constant (r12).
    */
  def rhpSign(j: Int, i: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j|$i".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xf) % 2 == 0) 1.0 else -1.0
  }

  /** `rhpBucket` with the plane family shifted by `planeOffset` — band b
    * of a banded-LSH signature uses planes [offset, offset + bits) so
    * every band hashes with INDEPENDENT hyperplanes, while the bucket's
    * bit positions stay local (the sum fits `bits` bits). At
    * planeOffset = 0 this is bit-identical to [[rhpBucket]] (signs are
    * the same md5 parities, the sum the same left-assoc chain) —
    * spec-asserted.
    */
  def rhpBucketSeeded(v: Column, bits: Int, dim: Int, planeOffset: Int): Column =
    (0 until bits)
      .map { t =>
        val proj = (0 until dim)
          .map(i => element_at(v, i + 1).cast("double") * lit(rhpSign(planeOffset + t, i)))
          .reduce(_ + _)
        when(proj > 0, lit(1L << t)).otherwise(lit(0L))
      }
      .reduce(_ + _)
}
