package graft.operators

import graft.functions.SpatialOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed bbox-intersection join (SURVEY.md §2.4 J6 general case, §4
  * custom item 3).
  *
  * The reference's spatial predicates are all grid-resolvable (affine
  * point-in-pixel, image_segmentation.py tiling); the general vector case —
  * "which polygons overlap which query regions" — appears as soon as the
  * Stage-2/3 polygon tables meet external vector layers. A naive theta join
  * (`a.xmin <= b.xmax AND …`) plans as a cartesian product: O(|L|·|R|)
  * comparisons, a non-starter at 100 TB.
  *
  * This operator is the classic Partition-Based Spatial-Merge join (PBSM,
  * Patel & DeWitt SIGMOD'96) re-expressed in DataFrame algebra:
  *
  *  1. **Bin**: each side explodes its envelope onto a uniform grid —
  *     one row per covering cell (`explode(sequence(...))` twice). Cell
  *     count per box is bounded by (box/cell + 1)², so duplication stays
  *     O(1) when `cellSize` tracks the typical envelope size.
  *  2. **Equi-join on the cell key** — a plain integer shuffle join, which
  *     Catalyst executes as SMJ/SHJ with both sides hash-partitioned on
  *     (cx, cy): the scale-correct shape (no broadcast requirement, no
  *     cartesian), AQE-skew-splittable when one cell is hot.
  *  3. **Exact predicate** on the envelope pair.
  *  4. **Reference-point dedup**: a pair overlapping k shared cells would
  *     emit k times; instead of a `distinct` (second shuffle over the full
  *     result), keep the pair only in the single cell that contains the
  *     intersection's min corner `(max(xmins), max(ymins))` — that corner
  *     lies in both envelopes, so exactly one surviving copy exists, and
  *     the filter is evaluated join-local (zero extra exchange).
  *
  * Matches the closed-interval semantics of [[SpatialOps.bboxIntersects]]
  * (touching edges intersect).
  */
object SpatialJoin {

  private def cellX(x: Column, cellSize: Double): Column =
    floor(x / lit(cellSize)).cast("long")

  /** Explode `df` to one row per grid cell covered by its `env` struct. */
  private def binned(df: DataFrame, env: String, cx: String, cy: String,
      cellSize: Double): DataFrame =
    df.withColumn(cx, explode(sequence(
        cellX(col(env).getField("xmin"), cellSize),
        cellX(col(env).getField("xmax"), cellSize))))
      .withColumn(cy, explode(sequence(
        cellX(col(env).getField("ymin"), cellSize),
        cellX(col(env).getField("ymax"), cellSize))))

  /** Inner-join rows of `left` and `right` whose envelope structs intersect.
    *
    * `left` must carry an envelope struct column `leftEnv` and `right` one
    * named `rightEnv` (distinct names; build with [[SpatialOps.bbox]] or
    * [[SpatialOps.wktEnvelope]]). All other column names must be disjoint.
    * `cellSize` is the binning grid pitch — set it near the typical
    * envelope extent: smaller cells = finer candidate pruning but more
    * duplication; larger cells = fewer copies but fatter cells.
    *
    * `salts` > 1 hardens the join against HOT CELLS (the one-dense-city
    * distribution): real spatial data is zipfian — one downtown cell can
    * hold a large share of both sides, and since all of a key's rows must
    * co-locate for the equi-join, that one (cx, cy) key becomes a single
    * giant task no matter how many partitions exist (AQE's skew split
    * cannot divide one key). The classic fix, applied inside the
    * operator: the LEFT copy of each cell row gets a deterministic salt
    * (envelope hash mod `salts`) appended to the join key, the RIGHT copy
    * is replicated across all `salts` values — every candidate pair still
    * meets exactly once (left holds one salt, right covers all), so the
    * result set is IDENTICAL to the unsalted join while the hot cell's
    * work spreads over `salts` tasks. Cost: right-side cell rows × salts
    * — size `salts` to the observed hot-cell ratio, keep 1 for uniform
    * data.
    *
    * `refine` (r13) is the exact-geometry stage of the classic
    * filter-refine pipeline: any predicate over both sides' columns —
    * typically [[SpatialOps.ringsContainPoint]] or
    * [[SpatialOps.ringsIntersectPolys]] over pre-parsed ring columns. It
    * is ANDed into the join condition, so it evaluates JOIN-LOCAL on the
    * bbox survivors (no second shuffle, no intermediate materialization);
    * because the exact predicates are CLOSED like the envelope test, the
    * refine can only shrink the candidate set. Default `lit(true)` keeps
    * the join envelope-exact (the pre-r13 behavior).
    */
  def bboxJoin(
      left: DataFrame, right: DataFrame,
      leftEnv: String, rightEnv: String,
      cellSize: Double,
      salts: Int = 1,
      refine: Column = lit(true)): DataFrame = {
    require(cellSize > 0, s"cellSize must be positive, got $cellSize")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val l0 = binned(left, leftEnv, "__gj_cx", "__gj_cy", cellSize)
    val r0 = binned(right, rightEnv, "__gj_cx_r", "__gj_cy_r", cellSize)
    val (le, re) = (col(leftEnv), col(rightEnv))
    val (l, r, saltKeys) =
      if (salts == 1) (l0, r0, Nil)
      else (
        // salt over ALL left columns, not just the envelope: a hot cell
        // full of duplicate geometries (stacked points are common in real
        // data) would otherwise collapse onto few salts and stay hot
        l0.withColumn("__gj_salt",
          pmod(xxhash64(l0.columns.map(col).toSeq: _*), lit(salts)).cast("int")),
        r0.withColumn("__gj_salt_r", explode(sequence(lit(0), lit(salts - 1)))),
        Seq(col("__gj_salt") === col("__gj_salt_r")))
    // min corner of the intersection — the unique reporting cell
    val refX = greatest(le.getField("xmin"), re.getField("xmin"))
    val refY = greatest(le.getField("ymin"), re.getField("ymin"))
    val cond = (Seq(
      col("__gj_cx") === col("__gj_cx_r"),
      col("__gj_cy") === col("__gj_cy_r")) ++ saltKeys ++ Seq(
      SpatialOps.bboxIntersects(le, re),
      cellX(refX, cellSize) === col("__gj_cx"),
      cellX(refY, cellSize) === col("__gj_cy"),
      refine)).reduce(_ && _)
    l.join(r, cond)
      .drop("__gj_cx", "__gj_cy", "__gj_cx_r", "__gj_cy_r", "__gj_salt", "__gj_salt_r")
  }
}
