package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A8 — first-principal-component projection per tile (SURVEY.md §2.3 A8).
  *
  * The reference runs sklearn `PCA(n_components=1).fit_transform` on each
  * tile's pixel×band matrix as a segmentation feature
  * (image_segmentation.py:73-78). Per-GROUP PCA doesn't fit Spark ML's
  * global estimator shape, and it doesn't need to: for one component only
  * the d×d channel covariance and its principal eigenvector are required.
  * So: one hash aggregation computes per-tile moment sums (map-side
  * partial, single shuffle of d² doubles per tile), the driver-free
  * eigen-solve happens inside the plan via a deterministic power iteration
  * over the tiny covariance (plain Scala on broadcastable rows), and the
  * projection is a broadcast join + dot product. No pixel matrix is ever
  * collected.
  */
object TilePca {

  /** Deterministic power iteration for the principal eigenvector of a
    * symmetric d×d matrix (fixed start = normalized ones, fixed iterations;
    * sign convention: first nonzero component positive).
    */
  def principalEigenvector(cov: Array[Array[Double]], iters: Int = 64): Array[Double] = {
    val d = cov.length
    // non-uniform deterministic start: an all-equal start is exactly
    // orthogonal to any (+a,-a,...) principal axis and never converges
    val n0 = math.sqrt((1 to d).map(i => i.toDouble * i).sum)
    var v = Array.tabulate(d)(i => (i + 1) / n0)
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val n = math.sqrt(w.map(x => x * x).sum)
      if (n == 0.0) return v
      v = w.map(_ / n)
      it += 1
    }
    val lead = v.find(math.abs(_) > 1e-12).getOrElse(1.0)
    if (lead < 0) v.map(-_) else v
  }

  /** Add `pca1`: the centered projection of `featureCols` onto the tile's
    * principal component. Exactly two jobs: the moment aggregation (tiny
    * result: one row per tile) and the projected scan.
    *
    * NULL semantics: moments are NULL-aware (per-feature and per-pair
    * counts, so partially-null tiles get unbiased means/covariance); an
    * entirely-NULL feature contributes mean 0 / covariance 0 and simply
    * drops out of the axis. Rows whose own features contain NULLs project
    * to a NULL `pca1` — impute first (e.g. `ScalarOps.fillNoData`) if that
    * is not wanted, as `Stages.prepareSegmentationFeatures` does.
    */
  def withPca1(df: DataFrame, tileCols: Seq[String], featureCols: Seq[String]): DataFrame = {
    val d = featureCols.length
    val spark = df.sparkSession

    // per-tile first and second moments (map-side combined); sums coalesced
    // to 0 and counts tracked per feature / per pair so NULLs don't bias
    val moments = df.groupBy(tileCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      Seq.tabulate(d)(i => coalesce(sum(col(featureCols(i)).cast("double")), lit(0.0)).as(s"s$i")) ++
        Seq.tabulate(d)(i => count(col(featureCols(i))).as(s"n$i")) ++
        (for { i <- 0 until d; j <- i until d } yield
          coalesce(sum((col(featureCols(i)) * col(featureCols(j))).cast("double")), lit(0.0)).as(s"p${i}_$j")) ++
        (for { i <- 0 until d; j <- i until d } yield
          count(col(featureCols(i)) * col(featureCols(j))).as(s"c${i}_$j")): _*)

    // eigen-solve per tile row (rows = #tiles, trivially small)
    import spark.implicits._
    val keyIdx = tileCols.indices
    val nPairs = d * (d + 1) / 2
    val withVec = moments.map { row =>
      val base = tileCols.length + 1
      val mean = Array.tabulate(d) { i =>
        val ni = row.getAs[Long](base + d + i)
        if (ni == 0L) 0.0 else row.getDouble(base + i) / ni
      }
      val cov = Array.ofDim[Double](d, d)
      var k = 0
      for { i <- 0 until d; j <- i until d } {
        val nij = row.getAs[Long](base + 2 * d + nPairs + k)
        val c =
          if (nij == 0L) 0.0
          else row.getDouble(base + 2 * d + k) / nij - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        k += 1
      }
      val v = principalEigenvector(cov)
      (keyIdx.map(i => String.valueOf(row.get(i))).mkString("|"), mean.toSeq, v.toSeq)
    }.toDF("tile_key", "mean", "pc1")

    val keyed = df.withColumn("tile_key",
      concat_ws("|", tileCols.map(c => col(c).cast("string")): _*))
    val projected = keyed
      .join(broadcast(withVec), Seq("tile_key"))
      .withColumn("pca1",
        featureCols.indices
          .map(i => (col(featureCols(i)) - element_at(col("mean"), i + 1)) *
            element_at(col("pc1"), i + 1))
          .reduce(_ + _))
      .drop("tile_key", "mean", "pc1")
    projected
  }
}
