package graft.operators

import graft.functions.{CosineSimExpr, VectorOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E2 — similarity search over embedding columns (SURVEY.md §2.6 E2).
  *
  * Two paths:
  *   - `bruteForceTopK`: exact cosine top-k. The query side is broadcast
  *     (queries ≪ corpus), so the corpus is scanned exactly once with no
  *     shuffle of the big side; top-k is a per-query window over the
  *     (|Q|·k)-sized candidate set. Right shape for "few queries, huge
  *     corpus" — the common retrieval-eval pattern.
  *   - `lshTopK`: random-hyperplane LSH bucketing; only same-bucket pairs
  *     are scored. Turns O(|Q|·|C|) into O(Σ per-bucket products) — the
  *     100 TB scale path, trading recall for a bounded candidate set.
  *
  * Determinism: ranking orders by (score DESC, corpus id ASC) so ties are
  * stable (SURVEY.md §7 hard part c).
  */
object Similarity {

  def withCosine(
      pairs: DataFrame,
      qVec: String = "q_emb",
      cVec: String = "c_emb"): DataFrame =
    pairs.withColumn("score", CosineSimExpr.cosineSim(col(qVec), col(cVec)))

  /** Rank the per-query top-k: first prune to k rows per query with the
    * custom TopKPerKey operator (bounded heaps, O(n log k), shuffles at
    * most k rows per query per partition — never the full scored set),
    * then number the ≤ k·|Q| survivors with an ordinary window (trivially
    * cheap at that size).
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val pruned = graft.plans.TopK.perKey(scored, Seq(col("query_id")),
      Seq(col("score").desc, col("neighbor_id").asc), k)
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)
    pruned
      .withColumn("rank", row_number().over(w))
      .select("query_id", "neighbor_id", "score", "rank")
  }

  /** Exact top-k neighbors for each query vector. */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_emb"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_emb"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", CosineSimExpr.cosineSim(col("q_emb"), col("c_emb")))
    rankTopK(scored, k)
  }

  /** IVF (inverted-file) ANN: KMeans-partition the corpus into `nLists`
    * cells (seeded, deterministic), then search only each query's `nProbe`
    * nearest cells. The 100 TB shape: the corpus is scanned once to build
    * the index, probes touch nProbe/nLists of the data, centroids are a
    * tiny broadcast table. Complements `lshTopK` (hash-based) with the
    * geometry-aware variant.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nLists: Int,
      nProbe: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: Long = 42L,
      maxIter: Int = 5,
      trainSample: Double = 1.0): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}

    val corpusVec = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("c_emb"),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    // Index-build cost control: centroids only need to partition space, not
    // converge — a handful of Lloyd iterations on a (seeded, deterministic)
    // sample is how production IVF trains at corpus scale. Probing quality
    // is governed by nProbe, not centroid convergence.
    val trainSet =
      if (trainSample >= 1.0) corpusVec
      else corpusVec.sample(withReplacement = false, trainSample, seed)
    // random init (1 pass) over k-means|| (~5 passes): with a few Lloyd
    // rounds on top, cell quality is equivalent for IVF routing purposes
    // and the index build drops several full-corpus passes
    val km = new KMeans().setK(nLists).setSeed(seed).setMaxIter(maxIter)
      .setInitMode("random")
      .setFeaturesCol("features")
    val model = km.fit(trainSet)
    val indexed = model.transform(corpusVec)
      .select(col("neighbor_id"), col("c_emb"), col("prediction").as("cell"))

    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat).toSeq)
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroidDf = centroids.toSeq.toDF("cell", "centroid")

    // route each query to its nProbe nearest cells (centroid table broadcast)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_emb"))
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("cdist").asc, col("cell").asc)
    val probes = q.join(broadcast(centroidDf))
      .withColumn("cdist", VectorOps.l2Distance(col("q_emb"), col("centroid")))
      .withColumn("prank", row_number().over(probeW))
      .filter(col("prank") <= nProbe)
      .select("query_id", "q_emb", "cell")

    val scored = indexed
      .join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", CosineSimExpr.cosineSim(col("q_emb"), col("c_emb")))
    rankTopK(scored, k)
  }

  /** Approximate top-k via random-hyperplane LSH: candidates share a bucket. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      bits: Int,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val bucket = (v: org.apache.spark.sql.Column) => VectorOps.rhpBucket(v, bits, dim)
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_emb"), bucket(col(vecCol)).as("bucket"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("c_emb"), bucket(col(vecCol)).as("bucket"))
    val scored = c
      .join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", CosineSimExpr.cosineSim(col("q_emb"), col("c_emb")))
    rankTopK(scored, k)
  }
}
