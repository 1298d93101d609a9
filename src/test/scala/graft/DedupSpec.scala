package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "dog lazy the over jumps fox brown quick the"),   // permutation of 1
    (4L, "the quick brown fox jumps over the lazy cat"),   // near-dup (1 token)
    (5L, "completely different content about spark engines")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min doc_id per identical text (E1)") {
    val kept = Dedup.dedupExact(docs).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L))
    val groups = Dedup.exactGroups(docs).filter(col("n_dups") > 1).collect()
    assert(groups.length == 1 && groups(0).getAs[Long]("keep_id") == 1L)
  }

  test("fingerprint groups collapse token permutations (E1b)") {
    val g = Dedup.fingerprintGroups(docs).filter(col("n_dups") >= 3).collect()
    assert(g.length == 1 && g(0).getAs[Long]("keep_id") == 1L) // docs 1,2,3 share the token set
  }

  test("identical docs get identical minhash signatures; near-dups share bands (E2)") {
    val sig = Dedup.minhashSignatures(docs, numHashes = 8).orderBy("doc_id").collect()
    assert(sig(0).toSeq.tail == sig(1).toSeq.tail) // docs 1,2 identical
    val pairs = Dedup.minhashCandidatePairs(docs, numHashes = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => b == 5L || a == 5L }) // unrelated doc never paired
  }

  test("jaccardVerify computes exact shingle jaccard on candidates (E2)") {
    val pairs = Seq((1L, 2L), (1L, 5L)).toDF("a", "b")
    val v = Dedup.jaccardVerify(docs, pairs, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(v((1L, 2L)) == 1.0)     // identical docs
    assert(!v.contains((1L, 5L)))  // below threshold (filtered)
  }

  test("embeddingNearDupPairs: exact pairs above threshold; LSH returns a subset (E2/E8)") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.05f, 0.0f)), // near-dup of 1
      (3L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDupPairs(vecs, threshold = 0.9, bits = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((1L, 2L)))
    val lsh = Dedup.embeddingNearDupPairs(vecs, threshold = 0.9, bits = 2, dim = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
  }

  test("simhashNearDupPairs equals brute-force all-pairs within the radius (E14)") {
    val byDoc = docs.select(col("doc_id"), graft.functions.TextOps.simhash16(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (radius <- Seq(0, 2, 5)) {
      val brute = (for {
        a <- byDoc.keys; b <- byDoc.keys if a < b
        if java.lang.Long.bitCount(byDoc(a) ^ byDoc(b)) <= radius
      } yield (a, b)).toSet
      val banded = Dedup.simhashNearDupPairs(docs, maxHamming = radius)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(banded == brute, s"radius=$radius")
      // reported hamming distances are the true distances
      val dists = Dedup.simhashNearDupPairs(docs, maxHamming = radius)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      dists.foreach { case ((a, b), h) =>
        assert(h == java.lang.Long.bitCount(byDoc(a) ^ byDoc(b)))
      }
    }
  }

  test("embeddingNearDupPairsBanded: candidates = pairs sharing >=1 band; seeded bucket == legacy at offset 0 (E8b)") {
    import graft.functions.VectorOps
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val bands = 3; val bb = 4
    // driver-side replica of the banded contract
    val sigs = vecs.select(col("vec_id") +:
        (0 until bands).map(b =>
          VectorOps.rhpBucketSeeded(col("embedding"), bb, 8, b * bb).as(s"b$b")): _*)
      .collect().map(r => r.getLong(0) -> (1 to bands).map(r.getLong(_))).toMap
    val raw = vecs.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.indices.map(i => a(i).toDouble * b(i)).sum
      d / math.sqrt(a.map(x => x.toDouble * x).sum * b.map(x => x.toDouble * x).sum)
    }
    val expected = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if sigs(a).zip(sigs(b)).exists { case (x, y) => x == y }
      if cos(raw(a), raw(b)) >= 0.2
    } yield (a, b)).toSet
    val got = Dedup.embeddingNearDupPairsBanded(vecs, threshold = 0.2,
        bands = bands, bandBits = bb, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    // plane-offset 0 reproduces the legacy single-table bucket bit-for-bit
    val eq = vecs.select(
      VectorOps.rhpBucket(col("embedding"), 6, 8).as("legacy"),
      VectorOps.rhpBucketSeeded(col("embedding"), 6, 8, 0).as("seeded"))
      .collect()
    eq.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("simhashNearDupPairsWide (60-bit) equals brute-force; SimHashExpr matches the HOF votes (E14b)") {
    // the wide signature: same vote semantics, checked against brute force
    val byDoc = docs.select(col("doc_id"), graft.functions.TextOps.simhash60(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.values.foreach(h => assert(h >= 0L && h < (1L << 60)))
    for (radius <- Seq(0, 2, 5)) {
      val brute = (for {
        a <- byDoc.keys; b <- byDoc.keys if a < b
        if java.lang.Long.bitCount(byDoc(a) ^ byDoc(b)) <= radius
      } yield (a, b)).toSet
      val banded = Dedup.simhashNearDupPairsWide(docs, maxHamming = radius)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(banded == brute, s"radius=$radius")
    }
    // exact dup (1,2) is radius-0 close; permutation 3 shares the token
    // SET so its distinct-token signature is identical too
    assert(java.lang.Long.bitCount(byDoc(1L) ^ byDoc(2L)) == 0)
    assert(java.lang.Long.bitCount(byDoc(1L) ^ byDoc(3L)) == 0)
    // the codegen kernel IS the HOF vote fold: at bits=16 over the same
    // hash array the two spellings must agree bit for bit
    val both = docs.select(
      graft.functions.TextOps.simhash16(col("text")).as("hof"),
      graft.functions.SimHashExpr.simhash(
        graft.functions.TextOps.tokenHashes16(col("text")), 16).as("gen"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("simhash groups identical docs together (E6)") {
    val g = Dedup.simhashGroups(docs)
    val dupGroup = g.filter(col("n_dups") >= 2).collect()
    assert(dupGroup.nonEmpty)
    // simhash of near-identical docs 1 & 4 differ by few bits
    val byDoc = docs.select(col("doc_id"), graft.functions.TextOps.simhash16(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hamming = java.lang.Long.bitCount(byDoc(1L) ^ byDoc(4L))
    assert(hamming <= 8, s"near-dups should be close in simhash space, got $hamming")
  }

  test("semanticDedup keeps the most atypical member of each near-dup pair") {
    val centroids = Seq(
      (0, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1, Seq(0.0f, 1.0f, 0.0f, 0.0f))).toDF("cell", "centroid")
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // cell 0, c_sim = 1 (most typical)
      (11L, Seq(0.95f, 0.3f, 0.0f, 0.0f)),  // cell 0, near-dup of 10, less typical
      (12L, Seq(0.0f, 0.2f, 1.0f, 0.0f)),   // cell 0 or 1? → far from both dups
      (20L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),   // cell 1, typical
      (21L, Seq(0.2f, 0.97f, 0.0f, 0.0f)),  // cell 1, near-dup of 20, less typical
      (30L, Seq(0.0f, 0.0f, 0.0f, 0.0f))    // zero vector: NULL c_sim, never drops
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(corpus, centroids, threshold = 0.9)
      .orderBy("vec_id").collect()
    val dropped = out.filter(_.getAs[Boolean]("dropped")).map(_.getLong(0)).toSet
    // in each pair the member MORE similar to its centroid drops
    assert(dropped == Set(10L, 20L), s"got $dropped")
    // zero vector survives with NULL c_sim
    val zero = out.find(_.getLong(0) == 30L).get
    assert(zero.isNullAt(zero.fieldIndex("c_sim")) && !zero.getAs[Boolean]("dropped"))
    // blocking contract: a near-dup pair straddling two cells is unreachable
    val straddle = Seq(
      (40L, Seq(0.75f, 0.66f, 0.0f, 0.0f)),  // lands cell 0
      (41L, Seq(0.66f, 0.75f, 0.0f, 0.0f))   // lands cell 1; cos(40,41) ≈ 0.98
    ).toDF("vec_id", "embedding")
    val s2 = Dedup.semanticDedup(straddle, centroids, threshold = 0.9).collect()
    assert(s2.forall(!_.getAs[Boolean]("dropped")), "cross-cell pairs must not form")
    assert(s2.map(_.getAs[Int]("cell")).toSet == Set(0, 1))
    // partition invariance
    val rep = Dedup.semanticDedup(corpus.repartition(7), centroids, threshold = 0.9)
      .orderBy("vec_id").collect()
    assert(rep.map(r => (r.getLong(0), r.getAs[Boolean]("dropped"))).toSeq ==
      out.map(r => (r.getLong(0), r.getAs[Boolean]("dropped"))).toSeq)
  }
}
