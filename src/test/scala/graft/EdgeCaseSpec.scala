package graft

import graft.functions.{SpatialOps, VectorOps}
import graft.operators.{Halo, MlOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case behavior pinned explicitly. */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("withHalo rejects pads that don't fit the tile") {
    val df = Seq((0, 0)).toDF("px_row", "px_col")
    intercept[IllegalArgumentException] {
      Halo.withHalo(df, "px_row", "px_col", 4, 4, 4)
    }
    intercept[IllegalArgumentException] {
      Halo.withHalo(df, "px_row", "px_col", 4, 4, -1)
    }
  }

  test("rhpBucket is deterministic and bounded by 2^bits") {
    val vecs = Seq(
      (1L, Array(0.5f, -0.2f, 0.9f)),
      (2L, Array(0.5f, -0.2f, 0.9f)),
      (3L, Array(-0.5f, 0.2f, -0.9f))).toDF("vec_id", "embedding")
    val out = vecs.select(col("vec_id"), VectorOps.rhpBucket(col("embedding"), 4, 3).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L))                       // same vector → same bucket
    assert(out.values.forall(b => b >= 0 && b < 16)) // 4 bits
  }

  test("dispatchByCombo drops apply-combos with no training data") {
    val train = Seq((Some(1.0), Some(2.0), 1)).toDF("B1", "B2", "label")
    val apply = Seq(
      (Some(1.0), Some(2.0), 0),                  // combo B1_B2: trainable
      (Some(1.0), None: Option[Double], 0)        // combo B1: no training rows
    ).toDF("B1", "B2", "label")
    val out = MlOps.dispatchByCombo(train, apply, Seq("B1", "B2"), "label")
    assert(out.count() == 1)
    assert(out.select("combo").head().getString(0) == "B1_B2")
  }

  test("wktEnvelope handles polygons with holes") {
    val wkt = "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    val env = Seq(wkt).toDF("wkt")
      .select(SpatialOps.wktEnvelope(col("wkt")).as("e")).select("e.*").collect()(0)
    assert(env.getDouble(0) == 0.0 && env.getDouble(2) == 3.0)
  }

  test("empty-text documents survive the text pipeline") {
    val df = Seq((1L, ""), (2L, "one")).toDF("doc_id", "text")
    val stats = df.select(col("doc_id"),
      graft.functions.TextOps.tokenCount(col("text")).as("n"),
      graft.functions.TextOps.rollingFingerprint(col("text")).as("fp"),
      graft.functions.TextOps.simhash16(col("text")).as("sh"))
      .orderBy("doc_id").collect()
    // split("") yields [""]: one empty token — counted, hashed, no crash
    assert(stats(0).getInt(1) == 1)
    assert(!stats(0).isNullAt(2) && !stats(0).isNullAt(3))
  }

  test("cosine of mismatched-length arrays compares the common prefix (fused expr)") {
    val df = Seq((Array(1.0f, 0.0f, 5.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val v = df.select(graft.functions.CosineSimExpr.cosineSim(col("a"), col("b"))).head().getDouble(0)
    // dot AND both norms run over min(len) — identical prefixes → exactly 1
    assert(v == 1.0)
  }

  test("round-2 operators survive empty inputs") {
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(graft.operators.Graph.connectedComponents(noEdges).count() == 0)
    assert(graft.operators.Graph.connectedComponents(noEdges, localThreshold = -1L).count() == 0)

    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.plans.TopK.perKey(noDocs, Seq(col("doc_id")),
      Seq(col("text").desc), 3).count() == 0)
    assert(graft.operators.Curation.topTfidfTerms(noDocs, 3).count() == 0)
    assert(graft.operators.Curation.packByTokenBudget(noDocs,
      graft.functions.TextOps.tokenCount(col("text")), "doc_id", 100).count() == 0)
    assert(graft.operators.Dedup.fuzzyDupPairs(noDocs, 0.5).count() == 0)

    val noEvents = Seq.empty[(Long, java.sql.Timestamp, Long)].toDF("event_id", "ts", "user_id")
    assert(graft.streaming.EventStream.sessionizeBatch(noEvents, 1800).count() == 0)
  }

  test("round-4 session operators survive empty and degenerate inputs") {
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    // simhash pairs: empty input, and empty with a bucket cap
    assert(graft.operators.Dedup.simhashNearDupPairs(noDocs).count() == 0)
    assert(graft.operators.Dedup.simhashNearDupPairs(docs, maxBucket = 1).count() == 0)
    // novelty: empty reference → everything fully novel
    val nov = graft.operators.Curation.gramNovelty(docs, noDocs)
      .collect().map(_.getDouble(3))
    assert(nov.length == 2 && nov.forall(_ == 1.0))
    // novelty/entropy/pmi on empty corpora
    assert(graft.operators.Curation.gramNovelty(noDocs, docs).count() == 0)
    assert(graft.operators.Curation.tokenEntropy(noDocs).count() == 0)
    assert(graft.operators.Curation.bigramPmi(noDocs, minCount = 1).count() == 0)
    // graph analytics on empty edge lists
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(graft.operators.Graph.triangles(noEdges).count() == 0)
    assert(graft.operators.Graph.degrees(noEdges).count() == 0)
    // knn with an empty corpus: no neighbors, no predictions
    val noVecs = Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(graft.operators.Similarity.knnClassify(q, noVecs, k = 3).count() == 0)
  }

  test("pmi and novelty are invariant under partition layout") {
    val docs = (1L to 60L).map(i => (i, s"w${i % 5} w${i % 7} w${i % 5} w${i % 3}"))
      .toDF("doc_id", "text")
    def pmi(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Curation.bigramPmi(df, minCount = 2)
        .orderBy("w1", "w2").collect().map(_.toSeq).toSeq
    assert(pmi(docs) == pmi(docs.repartition(13)))
    def novel(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Curation.gramNovelty(df.filter(col("doc_id") > 30),
          df.filter(col("doc_id") <= 30))
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(novel(docs) == novel(docs.repartition(13)))
  }

  test("TopK with k larger than any group returns every row") {
    val df = Seq((1L, 1.0), (1L, 2.0), (2L, 3.0)).toDF("key", "v")
    val got = graft.plans.TopK.perKey(df, Seq(col("key")), Seq(col("v").desc), 10)
    assert(got.count() == 3)
  }

  test("round-3 curation operators survive degenerate inputs") {
    import graft.operators.Curation
    val noDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    assert(Curation.qualityGate(noDocs).count() == 0)
    assert(Curation.passageDupStats(noDocs).count() == 0)
    assert(Curation.chunkByTokens(noDocs, 8, 4).count() == 0)

    // one doc: no cross-doc sharing, one component, chunks cover it
    val one = Seq((1L, "a b c", "en")).toDF("doc_id", "text", "lang")
    val pd = Curation.passageDupStats(one, ngramK = 2).collect()
    assert(pd.length == 1 && pd(0).getDouble(1) == 0.0)
    // stride larger than the doc: a single chunk
    val ch = Curation.chunkByTokens(one, chunkTokens = 10, stride = 10).collect()
    assert(ch.length == 1 && ch(0).getString(2) == "a b c")

    // empty text: tokenizes to [""], must not throw anywhere
    val empty = Seq((1L, "", "en")).toDF("doc_id", "text", "lang")
    assert(Curation.qualityGate(empty).select("keep").count() == 1)
    assert(Curation.chunkByTokens(empty, 4, 2).count() == 1)
  }

  test("repetition fold handles single-gram and all-identical docs") {
    import graft.functions.TextOps
    val df = Seq("solo", "x x x x x x").toDF("t")
    val out = df
      .select(sort_array(TextOps.shingles(TextOps.tokens($"t"), 2)).as("g"))
      .select(TextOps.dupFraction($"g").as("f")).as[Double].collect()
    assert(out(0) == 0.0)   // one gram, nothing repeats
    assert(out(1) == 1.0)   // every bigram identical
  }

  // ---- round-6 operators ----

  test("GPKG writeLayer handles a single-feature layer and rejects bad fids") {
    val one = Seq((1L, "POINT (0.0 0.0)", 1.0)).toDF("fid", "geom", "v")
    val bytes = operators.GeoPackage.writeLayer(one, "single")
    val back = operators.GeoPackage.readLayer(spark, bytes, "single")
    assert(back.count() == 1 && back.head().getString(1) == "POINT (0.0 0.0)")
    // duplicate fids produce a malformed b-tree — the writer must not
    // silently accept them... (rowids equal: the reader sees both cells)
    val dup = Seq((1L, "POINT (0.0 0.0)", 1.0), (1L, "POINT (1.0 1.0)", 2.0))
      .toDF("fid", "geom", "v")
    val dupBytes = operators.GeoPackage.writeLayer(dup, "d")
    assert(operators.GeoPackage.readLayer(spark, dupBytes, "d").count() == 2)
  }

  test("PQ with k exceeding the corpus returns every candidate, ranked") {
    val vecs = Seq(
      (0L, Array.fill(16)(0.1f)), (1L, Array.fill(16)(0.2f)), (2L, Array.fill(16)(0.9f)))
      .toDF("vec_id", "embedding")
    val cb = vecs.select(col("vec_id").cast("int").as("code"), col("embedding").as("__e"))
      .select(col("code"), posexplode(
        transform(sequence(lit(0), lit(3)),
          mm => slice(col("__e"), mm * 4 + 1, lit(4)))).as(Seq("m", "center")))
      .select("m", "code", "center")
    val out = operators.Similarity.pqTopKWithCodebook(
      vecs.filter(col("vec_id") === 0), vecs, cb, k = 10, m = 4, dSub = 4)
    assert(out.count() == 2) // self excluded, both others ranked
    assert(out.orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L))
  }

  test("UTM transforms stay finite at the zone edge and high latitude") {
    val fwd = operators.Regrid.UtmFromGeographic(33)
    val pts = Seq((12.0, 83.5), (18.0, -79.5), (11.5, 0.001)).toDF("x", "y")
    val (ox, oy) = fwd(col("x"), col("y"))
    val rows = pts.select(ox.as("e"), oy.as("n")).collect()
    rows.foreach { r =>
      assert(!r.getDouble(0).isNaN && !r.getDouble(0).isInfinite)
      assert(!r.getDouble(1).isNaN && !r.getDouble(1).isInfinite)
    }
  }

  test("1x1 multi-band TIFF round-trips in both planar configs") {
    for (planar <- Seq(1, 2)) {
      val tiff = operators.Tiff.synthMultibandTiff(1, 1, 1, 1,
        littleEndian = true, tile = true, bands = 3, planarConfig = planar)(
        (b, _, _) => b * 2.5f)
      val blocks = operators.Tiff.bandBlocksOf(tiff)
      assert(blocks.length == 3, s"planar=$planar")
      blocks.foreach { case (band, _, _, _, _, blob) =>
        assert(java.nio.ByteBuffer.wrap(blob).getFloat(0) == band * 2.5f)
      }
    }
  }

  test("containmentVerify scores a subset pair asymmetrically") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val out = operators.Dedup.containmentVerify(docs, pairs, threshold = 0.5).head()
    val (ab, ba) = (out.getAs[Double]("cont_ab"), out.getAs[Double]("cont_ba"))
    assert(ab == 1.0, s"short doc fully contained, got $ab") // every shingle of 1 is in 2
    assert(ba < 0.5, s"long doc only partially covered, got $ba")
  }

  test("bigramLogprobScore drops docs with fewer than two tokens") {
    val docs = Seq((1L, "solo"), (2L, "two tokens here")).toDF("doc_id", "text")
    val out = operators.Curation.bigramLogprobScore(docs).collect()
    assert(out.map(_.getLong(0)).toSet == Set(2L))
    assert(out.head.getAs[Long]("n_bigram") == 2L)
  }
}
