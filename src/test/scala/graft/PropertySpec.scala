package graft

import graft.functions.{ScalarOps, TextOps}
import graft.operators.{Composite, Halo}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.4) driven by seeded ScalaCheck
  * generators (scalatestplus glue isn't available offline, so sampling is
  * explicit: N deterministic draws per property). Row counts stay small —
  * each property round-trips through Spark jobs.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** N deterministic samples from a generator. */
  private def samples[T](g: Gen[T], n: Int = 5): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(12), Seed(42L + i)))

  private def forAll[T](g: Gen[T])(body: T => Unit): Unit =
    samples(g).foreach(body)

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(body: (A, B) => Unit): Unit =
    samples(g1).zip(samples(g2)).foreach { case (a, b) => body(a, b) }

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val sceneGen: Gen[List[(Long, Int, Option[Double], Double)]] =
    Gen.listOf(for {
      scene <- Gen.choose(1L, 4L)
      px <- Gen.choose(0, 3)
      b <- Gen.option(Gen.choose(-100.0, 100.0))
      score <- Gen.choose(-1.0, 1.0)
    } yield (scene, px, b, score))

  test("property: argmax composite == window-rank-1 under explicit tiebreak (A2/W3)") {
    forAll(sceneGen) { rows =>
      whenever(rows.nonEmpty) {
        // dedupe (scene, px) so both formulations see identical candidates
        val df = rows.distinctBy(r => (r._1, r._2))
          .toDF("scene_id", "px", "B1", "ndvi")
        val viaAgg = Composite.argmaxComposite(df, Seq("px"), "scene_id", "ndvi", Seq("B1"))
          .select("px", "scene_id").collect()
          .map(r => (r.getInt(0), r.getLong(1))).toSet
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("px").orderBy(col("ndvi").desc, col("scene_id").asc)
        val viaWin = df.filter(col("ndvi").isNotNull)
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select("px", "scene_id").collect()
          .map(r => (r.getInt(0), r.getLong(1))).toSet
        assert(viaAgg == viaWin)
      }
    }
  }

  test("property: NULL-skipping median == median of the non-null subset (A1)") {
    forAll(sceneGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("scene_id", "px", "B1", "ndvi")
        val got = Composite.medianComposite(df, Seq("px"), Seq("B1"))
          .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
        rows.groupBy(_._2).foreach { case (px, grp) =>
          val vals = grp.flatMap(_._3).sorted
          val expect =
            if (vals.isEmpty) None
            else if (vals.size % 2 == 1) Some(vals(vals.size / 2))
            else Some((vals(vals.size / 2 - 1) + vals(vals.size / 2)) / 2.0)
          (got(px), expect) match {
            case (None, None) => ()
            case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-9, s"px $px")
            case other => fail(s"px $px: $other")
          }
        }
      }
    }
  }

  test("property: halo(pad=0) is the identity partition (W1)") {
    forAll(Gen.listOf(Gen.zip(Gen.choose(0, 15), Gen.choose(0, 15)))) { pts =>
      whenever(pts.nonEmpty) {
        val df = pts.distinct.toDF("px_row", "px_col")
        val out = Halo.withHalo(df, "px_row", "px_col", 4, 4, 0)
        assert(out.count() == pts.distinct.size)
        assert(out.filter(!col("is_core")).count() == 0)
      }
    }
  }

  test("property: composites are permutation-invariant in input order (A1/A2)") {
    forAll(sceneGen, Gen.choose(1L, Long.MaxValue)) { (rows, seed) =>
      whenever(rows.nonEmpty) {
        val df = rows.distinctBy(r => (r._1, r._2)).toDF("scene_id", "px", "B1", "ndvi")
        val shuffled = df.orderBy(rand(seed))
        def snap(d: org.apache.spark.sql.DataFrame) =
          Composite.argmaxComposite(d, Seq("px"), "scene_id", "ndvi", Seq("B1"))
            .orderBy("px").collect().map(_.toSeq).toSeq
        assert(snap(df) == snap(shuffled))
      }
    }
  }

  test("property: clamp output is always within [lo, hi] and idempotent (P7)") {
    forAll(Gen.listOf(Gen.choose(-1e6, 1e6))) { vs =>
      whenever(vs.nonEmpty) {
        val df = vs.toDF("v")
        val once = df.select(ScalarOps.clamp(col("v"), lit(-5.0), lit(5.0)).as("c"))
        val vals = once.as[Double].collect()
        assert(vals.forall(v => v >= -5.0 && v <= 5.0))
        val twice = once.select(ScalarOps.clamp(col("c"), lit(-5.0), lit(5.0)).as("c"))
        assert(twice.as[Double].collect().toSeq == vals.toSeq)
      }
    }
  }

  test("property: rolling fingerprint is deterministic, order-sensitive, in [0, M) (E9)") {
    val tokenGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "cat", "dog", "x1"))
    forAll(tokenGen) { toks =>
      val text = toks.mkString(" ")
      val df = Seq(text, text, toks.reverse.mkString(" ")).toDF("t")
      val fps = df.select(TextOps.rollingFingerprint(col("t"))).as[Long].collect()
      assert(fps(0) == fps(1))
      assert(fps.forall(f => f >= 0 && f < TextOps.RollMod))
      if (toks != toks.reverse) assert(fps(0) != fps(2) || toks.distinct.size == 1)
    }
  }

  private val edgeGen: Gen[List[(Long, Long)]] =
    Gen.listOf(for {
      a <- Gen.choose(0L, 15L)
      b <- Gen.choose(0L, 15L)
      if a != b
    } yield (a, b))

  test("property: connectedComponents == brute-force closure (CC)") {
    forAll(edgeGen) { edges =>
      whenever(edges.nonEmpty) {
        val got = graft.operators.Graph.connectedComponents(edges.toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // brute force: repeatedly min-merge until stable
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        var lbl = nodes.map(n => n -> n).toMap
        var changed = true
        while (changed) {
          changed = false
          for ((a, b) <- edges) {
            val m = math.min(lbl(a), lbl(b))
            if (lbl(a) != m || lbl(b) != m) { lbl += (a -> m, b -> m); changed = true }
          }
        }
        assert(got == lbl)
      }
    }
  }

  test("property: packByTokenBudget bins are contiguous and within budget (PACK1)") {
    val lenGen = Gen.nonEmptyListOf(Gen.choose(1, 40))
    forAll(lenGen) { lens =>
      val budget = 64
      val docs = lens.zipWithIndex
        .map { case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val rows = graft.operators.Curation.packByTokenBudget(docs,
          TextOps.tokenCount(col("text")), "doc_id", budget)
        .select("doc_id", "n_tok", "bin_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      // bin ids are non-decreasing in doc order, start at 0, and each doc's
      // bin equals its first-token offset / budget
      var off = 0L
      for ((_, n, bin) <- rows) {
        assert(bin == off / budget)
        off += n
      }
      assert(rows.head._3 == 0L)
    }
  }

  test("property: hashSplit census is permutation-invariant and covers all rows (SAMP1)") {
    val idsGen = Gen.nonEmptyListOf(Gen.choose(1L, 10000L)).map(_.distinct)
    forAll(idsGen) { ids =>
      def census(xs: Seq[Long]): Map[String, Long] = {
        val df = xs.map(i => (i, "t")).toDF("doc_id", "text")
        df.withColumn("split", graft.operators.Curation.hashSplit(df, "doc_id"))
          .groupBy("split").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      val a = census(ids)
      val b = census(scala.util.Random.shuffle(ids))
      assert(a == b)
      assert(a.values.sum == ids.size)
    }
  }

  test("property: repetition fold == relational counts on random token docs (REP1)") {
    val docGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "ab", "xyz"))
      .map(_.mkString(" "))
    forAll(Gen.listOfN(6, docGen)) { texts =>
      whenever(texts.nonEmpty) {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
        val fold = df
          .select($"id", sort_array(TextOps.shingles(TextOps.tokens($"t"), 2)).as("g"))
          .select($"id", TextOps.dupFraction($"g").as("f"))
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val rel = df
          .select($"id", explode(TextOps.shingles(TextOps.tokens($"t"), 2)).as("g"))
          .groupBy($"id", $"g").agg(count(lit(1)).as("c"))
          .groupBy($"id")
          .agg((sum(when($"c" >= 2, $"c" * length($"g")).otherwise(0L)).cast("double") /
            sum($"c" * length($"g")).cast("double")).as("f"))
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(fold == rel) // exact equality — both are int ratios
        assert(fold.values.forall(v => v >= 0.0 && v <= 1.0))
      }
    }
  }

  test("property: quantize8 codes bounded; dequantized dot stays near exact (EMB2)") {
    import graft.functions.VectorOps
    val vecGen = Gen.listOfN(6, Gen.choose(-8.0, 8.0).map(_.toFloat))
    forAll(Gen.listOfN(5, vecGen)) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      val rows = df.select(
          VectorOps.quantize8($"embedding").as("q"),
          VectorOps.quantize8Scale($"embedding").as("s"),
          $"embedding")
        .collect()
      rows.foreach { r =>
        val q = r.getSeq[Long](0); val s = r.getDouble(1); val x = r.getSeq[Float](2)
        assert(q.forall(c => c >= -127 && c <= 127))
        // dequantized self-dot within the accumulated floor-error bound:
        // |x·x − (qs)·(qs)| ≤ Σ |x_i + q_i s| · s  (per-term error ≤ s)
        val exact = x.map(v => v.toDouble * v).sum
        val deq = q.map(_ * s)
        val approx = deq.map(v => v * v).sum
        val bound = x.zip(deq).map { case (xi, di) => (math.abs(xi) + math.abs(di)) * s }.sum + 1e-9
        assert(math.abs(exact - approx) <= bound, s"$exact vs $approx (bound $bound)")
      }
    }
  }

  // ---- round-6 codec round trips under adversarial coordinates ----

  /** Doubles whose toString spans plain, negative, tiny-exponent, and
    * huge-magnitude spellings — the WKT formatting paths a writer must
    * parse back exactly.
    */
  private val coordGen: Gen[Double] = Gen.oneOf(
    Gen.choose(-1000.0, 1000.0),
    Gen.choose(-1.0e-6, 1.0e-6), // prints in E notation
    Gen.choose(-1.0e8, 1.0e8),
    Gen.oneOf(0.0, -0.0, 1.25, -180.0, 90.0))

  private val wktGen: Gen[String] = for {
    kind <- Gen.oneOf("POINT", "LINESTRING", "POLYGON")
    n <- Gen.choose(3, 6)
    xs <- Gen.listOfN(n, coordGen)
    ys <- Gen.listOfN(n, coordGen)
  } yield {
    val pts = xs.zip(ys)
    kind match {
      case "POINT" => s"POINT (${pts.head._1} ${pts.head._2})"
      case "LINESTRING" =>
        s"LINESTRING ${pts.map(p => s"${p._1} ${p._2}").mkString("(", ", ", ")")}"
      case _ =>
        val ring = (pts :+ pts.head).map(p => s"${p._1} ${p._2}").mkString("(", ", ", ")")
        s"POLYGON ($ring)"
    }
  }

  test("property: GPKG writeLayer round-trips arbitrary WKT coordinates exactly") {
    forAll(Gen.listOfN(6, wktGen)) { wkts =>
      whenever(wkts.nonEmpty) {
        val src = wkts.zipWithIndex.map { case (w, i) => (i.toLong + 1, w, i * 0.5) }
          .toDF("fid", "geom", "v")
        val bytes = operators.GeoPackage.writeLayer(src, "l")
        val back = operators.GeoPackage.readLayer(spark, bytes, "l")
          .orderBy("fid").select("geom").as[String].collect()
        assert(back.toSeq == wkts, s"GPKG round trip diverged")
      }
    }
  }

  test("property: shapefile codec round-trips arbitrary WKT coordinates exactly") {
    forAll(Gen.listOfN(6, wktGen)) { wkts =>
      whenever(wkts.nonEmpty) {
        val recs = operators.Shapefile.shpRecords(operators.Shapefile.synthShp(wkts))
        assert(recs.map(_._2) == wkts, s"shapefile round trip diverged")
      }
    }
  }

  test("property: multi-band TIFF round-trips arbitrary float rasters in both layouts") {
    val rasterGen = for {
      w <- Gen.choose(1, 9)
      h <- Gen.choose(1, 9)
      bands <- Gen.choose(1, 4)
      seedV <- Gen.choose(1, 1000)
    } yield (w, h, bands, seedV)
    forAll(rasterGen) { case (w, h, bands, seedV) =>
      def v(b: Int, r: Int, c: Int): Float =
        java.lang.Float.intBitsToFloat(
          (seedV * 2654435761L + b * 97 + r * 31 + c).toInt & 0x7f7fffff) match {
          case f if f.isNaN => 1.5f
          case f => f
        }
      for (planar <- Seq(1, 2); lzw <- Seq(false, true)) {
        val tiff = operators.Tiff.synthMultibandTiff(w, h, w, math.min(4, h),
          littleEndian = true, tile = false, bands = bands, planarConfig = planar,
          lzw = lzw, predictor = if (lzw) 3 else 1)(v)
        val blocks = operators.Tiff.bandBlocksOf(tiff)
        for ((band, sy, _, bh, bw, blob) <- blocks) {
          val bb = java.nio.ByteBuffer.wrap(blob)
          for (lr <- 0 until bh; lc <- 0 until bw) {
            val expect = v(band, sy * math.min(4, h) + lr, lc)
            val got = bb.getFloat(4 * (lr * bw + lc))
            assert(java.lang.Float.floatToRawIntBits(got) ==
              java.lang.Float.floatToRawIntBits(expect),
              s"w=$w h=$h bands=$bands planar=$planar lzw=$lzw band=$band ($lr,$lc)")
          }
        }
      }
    }
  }
}
