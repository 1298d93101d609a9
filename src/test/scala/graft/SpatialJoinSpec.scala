package graft

import graft.functions.SpatialOps
import graft.operators.SpatialJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpatialJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic box set: integer-derived envelopes, including negatives
    * and boxes spanning many grid cells.
    */
  private def boxes(n: Int, idCol: String, envCol: String, seed: Int): DataFrame = {
    val rows = (1 to n).map { i =>
      val h = (i * 2654435761L + seed) & 0x7fffffffL
      val xmin = (h % 197).toDouble - 80      // negatives included
      val ymin = ((h / 197) % 181).toDouble - 60
      val w = 1.0 + (h % 23)                  // up to 24 wide: spans cells
      val ht = 1.0 + (h % 19)
      (i.toLong, xmin, ymin, xmin + w, ymin + ht)
    }
    rows.toDF(idCol, "xmin", "ymin", "xmax", "ymax")
      .select(col(idCol),
        SpatialOps.bbox($"xmin", $"ymin", $"xmax", $"ymax").as(envCol))
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("lid", "rid").as[(Long, Long)].collect().toSet

  test("bboxJoin == naive theta join, each pair exactly once") {
    val l = boxes(300, "lid", "env", seed = 7)
    val r = boxes(250, "rid", "env_r", seed = 1013)
    for (cell <- Seq(4.0, 8.0, 64.0)) {
      val binnedDf = SpatialJoin.bboxJoin(l, r, "env", "env_r", cell)
        .select("lid", "rid")
      val naive = l.crossJoin(r)
        .filter(SpatialOps.bboxIntersects($"env", $"env_r"))
        .select("lid", "rid")
      // exactly-once: row count equals distinct pair count
      assert(binnedDf.count() == pairs(binnedDf).size, s"dup pairs at cell=$cell")
      assert(pairs(binnedDf) == pairs(naive), s"pair set mismatch at cell=$cell")
      assert(pairs(binnedDf).nonEmpty)
    }
  }

  test("salted bboxJoin is result-identical to unsalted on skewed data") {
    // one-dense-city: 80% of boxes crowd into grid cell (0,0)
    def skewed(n: Int, idCol: String, envCol: String, seed: Int): DataFrame = {
      val rows = (1 to n).map { i =>
        val h = (i * 2654435761L + seed) & 0x7fffffffL
        val (x, y) = if (i % 5 != 0) ((h % 12).toDouble * 0.5, (h % 10).toDouble * 0.5)
          else ((h % 97).toDouble * 2, (h % 89).toDouble * 2)
        (i.toLong, x, y, x + 1 + (h % 3), y + 1 + (h % 4))
      }
      rows.toDF(idCol, "xmin", "ymin", "xmax", "ymax")
        .select(col(idCol), SpatialOps.bbox($"xmin", $"ymin", $"xmax", $"ymax").as(envCol))
    }
    val l = skewed(400, "lid", "env", seed = 3)
    val r = skewed(350, "rid", "env_r", seed = 7919)
    val unsalted = pairs(SpatialJoin.bboxJoin(l, r, "env", "env_r", 8.0))
    val salted = pairs(SpatialJoin.bboxJoin(l, r, "env", "env_r", 8.0, salts = 8))
    assert(salted == unsalted && salted.nonEmpty)
  }

  test("salting spreads the hot cell's join-key load across sub-keys") {
    // replicate the operator's binning arithmetic: with salts=S no
    // (cell, salt) key may carry more than ~1/S of the hot cell's rows —
    // the "no task reads > c x the mean cell load" contract.
    val salts = 8
    val n = 4000
    val hot = (1 to n).map { i =>
      val h = (i * 2654435761L + 11) & 0x7fffffffL
      val x = (h % 12).toDouble * 0.5; val y = (h % 10).toDouble * 0.5
      (i.toLong, x, y, x + 1, y + 1) // every box inside cell (0,0) at cellSize 8
    }.toDF("lid", "xmin", "ymin", "xmax", "ymax")
      .select(col("lid"), SpatialOps.bbox($"xmin", $"ymin", $"xmax", $"ymax").as("env"))
    val keyed = hot.withColumn("salt",
      pmod(xxhash64(col("lid"), col("env")), lit(salts)).cast("int"))
    val loads = keyed.groupBy("salt").count().select("count").as[Long].collect()
    assert(loads.length == salts, s"only ${loads.length} of $salts sub-keys used")
    val mean = n.toDouble / salts
    assert(loads.max <= mean * 1.5,
      s"hot sub-key carries ${loads.max} rows vs mean $mean - salt hash is lumpy")
  }

  test("touching edges count as intersecting (closed intervals)") {
    val l = Seq((1L, 0.0, 0.0, 10.0, 10.0)).toDF("lid", "a", "b", "c", "d")
      .select($"lid", SpatialOps.bbox($"a", $"b", $"c", $"d").as("env"))
    val r = Seq(
      (1L, 10.0, 10.0, 20.0, 20.0), // corner touch
      (2L, -5.0, 10.0, 0.0, 20.0),  // edge touch at x=0/y=10 corner region
      (3L, 10.5, 0.0, 20.0, 10.0)   // disjoint
    ).toDF("rid", "a", "b", "c", "d")
      .select($"rid", SpatialOps.bbox($"a", $"b", $"c", $"d").as("env_r"))
    val got = pairs(SpatialJoin.bboxJoin(l, r, "env", "env_r", 8.0)
      .select($"lid", $"rid"))
    assert(got == Set((1L, 1L), (1L, 2L)))
  }

  test("zorderKey interleaves bits (Morton order on a 4x4 grid)") {
    val cells = for (y <- 0 until 4; x <- 0 until 4) yield (x, y)
    val got = cells.toDF("x", "y")
      .select($"x", $"y", SpatialOps.zorderKey($"x", $"y", bits = 2).as("z"))
      .orderBy("z")
      .as[(Int, Int, Long)].collect()
    val expected = Seq( // recursive quadrant order
      (0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
      (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3))
    assert(got.map(t => (t._1, t._2)).toSeq == expected)
    assert(got.map(_._3).toSeq == (0L until 16L))
  }

  test("clusterByZOrder yields globally z-sorted partition order") {
    val h = 2654435761L
    val df = (1 to 500).map(i => (i.toLong, (i * h) % 512, (i * h / 512) % 512))
      .toDF("id", "cx", "cy")
    val clustered = SpatialOps.clusterByZOrder(df, "cx", "cy", numPartitions = 4, bits = 9)
    val keys = clustered
      .select(SpatialOps.zorderKey($"cx", $"cy", 9).as("z"))
      .as[Long].collect() // collect preserves partition order
    assert(keys.toSeq == keys.sorted.toSeq)
    assert(clustered.rdd.getNumPartitions == 4)
  }

  /** Concave arrow polygons with a square hole, integer-derived (the j16
    * family): bbox candidates genuinely exceed true containment (the notch
    * and the hole both produce bbox-hit/geometry-miss candidates).
    */
  private def arrows(n: Int, idCol: String, seed: Int): DataFrame = {
    val rows = (1 to n).map { i =>
      val h = (i * 2654435761L + seed) & 0x7fffffffL
      val x0 = (h % 50).toDouble; val y0 = ((h / 50) % 40).toDouble
      val w = 4.0 + (h % 5); val ht = 4.0 + (h % 7)
      val wkt = s"POLYGON (($x0 $y0, ${x0 + w} $y0, ${x0 + w} ${y0 + ht}, " +
        s"${x0 + w / 2} ${y0 + ht / 2}, $x0 ${y0 + ht}, $x0 $y0), " +
        s"(${x0 + 0.5} ${y0 + 0.5}, ${x0 + 0.5} ${y0 + 1.5}, " +
        s"${x0 + 1.5} ${y0 + 1.5}, ${x0 + 1.5} ${y0 + 0.5}, ${x0 + 0.5} ${y0 + 0.5}))"
      (i.toLong, wkt)
    }
    rows.toDF(idCol, "wkt")
  }

  test("refine stage: point-in-polygon join == brute force, strictly fewer than bbox") {
    val polys = arrows(120, "lid", seed = 5)
      .select($"lid", SpatialOps.wktRings($"wkt").as("rings"), $"wkt")
      .withColumn("env", SpatialOps.ringsEnvelope($"rings"))
    val pts = (1 to 400).map { i =>
      val h = (i * 40503L + 11) & 0x7fffffffL
      (i.toLong, (h % 110).toDouble * 0.5, ((h / 110) % 95).toDouble * 0.5)
    }.toDF("rid", "px", "py")
      .withColumn("env_r", SpatialOps.bbox($"px", $"py", $"px", $"py"))
    val refined = pairs(SpatialJoin.bboxJoin(polys, pts, "env", "env_r", 8.0,
      refine = graft.functions.GeomPredExprs.pointInRings(
        col("rings"), col("px"), col("py")))
      .select("lid", "rid"))
    // the HOF spelling refines to the identical pair set
    val refinedHof = pairs(SpatialJoin.bboxJoin(polys, pts, "env", "env_r", 8.0,
      refine = SpatialOps.ringsContainPoint(col("rings"), col("px"), col("py")))
      .select("lid", "rid"))
    assert(refined == refinedHof)
    val brute = pairs(polys.crossJoin(pts)
      .filter(SpatialOps.wktContainsPoint($"wkt", $"px", $"py"))
      .select("lid", "rid"))
    val bboxOnly = pairs(SpatialJoin.bboxJoin(polys, pts, "env", "env_r", 8.0)
      .select("lid", "rid"))
    assert(refined == brute && refined.nonEmpty)
    // the refine must actually refine: notch/hole candidates drop out
    assert(refined.size < bboxOnly.size, s"${refined.size} vs bbox ${bboxOnly.size}")
  }

  test("refine stage: ST_DWithin join (expanded envelopes) == brute force") {
    val dist = 1.5
    val polys = arrows(100, "lid", seed = 41)
      .select($"lid", SpatialOps.wktRings($"wkt").as("rings"), $"wkt")
      .withColumn("env", {
        val e = SpatialOps.ringsEnvelope($"rings")
        SpatialOps.bbox(e.getField("xmin") - dist, e.getField("ymin") - dist,
          e.getField("xmax") + dist, e.getField("ymax") + dist)
      })
    val pts = (1 to 300).map { i =>
      val h = (i * 40503L + 29) & 0x7fffffffL
      (i.toLong, (h % 120).toDouble * 0.5 - 3.0, ((h / 120) % 100).toDouble * 0.5 - 3.0)
    }.toDF("rid", "px", "py")
      .withColumn("env_r", SpatialOps.bbox($"px", $"py", $"px", $"py"))
    val refined = pairs(SpatialJoin.bboxJoin(polys, pts, "env", "env_r", 8.0,
      refine = graft.functions.GeomPredExprs.withinDistCol(
        col("rings"), col("px"), col("py"), lit(dist)))
      .select("lid", "rid"))
    val brute = pairs(polys.crossJoin(pts)
      .filter(SpatialOps.ringsWithinDist(
        SpatialOps.wktRings($"wkt"), $"px", $"py", lit(dist)))
      .select("lid", "rid"))
    assert(refined == brute && refined.nonEmpty)
    // dwithin is strictly looser than containment at the same fixtures
    val contained = pairs(SpatialJoin.bboxJoin(polys, pts, "env", "env_r", 8.0,
      refine = graft.functions.GeomPredExprs.pointInRings(
        col("rings"), col("px"), col("py")))
      .select("lid", "rid"))
    assert(contained.subsetOf(refined) && contained.size < refined.size)
  }

  test("nearest-neighbor join (min-struct over region distance) == brute-force ranking") {
    import org.apache.spark.sql.expressions.Window
    val radius = 3.0
    val polys = arrows(80, "lid", seed = 53)
      .select($"lid", SpatialOps.wktRings($"wkt").as("rings"), $"wkt")
      .withColumn("env", {
        val e = SpatialOps.ringsEnvelope($"rings")
        SpatialOps.bbox(e.getField("xmin") - radius, e.getField("ymin") - radius,
          e.getField("xmax") + radius, e.getField("ymax") + radius)
      })
    val pts = (1 to 250).map { i =>
      val h = (i * 48271L + 13) & 0x7fffffffL
      (i.toLong, (h % 120).toDouble * 0.5 - 3.0, ((h / 120) % 100).toDouble * 0.5 - 3.0)
    }.toDF("rid", "px", "py")
      .withColumn("env_r", SpatialOps.bbox($"px", $"py", $"px", $"py"))
    val nearest = SpatialJoin.bboxJoin(polys, pts, "env", "env_r", 8.0)
      .withColumn("d2", graft.functions.GeomPredExprs.regionDistSqCol(
        col("rings"), col("px"), col("py")))
      .filter($"d2" <= lit(radius * radius))
      .groupBy("rid").agg(min(struct($"d2", $"lid")).as("best"))
      .select($"rid", $"best.lid".as("lid"), $"best.d2".as("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = polys.crossJoin(pts)
      .withColumn("d2", SpatialOps.ringsRegionDistSq(
        SpatialOps.wktRings($"wkt"), $"px", $"py"))
      .filter($"d2" <= lit(radius * radius))
      .withColumn("rn", row_number().over(
        Window.partitionBy("rid").orderBy($"d2", $"lid")))
      .filter($"rn" === 1)
      .select("rid", "lid", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(nearest == brute && nearest.nonEmpty)
    // some points snap to a nonzero-distance neighbor, some sit inside
    assert(nearest.exists(_._3 == 0.0) && nearest.exists(_._3 > 0.0))
  }

  test("refine stage: polygon-overlap join == brute force") {
    val polys = arrows(100, "lid", seed = 23)
      .select($"lid", SpatialOps.wktRings($"wkt").as("rings_a"), $"wkt".as("wkt_a"))
      .withColumn("env", SpatialOps.ringsEnvelope($"rings_a"))
    val diamonds = (1 to 150).map { i =>
      val h = (i * 69069L + 7) & 0x7fffffffL
      val cx = (h % 52).toDouble + 2; val cy = ((h / 52) % 42).toDouble + 2
      val r = 1.0 + (h % 3) * 0.5
      (i.toLong, s"POLYGON (($cx ${cy - r}, ${cx + r} $cy, $cx ${cy + r}, ${cx - r} $cy, $cx ${cy - r}))")
    }.toDF("rid", "wkt_b")
      .select($"rid", SpatialOps.wktRings($"wkt_b").as("rings_b"), $"wkt_b")
      .withColumn("env_r", SpatialOps.ringsEnvelope($"rings_b"))
    val refined = pairs(SpatialJoin.bboxJoin(polys, diamonds, "env", "env_r", 8.0,
      refine = graft.functions.GeomPredExprs.ringsIntersect(
        col("rings_a"), col("rings_b")))
      .select("lid", "rid"))
    val brute = pairs(polys.crossJoin(diamonds)
      .filter(SpatialOps.wktIntersects($"wkt_a", $"wkt_b"))
      .select("lid", "rid"))
    assert(refined == brute && refined.nonEmpty)
  }

  test("plans as an equi-join on cell keys, not a cartesian product") {
    val l = boxes(200, "lid", "env", seed = 3)
    val r = boxes(200, "rid", "env_r", seed = 17)
    val plan = SpatialJoin.bboxJoin(l, r, "env", "env_r", 8.0)
      .queryExecution.executedPlan
    val cartesian = plan.collect { case c: CartesianProductExec => c }
    assert(cartesian.isEmpty, "binned bbox join must not plan a cartesian product")
  }

  test("hausdorffBoundarySq: closed forms — nested, identical, disjoint, symmetry") {
    import graft.functions.{GeomPredExprs, SpatialOps}
    import org.apache.spark.sql.functions.{col, element_at, lit}
    def hOf(a: String, b: String): Double =
      Seq((a, b)).toDF("a", "b")
        .select(GeomPredExprs.hausdorffBoundarySqCol(
          SpatialOps.wktRings(col("a")), SpatialOps.wktRings(col("b"))))
        .head.getDouble(0)
    val outer = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    val inner = "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"
    // nested squares: outer corner (0,0) -> inner corner (1,1) is the
    // worst pair: d^2 = 2 (inner->outer worst is only 1)
    assert(hOf(outer, inner) == 2.0)
    // symmetry and identity
    assert(hOf(inner, outer) == 2.0)
    assert(hOf(outer, outer) == 0.0)
    // disjoint unit squares 10 apart: worst vertex pair (0,0)..(11,1)
    // against nearest boundary: far corners project to the near corner
    val far = "POLYGON ((10 0, 11 0, 11 1, 10 1, 10 0))"
    val unit = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    // (0,y) verts are 10 away in x from x=10 wall: worst d^2 = 100
    assert(hOf(unit, far) == 100.0)
    // a polygon-with-hole measures to ALL rings: the hole ring coincides
    // with `inner` (its vertices contribute 0) but the OUTER corners
    // still sit sqrt(2) from the inner square — boundary Hausdorff 2
    val holed = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 3, 3 3, 3 1, 1 1))"
    assert(hOf(holed, inner) == 2.0)
    // and against ITSELF the hole ring is part of the boundary: 0
    assert(hOf(holed, holed) == 0.0)
  }
}
