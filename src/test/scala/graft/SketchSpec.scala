package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-aggregate surface (the 100 TB substitutes for exact distinct /
  * exact percentiles): error stays within the configured bounds on real
  * testdata. These are Catalyst built-ins (HLL++ and KLL-style quantiles)
  * — the engine's job is picking parameters, not reimplementing them.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct (HLL++) within rsd bound on orderkeys") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0).toDouble
    val approx = li.select(approx_count_distinct(col("l_orderkey"), rsd = 0.02))
      .head().getLong(0).toDouble
    // 0.02 rsd → generous 4-sigma acceptance
    assert(math.abs(approx - exact) / exact < 0.08,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx converges to exact percentile as accuracy grows") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(expr("percentile(l_extendedprice, 0.5)")).head().getDouble(0)
    val loose = li.select(expr("percentile_approx(l_extendedprice, 0.5, 100)")).head().getDouble(0)
    val tight = li.select(expr("percentile_approx(l_extendedprice, 0.5, 10000)")).head().getDouble(0)
    assert(math.abs(tight - exact) <= math.abs(loose - exact) + 1e-9)
    // median of a dense price distribution: tight sketch lands within 1%
    assert(math.abs(tight - exact) / exact < 0.01, s"tight=$tight exact=$exact")
  }

  test("kmvDistinct is exact below sketch capacity") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i % 7, i)).toDF("g", "v")
    val sk = operators.Sketches.kmvDistinct(df, col("v"), Seq("g"), k = 256)
      .orderBy("g").collect()
    assert(sk.length == 7)
    sk.foreach { r =>
      // every group has < 256 distinct values → est is the exact count
      assert(r.getAs[Double]("est_distinct") == r.getAs[Long]("n_min").toDouble)
    }
    assert(sk.map(_.getAs[Long]("n_min")).sum == 100L)
  }

  test("kmvDistinct estimate within expected error above capacity") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0).toDouble
    val est = operators.Sketches.kmvDistinct(li, col("l_orderkey"), Nil, k = 256)
      .head().getAs[Double]("est_distinct")
    // KMV rse ≈ 1/sqrt(k-2) ≈ 6.3% at k=256; accept 4 sigma
    assert(math.abs(est - exact) / exact < 0.25, s"est=$est exact=$exact")
  }

  test("kmvDistinct is mergeable: sketch of union == merged sketches") {
    import spark.implicits._
    val a = (1L to 5000L).toDF("v")
    val b = (2500L to 7500L).toDF("v")
    val k = 64
    def sketch(df: org.apache.spark.sql.DataFrame) =
      operators.Sketches.kmvDistinct(df, col("v"), Nil, k)
    // merge = union the kept hash sets, re-cap to the k smallest: rebuild
    // from the two sketches' value domains via their defining property
    val direct = sketch(a.union(b)).head()
    // the sketch keeps the k smallest distinct hashes; merging two k-sets
    // and re-capping reproduces exactly the k smallest of the union
    val ha = a.select(graft.functions.TextOps.hexVal(md5(col("v").cast("string")), 15).as("h"))
      .distinct().orderBy("h").limit(k)
    val hb = b.select(graft.functions.TextOps.hexVal(md5(col("v").cast("string")), 15).as("h"))
      .distinct().orderBy("h").limit(k)
    val mergedKth = ha.union(hb).distinct().orderBy("h").limit(k)
      .agg(max(col("h"))).head().getLong(0)
    assert(direct.getAs[Long]("kth_hash") == mergedKth,
      "k-th smallest of merged k-sets must equal the union's sketch bound")
  }

  test("kmvDistinct per-group matches per-group exact ordering of magnitude") {
    val li = Tables.lineitem(spark, sf)
    val sk = operators.Sketches.kmvDistinct(li, col("l_partkey"), Seq("l_returnflag"), k = 128)
    val exact = li.groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("x"))
    val j = sk.join(exact, Seq("l_returnflag")).collect()
    j.foreach { r =>
      val est = r.getAs[Double]("est_distinct"); val x = r.getAs[Long]("x").toDouble
      assert(math.abs(est - x) / x < 0.4, s"flag=${r.get(0)} est=$est exact=$x")
    }
  }

  // ---- count-min ----

  test("countMin never underestimates, and the table is bounded at depth*width") {
    import spark.implicits._
    // zipf-ish multiplicities over 600 keys into a 4x128 sketch: heavy
    // collision pressure, so overestimates genuinely occur
    val rows = (1 to 600).flatMap(k => Seq.fill(1 + 600 / k)(s"key$k"))
    val df = rows.toDF("k")
    val sk = operators.Sketches.countMin(df, col("k"), depth = 4, width = 128)
    assert(sk.count() <= 4L * 128L)
    val est = operators.Sketches.countMinEstimate(sk, df, col("k"), depth = 4, width = 128)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (k, x) =>
      assert(est(k) >= x, s"$k: est ${est(k)} under exact $x")
    }
    assert(exact.exists { case (k, x) => est(k) > x },
      "4x128 under 600 keys must produce at least one collision overestimate")
    // CMS error bound: over by at most ~e/width * N at 1-1/e^depth conf;
    // allow the full union bound with slack
    val n = rows.size.toLong
    exact.foreach { case (k, x) =>
      assert(est(k) - x <= math.ceil(math.E / 128 * n).toLong * 4,
        s"$k: over-error ${est(k) - x} beyond bound")
    }
  }

  test("countMin is mergeable: counters of a union add") {
    import spark.implicits._
    val a = (1 to 300).map(i => s"k${i % 50}").toDF("k")
    val b = (1 to 200).map(i => s"k${i % 30}").toDF("k")
    val direct = operators.Sketches.countMin(a.union(b), col("k"), 4, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    def cells(df: org.apache.spark.sql.DataFrame) =
      operators.Sketches.countMin(df, col("k"), 4, 64)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (cells(a).toSeq ++ cells(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(direct == merged)
  }

  test("heavyHitters equals the plain GROUP BY/HAVING at any width (no false results)") {
    import spark.implicits._
    // zipf-ish: key k appears ~1+600/k times; heavy set is the small-k head
    val rows = (1 to 200).flatMap(k => Seq.fill(1 + 600 / k)(k.toLong))
    val df = rows.toDF("k")
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 50L).toMap
    // a tiny width forces many false candidates — the exact verify must drop them all
    Seq(8, 64, 512).foreach { w =>
      val got = operators.Sketches.heavyHitters(df, col("k"), minCount = 50L, depth = 4, width = w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == exact, s"width=$w: $got != $exact")
    }
    intercept[IllegalArgumentException](
      operators.Sketches.heavyHitters(df, col("k"), minCount = 0L))
  }

  test("countMinJoinSize never underestimates and stays within the eps*Na*Nb bound") {
    import spark.implicits._
    val a = (1 to 2000).map(i => (i % 300).toLong).toDF("k")
    val b = (1 to 1500).map(i => (i % 200).toLong).toDF("k")
    val est = operators.Sketches.countMinJoinSize(a, col("k"), b, col("k"), 4, 128)
      .head().getLong(0)
    val ca = (1 to 2000).map(_ % 300).groupBy(identity).view.mapValues(_.size.toLong)
    val cb = (1 to 1500).map(_ % 200).groupBy(identity).view.mapValues(_.size.toLong)
    val exact = ca.keys.map(k => ca(k) * cb.getOrElse(k, 0L)).sum
    assert(est >= exact, s"est $est under exact $exact")
    val bound = exact + math.ceil(math.E / 128 * 2000L * 1500L).toLong
    assert(est <= bound, s"est $est beyond CMS bound $bound")
    // disjoint keys: exact join size 0, estimate only collision noise
    val d = (10000 to 10100).map(_.toLong).toDF("k")
    val estDisjoint = operators.Sketches.countMinJoinSize(a, col("k"), d, col("k"), 4, 128)
      .head().getLong(0)
    assert(estDisjoint <= math.ceil(math.E / 128 * 2000L * 101L).toLong)
    // a row where the two sketches share NO cells must still contribute
    // its (zero-filled) inner product to the min -- with width >> keys the
    // cells are fully disjoint, so the min is 0, not NULL/absent (r13
    // ADVICE): one key per side, huge width
    val one = Seq(1L).toDF("k"); val two = Seq(999999L).toDF("k")
    val estTiny = operators.Sketches.countMinJoinSize(one, col("k"), two, col("k"), 4, 4096)
      .head()
    assert(!estTiny.isNullAt(0) && estTiny.getLong(0) == 0L,
      s"disjoint-cell sketches must report est 0, got $estTiny")
    // both-empty inputs: join size 0, never NULL
    val empty = spark.emptyDataset[Long].toDF("k")
    val estEmpty = operators.Sketches.countMinJoinSize(empty, col("k"), empty, col("k"), 4, 128)
      .head()
    assert(!estEmpty.isNullAt(0) && estEmpty.getLong(0) == 0L)
  }

  test("countMinSelfJoinSize equals the general form with A = B, at half the sketch cost") {
    import spark.implicits._
    val df = (1 to 3000).map(i => (i * 37) % 500).toDF("k")
    val self = operators.Sketches.countMinSelfJoinSize(df, col("k"), depth = 4, width = 64)
      .head().getLong(0)
    val general = operators.Sketches.countMinJoinSize(
      df, col("k"), df, col("k"), depth = 4, width = 64).head().getLong(0)
    assert(self == general, s"self=$self general=$general")
    // empty input degenerate: 0, not NULL
    val empty = Seq.empty[Int].toDF("k")
    assert(operators.Sketches.countMinSelfJoinSize(empty, col("k")).head().getLong(0) == 0L)
  }

  test("countMin fail-closes on bad parameters") {
    import spark.implicits._
    val df = Seq("a").toDF("k")
    intercept[IllegalArgumentException](operators.Sketches.countMin(df, col("k"), 0, 64))
    intercept[IllegalArgumentException](operators.Sketches.countMin(df, col("k"), 4, 1))
    intercept[IllegalArgumentException](
      operators.Sketches.countMinEstimate(df, df, col("k"), 17, 64))
  }

  // ---- hyperloglog ----

  test("hllRegisters: registers bounded by 2^p, rho in range, duplicates absorbed") {
    import spark.implicits._
    val df = (1L to 10000L).toDF("v")
    val regs = operators.Sketches.hllRegisters(df, col("v"), Nil, p = 8).collect()
    assert(regs.length <= 256)
    regs.foreach { r =>
      val reg = r.getAs[Long]("register"); val rho = r.getAs[Long]("max_rho")
      assert(reg >= 0 && reg < 256 && rho >= 1 && rho <= 53, s"reg=$reg rho=$rho")
    }
    // duplicates change nothing: max is idempotent
    val dup = operators.Sketches.hllRegisters(df.union(df), col("v"), Nil, p = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSortedMap
    assert(dup == regs.map(r => r.getLong(0) -> r.getLong(1)).toSortedMap)
  }

  test("hll corrected estimate within 4-sigma at three cardinalities") {
    import spark.implicits._
    // rse ≈ 1.04/sqrt(256) ≈ 6.5%; accept 4 sigma = 26%
    Seq(300L, 5000L, 60000L).foreach { n =>
      val df = (1L to n).map(i => s"item$i").toDF("v")
      val regs = operators.Sketches.hllRegisters(df, col("v"), Nil, p = 8)
      val est = operators.Sketches.hllEstimate(regs, Nil, p = 8)
        .head().getAs[Double]("est_corrected")
      assert(math.abs(est - n) / n < 0.26, s"n=$n est=$est")
    }
  }

  test("hll is mergeable: register-wise max == registers of the union") {
    import spark.implicits._
    val a = (1L to 4000L).toDF("v")
    val b = (2000L to 9000L).toDF("v")
    def regMap(df: org.apache.spark.sql.DataFrame) =
      operators.Sketches.hllRegisters(df, col("v"), Nil, p = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = regMap(a.union(b))
    val merged = (regMap(a).toSeq ++ regMap(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(direct == merged)
  }

  test("hll p=12 low cardinality: fixed-point fold must not overflow (62-p scale regression)") {
    import spark.implicits._
    // ~100 keys over 4096 registers: almost all empty — the old fixed
    // 2^54 scale put n_zero * 2^54 ≈ 2^66 into a BIGINT and wrapped
    val df = (1L to 100L).toDF("v")
    val regs = operators.Sketches.hllRegisters(df, col("v"), Nil, p = 12)
    val row = operators.Sketches.hllEstimate(regs, Nil, p = 12).head()
    val rawSum = row.getAs[Long]("raw_sum")
    assert(rawSum > 0, s"raw_sum wrapped negative: $rawSum")
    val est = row.getAs[Double]("est_corrected")
    assert(est > 0 && math.abs(est - 100.0) / 100.0 < 0.2, s"est=$est")
  }

  test("NULL keys are excluded across the sketch family (the countDistinct convention)") {
    import spark.implicits._
    val withNulls = (Seq.fill(200)(Some(1L)) ++ Seq.fill(300)(Option.empty[Long]) ++
      (2L to 50L).map(Some(_))).toDF("v")
    val noNulls = withNulls.filter(col("v").isNotNull)
    // countMin: identical counters with or without the NULL rows
    def cm(df: org.apache.spark.sql.DataFrame) =
      operators.Sketches.countMin(df, col("v"), 4, 64)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cm(withNulls) == cm(noNulls))
    // heavyHitters: the frequent non-null key survives, no NULL row appears
    val hh = operators.Sketches.heavyHitters(withNulls, col("v"), minCount = 100L, width = 64)
      .collect().map(r => (r.isNullAt(0), if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1)))
    assert(hh.toSeq == Seq((false, 1L, 200L)))
    // hll: no phantom NULL register; estimate sees only real keys
    val regs = operators.Sketches.hllRegisters(withNulls, col("v"), Nil, p = 8)
    assert(!regs.collect().exists(_.isNullAt(0)))
    val nz = operators.Sketches.hllEstimate(regs, Nil, p = 8).head().getAs[Long]("n_zero")
    assert(nz >= 256 - 50)
  }

  test("kmvSetSketch is exact below capacity and within theta-sketch error above") {
    import spark.implicits._
    // below capacity on both sides: everything exact
    val a1 = (1L to 40L).toDF("v")
    val b1 = (30L to 70L).toDF("v")
    val small = operators.Sketches.kmvSetSketch(a1, col("v"), b1, col("v"), k = 128).head()
    assert(small.getAs[Double]("est_intersect") == 11.0)
    assert(small.getAs[Double]("est_union") == 70.0)
    assert(small.getAs[Long]("theta") == (1L << 60))
    // above capacity: rse ~ 1/sqrt(k); accept 4 sigma at k=128 (~35%)
    val a2 = (1L to 6000L).toDF("v")
    val b2 = (4000L to 12000L).toDF("v")
    val big = operators.Sketches.kmvSetSketch(a2, col("v"), b2, col("v"), k = 128).head()
    val ei = big.getAs[Double]("est_intersect")
    val eu = big.getAs[Double]("est_union")
    assert(math.abs(ei - 2001.0) / 2001.0 < 0.5, s"intersect est $ei")
    assert(math.abs(eu - 12000.0) / 12000.0 < 0.35, s"union est $eu")
    // disjoint sets: zero common sample entries
    val d = (100000L to 101000L).toDF("v")
    val dj = operators.Sketches.kmvSetSketch(a2, col("v"), d, col("v"), k = 128).head()
    assert(dj.getAs[Long]("n_common") == 0L && dj.getAs[Double]("est_intersect") == 0.0)
    intercept[IllegalArgumentException](
      operators.Sketches.kmvSetSketch(a1, col("v"), b1, col("v"), k = 1))
  }

  // ---- bottom-k quantile sketch ----

  test("quantileSketch is exact below capacity (sample == input, type-1 quantiles)") {
    import spark.implicits._
    val vals = (1 to 100).map(i => ((i * 37 % 100).toDouble, i.toLong))
    val df = vals.toDF("v", "id")
    val st = operators.Sketches.quantileSketch(df, col("v"), col("id"), Nil, k = 256)
    assert(st.count() == 100)
    val est = operators.Sketches.quantileEstimate(st, Seq(0.25, 0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = vals.map(_._1).sorted
    def exact(q: Double) = sorted(math.max(1, math.ceil(q * 100).toInt) - 1)
    Seq(0.25, 0.5, 0.9).foreach(q => assert(est(q) == exact(q), s"q=$q"))
  }

  test("quantileSketch rank error within the bottom-k bound above capacity") {
    import spark.implicits._
    val n = 20000
    val vals = (1 to n).map(i => ((i.toLong * 7919) % n).toDouble)
    val df = vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
    val st = operators.Sketches.quantileSketch(df, col("v"), col("id"), Nil, k = 1024)
    assert(st.count() == 1024)
    val est = operators.Sketches.quantileEstimate(st, Seq(0.1, 0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = vals.sorted
    Seq(0.1, 0.5, 0.9).foreach { q =>
      val rank = sorted.count(_ <= est(q)).toDouble / n
      // ~4 sigma of sqrt(q(1-q)/k) at k=1024 (max 0.0156 at q=.5) -> 0.07
      assert(math.abs(rank - q) < 0.07, s"q=$q est=${est(q)} rank=$rank")
    }
  }

  test("quantileSketch merge law: recap(state(A) U state(B)) == state(A U B)") {
    import spark.implicits._
    val rows = (1 to 5000).map(i => (((i * 271) % 5000).toDouble, i.toLong))
    val df = rows.toDF("v", "id")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getDouble(1))
    val whole = operators.Sketches.quantileSketch(df, col("v"), col("id"), Nil, k = 128)
      .collect().map(key).toSet
    val a = df.filter(col("id") % 2 === 0); val b = df.filter(col("id") % 2 =!= 0)
    val merged = operators.Sketches.quantileSketch(a, col("v"), col("id"), Nil, k = 128)
      .unionAll(operators.Sketches.quantileSketch(b, col("v"), col("id"), Nil, k = 128))
      .withColumn("__g", org.apache.spark.sql.functions.lit(1))
    val recapped = graft.plans.TopK.perKey(merged, Seq(col("__g")),
        Seq(col("h").asc, col("v").asc), 128)
      .select("h", "v").collect().map(key).toSet
    assert(recapped == whole, "merge law violated")
  }

  test("BottomKAgg: capacity boundary, eviction, and split-invariant merge") {
    val agg = new operators.Sketches.BottomKAgg(4)
    val items = Seq((9L, 9.0), (3L, 3.0), (7L, 7.0), (1L, 1.0), (5L, 5.0), (2L, 2.0))
    val full = items.foldLeft(agg.zero)(agg.reduce)
    assert(full == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (5L, 5.0)),
      s"bottom-4 wrong: $full")
    // merge law over EVERY 2-way split of the items
    (0 to items.length).foreach { cut =>
      val (l, r) = items.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged == full, s"split at $cut broke the merge law: $merged")
    }
    // below capacity: lossless
    val few = items.take(3).foldLeft(agg.zero)(agg.reduce)
    assert(few.map(_._1) == Seq(3L, 7L, 9L))
    intercept[IllegalArgumentException](new operators.Sketches.BottomKAgg(1))
  }

  test("BottomKAgg: hash collision straddling the k boundary is arrival-order invariant") {
    // the r14 ADVICE finding: a hash-only order made the kept row under a
    // boundary collision depend on split/arrival order. The (h, v) total
    // order must keep the SAME row — (5, 1.0), not (5, 9.0) — for every
    // permutation and every 2-way split.
    val agg = new operators.Sketches.BottomKAgg(2)
    val items = Seq((1L, 1.0), (5L, 9.0), (5L, 1.0), (7L, 7.0))
    val expected = Seq((1L, 1.0), (5L, 1.0))
    items.permutations.foreach { perm =>
      val direct = perm.foldLeft(agg.zero)(agg.reduce)
      assert(direct == expected, s"order ${perm.mkString(",")} gave $direct")
      (0 to perm.length).foreach { cut =>
        val (l, r) = perm.splitAt(cut)
        val merged = agg.merge(
          l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
        assert(merged == expected,
          s"order ${perm.mkString(",")} split $cut gave $merged")
      }
    }
  }

  test("quantileSketch/Estimate fail-close on bad parameters; NULL values excluded") {
    import spark.implicits._
    val df = Seq((Option(1.0), 1L), (None, 2L)).toDF("v", "id")
    intercept[IllegalArgumentException](
      operators.Sketches.quantileSketch(df, col("v"), col("id"), Nil, k = 1))
    val st = operators.Sketches.quantileSketch(df, col("v"), col("id"), Nil, k = 16)
    assert(st.count() == 1, "NULL value must be excluded")
    intercept[IllegalArgumentException](
      operators.Sketches.quantileEstimate(st, Seq.empty))
    intercept[IllegalArgumentException](
      operators.Sketches.quantileEstimate(st, Seq(1.5)))
  }

  test("hll fail-closes on out-of-range precision") {
    import spark.implicits._
    val df = Seq(1L).toDF("v")
    intercept[IllegalArgumentException](
      operators.Sketches.hllRegisters(df, col("v"), Nil, p = 3))
    intercept[IllegalArgumentException](
      operators.Sketches.hllEstimate(df, Nil, p = 17))
  }

  private implicit class ToSortedMap(pairs: Array[(Long, Long)]) {
    def toSortedMap: scala.collection.SortedMap[Long, Long] =
      scala.collection.SortedMap(pairs.toIndexedSeq: _*)
  }
}
