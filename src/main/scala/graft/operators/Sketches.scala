package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter sketch plumbing over Spark's native codegen'd bloom
  * expressions (the same pair Catalyst injects for runtime join
  * filters — BloomFilterAggregate / BloomFilterMightContain; neither is
  * SQL-registered, so this is the public Column face).
  *
  * Scale shape: the build is a distributed single-pass aggregate (each
  * partition fills a local filter, partials OR together — commutative,
  * so partitioning never changes the result); only the finished bitmap
  * (~1.2 bytes/item at 1% fpp) crosses to the driver, like a broadcast
  * side. The probe is a pure projection predicate — codegen'd, no
  * shuffle, usable right at the scan.
  */
object Sketches {

  /** Build a bloom filter over `keyCol` (hashed with xxhash64, matching
    * what [[mightContain]] probes). One distributed aggregation; returns
    * the serialized bitmap.
    */
  def buildBloom(keys: DataFrame, keyCol: Column, expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    // optimal bit count for the target false-positive rate
    val numBits = math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong.max(64L)
    // BloomFilterAggregate silently CLAMPS both parameters to the runtime-
    // filter session confs (defaults: 4M items / 64M bits) — at corpus
    // scale the filter would saturate and the real fpp silently approach
    // 1. Raise the caps for the duration of THIS build only and restore
    // them after: leaving a 10^9-item cap behind would let Catalyst's own
    // injected runtime join filters build multi-GB driver-side blooms in
    // unrelated queries for the rest of the session.
    val spark = keys.sparkSession
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> expectedItems,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> numBits
    ).map { case (key, needed) =>
      val old = spark.conf.getOption(key)
      if (old.forall(_.toLong < needed)) spark.conf.set(key, needed.toString)
      key -> old
    }
    try {
      val agg = new BloomFilterAggregate(
        GraftBridge.toCatalyst(xxhash64(keyCol)),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression()
      keys.select(GraftBridge.column(agg).as("bf")).head().getAs[Array[Byte]]("bf")
    } finally saved.foreach {
      case (key, Some(v)) => spark.conf.set(key, v)
      case (key, None) => spark.conf.unset(key)
    }
  }

  /** Membership probe against a serialized filter from [[buildBloom]].
    * No false negatives; false positives at ~the build fpp — callers
    * that need exactness verify survivors with an exact join.
    */
  def mightContain(bloom: Array[Byte], keyCol: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      GraftBridge.toCatalyst(xxhash64(keyCol))))

  /** COUNT-MIN frequency sketch (Cormode & Muthukrishnan 2005), built as
    * a plain aggregate: every input key maps to `depth` (row, bucket)
    * cells (independent seeded md5 hashes — the MinHash seed family),
    * and the sketch is the counter table over those cells. Point
    * estimate = min over the key's `depth` counters; never an
    * underestimate, over by at most εN with ε = e/width at the usual
    * confidence, and — because both build and probe are md5-derived and
    * integer-only — bit-for-bit reproducible in any engine, so the
    * estimates themselves are oracle-checkable (the kmv1 doctrine).
    *
    * Scale shape: the counter table is bounded at depth·width rows no
    * matter the corpus — the explode is map-local and partial
    * aggregation collapses it before the one tiny shuffle, so this is
    * THE way to get approximate term frequencies at 100 TB without a
    * vocabulary-sized reduce side. Mergeable: counters add.
    *
    * Output: `row`, `bucket`, `cnt` (cells never touched are absent —
    * semantically zero; [[countMinEstimate]] coalesces).
    *
    * NULL keys are EXCLUDED throughout the family (the countDistinct
    * convention): a NULL would hash to a NULL bucket and silently count
    * toward nothing while the probe side never matched it — callers
    * wanting a NULL group coalesce to a sentinel upstream.
    */
  /** The per-key (row, bucket) cell structs shared by the batch and
    * streaming CMS builds — one projection, identical md5 chains. */
  private def cmsCells(key: Column, depth: Int, width: Int): Seq[Column] = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    (0 until depth).map { j =>
      struct(lit(j).as("row"),
        (graft.functions.TextOps.seededHash(key.cast("string"), j) % width).as("bucket"))
    }
  }

  def countMin(df: DataFrame, key: Column, depth: Int = 4, width: Int = 512,
      groupCols: Seq[String] = Nil): DataFrame = {
    val cells = cmsCells(key, depth, width)
    // groupCols (r16): per-group sketches from ONE scan — a split corpus
    // (daily shards, the cms4 halves) no longer needs one full pass per
    // member; each group's (row, bucket, cnt) table is value-identical to
    // countMin over that group's rows alone (counts partition by group)
    df.filter(key.isNotNull)
      .select(groupCols.map(col) :+ explode(array(cells: _*)).as("rb"): _*)
      .groupBy(groupCols.map(col) :+ col("rb.row").as("row") :+
        col("rb.bucket").as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** STREAMING count-min — the daily-sketch shape, live: per
    * (event-time window, row, bucket) counts under a watermark. State is
    * bounded at open-windows × depth·width rows no matter the stream
    * volume; counts are monotone, so Update-mode refinements collapse by
    * max (the runToCompletion(finalKeys) contract) and each CLOSED
    * window's counter table IS the batch [[countMin]] of that window's
    * rows — EventStreamSpec gates the equality cell-for-cell, which is
    * what lets live sketches merge with historical ones (counters add).
    */
  def streamingCountMin(events: DataFrame, key: Column,
      window_ : String = "1 hour", watermark: String = "2 hours",
      depth: Int = 4, width: Int = 512): DataFrame = {
    val cells = cmsCells(key, depth, width)
    events.filter(key.isNotNull)
      .withWatermark("ts", watermark)
      .select(col("ts"), explode(array(cells: _*)).as("rb"))
      .groupBy(window(col("ts"), window_),
        col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("row"), col("bucket"), col("cnt"))
  }

  /** Point-query the [[countMin]] sketch for each distinct value of
    * `key` in `probes`: recompute the `depth` cells, left-join the
    * counter table (absent cell = 0), take the min. The sketch side is
    * depth·width rows → Spark broadcasts it; the probe pass is one
    * map-side join + a per-key min, no matter how large the probe set.
    * Output: `key`, `est` (>= the true count, never under).
    */
  def countMinEstimate(
      sketch: DataFrame,
      probes: DataFrame,
      key: Column,
      depth: Int = 4,
      width: Int = 512): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val cells = (0 until depth).map { j =>
      struct(lit(j).as("row"),
        (graft.functions.TextOps.seededHash(col("key").cast("string"), j) % width).as("bucket"))
    }
    probes.select(key.as("key")).filter(col("key").isNotNull).distinct()
      .select(col("key"), explode(array(cells: _*)).as("rb"))
      .select(col("key"), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** HEAVY HITTERS end to end — the count-min sketch's canonical use:
    * keys whose count >= `minCount`, found by sketch prefilter then
    * exact verify of the candidates ONLY. No false negatives (estimates
    * never underestimate) and no false positives (the exact recount
    * drops them), so the result EQUALS the plain GROUP BY/HAVING — at a
    * bounded cost: the sketch is one depth·width aggregate, the
    * candidate set is <= N/minCount + collision strays (broadcast-class
    * by the caller's choice of minCount), and the exact pass is a
    * broadcast semi-join + recount over candidate rows only. Never a
    * full-key shuffle.
    * Output: `key` (original type), `n` (exact count).
    */
  def heavyHitters(
      df: DataFrame,
      key: Column,
      minCount: Long,
      depth: Int = 4,
      width: Int = 512): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(depth.toLong * width <= (1L << 22),
      s"depth*width (${depth.toLong * width}) exceeds the driver-collect bound 2^22")
    val keyed = df.select(key.as("key")).filter(col("key").isNotNull)
    // the finished counter table is depth*width rows — the zone-map /
    // IVF-cell adjudicated-collect class — so the per-row estimate can
    // be a literal map lookup instead of a probe-side distinct+join:
    // no vocabulary-sized shuffle anywhere (countMinEstimate's distinct
    // would be exactly the reduce side this operator exists to avoid)
    // dense array literal instead of a map literal: element_at on a map
    // LITERAL is a linear scan of all depth·width keys per lookup (4096
    // comparisons per row at the defaults) where the array index is O(1);
    // absent cells are exactly the zero entries, so the per-row estimates
    // are value-identical to the map form
    val cellArr = new Array[Long](depth * width)
    countMin(keyed, col("key"), depth, width).collect()
      .foreach(r => cellArr(r.getInt(0) * width + r.getLong(1).toInt) = r.getLong(2))
    val arrLit = typedlit(cellArr)
    val est = (0 until depth).map { j =>
      // seededHash is a 24-bit md5 slice (non-negative), so the 1-based
      // index is always in [1, depth·width]
      element_at(arrLit,
        (lit(j.toLong * width) +
          graft.functions.TextOps.seededHash(col("key").cast("string"), j) % width +
          lit(1L)).cast("int"))
    }.reduce(least(_, _))
    // map-side prefilter -> the groupBy shuffles ONLY candidate rows
    keyed.filter(est >= minCount)
      .groupBy("key").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** SET-OPERATION cardinalities from two KMV sketches — the theta-sketch
    * construction (Dasgupta et al. 2016) on the md5-deterministic KMV
    * base [[kmvDistinct]] proves: with θ = min of the two sketch
    * thresholds (a below-capacity sketch sees everything, θ = 2^60),
    * the hashes below θ are a uniform sample of the union, so
    * |A ∩ B| ≈ |{h ∈ kA ∩ kB : h < θ}| · 2^60 / θ and the union
    * estimate is the re-capped merged sketch's own KMV estimate. When
    * BOTH sides are below capacity every number is exact. This is the
    * audience-overlap shape: intersect/union distinct counts across
    * stores/days from k-row summaries, no re-scan, no key shuffle —
    * and md5-determinism makes the estimates themselves oracle-checkable.
    *
    * Output: one row — `n_common`, `theta`, `est_intersect`,
    * `est_union`.
    */
  def kmvSetSketch(
      a: DataFrame, keyA: Column,
      b: DataFrame, keyB: Column,
      k: Int = 128): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val full = 1L << 60
    def kset(df: DataFrame, key: Column) = {
      val h = graft.functions.TextOps.hexVal(md5(key.cast("string")), 15)
      graft.plans.TopK.perKey(
        df.filter(key.isNotNull).select(lit(1).as("__g"), h.as("h")).distinct(),
        Seq(col("__g")), Seq(col("h").asc), k).select("h")
    }
    val ka = kset(a, keyA)
    val kb = kset(b, keyB)
    val theta = ka.agg(count(lit(1)).as("na"), max(col("h")).as("ka"))
      .crossJoin(kb.agg(count(lit(1)).as("nb"), max(col("h")).as("kb")))
      .select(least(
        when(col("na") < k, lit(full)).otherwise(col("ka")),
        when(col("nb") < k, lit(full)).otherwise(col("kb"))).as("theta"))
    val common = ka.join(kb, "h").crossJoin(broadcast(theta))
      .filter(col("h") < col("theta"))
      .agg(count(lit(1)).as("n_common"))
    val merged = graft.plans.TopK.perKey(
      ka.union(kb).distinct().select(lit(1).as("__g"), col("h")),
      Seq(col("__g")), Seq(col("h").asc), k)
    val union = merged.agg(count(lit(1)).as("nu"), max(col("h")).as("kthu"))
    common.crossJoin(broadcast(theta)).crossJoin(broadcast(union))
      .select(col("n_common"), col("theta"),
        round(col("n_common").cast("double") * lit(math.pow(2.0, 60))
          / col("theta").cast("double"), 6).as("est_intersect"),
        when(col("nu") < k, col("nu").cast("double"))
          .otherwise(round(lit((k - 1).toDouble * math.pow(2.0, 60))
            / col("kthu").cast("double"), 6)).as("est_union"))
  }

  /** EQUI-JOIN SIZE estimate from two count-min sketches (Alon–Matias–
    * Szegedy second moments via the CMS inner product, Cormode &
    * Muthukrishnan §4.3): |A ⋈ B on key| is estimated as
    * min over rows j of Σ_buckets cmsA[j][b]·cmsB[j][b] — NEVER an
    * underestimate (colliding keys only add cross terms), within
    * εN_A·N_B of truth per row at the usual confidence. The
    * cardinality-estimation use of the sketch: judge a join's output
    * size from two depth·width tables WITHOUT running the join or
    * shuffling either input by key. A = B gives the self-join size
    * (the F2 second moment, Σ_k c_k²). All-integer, so the estimate
    * itself is oracle-checkable.
    * Output: one row, `est` (bigint).
    */
  def countMinJoinSize(
      a: DataFrame, keyA: Column,
      b: DataFrame, keyB: Column,
      depth: Int = 4, width: Int = 512): DataFrame = {
    val sa = countMin(a, keyA, depth, width)
    val sb = countMin(b, keyB, depth, width)
      .withColumnRenamed("cnt", "cnt_b")
    // FULL outer + zero-fill: an inner join would drop cells present in
    // only one sketch (their product is 0, harmless) but — worse — drop a
    // whole ROW from the min when the two sketches share no cells in it,
    // so fully-disjoint key sets reported NULL instead of their true
    // min-over-rows. The final coalesce covers the both-inputs-empty
    // degenerate (no rows at all → inner product 0, the exact join size).
    sa.join(sb, Seq("row", "bucket"), "full_outer")
      .groupBy("row")
      .agg(sum(coalesce(col("cnt"), lit(0L)) * coalesce(col("cnt_b"), lit(0L))).as("__ip"))
      .agg(coalesce(min(col("__ip")), lit(0L)).as("est"))
  }

  /** [[countMinJoinSize]] with A = B — the F2 second moment Σ_k c_k²
    * from ONE sketch build: the general form scans and shuffles the
    * SAME input twice to construct two identical tables and full-outer
    * them; the self inner product is just Σ cnt² per sketch row, min
    * over rows — identical output by construction (every cell matches
    * itself; the zero-fill cases cannot arise), half the sketch cost.
    */
  def countMinSelfJoinSize(
      df: DataFrame, key: Column,
      depth: Int = 4, width: Int = 512): DataFrame =
    countMin(df, key, depth, width)
      .groupBy("row")
      .agg(sum(col("cnt") * col("cnt")).as("__ip"))
      .agg(coalesce(min(col("__ip")), lit(0L)).as("est"))

  /** HYPERLOGLOG register table (Flajolet et al. 2007), md5-derived and
    * therefore deterministic across engines (the kmv1 doctrine — Spark's
    * own approx_count_distinct uses engine-private xxhash state, which
    * can never be oracle-checked). The 60-bit hash splits into a p-bit
    * register index and a (60-p)-bit suffix whose leading-zero rank is
    * the register's update; registers take the MAX — commutative and
    * idempotent, so partials merge across partitions/stores/days and
    * duplicates are absorbed for free (no distinct pass, unlike KMV).
    *
    * Scale shape: ONE narrow aggregate with map-side partial max onto at
    * most groups × 2^p rows — the cheapest mergeable distinct sketch
    * there is.
    *
    * Output: group columns + `register` (0..2^p-1, absent = never hit) +
    * `max_rho` (leading-zero rank, 1..61-p).
    */
  /** The (register, rho) projection shared by the batch and streaming
    * HLL builds: rho = leading zeros of the L-bit suffix + 1, via the
    * minimal binary string length (all-integer: no float log anywhere).
    */
  private def hllCols(key: Column, p: Int): (Column, Column) = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val L = 60 - p
    val h = graft.functions.TextOps.hexVal(md5(key.cast("string")), 15)
    val reg = shiftright(h, L)
    val suffix = h.bitwiseAND(lit((1L << L) - 1))
    val rho = when(suffix === 0, lit(L + 1).cast("long"))
      .otherwise(lit(L + 1).cast("long") - length(bin(suffix)).cast("long"))
    (reg, rho)
  }

  def hllRegisters(
      df: DataFrame,
      key: Column,
      groupCols: Seq[String] = Nil,
      p: Int = 8): DataFrame = {
    val (reg, rho) = hllCols(key, p)
    // NULL keys excluded (the countDistinct convention, and the countMin
    // family's): a NULL would form a phantom (NULL, NULL) register row
    // that hllEstimate would count as a hit while contributing nothing
    val base = df.filter(key.isNotNull)
      .select(groupCols.map(col) :+ reg.as("register") :+ rho.as("__rho"): _*)
    base.groupBy((groupCols.map(col) :+ col("register")): _*)
      .agg(max(col("__rho")).as("max_rho"))
  }

  /** STREAMING HyperLogLog — registers as a watermarked stateful
    * aggregate: per (event-time window, register) MAX over the identical
    * md5-derived rho projection. State bounded at open-windows × 2^p
    * rows; max is monotone and idempotent, so Update-mode refinements
    * collapse by max and a closed window's register table IS the batch
    * [[hllRegisters]] of that window's rows (EventStreamSpec gates it) —
    * live daily sketches then merge with stored ones by register-wise
    * max, exactly the law hll2 proves in batch.
    */
  def streamingHllRegisters(events: DataFrame, key: Column,
      window_ : String = "1 hour", watermark: String = "2 hours",
      p: Int = 8): DataFrame = {
    val (reg, rho) = hllCols(key, p)
    events.filter(key.isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), reg.as("register"))
      .agg(max(rho).as("max_rho"))
      .select(col("window.start").as("window_start"), col("register"), col("max_rho"))
  }

  /** Fixed-point HLL state fold + raw estimate, per group: `n_zero`
    * (registers never hit), `raw_sum` = Σ 2^(L−rho) over all 2^p
    * registers with L = 62−p, as an EXACT BIGINT — rho <= 61−p so every
    * term is integral, and the sum is bounded by 2^p · 2^(62−p) = 2^62
    * for ANY p (the first cut used a fixed 2^54 scale, which the
    * all-registers-empty bound overflows from p = 10 up). The raw
    * harmonic estimate α·m²·2^L / raw_sum is a single correctly-rounded
    * double divide by an exact integer, so even the float column is
    * engine-identical (the kmv1 arithmetic shape). The standard
    * small-range linear counting correction (m·ln(m/V)) involves a
    * transcendental whose last-ulp behavior is engine-private — it
    * lives in SketchSpec's accuracy harness, not in oracled output.
    */
  /** α·m²·2^(62−p) for [[hllEstimate]]'s single divide — public so the
    * DuckDB oracle can interpolate the IDENTICAL double literal. */
  def hllScale(p: Int): Double = {
    val m = (1L << p).toDouble
    (0.7213 / (1.0 + 1.079 / m)) * m * m * math.pow(2.0, (62 - p).toDouble)
  }

  def hllEstimate(registers: DataFrame, groupCols: Seq[String] = Nil, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1L << p
    val L = 62 - p
    val gb = if (groupCols.isEmpty) registers.groupBy() else registers.groupBy(groupCols.map(col): _*)
    gb.agg(
        (lit(m) - count(lit(1))).as("n_zero"),
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($L - max_rho AS INT))"))
          + (lit(m) - count(lit(1))) * lit(1L << L)).as("raw_sum"))
      .withColumn("est_raw", round(lit(hllScale(p)) / col("raw_sum").cast("double"), 6))
      // the standard small-range linear-counting switch — ln's last-ulp
      // behavior is engine-private, so this column is for USERS (accuracy
      // proven in SketchSpec); oracled queries project est_raw instead
      .withColumn("est_corrected",
        when(col("est_raw") <= lit(2.5 * m) && col("n_zero") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero").cast("double")))
          .otherwise(col("est_raw")))
  }

  /** MERGEABLE QUANTILE sketch — the fourth canonical mergeable summary
    * beside CMS (frequency), HLL (distinct), and KMV (theta): a bottom-k
    * uniform row sample keyed by the 60-bit md5 hash of the row identity
    * (Cohen & Kaplan 2007's bottom-k sketches, applied to order
    * statistics). The k rows with the smallest hashes are a uniform
    * without-replacement sample of the multiset, so the sample's type-1
    * q-quantile estimates the population's with rank error
    * O(√(q(1−q)/k)); below capacity the sample IS the input and every
    * quantile is exact (the kmvDistinct losslessness).
    *
    * Why not KLL/t-digest state: their compaction consumes items in
    * ARRIVAL order, so the state is a function of partition boundaries
    * and merge scheduling — no two engines (or two runs) agree on it,
    * which makes the state un-oracle-able and the merge law untestable
    * as data. Bottom-k state is a pure function of the input SET:
    * md5-deterministic, engine-identical, and its merge law is exact —
    * recap_k(state(A) ∪ state(B)) = state(A ∪ B) — the same law hll2
    * proves for registers and KMV for hashes (qs2 gates it row-for-row).
    * The price is O(1/√k) rank error instead of KLL's O(1/k); buy
    * accuracy with k, which only grows the k-row state.
    *
    * Scale shape: one distinct-free narrow scan (hash is a projection)
    * into the bounded-heap [[graft.plans.TopK]] pair — the exchange
    * carries at most k rows per (group, input partition), the reduce
    * side O(k·groups), regardless of corpus size. Mergeable across
    * stores/days by unioning states and re-capping.
    *
    * `idCol` must be row-unique (it IS the sampling frame — duplicated
    * ids collapse rather than double-sample) and integer/string-typed:
    * the hash is md5 of its string form, and float-to-string rendering
    * is the one chain engines disagree on, so values stay OUT of the
    * hash. NULL values excluded (the family convention).
    * Output: group columns + `h` (60-bit hash) + `v` (the value).
    */
  def quantileSketch(
      df: DataFrame,
      value: Column,
      idCol: Column,
      groupCols: Seq[String] = Nil,
      k: Int = 256): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val h = graft.functions.TextOps.hexVal(md5(idCol.cast("string")), 15)
    val gcols = if (groupCols.isEmpty) Seq("__g") else groupCols
    val base =
      if (groupCols.isEmpty)
        df.filter(value.isNotNull).select(lit(1).as("__g"), h.as("h"), value.as("v"))
      else
        df.filter(value.isNotNull)
          .select(groupCols.map(col) ++ Seq(h.as("h"), value.as("v")): _*)
    val top = graft.plans.TopK.perKey(base, gcols.map(col),
      Seq(col("h").asc, col("v").asc), k)
    if (groupCols.isEmpty) top.drop("__g") else top
  }

  /** Quantile estimates from a [[quantileSketch]] state, per group: the
    * sample's type-1 quantile — the value at rank max(1, ⌈q·m⌉) of the m
    * kept rows ordered by (v, h). NO window: the state is BOUNDED (≤ k
    * rows per group), so one `sort_array(collect_list(...))` aggregation
    * ranks it — a lit-partitioned window here would be folded to a
    * single-partition WindowExec by Spark's EliminateWindowPartitions,
    * tripping the engine's own no-global-window doctrine even though the
    * input is k rows. ⌈q·m⌉ is one exact double-multiply + ceil, so
    * estimates hash-gate cross-engine.
    * Output: group columns + `q` + `est` + `m` (sample size).
    */
  def quantileEstimate(
      state: DataFrame,
      qs: Seq[Double],
      groupCols: Seq[String] = Nil): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    qs.foreach(q => require(q > 0 && q <= 1, s"quantile must be in (0,1], got $q"))
    val gcols = if (groupCols.isEmpty) Seq("__g") else groupCols
    val st = if (groupCols.isEmpty) state.withColumn("__g", lit(1)) else state
    // struct field order (v, h) = the rank order; sort_array is the
    // lexicographic struct sort, so element_at(s, ⌈q·m⌉).v IS the
    // type-1 sample quantile
    val agg = st
      .groupBy(gcols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("v"), col("h")))).as("__s"))
    val est = agg
      .select(gcols.map(col) ++ Seq(col("__s"),
        explode(array(qs.map(lit): _*)).as("q")): _*)
      .withColumn("m", size(col("__s")).cast("long"))
      .select(gcols.map(col) ++ Seq(col("q"),
        element_at(col("__s"),
          greatest(lit(1L), ceil(col("q") * col("m").cast("double")))
            .cast("int")).getField("v").as("est"),
        col("m")): _*)
    if (groupCols.isEmpty) est.drop("__g") else est
  }

  /** Typed bounded bottom-k aggregator over (hash, value) pairs — the
    * quantile sketch's state as a MERGEABLE AGGREGATE, which is what a
    * watermarked streaming groupBy needs (the custom TopK physical plan
    * serves batch; streaming state must live in an agg buffer). merge()
    * IS the qs2/qs4 re-cap law, so partial states from any partitioning
    * or micro-batch schedule combine exactly. Buffer kept sorted
    * ascending by hash and capped at k: O(k) per row — right for
    * per-window streaming state (bounded rows per trigger); corpus-scale
    * batch builds should use [[quantileSketch]]'s TopK pair instead.
    *
    * The order is TOTAL on (h, v) — hash first, value as tiebreak —
    * in reduce, merge, and eviction alike (and [[quantileSketch]]'s
    * TopK pair orders the same way): with a hash-only order, a 60-bit
    * collision straddling the k boundary would keep whichever row
    * arrived first, making the state depend on partitioning and
    * breaking the exact merge law exactly where it matters (birthday
    * collisions in 2^60 are realistic at billions of rows).
    */
  class BottomKAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
    require(k >= 2, s"k must be >= 2, got $k")
    private val ord = Ordering.Tuple2[Long, Double]
    override def zero: Seq[(Long, Double)] = Nil
    override def reduce(b: Seq[(Long, Double)], x: (Long, Double)): Seq[(Long, Double)] =
      if (b.length < k) (b :+ x).sorted(ord)
      else if (ord.lt(x, b.last)) (b.init :+ x).sorted(ord)
      else b
    override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
      (a ++ b).sorted(ord).take(k)
    override def finish(b: Seq[(Long, Double)]): Seq[(Long, Double)] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** STREAMING quantile sketch state — per (event-time window), the
    * bottom-k (hash, value) sample under a watermark, via [[BottomKAgg]]
    * (a real mergeable aggregate, so Spark's stateful store holds one
    * bounded buffer per open window). A closed window's rows equal the
    * batch [[quantileSketch]] of that window's events — EventStreamSpec
    * gates it — so live window states feed [[quantileEstimate]] and the
    * qs4 rollup tree directly.
    *
    * CONSUME IN COMPLETE OUTPUT MODE (unlike the streamingCountMin /
    * streamingHllRegisters siblings): bottom-k state EVICTS rows, so
    * Update-mode emissions are NOT max-collapsible — collapsing them
    * with the family's runToCompletion(finalKeys) contract would keep
    * stale evicted rows in the final table. Complete mode's sink holds
    * the exact current snapshot per window, which is the state the
    * batch-equality law is stated over.
    * Output: `window_start`, `h`, `v`.
    */
  def streamingQuantileState(events: DataFrame, value: Column, idCol: Column,
      window_ : String = "1 hour", watermark: String = "2 hours",
      k: Int = 256): DataFrame = {
    val h = graft.functions.TextOps.hexVal(md5(idCol.cast("string")), 15)
    val bottomK = udaf(new BottomKAgg(k))
    events.filter(value.isNotNull)
      .withWatermark("ts", watermark)
      .select(col("ts"), h.as("__h"), value.cast("double").as("__v"))
      .groupBy(window(col("ts"), window_))
      .agg(bottomK(col("__h"), col("__v")).as("state"))
      .select(col("window.start").as("window_start"), explode(col("state")).as("hv"))
      .select(col("window_start"), col("hv._1").as("h"), col("hv._2").as("v"))
  }

  /** KMV (k-minimum-values) distinct-count sketch, per group: keep the k
    * smallest distinct 60-bit md5-derived hashes of `key`; with h(k) the
    * k-th smallest hash on the 2^60 scale, the estimate is
    * (k-1) · 2^60 / h(k) (Bar-Yossef et al. 2002). Groups holding fewer
    * than k distinct keys report the EXACT count (the sketch is lossless
    * below capacity).
    *
    * Unlike HyperLogLog this sketch is RNG-free and fully deterministic
    * (md5 of the value), so two engines agree bit-for-bit — which is what
    * makes it oracle-checkable. It is also mergeable: the union of two
    * sketches' hash sets, re-capped to the k smallest, is exactly the
    * sketch of the unioned inputs, so partials combine across
    * partitions, stores, or days like any mergeable agg state.
    *
    * Scale shape: one distinct shuffle on (group, hash) with map-side
    * partial dedup, then the k-cap runs through the bounded-heap
    * [[graft.plans.TopK]] physical operator — the post-distinct exchange
    * carries at most k rows per group, so the reduce side is O(k·groups)
    * regardless of input distinct cardinality.
    *
    * Output: group columns + `n_min` (hashes kept, = min(k, distinct)),
    * `kth_hash` (the sketch bound), `est_distinct`.
    */
  def kmvDistinct(
      df: DataFrame,
      key: Column,
      groupCols: Seq[String] = Nil,
      k: Int = 256): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    // 15 hex chars = 60 bits: exact in a BIGINT in both engines, and
    // (k-1)·2^60 stays exactly representable as a double for any sane k
    val h = graft.functions.TextOps.hexVal(md5(key.cast("string")), 15)
    val gcols = if (groupCols.isEmpty) Seq("__g") else groupCols
    val base =
      if (groupCols.isEmpty) df.select(lit(1).as("__g"), h.as("__h"))
      else df.select(groupCols.map(col) :+ h.as("__h"): _*)
    val top = graft.plans.TopK.perKey(
      base.distinct(), gcols.map(col), Seq(col("__h").asc), k)
    // with no groups the final fold is a SCALAR agg (keys=[]), not a
    // groupBy on the constant __g — the plan stays statically provable
    // as ≤1 row, which is what lets QueryAuditSpec's row-bound check
    // adjudicate broadcasts of this frame without an allowlist entry
    val folded =
      if (groupCols.isEmpty)
        top.agg(count(lit(1)).as("n_min"), max(col("__h")).as("kth_hash"))
      else
        top.groupBy(gcols.map(col): _*)
          .agg(count(lit(1)).as("n_min"), max(col("__h")).as("kth_hash"))
    folded.withColumn("est_distinct",
      when(col("n_min") < k, col("n_min").cast("double"))
        .otherwise(round(
          lit((k - 1).toDouble * math.pow(2.0, 60)) / col("kth_hash").cast("double"), 6)))
  }
}
