package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators (BASELINE.json north_star): the steps
  * between "deduplicated corpus" and "training shards" — deterministic
  * splits, token-budget packing, salient-term extraction.
  *
  * Everything here is hash- or window-based and oracle-checkable; no RNG,
  * no driver-side state.
  */
object Curation {

  /** Deterministic hash split: md5 of the id → bucket 0..99 → named split.
    * The split is a pure function of the id (stable under reruns, appends,
    * and re-partitioning — the property `sample()`/`randomSplit()` lack),
    * which is what training pipelines need so a document never migrates
    * between train and eval. Fractions are cumulative percentages.
    */
  /** Deterministic corpus shuffle — training-order assignment (r10b):
    * `outCol` = 1-based position in the order of
    * (md5(seed || ':' || id), id). Reproducible under any partitioning,
    * cluster size, or rerun (the property epoch shuffles need that
    * `orderBy(rand())` lacks), and a new `seed` is a new independent
    * permutation — one shuffle per epoch. No global sort:
    * [[GlobalOrder.withGlobalRank]]'s two-pass bucket rank (the 60-bit
    * md5 prefix is the numeric leading order, `idCol` the tie-break).
    */
  def deterministicShuffle(
      df: DataFrame,
      seed: String,
      idCol: String = "doc_id",
      outCol: String = "shuffle_pos"): DataFrame = {
    val key = TextOps.hexVal(
      md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))), 15)
    GlobalOrder.withGlobalRank(
        df.withColumn("__shuf_key", key),
        Seq(col("__shuf_key"), col(idCol)), outCol)
      .drop("__shuf_key")
  }

  def hashSplit(
      df: DataFrame,
      idCol: String,
      trainPct: Int = 80,
      valPct: Int = 10): Column = {
    val bucket = TextOps.hexVal(md5(col(idCol).cast("string")), 4) % 100
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Token-budget sequence packing, concat-and-split style: documents are
    * laid out in `orderCol` order as one virtual token stream and cut into
    * bins of `budget` tokens; a document's bin is where its FIRST token
    * falls. One window pass (running sum), no driver loop.
    *
    * Scale note: a single unpartitioned ORDER BY window serializes onto
    * one reducer. Pass `shardCol` to pack independently within shards
    * (file / date / bucket) — the production layout, since cross-shard
    * packing order is arbitrary anyway.
    */
  def packByTokenBudget(
      df: DataFrame,
      tokenCountCol: Column,
      orderCol: String,
      budget: Int,
      shardCol: Option[String] = None): DataFrame = {
    val w0 = shardCol match {
      case Some(s) => Window.partitionBy(s)
      case None => Window.partitionBy()
    }
    val w = w0.orderBy(col(orderCol)).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("_n_tok", tokenCountCol.cast("long"))
      .withColumn("_cum", sum(col("_n_tok")).over(w))
      .withColumn("bin_id", floor((col("_cum") - col("_n_tok")) / budget).cast("long"))
      .drop("_cum")
      .withColumnRenamed("_n_tok", "n_tok")
  }

  /** Eval-set decontamination: drop every document sharing at least one
    * `ngramK`-token n-gram with the `evalSet` — the standard guard against
    * benchmark leakage into training corpora. Exact-match on the gram
    * string (no hashing → no false drops); the eval side is tiny relative
    * to the corpus, so after its distinct-gram aggregation AQE broadcasts
    * it and the semi join never shuffles the corpus grams. Per-doc
    * `array_distinct` bounds the explode at one row per distinct gram.
    *
    * A document that IS in the eval set shares its own grams and is
    * dropped too — the conservative contract.
    */
  def decontaminate(
      docs: DataFrame,
      evalSet: DataFrame,
      ngramK: Int = 13,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    def grams(df: DataFrame, cols: Column*): DataFrame = df.select(
      cols :+ explode(array_distinct(
        TextOps.shingles(TextOps.tokens(col(textCol)), ngramK))).as("__gram"): _*)
    val evalGrams = grams(evalSet).distinct()
    // spread BEFORE the shingle build: a single-file corpus scan would
    // otherwise run the whole tokenize+shingle on one core (measured 5x
    // on the sf0.1 bench)
    val contaminated = grams(Partitioning.spread(docs), col(idCol))
      .join(evalGrams, Seq("__gram"), "left_semi")
      .select(col(idCol)).distinct()
    docs.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Per-document gram NOVELTY against a reference corpus: the fraction
    * of a doc's distinct `ngramK`-grams NOT present in `reference` — the
    * novelty-weighted sampling signal (prefer documents that add new
    * content; near-zero novelty ≈ boilerplate the corpus already has).
    * Same scale shape as [[decontaminate]]: per-doc distinct grams bound
    * the explode, the reference's distinct-gram table broadcasts after
    * its aggregation, and the fraction is integer-ratio arithmetic
    * (novel/total as DOUBLE — engine-exact). Every doc appears in the
    * output: shorter-than-k docs shingle to one whole-text gram, so the
    * explode never drops a row.
    */
  def gramNovelty(
      docs: DataFrame,
      reference: DataFrame,
      ngramK: Int = 13,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    def grams(df: DataFrame, cols: Column*): DataFrame = df.select(
      cols :+ explode(array_distinct(
        TextOps.shingles(TextOps.tokens(col(textCol)), ngramK))).as("__gram"): _*)
    val refGrams = grams(reference).distinct().withColumn("__hit", lit(1L))
    grams(Partitioning.spread(docs), col(idCol))
      .join(refGrams, Seq("__gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_grams").cast("double"))
  }

  /** Sketch-accelerated decontamination — identical RESULT to
    * [[decontaminate]] (the oracle hash-checks that), different scale
    * shape: instead of semi-joining every corpus gram against the eval
    * grams, a bloom filter built over the eval grams prefilters corpus
    * grams as a pure scan-side predicate (no shuffle, no false
    * negatives), and only the survivors — true hits plus ~fpp false
    * positives — pay the exact semi-join verify. At 100 TB the corpus
    * gram exchange is the dominant cost of exact decontamination; the
    * bloom path shrinks it to (contamination rate + fpp) of the corpus.
    */
  def decontaminateBloom(
      docs: DataFrame,
      evalSet: DataFrame,
      ngramK: Int = 13,
      idCol: String = "doc_id",
      textCol: String = "text",
      fpp: Double = 0.01): DataFrame = {
    def grams(df: DataFrame, cols: Column*): DataFrame = df.select(
      cols :+ explode(array_distinct(
        TextOps.shingles(TextOps.tokens(col(textCol)), ngramK))).as("__gram"): _*)
    // The eval-gram projection is referenced three times (count to size
    // the filter, the bloom build, the exact-verify semi join) and
    // actions get no cross-query subtree reuse — persist it for the
    // build, then release it: the returned plan must not pin a session-
    // lifetime cache (a per-eval-set leak, and it would compete with
    // every later query for storage memory). Only the tiny contaminated
    // id set stays cached, because the lazy result references it.
    // Without the persist the tokenize+shingle+distinct subtree ran 3×
    // (measured 5.0 s vs the exact path's 1.1 s at sf0.1).
    val evalGrams = grams(evalSet).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val contaminated = try {
      // distributed build; one bounded bitmap returns to the driver (an
      // index-build action, same contract as Similarity's IVF metadata)
      val nGrams = evalGrams.count().max(1L)
      val bloom = Sketches.buildBloom(evalGrams, col("__gram"), nGrams, fpp)
      val ids = grams(Partitioning.spread(docs), col(idCol))
        .filter(Sketches.mightContain(bloom, col("__gram")))
        .join(evalGrams, Seq("__gram"), "left_semi")
        .select(col(idCol)).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ids.count() // materialize off the eval-gram cache before dropping it
      ids
    } finally evalGrams.unpersist()
    docs.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Deterministic WEIGHTED sampling without replacement, k per group
    * (Efraimidis–Spirakis A-ES): each row draws a pseudo-uniform
    * u ∈ (0,1] from an md5 of its id and the k rows with the largest
    * u^(1/w) win — spelled as the equivalent ln(u)/w ordering and
    * FIXED-POINTED (floor(ln u / w · 2^20) BIGINT) so the rank key is
    * integer-comparable and engine-exact (the lm1 ln-parity pattern).
    * The draw is a pure function of the id: stable under reruns,
    * appends (for surviving rows), and partitioning — the weighted
    * analog of [[hashSplit]]/[[stratifiedSample]], which can only do
    * uniform rates. One window per group, no RNG state.
    */
  def weightedSample(
      df: DataFrame,
      idCol: Column,
      weightCol: Column,
      groupCols: Seq[Column],
      k: Int,
      keyCol: String = "wkey_fp"): DataFrame = {
    require(k > 0, s"weightedSample k must be positive, got $k")
    val u = (TextOps.hexVal(md5(idCol.cast("string")), 8) + lit(1L))
      .cast("double") / lit(4294967296.0)
    // A-ES precondition: weights must be strictly positive. w = 0 makes
    // the key -Inf/NaN (NaN casts to 0 and ranks mid-pack); w < 0 FLIPS
    // ln(u)/w positive so the lowest-weight rows win — both silent
    // inversions, so fail loudly instead (raise_error evaluates per row
    // on the executors; no extra pass over the data).
    val checkedW = when(weightCol.isNull || weightCol <= 0, raise_error(concat(
      lit("weightedSample: weight must be > 0, got "), weightCol.cast("string"))))
      .otherwise(weightCol)
    val key = floor(log(u) / checkedW * lit(1048576L)).cast("long")
    val w = Window.partitionBy(groupCols: _*).orderBy(col(keyCol).desc, idCol.asc)
    df.withColumn(keyCol, key)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Per-group document cap: keep at most `k` rows per group, best
    * `orderCol` first (ties broken by `tieCol` for determinism) — the
    * per-domain cap every web corpus applies so no single site dominates
    * the training mix. One window per group partition — each group ranks
    * independently, no global sort; the output is bounded at k·groups.
    */
  def capPerGroup(
      df: DataFrame,
      groupCols: Seq[Column],
      orderCol: Column,
      tieCol: Column,
      k: Int,
      rankCol: String = "rn"): DataFrame = {
    require(k > 0, s"capPerGroup k must be positive, got $k")
    require(!df.columns.contains(rankCol),
      s"capPerGroup would overwrite existing column '$rankCol' — pass a different rankCol")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols: _*).orderBy(orderCol.desc, tieCol.asc)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Deterministic stratified sampling: keep a per-stratum percentage,
    * decided by an md5 bucket of the row id — stable under reruns,
    * appends, and repartitioning (the property `sampleBy` lacks), and
    * pure projection+filter (no shuffle, no RNG state).
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: Column,
      stratumCol: Column,
      ratePct: Map[String, Int],
      defaultPct: Int): DataFrame = {
    val bucket = TextOps.hexVal(md5(idCol.cast("string")), 4) % 100
    val rate = ratePct.foldLeft(lit(defaultPct)) { case (acc, (k, pct)) =>
      when(stratumCol === k, pct).otherwise(acc)
    }
    df.filter(bucket < rate)
  }

  /** Context-window chunking: split each document's token stream into
    * fixed-size chunks with overlap (`stride` = tokens between chunk
    * starts; stride < chunkTokens overlaps, the standard training-prep
    * shape). Pure per-row explode — no shuffle; chunk_id is the 0-based
    * window index so (doc, chunk) is a stable key under reruns. The final
    * partial chunk is kept (training pipelines pad it downstream).
    */
  def chunkByTokens(
      docs: DataFrame,
      chunkTokens: Int,
      stride: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(stride > 0 && chunkTokens > 0)
    val toks = col("__toks")
    // window starts: 0, stride, 2·stride, … up to the last index that
    // starts a non-empty chunk
    val starts = sequence(lit(0), greatest(
      (size(toks) - 1) - pmod(size(toks) - 1, lit(stride)), lit(0)), lit(stride))
    docs
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .select(col(idCol), col("__toks"),
        posexplode(starts).as(Seq("chunk_id", "__start")))
      .filter(col("__start") < size(col("__toks")))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ", slice(col("__toks"), col("__start") + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(size(col("__toks")) - col("__start"), lit(chunkTokens))
          .cast("long").as("n_tokens"))
  }

  /** Cross-document duplicated-passage profile (C4-style passage dedup
    * signal, Raffel et al. 2020): for each document, the fraction of its
    * `ngramK`-token passage occurrences whose passage also appears in at
    * least `minDocs` distinct documents, plus the count of such shared
    * passages. Boilerplate and template-heavy documents score high and can
    * be dropped or passage-stripped downstream.
    *
    * Distinct from doc-level LSH dedup (whole-document similarity) and
    * from `decontaminate` (corpus vs a small eval set): this profiles the
    * corpus against ITSELF at passage granularity.
    *
    * Scale shape: TWO shuffles total. Explode → ONE exchange on gram
    * (sorted by (gram, doc)); within that sorted run a `lag` marks the
    * first occurrence row of each (gram, doc) run, and the gram's distinct
    * doc-frequency is the sum of those markers over the same partition —
    * the second window shares the first's exchange AND sort (same
    * partition key, no ordering requirement), so no (doc, gram)
    * pre-aggregation exchange exists at all → final per-doc agg is the
    * second shuffle. (The previous three-shuffle spelling pre-agged on
    * (doc, gram) before the gram window; the pre-agg exchange carried the
    * same gram strings a second time for near-zero dedup — within one
    * document most grams are unique.) All counters are integers, so the
    * fraction is oracle-exact.
    */
  def passageDupStats(
      docs: DataFrame,
      ngramK: Int = 5,
      minDocs: Int = 2,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val byGram = Window.partitionBy("__gram")
    val byGramDoc = byGram.orderBy(col(idCol))
    Partitioning.spread(docs)
      .select(col(idCol),
        explode(TextOps.shingles(TextOps.tokens(col(textCol)), ngramK)).as("__gram"))
      // first row of each (gram, doc) run in the gram-sorted partition;
      // lag is NULL on the partition's first row, NULL === id is NULL,
      // `when` skips it → otherwise-branch marks that row a first too
      .withColumn("__first",
        when(lag(col(idCol), 1).over(byGramDoc) === col(idCol), lit(0L)).otherwise(lit(1L)))
      .withColumn("__ndocs", sum(col("__first")).over(byGram))
      .groupBy(col(idCol))
      .agg(
        (sum(when(col("__ndocs") >= minDocs, lit(1L)).otherwise(lit(0L)))
          .cast("double") / count(lit(1)).cast("double")).as("dup_passage_frac"),
        sum(when(col("__ndocs") >= minDocs, col("__first")).otherwise(lit(0L)))
          .as("shared_grams"))
  }

  /** LINE-level boilerplate removal — the RefinedWeb/C4-style pass that
    * strips navigation chrome, cookie banners, and footers: a LINE whose
    * normalized text (lower + trim) appears in ≥ `minDocFreq` DISTINCT
    * documents is boilerplate and is dropped from every document; the
    * survivors re-join in original order. Blank-normalized lines never
    * count and are always kept (they are structure, not boilerplate).
    *
    * Plan shape (the passageDupStats discipline): explode lines with
    * positions → ONE exchange on the normalized line, where a lag marks
    * the first row of each (norm, doc) run and a sum-over-partition
    * window SHARING that exchange+sort yields the distinct-doc count (no
    * distinct expand, no join-back) → one exchange on the doc id for the
    * ordered reassembly. Two shuffles total at any corpus size.
    *
    * Returns the caller's id column + `text` (cleaned) + `n_dropped`.
    */
  def stripBoilerplateLines(
      docs: DataFrame,
      minDocFreq: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minDocFreq >= 2, s"minDocFreq must be >= 2, got $minDocFreq")
    val byNorm = Window.partitionBy("__norm")
    val byNormDoc = byNorm.orderBy(col(idCol))
    Partitioning.spread(docs)
      // NULL text coalesces to "" BEFORE the split: posexplode(split(NULL))
      // yields no rows, which would silently drop the document from the
      // output instead of returning it with empty text / n_dropped=0.
      .select(col(idCol),
        posexplode(split(coalesce(col(textCol), lit("")), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__norm", lower(trim(col("__line"))))
      .withColumn("__first",
        when(col("__norm") === "", lit(0L)) // blanks never count
          .when(lag(col(idCol), 1).over(byNormDoc) === col(idCol), lit(0L))
          .otherwise(lit(1L)))
      .withColumn("__ndocs", sum(col("__first")).over(byNorm))
      .withColumn("__keep", col("__norm") === "" || col("__ndocs") < minDocFreq)
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("__pos"), col("__line"))))),
          p => p.getField("__line")), "\n").as("text"),
        sum(when(col("__keep"), lit(0L)).otherwise(lit(1L))).as("n_dropped"))
  }

  /** Unigram language-model score per document — the in-engine analog of
    * perplexity-based quality filtering (a real curation stack scores
    * docs under a reference LM and drops the tails; the unigram model is
    * the closed-form member of that family, buildable from the corpus in
    * one aggregation). Two shuffles: term frequencies, then the per-doc
    * sum. The per-token log-probability is fixed-pointed
    * (floor(ln p · 2^20) as BIGINT) so the per-doc sum is an integer
    * aggregation — commutative, partition-order-proof, oracle-exact.
    * Lower (more negative) scores = rarer tokens ≈ higher surprise.
    */
  def unigramLogprobScore(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      localVocabThreshold: Int = 1 << 21): DataFrame = {
    val spark = docs.sparkSession
    val toks = Partitioning.spread(docs)
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("__term"))
    val freq = toks.groupBy("__term").agg(count(lit(1)).as("__tf"))
    // Hybrid (the dedupAgainstIndex shape): `toks` feeds three
    // differently-keyed subtrees, so the lazy plan tokenizes the corpus
    // 3×. Pin one pass with an eager cache, pull the vocabulary (≤
    // threshold) to a LOCAL relation, derive the total from it exactly,
    // and return a plan that references only the local lp table +
    // ONE corpus scan at action time — no cache survives this call.
    // The lp arithmetic still runs through the SAME Column expressions
    // (on the local frame), so fixed-point parity is untouched.
    val cached = toks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val head = freq.take(localVocabThreshold + 1)
      val lp =
        if (head.length <= localVocabThreshold) {
          val total = head.map(_.getLong(1)).sum // exact: sum of tfs IS the token count
          val local = spark.createDataFrame(
            spark.sparkContext.parallelize(head.toIndexedSeq, 1), freq.schema)
          broadcast(local.select(col("__term"),
            floor(log(col("__tf").cast("double") / lit(total).cast("double")) * lit(1048576L))
              .cast("long").as("__lp_fp")))
        } else {
          // giant-vocabulary fallback: the original lazy 3-pass plan
          val tot = toks.agg(count(lit(1)).as("__n_total"))
          freq.crossJoin(tot).select(col("__term"),
            floor(log(col("__tf").cast("double") / col("__n_total").cast("double")) * lit(1048576L))
              .cast("long").as("__lp_fp"))
        }
      toks.join(lp, Seq("__term"))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_tok"), sum(col("__lp_fp")).as("sum_lp_fp"))
    } finally cached.unpersist()
  }

  /** DSIR-style importance resampling (Xie et al. 2023, arXiv:2302.03169):
    * score every document by the unigram log-likelihood RATIO of a target
    * corpus (the rows where `isTarget`) against the raw corpus, then draw
    * a deterministic weighted sample of k via Gumbel top-k — argmax of
    * (log w + Gumbel(0,1)) IS sampling ∝ w, and staying in LOG space
    * sidesteps exp() overflow on corpus-scale ratio sums entirely.
    *
    * Per term: lr = ln((tf_tgt + 1)/(N_tgt + V)) − ln(tf_raw/N_raw)
    * (add-one smoothing keeps target-absent terms finite; the raw side
    * needs none — every observed term has tf_raw ≥ 1), fixed-pointed to
    * floor(lr·2^20) BIGINT so the per-doc weight Σ count·lr_fp is an
    * integer aggregation (commutative, partition-order-proof,
    * oracle-exact). The Gumbel draw is md5-derived from the id (the
    * weightedSample A-ES discipline — no RNG state), u ∈ (0,1) strictly:
    * (hex+1)/2^32+1 so neither ln can hit 0 or −∞.
    *
    * Plan shape: TWO independent corpus passes, no persist — the
    * frequency pass aggregates straight to (term, tf_raw, tf_tgt) (the
    * vocabulary, tiny), and the weight pass joins token rows to the
    * broadcast lr table and sums per doc (Σ_tokens lr_fp ≡ Σ_terms
    * count·lr_fp, so no intermediate (doc, term) grouping exists at all).
    * The first dsir cut pinned a (doc,tgt,term) count table with the lm1
    * persist hybrid; the ~sf1/sf2 probe measured that shape SUPERLINEAR
    * (2.78× wall at 2× tokens — cache materialization + an extra 2.5M-row
    * shuffle per action), while two plain scans are linear and strictly
    * cheaper at every scale. When the vocabulary exceeds the local
    * threshold the lr table stays distributed (the 100 TB fallback).
    * Selection is orderBy+limit — TakeOrdered, no global sort.
    * Zero-token docs cannot score and drop (both engines agree);
    * documents keep (n_tok, w_fp, gumbel_fp, key_fp) so the weight
    * decomposition is auditable.
    */
  def dsirResample(
      docs: DataFrame,
      isTarget: Column,
      k: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      localVocabThreshold: Int = 1 << 21): DataFrame = {
    require(k > 0, s"dsirResample k must be positive, got $k")
    val spark = docs.sparkSession
    val freq = Partitioning.spread(docs)
      .select(isTarget.as("__tgt"), explode(TextOps.tokens(col(textCol))).as("__term"))
      .groupBy("__term").agg(
        count(lit(1)).as("__tr"),
        count(when(col("__tgt"), lit(1))).as("__tt"))
    // Branch on a SCALAR vocabulary count first: deciding via
    // take(threshold+1) would ship up to 2M aggregated rows to the driver
    // (hundreds of MB at corpus-scale vocabularies) just to measure the
    // length. The local path pays one extra linear pass for the count —
    // the price of never pulling an unbounded result to the driver.
    val vocabSize = freq.count()
    val lr =
      if (vocabSize <= localVocabThreshold) {
        val head = freq.take(localVocabThreshold)
        val nRaw = head.map(_.getLong(1)).sum // exact: Σ tf IS the token count
        val nTgt = head.map(_.getLong(2)).sum
        val v = head.length.toLong
        val local = spark.createDataFrame(
          spark.sparkContext.parallelize(head.toIndexedSeq, 1), freq.schema)
        broadcast(local.select(col("__term"),
          floor((log((col("__tt") + lit(1L)).cast("double") / lit(nTgt + v).cast("double")) -
            log(col("__tr").cast("double") / lit(nRaw).cast("double"))) * lit(1048576L))
            .cast("long").as("__lr_fp")))
      } else {
        val tot = freq.agg(sum(col("__tr")).as("__nr"), sum(col("__tt")).as("__nt"),
          count(lit(1)).as("__v"))
        freq.crossJoin(broadcast(tot)).select(col("__term"),
          floor((log((col("__tt") + lit(1L)).cast("double") / (col("__nt") + col("__v")).cast("double")) -
            log(col("__tr").cast("double") / col("__nr").cast("double"))) * lit(1048576L))
            .cast("long").as("__lr_fp"))
      }
    val u = (TextOps.hexVal(md5(col(idCol).cast("string")), 8) + lit(1L))
      .cast("double") / lit(4294967297.0)
    Partitioning.spread(docs)
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("__term"))
      .join(lr, Seq("__term"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"), sum(col("__lr_fp")).as("w_fp"))
      .withColumn("gumbel_fp", floor(-log(-log(u)) * lit(1048576L)).cast("long"))
      .withColumn("key_fp", col("w_fp") + col("gumbel_fp"))
      .orderBy(col("key_fp").desc, col(idCol).asc)
      .limit(k)
  }

  /** Interpolated BIGRAM language-model score per document — one rung up
    * the n-gram ladder from [[unigramLogprobScore]] toward the
    * perplexity filters real curation stacks run: per bigram (c, n),
    * p = λ·bf(c,n)/cf(c) + (1−λ)·tf(n)/N, scored as floor(ln p · 2^20)
    * BIGINTs so the per-doc sum is an integer aggregation (commutative,
    * partition-order-proof, oracle-exact). The unigram back-off term
    * keeps unseen-context probabilities finite without smoothing
    * hyperparameters. Docs with fewer than 2 tokens have no bigrams and
    * drop out (both engines agree).
    *
    * Same hybrid as lm1: the corpus feeds FIVE differently-keyed
    * aggregations, so the token arrays are pinned with an eager cache
    * while the (bigram → logprob) table is materialized; when that table
    * fits the local threshold it becomes a broadcast local relation and
    * the returned plan re-scans the corpus ONCE — otherwise the lazy
    * multi-pass plan stands (the 100 TB fallback).
    */
  def bigramLogprobScore(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      lambda: Double = 0.5,
      localPairThreshold: Int = 1 << 21): DataFrame = {
    val spark = docs.sparkSession
    val base = Partitioning.spread(docs)
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
    val toks = base.select(col(idCol), explode(col("__t")).as("__term"))
    val nm1 = greatest(size(col("__t")) - 1, lit(0))
    val bigrams = base
      .select(col(idCol), explode(zip_with(
        slice(col("__t"), lit(1), nm1), slice(col("__t"), lit(2), nm1),
        (a, b) => struct(a.as("c"), b.as("n")))).as("__bg"))
      .select(col(idCol), col("__bg.c").as("__c"), col("__bg.n").as("__n"))
    val uni = toks.groupBy("__term").agg(count(lit(1)).as("__tf"))
    val nTotal = toks.agg(count(lit(1)).as("__ntot"))
    val bf = bigrams.groupBy("__c", "__n").agg(count(lit(1)).as("__bf"))
    val cf = bigrams.groupBy("__c").agg(count(lit(1)).as("__cf"))
    val lpPlan = bf.join(cf, Seq("__c"))
      .join(uni.withColumnRenamed("__term", "__n"), Seq("__n"))
      .crossJoin(broadcast(nTotal))
      .select(col("__c"), col("__n"),
        floor(log(
          lit(lambda) * (col("__bf").cast("double") / col("__cf").cast("double")) +
          lit(1.0 - lambda) * (col("__tf").cast("double") / col("__ntot").cast("double")))
          * lit(1048576L)).cast("long").as("__lp_fp"))
    val cached = base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val head = lpPlan.take(localPairThreshold + 1)
      val lp =
        if (head.length <= localPairThreshold)
          broadcast(spark.createDataFrame(
            spark.sparkContext.parallelize(head.toIndexedSeq, 1),
            lpPlan.schema))
        else lpPlan // giant-pair-table fallback: the lazy multi-pass plan
      bigrams.join(lp, Seq("__c", "__n"))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_bigram"), sum(col("__lp_fp")).as("sum_lp_fp"))
    } finally cached.unpersist()
  }

  /** Per-document token-distribution entropy — the vocabulary-flatness
    * quality signal (near-zero entropy = one token repeated; high
    * entropy = diverse vocabulary): H(d) = -Σ_t (tf/len)·ln(tf/len).
    * Determinism: the per-(doc,term) probability is fixed-pointed ONCE
    * (floor(ln(tf/len)·2^20), the lm1 pattern) and weighted by the exact
    * integer tf, so the per-doc sum is integer arithmetic — partition-
    * order-proof. Scale shape: one explode → one (doc,term) agg → one
    * per-doc agg; everything keys on the doc id, no corpus-wide state.
    * Returns (id, n_tok, entropy_fp) where entropy_fp = -Σ tf·lp_fp
    * (divide by 2^20·n_tok for nats).
    */
  def tokenEntropy(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    Partitioning.spread(docs)
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("__term"))
      .groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).as("__tf"))
      .withColumn("__len", sum(col("__tf")).over(Window.partitionBy(idCol)))
      .select(col(idCol), col("__tf"), col("__len"),
        floor(log(col("__tf").cast("double") / col("__len").cast("double")) * lit(1048576L))
          .cast("long").as("__lp_fp"))
      .groupBy(col(idCol))
      .agg(max(col("__len")).as("n_tok"),
        (-sum(col("__tf") * col("__lp_fp"))).as("entropy_fp"))

  /** Bigram PMI collocations — pointwise mutual information
    * ln(p(w1,w2) / (p(w1)·p(w2))) over adjacent token pairs, the classic
    * phrase-mining signal. Counts are exact integers; the single
    * log+fixed-point step (floor(ln·2^20), the lm1 pattern) evaluates on
    * bit-identical doubles in any engine, so the score is hash-exact.
    *
    * Scale shape: two explode+groupBy count passes (unigrams, bigrams) —
    * the tfidf1 shape; the totals are single-row broadcasts and the
    * per-side count joins shuffle on the vocabulary, never on the corpus.
    * Bigrams are built with an indexed `transform` over a slice (NOT
    * `sequence(0, size-2)` — Spark's sequence DESCENDS when size < 2,
    * which would fabricate pairs for 1-token docs).
    */
  def bigramPmi(
      docs: DataFrame,
      minCount: Long = 5,
      textCol: String = "text",
      localVocabThreshold: Int = 1 << 21): DataFrame = {
    val spark = docs.sparkSession
    val t = Partitioning.spread(docs).select(TextOps.tokens(col(textCol)).as("__t"))
    val uni = t.select(explode(col("__t")).as("w"))
    val uc = uni.groupBy("w").agg(count(lit(1)).as("c"))
    val bg = t.select(explode(expr(
        "transform(slice(__t, 1, greatest(size(__t)-1, 0)), " +
          "(x, i) -> struct(x AS w1, element_at(__t, i + 2) AS w2))")).as("b"))
      .select("b.w1", "b.w2")
    val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    // one product chain, one division, left-associative — the oracle must
    // mirror this exact operand order for bit-identical doubles
    val ratio =
      (col("c12").cast("double") * col("nu").cast("double") * col("nu").cast("double")) /
        (col("nb").cast("double") * col("c1").cast("double") * col("c2").cast("double"))
    def assemble(ucF: DataFrame, bcF: DataFrame, nuF: DataFrame, nbF: DataFrame) =
      bcF.join(ucF.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
        .join(ucF.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
        .crossJoin(broadcast(nuF)).crossJoin(broadcast(nbF))
        .select(col("w1"), col("w2"), col("c12"),
          floor(log(ratio) * lit(1048576L)).cast("long").as("pmi_fp"))
    // Hybrid (the dedupAgainstIndex shape): the lazy plan tokenizes the
    // corpus 4× (unigram agg, unigram total, bigram agg, bigram total).
    // Pin one pass with an eager cache; when the vocabulary fits the
    // threshold, pull unigram + frequent-bigram counts to LOCAL relations
    // (totals derive from them exactly — nu = Σ tf; nb needs one extra agg
    // off the cache since bc is minCount-filtered) and return a plan over
    // local data only: ONE corpus tokenize total, nothing left cached.
    // The PMI arithmetic runs through the SAME Column code either way.
    val cached = t.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val ucHead = uc.take(localVocabThreshold + 1)
      val bcHead = bc.take(localVocabThreshold + 1)
      if (ucHead.length <= localVocabThreshold && bcHead.length <= localVocabThreshold) {
        val nuVal = ucHead.map(_.getLong(1)).sum
        val nbVal = bg.agg(count(lit(1))).head().getLong(0)
        val ucL = spark.createDataFrame(
          spark.sparkContext.parallelize(ucHead.toIndexedSeq, 1), uc.schema)
        val bcL = spark.createDataFrame(
          spark.sparkContext.parallelize(bcHead.toIndexedSeq, 1), bc.schema)
        assemble(ucL, bcL,
          spark.range(1).select(lit(nuVal).as("nu")),
          spark.range(1).select(lit(nbVal).as("nb")))
      } else
        assemble(uc, bc,
          uni.agg(count(lit(1)).as("nu")),
          bg.agg(count(lit(1)).as("nb")))
    } finally cached.unpersist()
  }

  /** Repeated-span profile — the span-level dedup signal: positions of
    * k-grams that occur more than once ANYWHERE in the corpus (across or
    * within documents), merged per document into maximal covered spans
    * (two repeated grams whose starts differ by ≤ k overlap or touch, so
    * their union is contiguous). Returns one row per affected document:
    * the span count and the number of tokens covered by repeated spans —
    * the "how much of this doc is boilerplate someone else also has"
    * census that span-level dedup acts on.
    *
    * Scale shape: explode → COUNT window over the gram partition (the
    * par1 shape) → per-doc sort window for the island merge (each doc
    * ranks independently; repeated positions per doc are bounded by the
    * token count) → one grouped agg. Integer arithmetic throughout.
    */
  def repeatedSpanStats(
      docs: DataFrame,
      ngramK: Int = 5,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val pos = Partitioning.spread(docs).select(col(idCol),
      posexplode(TextOps.shingles(TextOps.tokens(col(textCol)), ngramK)).as(Seq("__pos", "__gram")))
    val rep = pos
      .withColumn("__n_occ", count(lit(1)).over(Window.partitionBy("__gram")))
      .filter(col("__n_occ") >= 2)
      .select(col(idCol), col("__pos"))
    val byDoc = Window.partitionBy(idCol).orderBy("__pos")
    rep
      // a gap of more than k start positions means the gram intervals
      // [p, p+k-1] no longer touch — start a new span (NULL lag → 1)
      .withColumn("__new_span",
        when(col("__pos") - lag(col("__pos"), 1).over(byDoc) <= ngramK, lit(0L)).otherwise(lit(1L)))
      .withColumn("__span_id", sum(col("__new_span"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__span_id"))
      .agg((max(col("__pos")) + ngramK - min(col("__pos"))).as("__span_tokens"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("__span_tokens")).as("repeated_tokens"))
  }

  /** Span-level dedup TRANSFORM — the removal half of
    * [[repeatedSpanStats]] (which only censuses): delete every token
    * covered by a corpus-repeated `ngramK`-gram (≥2 occurrences anywhere,
    * across or within documents — same repetition predicate as span1) and
    * reassemble the surviving tokens in order. Every document comes back,
    * fully-stripped ones with empty text — the caller decides whether to
    * drop empties (a filter) or keep them as tombstones.
    *
    * Scale shape: gram explode → COUNT window over the gram partition
    * (one shuffle, the span1/par1 shape) → covered positions via a
    * bounded k-explode + distinct → one co-partitioned join back to the
    * exploded tokens on (doc, pos) → per-doc agg whose state is the
    * kept-token list (bounded by document length, the same bound
    * chunk/pack carry). No driver state, no self-join of the corpus.
    */
  def stripRepeatedSpans(
      docs: DataFrame,
      ngramK: Int = 5,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val pos = Partitioning.spread(docs).select(col(idCol),
      posexplode(TextOps.shingles(TextOps.tokens(col(textCol)), ngramK)).as(Seq("__pos", "__gram")))
    val covered = pos
      .withColumn("__n_occ", count(lit(1)).over(Window.partitionBy("__gram")))
      .filter(col("__n_occ") >= 2)
      // a repeated gram starting at p covers tokens p .. p+k-1; overlaps
      // collapse in the distinct
      // rename the id out of the shared lineage: both sides descend from
      // `docs`, and an ambiguous self-reference would resolve to a
      // trivially-true predicate instead of the intended equi-join
      .select(col(idCol).as("__cov_id"),
        explode(sequence(col("__pos"), col("__pos") + ngramK - 1)).as("__cov"))
      .distinct()
    val toks = docs.select(col(idCol),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("__pos", "__tok")))
    toks
      .join(covered, col(idCol) === col("__cov_id") && col("__pos") === col("__cov"), "left")
      .select(col(idCol), col("__pos"), col("__tok"), col("__cov").isNotNull.as("__is_cov"))
      .groupBy(col(idCol))
      .agg(
        // collect_list drops the NULL-ed covered slots; the sort restores
        // document order (collect order is partition-dependent)
        concat_ws(" ", transform(
          array_sort(collect_list(when(!col("__is_cov"), struct(col("__pos"), col("__tok"))))),
          s => s.getField("__tok"))).as("clean_text"),
        sum(when(!col("__is_cov"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__is_cov"), 1L).otherwise(0L)).as("n_removed"))
  }

  /** Composite document quality gate: the standard curation filter stack
    * (length/stopword quality score, language-ID agreement, within-doc
    * repetition) folded into one pass with an audit trail — each document
    * gets `keep` plus the FIRST failing rule as `reason` ("low_quality" →
    * "lang_mismatch" → "repetitive" → "ok"), so drops are explainable and
    * per-reason drop rates are one GROUP BY away.
    *
    * One scan, zero shuffles: every signal is a per-row projection (the
    * repetition fold included), staged so the token array and gram array
    * build once. All comparisons are on oracle-exact arithmetic.
    */
  def qualityGate(
      docs: DataFrame,
      minQuality: Double = 0.3,
      maxDupBigramFrac: Double = 0.2,
      idCol: String = "doc_id",
      textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    val staged = docs
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .withColumn("__g2", sort_array(TextOps.shingles(col("__toks"), 2)))
      // dupFraction, not repetitionCounts: two field extractions from the
      // staged counter struct would re-inline the fold twice
      .withColumn("__dup2", TextOps.dupFraction(col("__g2")))
      .withColumn("__ratio",
        TextOps.stopwordHits(col("__toks"), TextOps.AllStopwords).cast("double") /
          size(col("__toks")).cast("double"))
      .withColumn("__quality",
        least(size(col("__toks")).cast("double") / lit(100.0), lit(1.0)) * lit(0.5) +
          least(col("__ratio") * lit(4.0), lit(1.0)) * lit(0.5))
      .withColumn("__guess", TextOps.langGuessFromTokens(col("__toks")))
    staged
      // NULL text (or NULL lang) must fail closed: every threshold compare
      // on NULL is NULL, which `when` skips — without the explicit guard a
      // null document would fall through to "ok"
      .withColumn("reason",
        when(col(textCol).isNull || col("__quality").isNull, "low_quality")
          .when(col("__quality") < minQuality, "low_quality")
          .when(col(langCol).isNull || col("__guess") =!= col(langCol), "lang_mismatch")
          .when(col("__dup2") > maxDupBigramFrac, "repetitive")
          .otherwise("ok"))
      // keep the caller's columns: the gate is a per-row filter, so
      // pipelines apply it INLINE (`.filter(col("keep"))`) with no
      // join-back — a semi join on the verdict would rebuild the whole
      // text-scoring subtree a second time
      .select(docs.columns.map(col) :+ (col("reason") === "ok").as("keep") :+ col("reason"): _*)
  }

  /** Frozen hashed-feature linear classifier inference — the fasttext/
    * logistic "quality classifier" shape every production curation stack
    * runs over the corpus (score each document under fixed weights, keep
    * above a threshold). Weights live in HASH SPACE (the hashing trick):
    * w(token) = H_seed(token) mod (2·`scale`+1) − `scale`, an integer in
    * [−scale, +scale], so "loading the model" is free and inference is a
    * per-row integer fold — ZERO shuffles, embarrassingly parallel at
    * 100 TB, and the margin sum is hash-exact in any engine. A real
    * trained model drops in by replacing the hash with a broadcast
    * weight-table join; the plan shape (scan-side scoring, no exchange)
    * is identical. Sigmoid is monotone, so thresholding the margin at 0
    * IS thresholding the probability at 0.5 — no transcendentals needed.
    */
  def hashedLinearScore(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      seed: Int = 7,
      scale: Int = 1000): DataFrame = {
    val m = 2L * scale + 1
    // NULL text coalesces to margin 0 (an empty document has no evidence
    // either way) — matching the qc1 oracle's coalesce(list_sum, 0), so
    // the NULL-document row buckets as predicted_keep = true, not NULL
    val margin = coalesce(aggregate(
      transform(TextOps.tokens(col(textCol)),
        t => TextOps.seededHash(t, seed) % lit(m) - lit(scale.toLong)),
      lit(0L), (acc, x) => acc + x), lit(0L))
    // keep the caller's columns (the qualityGate convention) so pipelines
    // filter inline; predicted_keep references the margin ALIAS — the
    // fold is non-cheap and multi-referenced, so CollapseProject keeps
    // the staging projection (it is evaluated once)
    docs.withColumn("margin", margin)
      .withColumn("predicted_keep", col("margin") >= 0L)
  }

  /** Domain blocklist filter (the C4 "bad domains" pass): drop every row
    * whose url's registrable domain appears in `blocked` (one `domain`
    * column). Keying on the REGISTRABLE domain makes subdomain evasion
    * ("ads.evil.com" vs "evil.com") an equi-join equality instead of an
    * `endswith` scan — the blocklist broadcasts (it's thousands of rows
    * against a 100 TB corpus) and the corpus never shuffles. Rows whose
    * url doesn't parse are dropped too (fail closed, like the NULL-text
    * gate); pass them through upstream if unparseable ≠ bad.
    */
  def domainBlocklistFilter(
      docs: DataFrame,
      urlCol: String,
      blocked: DataFrame): DataFrame = {
    val dom = graft.functions.WebOps.registrableDomain(
      graft.functions.WebOps.urlHost(col(urlCol)))
    docs
      .withColumn("__dom", dom)
      .filter(col("__dom").isNotNull)
      .join(broadcast(blocked.select(col("domain").as("__dom")).distinct()),
        Seq("__dom"), "left_anti")
      .drop("__dom")
  }

  /** PII anonymization pass: redact emails/IPv4s/phones in `textCol`
    * (in that order) and attach per-kind match counts from the ORIGINAL
    * text, so downstream can both train on clean text and audit/filter
    * by PII density. Pure projection — no shuffle, no UDF.
    */
  def redactPii(
      docs: DataFrame,
      textCol: String = "text"): DataFrame = {
    import graft.functions.WebOps
    docs
      .withColumn("n_emails", WebOps.matchCount(col(textCol), WebOps.EmailRe))
      .withColumn("n_phones", WebOps.matchCount(col(textCol), WebOps.PhoneRe))
      .withColumn("n_ips", WebOps.matchCount(col(textCol), WebOps.Ipv4Re))
      .withColumn(textCol, WebOps.redactPii(col(textCol)))
  }

  /** Per-document top-`k` TF-IDF terms. tf = in-doc term count,
    * idf = ln(N / df); ties break on term ascending. Two shuffles
    * (doc-term agg, term df agg) + a broadcast of the per-term df table —
    * df has one row per distinct term, small relative to the corpus.
    */
  def topTfidfTerms(
      docs: DataFrame,
      k: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val n = docs.select(countDistinct(col(idCol)).as("n_docs"))
    val docTerm = Partitioning.spread(docs)
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(idCol, "term")
      .agg(count(lit(1)).as("tf"))
    val termDf = docTerm.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("term").asc)
    docTerm
      .join(termDf, Seq("term")) // AQE broadcasts from the agg's true size
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") * log(col("n_docs") / col("df")), 6))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("score"))
  }
}
