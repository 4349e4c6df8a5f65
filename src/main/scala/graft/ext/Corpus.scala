package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-management operators for training-data pipelines: deterministic
 * train/val/test splits, stratified sampling, sequence packing, and PII
 * scrubbing.
 *
 * Scale design:
 *  - Splits and samples are HASH-based, never random: the same row lands
 *    in the same split on every engine, every rerun, every cluster size —
 *    reproducibility is a correctness property for training data (and the
 *    md5 cell is engine-portable, unlike Spark-private xxhash64 seeds).
 *  - [[hashSplit]] is a pure projection — no shuffle, no sampling pass;
 *    adding data never moves an existing row between splits.
 *  - [[stratifiedSample]] shuffles once on the stratum key; per-stratum
 *    quota is computed inline by a count window, so no driver round-trip
 *    per stratum.
 *  - [[packSequences]] / [[packSequencesStrided]] pack WITHIN a partition
 *    key (a global concatenation order would serialize the corpus through
 *    one task — the anti-scale shape); each partition key costs one
 *    sorted pass.
 *  - [[scrubPii]] is codegen'd regexp_replace — streams through the scan.
 */
object Corpus {

  /** Engine-portable 256-cell hash: first hex byte of md5 of the id. */
  def hashCell(id: Column): Column = substring(md5(id.cast("string")), 1, 2)

  /**
   * Deterministic split assignment from the md5 cell: cells [0, trainCells)
   * → "train", [trainCells, trainCells + valCells) → "val", rest → "test".
   * Defaults: 230/13/13 of 256 ≈ 90/5/5 %.
   */
  def hashSplit(id: Column, trainCells: Int = 230, valCells: Int = 13): Column = {
    require(trainCells + valCells < 256, "train+val must leave test cells")
    val trainHi = f"$trainCells%02x"
    val valHi = f"${trainCells + valCells}%02x"
    val cell = hashCell(id)
    when(cell < lit(trainHi), "train")
      .when(cell < lit(valHi), "val")
      .otherwise("test")
  }

  /**
   * Deterministic stratified sample: the first ceil(frac × |stratum|)
   * rows per stratum in (md5(id), id) order. Exact per-stratum quotas
   * (unlike Bernoulli sampleBy), reproducible, one shuffle on the stratum.
   */
  /**
   * Deterministic training-order shuffle — the "global shuffle" every
   * pretraining data pipeline runs before sequence packing, made
   * RNG-free the same way every sampler here is: each row gets a
   * pseudorandom permutation key `md5(salt ‖ id)`, a shard (key-derived,
   * `shards`-way), and its position within the shard in key order.
   * Downstream packing consumes shards independently; re-shuffling for
   * a new epoch is a salt change, and the whole order is reproducible
   * from (corpus, salt) alone — no seed state to store.
   *
   * Shape at 100 TB: ONE hash exchange on the shard id plus a
   * within-partition sort — there is deliberately no global sort and no
   * single total order; cross-shard interleaving is the data loader's
   * round-robin. Each shard is one reducer's sort, so pick
   * `shards` >> executors (shard ≈ output-file grain, the same knob as
   * any sharded writer).
   */
  def shuffleOrder(df: DataFrame, idCol: String, shards: Int,
                   salt: String = ""): DataFrame = {
    require(shards > 0, s"shards=$shards must be positive")
    val key = md5(concat(lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__key"), col(idCol))
    df.withColumn("__key", key)
      .withColumn("shard",
        pmod(conv(substring(col("__key"), 1, 2), 16, 10).cast("int"),
          lit(shards)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__key")
  }

  /**
   * Corpus snapshot diff — the version audit between two corpus builds
   * (what changed since the last release: regulatory takedowns applied?
   * re-crawl drift? silent loss?): full-outer join of the two snapshots
   * on the doc id, comparing normalized-content fingerprints. Returns
   * ONLY the differences as (idCol, status ∈ added | removed | changed)
   * — at corpus scale the unchanged set is the overwhelming majority
   * and echoing it back would dominate the output for no information.
   *
   * Scale shape: each snapshot is reduced to (id, 64-bit fp) on the
   * scan, then one id-keyed shuffle per side for the join — or zero if
   * both snapshots are stored bucketed by id, the natural layout for
   * versioned corpora (see `Materialize.bucketTable`).
   */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    // the id is only a join key — no coercion, so string/UUID-keyed
    // corpora work unchanged
    val o = oldSnap.select(col(idCol),
      TextOps.fingerprint(col(textCol)).as("__ofp"))
    val n = newSnap.select(col(idCol),
      TextOps.fingerprint(col(textCol)).as("__nfp"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__ofp").isNull, "added")
          .when(col("__nfp").isNull, "removed")
          .when(col("__ofp") =!= col("__nfp"), "changed"))
      .filter(col("status").isNotNull)
      .select(col(idCol), col("status"))
  }

  /**
   * Population Stability Index between two corpus snapshots over a
   * numeric column — the distribution-drift score release pipelines
   * gate on (the companion of [[snapshotDiff]]: that reports WHICH rows
   * changed, this reports whether the SHAPE moved). Fixed-width bins
   * (no quantile estimation to disagree across engines), epsilon-
   * smoothed proportions, per-bin terms (p_new − p_old)·ln(p_new/p_old)
   * — their sum is the PSI (< 0.1 stable, > 0.25 shifted, by the usual
   * credit-scoring rule of thumb).
   *
   * Scale shape: each snapshot collapses to bin counts on the scan
   * (map-side combined, rows = distinct bins); everything after is
   * bins-sized arithmetic with a broadcast 1-row total.
   *
   * @return (bin, n_old, n_new, psi_term), psi_term 6-digit rounded
   */
  def psiDrift(oldSnap: DataFrame, newSnap: DataFrame, valueCol: String,
               binWidth: Double, epsilon: Double = 1e-6): DataFrame =
    psiDriftFromBins(binCounts(oldSnap, valueCol, binWidth),
      binCounts(newSnap, valueCol, binWidth), epsilon)

  /**
   * Binned two-sample Kolmogorov–Smirnov drift — the max-CDF-gap
   * complement to [[psiDrift]]'s sum-of-terms: PSI localizes WHERE mass
   * moved (per-bin terms), KS bounds the worst cumulative divergence
   * (the statistic classical drift tests threshold). Computed at bin
   * boundaries, so it is exactly the KS statistic of the binned
   * distributions (a lower bound on the unbinned one, tight as binWidth
   * shrinks — same resolution trade every streaming drift monitor
   * makes).
   *
   * Scale shape: the corpus collapses to (bin, n) counts on the scan —
   * map-side combined, rows = distinct bins — and the cumulative sums
   * run in an UNPARTITIONED window over that bins-sized frame (hundreds
   * of rows by construction; the same deliberately-tiny-window posture
   * as temperatureMix's per-source prefix sums). An empty snapshot
   * yields CDF 0 everywhere and the gap reads the other side's CDF —
   * maximal drift, which is the truth.
   *
   * @return (bin, n_old, n_new, cdf_old, cdf_new, gap) per occupied
   *         bin, all rounded to 6 digits; KS statistic = max(gap)
   */
  def ksDrift(oldSnap: DataFrame, newSnap: DataFrame, valueCol: String,
              binWidth: Double): DataFrame =
    ksDriftFromBins(binCounts(oldSnap, valueCol, binWidth),
      binCounts(newSnap, valueCol, binWidth))

  /** KS terms from two pre-binned (bin, n) frames — the arithmetic half
    * of [[ksDrift]], bins-sized. */
  def ksDriftFromBins(oldBins: DataFrame, newBins: DataFrame): DataFrame = {
    val j = oldBins.select(col("bin"), col("n").as("__no"))
      .join(newBins.select(col("bin"), col("n").as("__nn")),
        Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("__no"), lit(0L)).as("n_old"),
        coalesce(col("__nn"), lit(0L)).as("n_new"))
    val tots = j.agg(sum("n_old").as("__to"), sum("n_new").as("__tn"))
    val cum = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    j.crossJoin(broadcast(tots))
      .withColumn("__co", sum(col("n_old")).over(cum))
      .withColumn("__cn", sum(col("n_new")).over(cum))
      .select(col("bin"), col("n_old"), col("n_new"),
        round(coalesce(col("__co").cast("double") / nullif(col("__to"), lit(0L)),
          lit(0.0)) + lit(1e-9), 6).as("cdf_old"),
        round(coalesce(col("__cn").cast("double") / nullif(col("__tn"), lit(0L)),
          lit(0.0)) + lit(1e-9), 6).as("cdf_new"))
      .withColumn("gap", round(abs(col("cdf_old") - col("cdf_new"))
        + lit(1e-9), 6))
  }

  /**
   * Binned two-sample chi-square drift — the third classical drift
   * statistic alongside [[psiDrift]] (sum of PSI terms) and [[ksDrift]]
   * (max CDF gap). Per occupied bin the standard two-sample term
   * (K1·n_new − K2·n_old)² / (n_old + n_new) with K1 = √(T_old/T_new),
   * K2 = √(T_new/T_old); their sum is the χ² statistic thresholded
   * against a χ²(bins−1) critical value. Unlike PSI it needs no epsilon
   * smoothing (empty bins contribute a finite term by construction) and
   * unlike KS it weights every bin, not just the worst cumulative point
   * — the test of record when drift is spread thinly across many bins.
   *
   * Scale shape: identical to [[psiDrift]] — each snapshot collapses to
   * bin counts on the scan (map-side combined), everything after is
   * bins-sized arithmetic with a broadcast 1-row total. An empty
   * snapshot makes its K factor 0/∞; both totals are guarded with
   * `nullif` so the degenerate monitor reads NULL terms rather than
   * crashing (the caller's alert treats NULL as "no basis", the same
   * posture as a 0-row KS side).
   *
   * @return (bin, n_old, n_new, chisq_term), term 6-digit rounded;
   *         statistic = sum(chisq_term)
   */
  def chiSqDrift(oldSnap: DataFrame, newSnap: DataFrame, valueCol: String,
                 binWidth: Double): DataFrame =
    chiSqDriftFromBins(binCounts(oldSnap, valueCol, binWidth),
      binCounts(newSnap, valueCol, binWidth))

  /** Chi-square terms from two pre-binned (bin, n) frames — the
    * arithmetic half of [[chiSqDrift]], bins-sized on both sides. */
  def chiSqDriftFromBins(oldBins: DataFrame, newBins: DataFrame): DataFrame = {
    val j = oldBins.select(col("bin"), col("n").as("__no"))
      .join(newBins.select(col("bin"), col("n").as("__nn")),
        Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("__no"), lit(0L)).as("n_old"),
        coalesce(col("__nn"), lit(0L)).as("n_new"))
    val tots = j.agg(sum("n_old").as("__to"), sum("n_new").as("__tn"))
    j.crossJoin(broadcast(tots))
      .withColumn("__k1", sqrt(col("__to").cast("double") /
        nullif(col("__tn"), lit(0L))))
      .withColumn("__k2", sqrt(col("__tn").cast("double") /
        nullif(col("__to"), lit(0L))))
      .select(col("bin"), col("n_old"), col("n_new"),
        round(pow(col("__k1") * col("n_new") - col("__k2") * col("n_old"), 2)
          / (col("n_old") + col("n_new")) + lit(1e-9), 6).as("chisq_term"))
  }

  /**
   * Per-source corpus datasheet (the "data card" summary a release
   * process records per source before training): document count, empty
   * documents, whitespace-token totals and mean, character mean, and the
   * exact-duplicate rate (1 − distinct normalized fingerprints / docs,
   * under the dedup family's trim/lower/whitespace-collapse
   * normalization). One scan computes the per-doc signals; one (source)
   * hash aggregation with a distinct-fingerprint sub-aggregate produces
   * the report — rows out = #sources.
   */
  def corpusReport(docs: DataFrame, idCol: String, textCol: String,
                   sourceCol: String): DataFrame = {
    val toks = filter(split(trim(lower(col(textCol))), "\\s+"),
      t => length(t) > 0)
    val perDoc = docs.select(col(sourceCol).as("source"),
      size(toks).as("__ntok"),
      length(col(textCol)).cast("long").as("__nchar"),
      md5(concat_ws(" ", toks)).as("__fp"))
    // means from EXACT integer sums (one division at the end), so the
    // result is independent of distributed summation order — the same
    // reproducibility posture as meanPoolByKey's fixed-point means
    perDoc.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("__ntok") === 0, 1L).otherwise(0L)).as("n_empty"),
      sum(col("__ntok").cast("long")).as("n_tokens"),
      sum(col("__nchar")).as("__sumchar"),
      countDistinct(col("__fp")).as("n_distinct"))
      .select(col("source"), col("n_docs"), col("n_empty"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("n_docs") + lit(1e-9), 6)
          .as("mean_tokens"),
        round(col("__sumchar").cast("double") / col("n_docs") + lit(1e-9), 6)
          .as("mean_chars"),
        col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_docs")
          + lit(1e-9), 6).as("dup_rate"))
  }

  /**
   * Zipf exponent per group: OLS slope of ln(frequency) on ln(rank)
   * over the group's token frequency table, negated (natural text sits
   * near α ≈ 1; a machine-generated or keyword-stuffed source bends
   * visibly away) — the corpus-health diagnostic that catches
   * template/boilerplate sources the per-doc gates miss, companion to
   * [[corpusReport]]'s dup_rate.
   *
   * Shape: one (group, token) hash agg, then the top-`topR` frequency
   * head per group through [[graft.functions.TopKAggregator.topKPerKey]]
   * (map-side-combining bounded buffers — a 10⁸-token vocabulary never
   * lands in one rank-window partition; the fit uses the HEAD, which is
   * standard Zipf practice since the long tail departs the power law
   * anyway), a rank window over the ≤topR surviving rows per group, and
   * one group agg via the engine's own regr_slope (parity with DuckDB's
   * established by `a21_regr_slope`). Rank ties break on token for a
   * deterministic assignment; ln is taken of exact integer counts.
   *
   * @return (group, vocab_size, alpha): rows actually fitted
   *         (min(vocab, topR)) and −slope, rounded to 6 digits
   */
  def zipfAlpha(df: DataFrame, groupCol: String, textCol: String,
                topR: Int = 1000): DataFrame = {
    require(topR >= 2, s"topR $topR must be >= 2 for a slope")
    val counts = df
      .select(col(groupCol),
        explode(TextOps.tokens(lower(col(textCol)))).as("__tok"))
      .groupBy(col(groupCol), col("__tok"))
      .agg(count(lit(1)).as("__c"))
    val head = graft.functions.TopKAggregator.topKPerKey(
      counts, Seq(groupCol), col("__c"), col("__tok"), topR, "__cd", "__tok")
    head
      .withColumn("__r", row_number().over(
        Window.partitionBy(groupCol).orderBy(desc("__cd"), col("__tok"))))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("vocab_size"),
        round(-regr_slope(log(col("__cd")), log(col("__r"))) + lit(1e-9), 6)
          .as("alpha"))
  }

  /** (bin, n) fixed-width bin counts of a numeric column —
    * [[psiDrift]]'s scan-side reduction, exposed so a standing monitor
    * can pre-bin its pinned reference ONCE instead of re-scanning the
    * baseline every trigger. */
  def binCounts(df: DataFrame, valueCol: String,
                binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth $binWidth must be positive")
    df.select(floor(col(valueCol) / binWidth).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
  }

  /** PSI terms from two pre-binned (bin, n) frames — the arithmetic
    * half of [[psiDrift]], bins-sized on both sides. */
  def psiDriftFromBins(oldBins: DataFrame, newBins: DataFrame,
                       epsilon: Double = 1e-6): DataFrame = {
    val j = oldBins.select(col("bin"), col("n").as("__no"))
      .join(newBins.select(col("bin"), col("n").as("__nn")),
        Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("__no"), lit(0L)).as("n_old"),
        coalesce(col("__nn"), lit(0L)).as("n_new"))
    val tots = j.agg(sum("n_old").as("__to"), sum("n_new").as("__tn"))
    // an EMPTY snapshot (first-release bootstrap, fully-filtered side)
    // contributes p = ε everywhere instead of dividing by zero — the
    // terms stay finite and read as maximal drift, which is the truth
    j.crossJoin(broadcast(tots))
      .withColumn("__po",
        coalesce(col("n_old").cast("double") / nullif(col("__to"), lit(0L)),
          lit(0.0)) + lit(epsilon))
      .withColumn("__pn",
        coalesce(col("n_new").cast("double") / nullif(col("__tn"), lit(0L)),
          lit(0.0)) + lit(epsilon))
      .select(col("bin"), col("n_old"), col("n_new"),
        round((col("__pn") - col("__po")) * log(col("__pn") / col("__po"))
          + lit(1e-9), 6).as("psi_term"))
  }

  /**
   * Curriculum ordering (Bengio et al., ICML'09 "Curriculum Learning"):
   * a global ease order — higher `easeCol` schedules earlier — cut into
   * `bins` equal-population difficulty stages, each stage internally
   * permuted by the same md5 shuffle [[shuffleOrder]] uses. The loader
   * consumes (bin asc, shard round-robin, pos asc): easy examples first,
   * hard ones last, no within-stage order bias, and — like every sampler
   * here — the whole schedule is reproducible from (corpus, salt) with
   * zero RNG state; a new epoch's re-shuffle is a salt change that
   * PRESERVES the curriculum stages.
   *
   * Shape at 100 TB: the global ease rank rides
   * [[graft.ops.RowIndex.globalIndex]] (range exchange + parallel
   * per-partition sorts + a P-element driver offset array — never a
   * SinglePartition window), bin assignment is exact integer arithmetic
   * against a broadcast 1-row count, and the within-bin permutation is
   * one hash exchange on (bin, shard) + per-shard sorts. No stage holds
   * more than a shard's rows in one task.
   */
  def curriculumOrder(df: DataFrame, idCol: String, easeCol: String,
                      bins: Int, shards: Int, salt: String = ""): DataFrame = {
    require(bins > 0, s"bins=$bins must be positive")
    require(shards > 0, s"shards=$shards must be positive")
    val idx = graft.ops.RowIndex.globalIndex(
      df.select(col(idCol), (-col(easeCol).cast("double")).as("__nease")),
      Seq("__nease", idCol), "__idx")
    val n = idx.agg(count(lit(1)).as("__N"))
    val binned = idx.crossJoin(broadcast(n))
      .select(col(idCol), expr(s"__idx * $bins div __N").as("bin"))
    val key = md5(concat(lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy(col("bin"), col("shard"))
      .orderBy(col("__key"), col(idCol))
    binned.withColumn("__key", key)
      .withColumn("shard",
        pmod(conv(substring(col("__key"), 1, 2), 16, 10).cast("int"),
          lit(shards)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__key")
  }

  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       frac: Double): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
    val ord = Window.partitionBy(col(stratumCol))
      .orderBy(hashCell(col(idCol)), col(idCol))
    df.withColumn("__n", count(lit(1)).over(w))
      .withColumn("__rn", row_number().over(ord))
      .filter(col("__rn") <= ceil(col("__n") * frac))
      .drop("__n", "__rn")
  }

  /**
   * Per-group quota cap (the RefinedWeb/C4 "domain cap": no single
   * source may dominate the mixture): keep at most `cap` rows per
   * `groupCol`, preferring higher `prefCol` and breaking ties on lowest
   * `idCol` — a deterministic absolute ceiling, where
   * [[stratifiedSample]] is a proportional one. One shuffle on the
   * group key; at corpus scale a skewed group (the giant domain — the
   * very thing the cap exists for) concentrates on one task, so the
   * rank is top-`cap`-able: AQE's skew handling or a two-phase
   * per-partition pre-rank bounds it, and `cap` rows per group is all
   * that ever survives the filter.
   */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
                  prefCol: String, cap: Int): DataFrame = {
    val ord = Window.partitionBy(col(groupCol))
      .orderBy(col(prefCol).desc, col(idCol))
    df.withColumn("__rn", row_number().over(ord))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /**
   * Per-group quality-percentile gate — "keep each source's top slice
   * by score" (the FineWeb/DataComp per-domain pruning posture, where
   * an absolute score cutoff would starve clean domains and drown noisy
   * ones; a RELATIVE cutoff per group adapts automatically): keeps the
   * rows whose score is >= their group's q-th exact percentile
   * (linear-interpolation semantics, SURVEY A1 — the form the oracle
   * reproduces as `quantile_cont`).
   *
   * Shape at 100 TB: one map-side-combinable aggregate down to ONE row
   * per group (groups are sources/domains — always broadcast-sized),
   * one broadcast equi-join back, one scan filter. No window over the
   * corpus, no sort. Exact group percentiles collect each group's
   * scores onto a reducer; at extreme group cardinality×size flip
   * `approx = true` for the sketch-merging `percentile_approx` path
   * whose thresholds are within epsilon at a fraction of the memory.
   */
  def percentileGate(df: DataFrame, groupCol: String, scoreCol: String,
                     q: Double, approx: Boolean = false): DataFrame = {
    require(q > 0.0 && q < 1.0, s"q=$q must be in (0,1)")
    val fn = if (approx) "approx_percentile" else "percentile"
    val thr = df.groupBy(col(groupCol))
      .agg(expr(s"$fn(`$scoreCol`, ${q}d)").as("__thr"))
    df.join(broadcast(thr), Seq(groupCol))
      .filter(col(scoreCol) >= col("__thr"))
      .drop("__thr")
  }

  /**
   * Token-budget sampling per source — the "N tokens from each source"
   * mixture knob (how LLaMA-style data recipes are actually specified,
   * in tokens, where [[capPerGroup]] caps document COUNTS and
   * [[mixture]] gates by RATE): documents are taken in the
   * deterministic md5-cell order (the same RNG-free order every
   * sampler here uses) until the source's cumulative token count
   * first reaches its budget. The doc that crosses the line is kept —
   * budgets are floors, truncation to exact token counts belongs to
   * sequence packing downstream. Sources without a budget entry pass
   * through whole.
   *
   * Scale: one window partitioned by source — the [[capPerGroup]]
   * shape, reducers = sources. A source too hot for one reducer is the
   * signal to split its budget across sub-shards (hash-salt the
   * partition key, budget/k each), which composes with this operator
   * unchanged.
   */
  def tokenBudgetSample(df: DataFrame, sourceCol: String, idCol: String,
                        tokensCol: String,
                        budgets: Map[String, Long]): DataFrame = {
    val ord = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val budgetCol = element_at(
      typedLit(budgets), col(sourceCol).cast("string"))
    df.withColumn("__cum",
        sum(col(tokensCol)).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__budget", budgetCol)
      .filter(col("__budget").isNull ||
        (col("__cum") - col(tokensCol)) < col("__budget"))
      .drop("__cum", "__budget")
  }

  /**
   * TRUE greedy (next-fit) sequence packing: documents are visited in
   * (partition, order) sequence; a document that does not fit in the
   * current bin starts a new one, so `bin_offset + size <= binSize` is an
   * invariant for every document with `size <= binSize` (an oversize
   * document gets its own bin at offset 0 and must be pre-split).
   *
   * The fill recurrence is sequential per partition key — exactly the
   * dependency a window sum cannot express — so this runs as a
   * mapPartitions pass over rows sorted by (partCol, orderCol), the same
   * single-pass-per-key cost shape as a window. Placement is stable under
   * append: later-ordered documents never move earlier ones.
   */
  def packSequences(df: DataFrame, partCol: String, orderCol: String,
                    sizeCol: String, binSize: Int): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val outSchema = df.schema
      .add("bin", org.apache.spark.sql.types.LongType, nullable = false)
      .add("bin_offset", org.apache.spark.sql.types.LongType, nullable = false)
    val kIdx = df.schema.fieldIndex(partCol)
    val sIdx = df.schema.fieldIndex(sizeCol)
    df.repartition(col(partCol))
      .sortWithinPartitions(col(partCol), col(orderCol))
      .mapPartitions { rows =>
        var curKey: Any = null
        var started = false
        var bin = 0L
        var fill = 0L
        rows.map { r =>
          val k = r.get(kIdx)
          if (!started || !java.util.Objects.equals(k, curKey)) {
            curKey = k; started = true; bin = 0L; fill = 0L
          }
          val s = r.getAs[Number](sIdx).longValue
          if (fill > 0L && fill + s > binSize) { bin += 1L; fill = 0L }
          val offset = fill
          fill += s
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ bin :+ offset)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /**
   * Strided layout packing (the split-on-boundary convention): a document
   * starting at running offset p is assigned bin floor(p / binSize) at
   * offset p mod binSize. A document may STRADDLE a bin boundary —
   * downstream must split/truncate it at the boundary (the layout wastes
   * zero tokens, the usual trade for causal-LM packing with document
   * splitting). Use [[packSequences]] when bin capacity must be an
   * invariant instead. Pure window pass — no sequential state.
   */
  def packSequencesStrided(df: DataFrame, partCol: String, orderCol: String,
                           sizeCol: String, binSize: Int): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__prev", coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("bin", (col("__prev") / binSize).cast("long"))
      .withColumn("bin_offset", (col("__prev") % binSize).cast("long"))
      .drop("__prev")
  }

  /**
   * Deterministic weighted sampling without replacement (Efraimidis–
   * Spirakis A-ES): each row draws u from its md5 cell (256-level
   * deterministic uniform) and ranks by ln(u)/w — the monotone transform
   * of u^(1/w), so higher-weight rows win proportionally more often. The
   * top-k plans as TakeOrderedAndProject (bounded per-partition heaps, no
   * global sort) and the same id always draws the same u: reruns, engine
   * ports, and cluster resizes select the same sample. The sort key is
   * not emitted — selection is key-gap-robust, the key's last ulp is not.
   */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    val cell = conv(hashCell(col(idCol)), 16, 10).cast("double")
    val u = (cell + 1.0) / 257.0
    df.withColumn("__skey", log(u) / col(weightCol).cast("double"))
      .orderBy(desc("__skey"), col(idCol))
      .limit(k)
      .drop("__skey")
  }

  /**
   * Deterministic weighted corpus mixture: subsample each source at its
   * rate through the engine-portable md5 cell-gate (rate quantized to
   * 256ths), then union. This is the training-mixture primitive — "2
   * parts web to 1 part books" — without RNG state: reruns, engine ports,
   * and retries pick the same rows. The gate is a scan-side filter, so a
   * source mixed at 1% never moves the other 99% off its scan.
   */
  def mixture(sources: Seq[(DataFrame, Double)], idCol: String): DataFrame = {
    require(sources.nonEmpty, "mixture needs at least one source")
    sources.map { case (df, rate) =>
      require(rate > 0.0 && rate <= 1.0, s"rate $rate outside (0, 1]")
      val cells = math.max(1L, math.round(rate * 256)).toInt
      if (cells >= 256) df
      else df.filter(hashCell(col(idCol)) < lit(f"$cells%02x"))
    }.reduce(_.unionByName(_))
  }

  /**
   * Temperature-scaled mixture (the mT5/XLM-R recipe: sample source s
   * with probability ∝ n_s^α, α < 1 up-weighting low-resource sources):
   * acceptance rates are water-filled — r_s = min(1, c·n_s^α / n_s)
   * with the budget constant c chosen so Σ min(n_s, c·n_s^α) =
   * targetFrac·N, i.e. mass a saturated low-resource source can't absorb
   * is renormalized onto the unsaturated ones (the mT5 posture; a plain
   * clamp would silently undershoot the target whenever a small source
   * hits rate 1). Saturation thresholds n_s^(1−α) are monotone in n_s
   * for α ≤ 1, so c falls out of one prefix-sum pass in threshold
   * order: the first source where (T − prefix_n)/(W − prefix_w) drops
   * below its own threshold pins c; if none does, every source
   * saturates (targetFrac = 1) and all rates are 1. Rates quantize to
   * 256 md5 cells — the same deterministic gate [[mixture]] uses: no
   * RNG, reruns and engine ports pick the same rows (expected total =
   * targetFrac·N up to cell quantization).
   *
   * Scale shape: one map-side-combinable count per source, then the
   * water-filling runs inside the sources-sized frame (the unpartitioned
   * prefix window is over #sources rows — tiny by definition), then a
   * broadcast join back (null-safe: a NULL source is a legitimate group
   * and keeps its computed rate) and a scan-side filter — the corpus
   * itself never shuffles.
   */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
                     alpha: Double, targetFrac: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha outside (0, 1]")
    require(targetFrac > 0.0 && targetFrac <= 1.0,
      s"targetFrac $targetFrac outside (0, 1]")
    val w = df.groupBy(sourceCol).agg(count(lit(1)).as("__n"))
      .withColumn("__w", pow(col("__n").cast("double"), alpha))
      .withColumn("__thr", pow(col("__n").cast("double"), 1 - alpha))
    val tot = w.agg(sum("__w").as("__sw"),
      sum("__n").cast("double").as("__tot"))
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy(col("__thr"), col(sourceCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val pre = w.crossJoin(broadcast(tot))
      .withColumn("__pre_n",
        coalesce(sum(col("__n").cast("double")).over(ord), lit(0.0)))
      .withColumn("__pre_w", coalesce(sum(col("__w")).over(ord), lit(0.0)))
      .withColumn("__c", (lit(targetFrac) * col("__tot") - col("__pre_n")) /
        (col("__sw") - col("__pre_w")))
    // round-before-compare (the repo-wide fp convention): __c and __thr
    // are raw pow()/division outputs, and a 1-ulp libm divergence between
    // engines on an unrounded < would flip which source pins the budget
    // constant, shifting EVERY acceptance rate — quantize both sides to
    // 6 digits (+1e-9 nudge) so the branch is bit-stable cross-engine
    val cStar = pre.filter(round(col("__c") + lit(1e-9), 6) <
        round(col("__thr") + lit(1e-9), 6))
      .orderBy(col("__thr"), col(sourceCol)).limit(1)
      .select(col("__c").as("__cstar"), lit(1).as("__k"))
    val rates = w.withColumn("__k", lit(1))
      .join(broadcast(cStar), Seq("__k"), "left")
      .withColumn("__cells", greatest(lit(1.0),
        round(least(lit(1.0),
          coalesce(col("__cstar"), lit(Double.MaxValue)) * col("__w") /
            col("__n").cast("double")) * 256 + lit(1e-9), 0)))
      .select(col(sourceCol).as("__src"), col("__cells"))
    df.join(broadcast(rates), df(sourceCol) <=> col("__src"))
      .filter(conv(hashCell(col(idCol)), 16, 10).cast("double") <
        col("__cells"))
      .drop("__src", "__cells")
  }

  /**
   * DSIR-style importance log-weights (Xie et al., "Data Selection for
   * Language Models via Importance Resampling", NeurIPS'23): score every
   * document by how much more likely its tokens are under a TARGET
   * distribution (the data you want more of — here any boolean column
   * predicate) than under the RAW corpus distribution, both estimated
   * over hashed token buckets. log w(doc) = Σ_tokens [ln p̂_target(b) −
   * ln p̂_raw(b)] with add-one smoothing over the 16^hexChars buckets;
   * resample/select downstream on the returned weight
   * ([[weightedSample]] / top-k).
   *
   * The bucket key is the first `hexChars` hex chars of md5(token) — a
   * builtin on both Spark and any oracle engine, so the whole scoring
   * chain replays bit-identically in SQL (same convention as
   * [[hashCell]]; no UDF, stays inside codegen).
   *
   * Scale shape: two corpus scans and nothing else grows with the
   * corpus — pass 1 builds the bucket model (one map-side-combined
   * shuffle on ≤16^hexChars keys, then a kilobyte model), pass 2
   * re-tokenizes and scores against the BROADCAST model (one shuffle
   * on doc id for the per-doc sum). The exploded token stream is never
   * cached or shuffled: at 100 TB the model is the only state worth
   * keeping, and rescanning beats caching a corpus-sized token table.
   * Emits (idCol, dsir_logweight) — unrounded; fixture-facing callers
   * round for fp-stable comparison.
   */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, hexChars: Int = 3): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8, s"hexChars=$hexChars outside [1,8]")
    val nBuckets = math.pow(16.0, hexChars)
    def bucketed(df: DataFrame) = df
      .select(col(idCol), isTarget.cast("boolean").as("__t"),
        explode(TextOps.tokens(lower(col(textCol)))).as("__tok"))
      .select(col(idCol), col("__t"),
        substring(md5(col("__tok")), 1, hexChars).as("__bucket"))
    // persist: counts feeds BOTH the totals row and the per-bucket model
    // — without the barrier the model-build scan (explode + agg over the
    // whole corpus) runs twice. ≤16^hexChars rows, kilobytes.
    val counts = graft.core.CacheRegistry.persistTracked(
      bucketed(docs).groupBy("__bucket").agg(
        count(lit(1)).as("__n_raw"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("__n_tgt")))
    val totals = counts.agg(sum("__n_raw").as("__nr"), sum("__n_tgt").as("__nt"))
    val model = counts.crossJoin(broadcast(totals))
      .select(col("__bucket"),
        (log((col("__n_tgt") + lit(1.0)) / (col("__nt") + lit(nBuckets))) -
         log((col("__n_raw") + lit(1.0)) / (col("__nr") + lit(nBuckets))))
          .as("__w"))
    bucketed(docs)
      .join(broadcast(model), Seq("__bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("__w")).as("dsir_logweight"))
  }

  /** RE2-safe patterns (portable across Java regex and RE2 oracles). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\d{3}-\\d{4}"

  /** Redact emails and phone-shaped tokens; counts ride along so a
    * pipeline can gate on PII density, not just rewrite. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhonePattern))
}
