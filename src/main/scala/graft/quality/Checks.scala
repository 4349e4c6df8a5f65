package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Data-quality check library — SURVEY §5 (dbt-test equivalents).
 *
 * The reference treats data quality as a first-class pipeline stage
 * (`run_data_quality_checks` before transform, reference
 * `5_dbt/READ.md:53-56`) with four declarative test kinds
 * (`5_dbt/READ.md:296-381`) plus thresholded custom SQL tests
 * (`5_dbt/READ.md:826-879`). Each check returns the VIOLATING rows as a
 * DataFrame (dbt's fail-if-rows-returned contract); [[CheckResult]] wraps
 * the count for report-style use.
 *
 * Scale notes: every check is a single distributed scan/agg — uniqueness
 * is groupBy-count (no global sort), relationships is a broadcast
 * anti-join when the parent is a dimension.
 */
object Checks {

  final case class CheckResult(name: String, violations: Long, threshold: Long = 0) {
    def passed: Boolean = violations <= threshold
  }

  /** dbt `not_null` (reference `5_dbt/READ.md:300-305`). */
  def notNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(col(_).isNull).reduce(_ || _))

  /** dbt `unique` (reference `5_dbt/READ.md:298-299`): keys with >1 row.
    * NULL-keyed rows are excluded first — dbt's unique test ignores
    * them (NULL coverage is [[notNull]]'s job), and counting the NULL
    * group would double-report what notNull already flags. */
  def unique(df: DataFrame, keys: Seq[String]): DataFrame =
    df.filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /**
   * dbt `relationships` FK test (reference `5_dbt/READ.md:306-311`):
   * non-NULL child keys with no parent. NULL child keys are excluded —
   * dbt's relationships test ignores them (NULL coverage is `not_null`'s
   * job), and a left_anti join would otherwise report every NULL as an
   * orphan.
   */
  /**
   * Column-level profile (the dbt-docs / expectation-suite bootstrap):
   * one row per column with null count, exact distinct count, and
   * lexicographic min/max (values stringified so heterogeneous columns
   * share a schema). ONE pass over the data — the per-column aggregates
   * ride a single wide agg, then unpivot driver-side expression-wise; no
   * per-column scans, no collect.
   */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c).cast("string")).as(s"__mn_$c"),
        max(col(c).cast("string")).as(s"__mx_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__nn_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_str"),
        col(s"__mx_$c").as("max_str"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  def relationships(child: DataFrame, childKey: String,
                    parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull).join(
      broadcast(parent.select(col(parentKey).as(childKey)).distinct()),
      Seq(childKey), "left_anti")

  /** dbt `accepted_values`/range test (reference `5_dbt/READ.md:312-381`). */
  def acceptedRange(df: DataFrame, c: String, lo: Double, hi: Double): DataFrame =
    df.filter(col(c).isNotNull && (col(c) < lo || col(c) > hi))

  /** dbt `accepted_values` enum test. */
  def acceptedValues(df: DataFrame, c: String, allowed: Seq[String]): DataFrame =
    df.filter(col(c).isNotNull && !col(c).isin(allowed: _*))

  /**
   * k-anonymity audit over a quasi-identifier column set — the privacy
   * gate run before a dataset (or its metadata) is released: any
   * combination of quasi-identifier values shared by FEWER than k rows
   * re-identifies those rows. Returns the violating equivalence classes
   * with their sizes (empty ⇒ the projection is k-anonymous). One
   * map-side-combined hash aggregation on the quasi columns; rows out ≤
   * #violating classes.
   */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(k >= 2, s"k $k must be >= 2 (k=1 is vacuous)")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
  }

  /**
   * Cohen's kappa inter-rater agreement (Cohen 1960) between two label
   * columns — the label-audit gate run when a cheap automatic rater
   * (a heuristic, a classifier) is validated against stored labels or a
   * second annotator: raw agreement alone rewards majority-class
   * guessing, kappa subtracts the chance-agreement floor. Returns one
   * row (n, po, pe, kappa): n rated rows (both labels non-NULL),
   * observed agreement po, chance agreement pe from the rater
   * marginals, kappa = (po − pe)/(1 − pe).
   *
   * Fp posture: every ratio derives from EXACT integer sums — agree,
   * n, and s = Σ_label ca·cb — and kappa is computed as the single
   * integer-ratio (agree·n − s)/(n² − s), algebraically equal to
   * (po−pe)/(1−pe), so no intermediate float ordering can shift it;
   * the only rounding is the final 6-digit quantization. A perfectly
   * chance-saturated table (pe = 1 ⇒ n² = s) yields NULL kappa
   * (undefined), not a division error.
   *
   * Scale shape: ONE corpus aggregation produces the k×k contingency
   * cells (map-side combined; k = distinct labels); cells are cached
   * for the marginal/total passes, the 1-row result is lineage-cut,
   * and the cache released — nothing corpus-sized is scanned twice and
   * a long-lived session accretes no cache.
   */
  def cohenKappa(df: DataFrame, raterACol: String, raterBCol: String): DataFrame = {
    val rated = df
      .filter(col(raterACol).isNotNull && col(raterBCol).isNotNull)
      .select(col(raterACol).cast("string").as("__a"),
        col(raterBCol).cast("string").as("__b"))
    val cells = graft.core.CacheRegistry.persistTracked(
      rated.groupBy("__a", "__b").agg(count(lit(1)).as("__c")))
    val tot = cells.agg(
      coalesce(sum(col("__c")), lit(0L)).as("n"),
      coalesce(sum(when(col("__a") === col("__b"), col("__c"))
        .otherwise(0L)), lit(0L)).as("__agree"))
    val chance = cells.groupBy("__a").agg(sum(col("__c")).as("__ca"))
      .join(cells.groupBy("__b").agg(sum(col("__c")).as("__cb")),
        col("__a") === col("__b"))
      .agg(coalesce(sum(col("__ca") * col("__cb")), lit(0L)).as("__s"))
    val out = tot.crossJoin(chance).select(
      col("n"),
      round(col("__agree").cast("double") /
        nullif(col("n"), lit(0L)) + lit(1e-9), 6).as("po"),
      round(col("__s").cast("double") /
        nullif(col("n") * col("n"), lit(0L)) + lit(1e-9), 6).as("pe"),
      round((col("__agree") * col("n") - col("__s")).cast("double") /
        nullif((col("n") * col("n") - col("__s")).cast("double"), lit(0.0))
        + lit(1e-9), 6).as("kappa"))
    val cut = graft.core.CheckpointStrategy.Local.cut(out)
    graft.core.CacheRegistry.release(cells)
    cut
  }

  /**
   * Fleiss' kappa (Fleiss 1971) — [[cohenKappa]] generalized to r ≥ 2
   * raters per item: the agreement audit for multiply-annotated data
   * (k quality gates voting per document, crowd labels, ensemble
   * raters). Input is LONG format — one row per (item, assigned
   * category); items whose rating count differs from `raters` are
   * dropped (the constant-r design Fleiss' statistic assumes).
   * Returns one row (n_items, raters, pbar, pe, kappa).
   *
   * Fp posture (the cohenKappa convention): with integer cell counts
   * n_ij, S2 = ΣΣ n_ij², category totals c_j, C2 = Σ c_j², N items,
   * A = S2 − N·r, D = N·r·(r−1), T = (N·r)² —
   * P̄ = A/D, P̄e = C2/T, and kappa collapses to the single integer
   * ratio (A·T − C2·D)/(D·(T − C2)); no intermediate float exists to
   * reorder. Chance saturation (every rating one category ⇒ C2 = T)
   * yields NULL kappa, not a division error. T = (N·r)² bounds the
   * exact-integer range: N·r < 3·10⁹ (a billion items at r=3) before
   * long overflow — beyond that, pre-aggregate per shard.
   *
   * Scale shape: one (item, category) hash aggregation (map-side
   * combined), one item-keyed count for the constant-r filter, then
   * category-count aggregations over cells — cells are cached once,
   * the 1-row result lineage-cut, the cache released.
   */
  def fleissKappa(df: DataFrame, itemCol: String, categoryCol: String,
                  raters: Int): DataFrame = {
    require(raters >= 2, s"raters $raters must be >= 2")
    val rated = df
      .filter(col(itemCol).isNotNull && col(categoryCol).isNotNull)
      .select(col(itemCol).cast("string").as("__i"),
        col(categoryCol).cast("string").as("__j"))
    val cells0 = rated.groupBy("__i", "__j").agg(count(lit(1)).as("__n"))
    val full = cells0.groupBy("__i").agg(sum(col("__n")).as("__ri"))
      .filter(col("__ri") === raters).select("__i")
    val cells = graft.core.CacheRegistry.persistTracked(
      cells0.join(full, Seq("__i"), "left_semi"))
    val item = cells.agg(
      coalesce(sum(col("__n") * col("__n")), lit(0L)).as("__s2"),
      countDistinct(col("__i")).as("n_items"))
    val cat = cells.groupBy("__j").agg(sum(col("__n")).as("__cj"))
      .agg(coalesce(sum(col("__cj") * col("__cj")), lit(0L)).as("__c2"))
    val nr = col("n_items") * lit(raters.toLong)
    val a = col("__s2") - nr
    val d = nr * lit((raters - 1).toLong)
    val t = nr * nr
    val out = item.crossJoin(cat).select(
      col("n_items"), lit(raters.toLong).as("raters"),
      round(a.cast("double") / nullif(d, lit(0L)) + lit(1e-9), 6).as("pbar"),
      round(col("__c2").cast("double") / nullif(t, lit(0L)) + lit(1e-9), 6)
        .as("pe"),
      round((a * t - col("__c2") * d).cast("double")
        / nullif((d * (t - col("__c2"))).cast("double"), lit(0.0))
        + lit(1e-9), 6).as("kappa"))
    val cut = graft.core.CheckpointStrategy.Local.cut(out)
    graft.core.CacheRegistry.release(cells)
    cut
  }

  /**
   * Chi-square goodness-of-fit against the UNIFORM expectation — the
   * category-balance audit (are labels/shards/splits evenly filled, or
   * did an upstream filter silently empty one?): χ² = Σ (Oᵢ − n/k)² /
   * (n/k) over the k observed categories. One hash aggregation produces
   * the k category counts; everything after is k-sized arithmetic. All
   * counts are exact integers; the statistic's divisions are single
   * correctly-rounded ops, rounded(+1e-9, 6) once at the end. The
   * caller compares χ² to the critical value for k−1 dof at their α —
   * emitted as `dof` for convenience.
   *
   * @return one row (k, n, chi2, dof)
   */
  def chiSquareUniform(df: DataFrame, catCol: String): DataFrame = {
    val cells = df.filter(col(catCol).isNotNull)
      .groupBy(col(catCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("__o"))
    cells.agg(
        count(lit(1)).as("k"),
        coalesce(sum(col("__o")), lit(0L)).as("n"),
        sum(col("__o") * col("__o")).as("__ssq"))
      // Σ(O−E)²/E with E = n/k collapses to k·ΣO²/n − n — two exact
      // integer aggregates and one division, no per-category float
      .select(col("k"), col("n"),
        round((col("k") * col("__ssq")).cast("double")
          / nullif(col("n"), lit(0L)).cast("double")
          - col("n").cast("double") + lit(1e-9), 6).as("chi2"),
        (col("k") - 1).cast("long").as("dof"))
  }

  /**
   * Benford first-digit audit of a positive INTEGER column — the
   * synthetic-data / fabricated-metric detector: naturally-occurring
   * multi-magnitude quantities follow P(d) = log10(1 + 1/d); uniform
   * generators and template artifacts do not. Integer-only by contract
   * because the leading digit comes from the engine's integer-to-string
   * rendering (identical everywhere) — never from log10 arithmetic,
   * whose behavior at exact powers of ten differs by ulps across
   * engines. One hash aggregation on the digit; ≤9 rows of arithmetic
   * after.
   *
   * @return 9 rows (digit, observed, obs_share, exp_share, dev) —
   *         unobserved digits zero-filled, dev = obs_share − exp_share
   */
  def benfordAudit(df: DataFrame, intCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val digits = spark.createDataset(1 to 9).toDF("digit")
      .select(col("digit").cast("long").as("digit"))
    val obs = df.filter(col(intCol).isNotNull && col(intCol) > 0)
      .select(substring(col(intCol).cast("long").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("observed"))
    val tot = obs.agg(coalesce(sum(col("observed")), lit(0L)).as("__n"))
    digits.join(obs, Seq("digit"), "left")
      .crossJoin(broadcast(tot))
      .select(col("digit"),
        coalesce(col("observed"), lit(0L)).as("observed"),
        round(coalesce(col("observed"), lit(0L)).cast("double")
          / nullif(col("__n"), lit(0L)).cast("double") + lit(1e-9), 6)
          .as("obs_share"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")) + lit(1e-9), 6)
          .as("exp_share"))
      .withColumn("dev", round(col("obs_share") - col("exp_share")
        + lit(1e-9), 6))
  }

  /**
   * 3-sigma outlier test (reference `5_dbt/READ.md:841-864`): rows more
   * than 3 sample-stddevs from the global mean. The 1-row stats frame is
   * cross-broadcast (J7), so the fact side never shuffles.
   */
  def threeSigmaOutliers(df: DataFrame, c: String): DataFrame = {
    val stats = df.agg(avg(col(c)).as("__mu"), stddev(col(c)).as("__sd"))
    df.crossJoin(broadcast(stats))
      .filter(abs(col(c) - col("__mu")) > lit(3) * col("__sd"))
      .drop("__mu", "__sd")
  }

  /**
   * Robust (MAD) outlier test: rows whose |x − median| exceeds
   * `k` × MAD within their group, where MAD = median(|x − median|).
   * Unlike 3-sigma this doesn't let the outliers inflate their own
   * threshold — the standard robust twin for skewed metrics. Two exact
   * percentile passes by construction; both group frames are
   * dimension-cardinality and broadcast, so the fact side shuffles only
   * for the two aggregations.
   */
  def madOutliers(df: DataFrame, c: String, groupCols: Seq[String],
                  k: Double = 3.5): DataFrame = {
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile($c, 0.5)").as("__med"))
    val dev = df.join(broadcast(med), groupCols)
      .withColumn("__absdev", abs(col(c) - col("__med")))
    val mad = dev.groupBy(groupCols.map(col): _*)
      .agg(expr("percentile(__absdev, 0.5)").as("__mad"))
    dev.join(broadcast(mad), groupCols)
      .filter(col("__absdev") > lit(k) * col("__mad"))
      .drop("__med", "__absdev", "__mad")
  }

  /** Interval-consistency test: end before start (reference `5_dbt/READ.md:866-879`). */
  def endBeforeStart(df: DataFrame, startCol: String, endCol: String): DataFrame =
    df.filter(col(endCol) < col(startCol))

  /**
   * Rolling anomaly test: rows whose value sits more than `k`
   * sample-stddevs from the TRAILING-window mean of their own series —
   * the drift-aware twin of [[threeSigmaOutliers]] (a global threshold
   * flags a whole regime shift; a trailing one flags the moment of
   * departure). The window frame excludes the current row, so a spike
   * never shrinks its own z-score; rows with fewer than `minPrior`
   * predecessors are not judged (cold start), and a zero-variance
   * history judges nothing (sd > 0 guard, not a division blow-up).
   *
   * Scale shape: one window exchange on the series key with an
   * O(window)-row frame per row — no self-join, no global pass; series
   * cardinality is the parallelism.
   *
   * @return the flagged rows as (orderCols' ids implied by caller's
   *         selection) + `z`, the 4-digit-rounded trailing z-score
   */
  def rollingAnomalies(df: DataFrame, valueCol: String,
                       keyCols: Seq[String], orderCols: Seq[String],
                       window: Int = 20, minPrior: Int = 10,
                       k: Double = 3.0): DataFrame = {
    require(window >= 2 && minPrior >= 2 && minPrior <= window,
      s"need 2 <= minPrior <= window (got window=$window minPrior=$minPrior)")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-window, -1)
    df.withColumn("__mu", avg(col(valueCol)).over(w))
      .withColumn("__sd", stddev_samp(col(valueCol)).over(w))
      .withColumn("__n", count(col(valueCol)).over(w))
      .filter(col("__n") >= minPrior && col("__sd") > 0)
      .withColumn("z",
        round((col(valueCol) - col("__mu")) / col("__sd") + lit(1e-9), 4))
      .filter(abs(col("z")) > k)
      .drop("__mu", "__sd", "__n")
  }

  /**
   * dbt source-freshness test: per key, the newest row's age relative to
   * `asOf`; keys staler than `maxLagSec` are violations. `asOf` is an
   * explicit column (a pinned literal in tests) rather than now() so the
   * check is reproducible. One hash aggregate — no sort, no window.
   */
  def freshness(df: DataFrame, tsCol: String, keys: Seq[String],
                asOf: Column, maxLagSec: Long): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(max(col(tsCol)).as("latest"))
      .withColumn("lag_sec", asOf.cast("long") - col("latest").cast("long"))
      .filter(col("lag_sec") > maxLagSec)

  /**
   * Tie-corrected Mann-Whitney U from BIN COUNTS — the nonparametric
   * two-sample test without a global sort. Binning first (`binWidth`)
   * makes average ranks derivable arithmetically: a bucket holding t
   * values after cumBefore earlier ones occupies ranks
   * cumBefore+1 … cumBefore+t, so every member's average rank is
   * cumBefore + (t+1)/2. Rank sums, U₁ = R₁ − m(m+1)/2, and the
   * tie-corrected normal z all follow from one (bucket, n₁, n₂) hash
   * aggregation plus one bins-sized window — the scale-honest shape
   * (this IS the exact tie-corrected MWU of the binned values; with a
   * bin per distinct value it is the exact test). Every intermediate
   * is integer or dyadic-rational, so independent engines agree
   * bit-for-bit until the final sqrt.
   *
   * Returns one row: m, n (group sizes), u1, z (unrounded — callers
   * round to their comparison tolerance).
   */
  def mannWhitneyBinned(df: DataFrame, valCol: String, isFirst: Column,
                        binWidth: Double): DataFrame = {
    val bins = df.filter(col(valCol).isNotNull)
      .groupBy(floor(col(valCol) / binWidth).cast("long").as("b"))
      .agg(sum(when(isFirst, 1L).otherwise(0L)).as("n1"),
        sum(when(isFirst, 0L).otherwise(1L)).as("n2"))
      .withColumn("t", col("n1") + col("n2"))
    val wc = org.apache.spark.sql.expressions.Window.orderBy(col("b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    // every product of group sizes / bin populations is computed in
    // DOUBLE (cast the first factor): m, n, and per-bin t can reach
    // billions at the scale this helper is documented for, and a Long
    // t³ (or m·n) overflows at t ≥ 2²¹ — silently wrapped variance, or
    // an ANSI abort. Doubles are exact for these integers up to 2⁵³
    // and the statistic only needs them inside a sqrt anyway.
    bins.withColumn("cumBefore",
        coalesce(sum(col("t")).over(wc), lit(0L)))
      .withColumn("avgRank",
        col("cumBefore") + (col("t") + lit(1)).cast("double") / 2)
      .agg(sum(col("n1")).as("m"), sum(col("n2")).as("n"),
        sum(col("n1") * col("avgRank")).as("r1"),
        sum(col("t").cast("double") * col("t") * col("t") - col("t"))
          .as("tiesum"))
      .select(col("m"), col("n"),
        (col("r1") - col("m").cast("double") * (col("m") + 1) / 2)
          .as("u1"),
        col("tiesum"))
      .select(col("m"), col("n"), col("u1"),
        (col("m").cast("double") * col("n") / 12 *
          ((col("m") + col("n") + 1) -
            col("tiesum") /
              ((col("m") + col("n")).cast("double") *
                (col("m") + col("n") - 1)))).as("variance"))
      // Degenerate inputs — one group empty (m·n = 0) or every value in
      // a single bin (tie correction cancels the variance) — make the
      // sqrt argument 0 or NaN; the test is then UNTESTABLE, and the dq
      // family's convention for "no verdict" is NULL, not a NaN that
      // poisons downstream comparisons. Spark's GreaterThan is NaN-SAFE
      // (NaN orders above every double, so NaN > 0 is TRUE — the
      // opposite of IEEE/DuckDB), so the guard needs an explicit
      // !isnan conjunct to match the oracle's `isfinite(vvar)` on the
      // 0/0-division case (m + n = 1).
      .select(col("m"), col("n"), col("u1"),
        when(col("variance") > 0 && !isnan(col("variance")),
          (col("u1") - col("m").cast("double") * col("n") / 2) /
            sqrt(col("variance"))).as("z"))
  }

  /** Thresholded runner (dbt `HAVING COUNT(*) > {{var}}`, reference `5_dbt/READ.md:836-837`). */
  def run(name: String, violations: DataFrame, threshold: Long = 0): CheckResult =
    CheckResult(name, violations.count(), threshold)
}
