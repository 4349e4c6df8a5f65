package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
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

  /** dbt `unique` (reference `5_dbt/READ.md:298-299`): keys with >1 row. */
  def unique(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_rows"))
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

  /** Thresholded runner (dbt `HAVING COUNT(*) > {{var}}`, reference `5_dbt/READ.md:836-837`). */
  def run(name: String, violations: DataFrame, threshold: Long = 0): CheckResult =
    CheckResult(name, violations.count(), threshold)
}
