package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Aggregation operators — SURVEY §2.4 A1-A10.
 *
 * Percentile semantics (SURVEY §7.4.1): the reference's
 * `np.quantile(x, q)` uses linear interpolation, which matches Spark's
 * exact `percentile`/`percentile_cont` and duckdb's `quantile_cont`.
 * `percentile_approx` is NOT hash-compatible and is exposed separately as
 * the documented 100 TB escape hatch.
 *
 * Scale notes:
 *  - Exact percentiles materialize each group's values on one reducer
 *    (no partial aggregation) — fine for (tmc, period)-grain groups whose
 *    cardinality bounds group size; at 100 TB prefer [[approxPercentiles]]
 *    (t-digest-style sketch, map-side combinable) unless exactness is a
 *    correctness requirement.
 *  - Everything else here is hash-aggregated with map-side partials by
 *    Catalyst automatically.
 */
object Aggregates {

  /** A1: exact linear-interpolation percentile (== np.quantile / quantile_cont). */
  def pct(c: Column, q: Double): Column = percentile(c, lit(q))

  /** A1 at scale: approximate percentile with map-side combine. */
  def approxPct(c: Column, q: Double, accuracy: Int = 10000): Column =
    percentile_approx(c, lit(q), lit(accuracy))

  /**
   * A1: groupBy + multi-percentile in ONE pass (the reference computes
   * three quantiles per group, reference `1_AWS/README.md:95-99`). One
   * shuffle, one sort per group, three outputs.
   */
  def groupPercentiles(df: DataFrame, keys: Seq[String], valueCol: String,
                       qs: Map[String, Double]): DataFrame = {
    val aggs = qs.toSeq.map { case (name, q) => pct(col(valueCol), q).as(name) }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * A1 at scale, still EXACT: pooled multi-percentile via a
   * (key, value) → count pre-aggregation, then `percentile(value, q,
   * frequency)` over the DISTINCT values. Bit-identical to
   * [[groupPercentiles]] — Spark's percentile buffers a value→count map
   * either way and runs the same interpolation — but the pre-count is a
   * hash aggregate WITH map-side partials, so the final per-group reducer
   * state is bounded by the number of distinct values, not the row count.
   * The right form when group cardinality is low and groups grow with the
   * data (e.g. per-DAY pooled percentiles over an ever-bigger feed).
   */
  def groupPercentilesPooled(df: DataFrame, keys: Seq[String], valueCol: String,
                             qs: Map[String, Double]): DataFrame = {
    val counted = df.groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__freq"))
    val aggs = qs.toSeq.map { case (name, q) =>
      percentile(col(valueCol), lit(q), col("__freq")).as(name) }
    counted.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** A3: boolean-mean exceedance rate (reference `3_BigQuery/READ.md:119-122`). */
  def exceedanceRate(c: Column, threshold: Double): Column =
    avg((c > threshold).cast("double"))

  /** A4: the standard multi-stat block (reference `5_dbt/READ.md:398-413`). */
  def multiStat(c: Column): Seq[Column] = Seq(
    avg(c).as("avg_value"), min(c).as("min_value"),
    max(c).as("max_value"), count(lit(1)).as("n_rows"))

  /** A10: HAVING-style thresholded aggregate (reference `5_dbt/READ.md:836-837`). */
  def countHaving(df: DataFrame, keys: Seq[String], minCount: Long): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > minCount)
}
