package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.{MetricExpr, TimeExpr}
import graft.ops.{Aggregates, Joins, Windows}

/**
 * Pipeline 3 — TTI trends + exceedance (reference
 * `3_BigQuery/READ.md:47-124`, SURVEY §3.2).
 *
 * The reference's per-year × per-period Python loops collapse into ONE
 * scan with `period` as a CASE column and the trend axis as a grouping
 * key — one shuffle where the reference ran 40 pandas passes. The trend
 * axis here is the DAY (the events fixture spans one month); the shape —
 * per-key top-10 selection, semi-join, lag-diff, exceedance rate — is
 * the reference's.
 */
object TtiTrends {

  /** Per-(tmc, day, period) TTI over the period-classified feed. */
  private def dailyTti(spark: SparkSession, dir: String): DataFrame = {
    val base = Npmrds.tt(spark, dir)
      .withColumn("period", TimeExpr.period(col("measurement_tstamp")))
      .na.drop(Seq("period"))
      .withColumn("day", to_date(col("measurement_tstamp")))
    Aggregates.groupPercentiles(base, Seq("tmc_code", "day", "period"),
      "travel_time_seconds", Map("tt50" -> 0.5, "tt85" -> 0.85))
      .withColumn("tti", round(MetricExpr.tti(col("tt85"), col("tt50")) + lit(1e-9), 6))
  }

  /** Top-k TMCs by mean TTI → their per-day mean TTI + day-over-day diff. */
  def trends(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val tti = dailyTti(spark, dir)
    val top = Windows.topK(
      tti.groupBy("tmc_code").agg(round(avg(col("tti")) + lit(1e-9), 6).as("mean_tti")),
      k, desc("mean_tti"), col("tmc_code"))
    val daily = tti.groupBy("tmc_code", "day")
      .agg(round(avg(col("tti")) + lit(1e-9), 6).as("avg_tti"))
    val picked = Joins.semiJoin(daily, top.select("tmc_code"), Seq("tmc_code"))
    Windows.lagDiff(picked, Seq("tmc_code"), "day", "avg_tti", "tti_change")
      .withColumn("tti_change", round(col("tti_change") + lit(1e-9), 6))
  }

  /** Per-TMC exceedance rate: share of (day, period) cells with TTI > thr. */
  def exceedance(spark: SparkSession, dir: String, threshold: Double = 1.5): DataFrame =
    dailyTti(spark, dir).groupBy("tmc_code")
      .agg(round(Aggregates.exceedanceRate(col("tti"), threshold) + lit(1e-9), 6)
        .as("exceed_rate"),
        count(lit(1)).as("n_cells"))
}
