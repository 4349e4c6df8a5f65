package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.MetricExpr
import graft.ops.{Aggregates, Windows}

/**
 * Pipeline 2 — yearly severity/variability Top-10 (reference
 * `2_Azure/READ.md:50-107`, SURVEY §3).
 *
 * Per-TMC yearly percentiles → TTI/PTI → severity = (TTI+PTI)/2,
 * variability = PTI/TTI → nlargest(10) by severity. The reference's
 * per-year Python loop is a single year-filtered scan here; running it
 * for N years is a union or a `year` grouping column, not N jobs.
 */
object SeverityVariability {

  def run(spark: SparkSession, dir: String, yr: Int = 2024, k: Int = 10): DataFrame = {
    val base = Npmrds.tt(spark, dir)
      .filter(year(col("measurement_tstamp")) === yr)
    val pct = Aggregates.groupPercentiles(base, Seq("tmc_code"),
      "travel_time_seconds", Map("tt50" -> 0.5, "tt85" -> 0.85, "tt95" -> 0.95))
    val m = pct
      .withColumn("tti", round(MetricExpr.tti(col("tt85"), col("tt50")) + lit(1e-9), 6))
      .withColumn("pti", round(MetricExpr.pti(col("tt95"), col("tt50")) + lit(1e-9), 6))
      .withColumn("severity",
        round(MetricExpr.severity(col("tti"), col("pti")) + lit(1e-9), 6))
      .withColumn("variability",
        round(MetricExpr.variability(col("pti"), col("tti")) + lit(1e-9), 6))
    Windows.topK(m, k, desc("severity"), col("tmc_code"))
      .select(lit(yr).cast("long").as("analysis_year"), col("tmc_code"),
        col("tti"), col("pti"), col("severity"), col("variability"))
  }
}
