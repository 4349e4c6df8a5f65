package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.{MetricExpr, TimeExpr}
import graft.ops.{Aggregates, Joins, Windows}

/**
 * Pipeline 4 — LOTTR (level of travel-time reliability) trend (reference
 * `4_Snowflake/READ.md:52-121`, SURVEY §3).
 *
 * LOTTR = p80/p50 per (tmc, period). The reference's fold of four
 * per-period left joins (J5) is ONE groupBy+pivot here — one shuffle
 * instead of four joins — and its per-year row-dict accumulation (U2) is
 * a plain grouping over the trend axis with pct_change (W7).
 */
object LottrYearly {

  private def periodized(spark: SparkSession, dir: String, yr: Int): DataFrame =
    Npmrds.tt(spark, dir)
      .filter(year(col("measurement_tstamp")) === yr)
      .withColumn("period", TimeExpr.period(col("measurement_tstamp")))
      .na.drop(Seq("period"))

  /** Per-TMC pivoted LOTTR columns (lottr_amp … lottr_we), fillna(0). */
  def pivoted(spark: SparkSession, dir: String, yr: Int = 2024): DataFrame = {
    val lottr = Aggregates.groupPercentiles(periodized(spark, dir, yr),
      Seq("tmc_code", "period"), "travel_time_seconds",
      Map("tt80" -> 0.8, "tt50" -> 0.5))
      .withColumn("lottr",
        round(MetricExpr.lottr(col("tt80"), col("tt50")) + lit(1e-9), 6))
    Joins.pivotInsteadOfJoins(lottr, "tmc_code", "period",
      Seq("amp", "mid", "pmp", "we"), max(col("lottr")))
      .withColumnRenamed("amp", "lottr_amp")
      .withColumnRenamed("mid", "lottr_mid")
      .withColumnRenamed("pmp", "lottr_pmp")
      .withColumnRenamed("we", "lottr_we")
      .na.fill(0d)
  }

  /**
   * Daily reliability summary over the trend axis: pooled p80/p50 of all
   * 'amp' readings per day → day-over-day pct_change (first row → 0).
   *
   * Day-grain groups grow linearly with the feed, so the percentiles run
   * through [[Aggregates.groupPercentilesPooled]]: a map-side-combined
   * (day, value)→count pre-aggregation bounds the one-reducer-per-day
   * state by DISTINCT travel times, not readings — exact result, same
   * oracle ([[Aggregates.approxPct]] remains the sketch escape hatch).
   */
  def dailySummary(spark: SparkSession, dir: String, yr: Int = 2024): DataFrame = {
    val amp = periodized(spark, dir, yr).filter(col("period") === "amp")
      .withColumn("day", to_date(col("measurement_tstamp")))
    val daily = Aggregates.groupPercentilesPooled(amp, Seq("day"),
      "travel_time_seconds", Map("tt80" -> 0.8, "tt50" -> 0.5))
      .withColumn("lottr_amp",
        round(MetricExpr.lottr(col("tt80"), col("tt50")) + lit(1e-9), 6))
      .select("day", "lottr_amp")
    Windows.pctChange(daily, Nil, "day", "lottr_amp", "lottr_change")
      .withColumn("lottr_change", round(col("lottr_change") + lit(1e-9), 6))
  }
}
