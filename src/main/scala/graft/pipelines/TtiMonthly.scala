package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.{MetricExpr, TimeExpr}
import graft.ops.{Aggregates, Joins, Windows}

/**
 * Pipeline 1 — monthly Top-10 congested roads (reference
 * `1_AWS/README.md:69-120`, SURVEY §3.1).
 *
 * extract → transform → load becomes ONE lazy plan: Catalyst pushes the
 * county filter below the join and prunes columns across what were XCom
 * process boundaries in the reference. Ordering/ranking runs on
 * 6-digit-rounded TTI so the result is stable across engines and
 * summation orders.
 */
object TtiMonthly {

  def run(spark: SparkSession, dir: String, yr: Int = 2024, mo: Int = 1,
          county: String = "NATION_3", k: Int = 10): DataFrame = {
    val base = Npmrds.tt(spark, dir)
      .filter(year(col("measurement_tstamp")) === yr &&
        month(col("measurement_tstamp")) === mo)
      .withColumn("period", TimeExpr.period(col("measurement_tstamp")))
      .na.drop(Seq("period"))
    val pct = Aggregates.groupPercentiles(base, Seq("tmc_code", "period"),
      "travel_time_seconds", Map("tt50" -> 0.5, "tt85" -> 0.85, "tt95" -> 0.95))
    val metrics = pct
      .withColumn("tti", round(MetricExpr.tti(col("tt85"), col("tt50")) + lit(1e-9), 6))
      .withColumn("pti", round(MetricExpr.pti(col("tt95"), col("tt50")) + lit(1e-9), 6))
    val located = Joins.leftBroadcast(metrics, Npmrds.shp(spark, dir), Seq("tmc_code"))
      .filter(col("county") === county)
    Windows.topK(located, k, desc("tti"), col("tmc_code"), col("period"))
      .select(
        TimeExpr.periodLabel(lit(yr), lit(mo)).as("analysis_period"),
        col("tmc_code"), col("county"), col("period"), col("tti"), col("pti"))
  }
}
