package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.expr.{MetricExpr, QualityExpr, TimeExpr}
import graft.ops.{Joins, Windows}

/**
 * Pipeline 5 — the dbt congestion-mart chain (reference
 * `5_dbt/READ.md:142-733`, SURVEY §3.3): staging sanitization →
 * intermediate hourly congestion metrics → three marts.
 *
 * dbt's DAG-of-models becomes a DAG of DataFrame functions; each mart is
 * one registered query. Rank/percent-rank keys are 6-digit-rounded so
 * tie groups are identical across engines (RANK keeps ties — the QUALIFY
 * semantics of the reference, `5_dbt/READ.md:587-588`).
 *
 * Scale notes: hourly aggregation shuffles once on (location, hour); the
 * full-outer speed∕volume merge joins two already-aggregated frames on
 * the same key (AQE-local); the location dimension is broadcast; marts
 * re-aggregate the small intermediate — no raw-fact reshuffle.
 */
object CongestionMarts {

  /** Staged speed readings: sanitize [0,120]→NULL, drop low-confidence +
    * NULL speeds (reference `5_dbt/READ.md:198-225`). */
  def stgSpeed(spark: SparkSession, dir: String): DataFrame =
    Npmrds.rawSpeed(spark, dir)
      .withColumn("speed", QualityExpr.sanitizeRange(col("speed"), 0, 120))
      .filter(col("confidence_score") >= 0.5 && col("speed").isNotNull)
      .select(col("sensor_id").as("location_id"),
        date_trunc("hour", col("timestamp")).as("recorded_hour"),
        col("speed"))

  /** Staged volumes: sanitize counts, hourly key (reference `5_dbt/READ.md:150-184`). */
  def stgVolume(spark: SparkSession, dir: String): DataFrame =
    Npmrds.rawVolume(spark, dir)
      .withColumn("vehicle_count",
        QualityExpr.sanitizeRange(col("vehicle_count").cast("double"), 0, 10000))
      .filter(col("vehicle_count").isNotNull)
      .select(col("location_id"),
        date_trunc("hour", col("recorded_time")).as("recorded_hour"),
        col("vehicle_count"), col("lane_count"))

  /**
   * int_congestion_metrics (reference `5_dbt/READ.md:383-478`): hourly
   * speed stats (incl. exact median — the PERCENTILE_CONT-as-window
   * idiom computed as a group aggregate, W4) FULL OUTER JOIN hourly
   * volume stats, LEFT JOIN incident counts on the coalesced key (J4),
   * broadcast-joined location attrs (J2), congestion index macro (F8).
   */
  def intCongestionMetrics(spark: SparkSession, dir: String): DataFrame = {
    // avg_speed is rounded HERE, not just at the output edge: downstream
    // marts re-average it (and congestion_index derives from it), so an
    // unrounded double lets summation-order ulps flip the final rounded
    // digit across environments. 6-digit-stable intermediates keep every
    // consumer's hash engine-independent (oracle speed_m CTE mirrors this).
    val speed = stgSpeed(spark, dir).groupBy("location_id", "recorded_hour")
      .agg(round(avg(col("speed")) + lit(1e-9), 6).as("avg_speed"),
        min(col("speed")).as("min_speed"),
        max(col("speed")).as("max_speed"),
        percentile(col("speed"), lit(0.5)).as("median_speed"),
        count(lit(1)).as("n_speed_readings"))
    val volume = stgVolume(spark, dir).groupBy("location_id", "recorded_hour")
      .agg(sum(col("vehicle_count")).as("total_volume"),
        avg(col("vehicle_count")).as("avg_volume"),
        max(col("lane_count")).as("lane_count"))
    val incidents = Npmrds.rawIncidents(spark, dir)
      .groupBy(col("location_id"),
        date_trunc("hour", col("start_time")).as("recorded_hour"))
      .agg(count(lit(1)).as("n_incidents"), max(col("severity")).as("max_severity"))
    val merged = Joins.fullOuter(speed, volume, Seq("location_id", "recorded_hour"))
      .join(incidents, Seq("location_id", "recorded_hour"), "left")
      .na.fill(0L, Seq("n_incidents"))
    val located = Joins.innerBroadcast(merged, Npmrds.locations(spark, dir),
      Seq("location_id"))
    located.withColumn("congestion_index",
      round(MetricExpr.congestionIndex(
        volume = col("total_volume"),
        speed = col("avg_speed"),
        speedLimit = col("speed_limit"),
        lanes = col("lanes").cast("double")) + lit(1e-9), 6))
  }

  /**
   * mart_daily_rankings (reference `5_dbt/READ.md:541-590`): daily mean
   * congestion per location, global RANK (W1) + QUALIFY top-10 (W5) with
   * ties kept, severity CASE buckets (P7).
   */
  def martDailyRankings(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val daily = intCongestionMetrics(spark, dir)
      .filter(col("congestion_index").isNotNull)
      .groupBy(col("location_id"), col("road_name"),
        to_date(col("recorded_hour")).as("day"))
      .agg(round(avg(col("congestion_index")) + lit(1e-9), 6).as("avg_daily_congestion"),
        round(max(col("congestion_index")) + lit(1e-9), 6).as("peak_congestion"),
        count(lit(1)).as("n_hours"))
    val ranked = daily.withColumn("congestion_rank",
      rank().over(Window.orderBy(desc("avg_daily_congestion"))).cast("long"))
    ranked.filter(col("congestion_rank") <= k)
      .withColumn("congestion_severity",
        when(col("avg_daily_congestion") >= 0.8, "Severe")
          .when(col("avg_daily_congestion") >= 0.5, "High")
          .when(col("avg_daily_congestion") >= 0.3, "Moderate")
          .otherwise("Low"))
  }

  /**
   * mart_hourly_patterns (reference `5_dbt/READ.md:602-650`): mean
   * congestion per (location, hour-of-day), PERCENT_RANK within the hour
   * (W3), rush-hour bucket labels (the time_buckets macro, P7).
   */
  def martHourlyPatterns(spark: SparkSession, dir: String): DataFrame = {
    val hourly = intCongestionMetrics(spark, dir)
      .filter(col("congestion_index").isNotNull)
      .groupBy(col("location_id"),
        hour(col("recorded_hour")).cast("long").as("hour_of_day"))
      .agg(round(avg(col("congestion_index")) + lit(1e-9), 6).as("avg_congestion"),
        round(avg(col("avg_speed")) + lit(1e-9), 6).as("avg_speed"),
        count(lit(1)).as("n_hours"))
    Windows.percentRank(hourly, Seq("hour_of_day"), "congestion_pctile",
        col("avg_congestion"))
      .withColumn("congestion_pctile", round(col("congestion_pctile") + lit(1e-9), 6))
      .withColumn("time_bucket",
        TimeExpr.timeBucket(make_timestamp(lit(2024), lit(1), lit(1),
          col("hour_of_day").cast("int"), lit(0), lit(0))))
  }

  /**
   * mart_weekly_trends (reference `5_dbt/READ.md:662-733`): daily volume
   * re-aggregated to day-of-week means (A8), RANK per day-of-week (W2),
   * day-name decode + weekend flag (P7/F2, DAYOFWEEK Sun=1 convention).
   */
  def martWeeklyVolume(spark: SparkSession, dir: String): DataFrame = {
    val daily = stgVolume(spark, dir)
      .groupBy(col("location_id"), to_date(col("recorded_hour")).as("day"))
      .agg(sum(col("vehicle_count")).as("daily_volume"))
    val weekly = daily
      .groupBy(col("location_id"), dayofweek(col("day")).cast("long").as("dow"))
      .agg(round(avg(col("daily_volume")) + lit(1e-9), 6).as("avg_daily_volume"),
        count(lit(1)).as("n_days"))
    Windows.rankBy(weekly, Seq("dow"), "volume_rank", desc("avg_daily_volume"))
      .withColumn("volume_rank", col("volume_rank").cast("long"))
      .withColumn("day_name",
        when(col("dow") === 1, "Sunday").when(col("dow") === 2, "Monday")
          .when(col("dow") === 3, "Tuesday").when(col("dow") === 4, "Wednesday")
          .when(col("dow") === 5, "Thursday").when(col("dow") === 6, "Friday")
          .otherwise("Saturday"))
      .withColumn("is_weekend", col("dow") === 1 || col("dow") === 7)
  }

  /**
   * int_location_analysis (reference `5_dbt/READ.md:479-529`): the wide
   * per-location stat block (A7) incl. COUNT(DISTINCT day) (A5) over the
   * joined location attributes.
   */
  /** Order-independent mean of an already-6-digit-rounded double: scale
    * to an exact BIGINT (×1e6), sum integers (associative — no
    * summation-order ulps), divide once. `avg(double)` over hundreds of
    * rows can land the 6th rounded digit on either side of a boundary
    * depending on partition/accumulation order — the one fp hazard the
    * per-hour rounding upstream cannot absorb, and the cause of two
    * rounds of environment-sensitive hash flips on this mart. */
  private def stableMean6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(sum(round(c * lit(1e6)).cast("long")).cast("double") /
      (count(c).cast("double") * lit(1e6)) + lit(1e-9), 6)

  def locationStats(spark: SparkSession, dir: String): DataFrame =
    intCongestionMetrics(spark, dir)
      .groupBy("location_id", "road_name", "road_type", "lanes", "speed_limit",
        "is_highway")
      .agg(stableMean6(col("avg_speed")).as("mean_speed"),
        stableMean6(col("congestion_index")).as("mean_congestion"),
        countDistinct(to_date(col("recorded_hour"))).as("active_days"),
        // integral-valued double sum → BIGINT so the hash is fp-free
        sum(col("total_volume")).cast("long").as("total_volume"),
        sum(col("n_incidents")).as("total_incidents"),
        count(lit(1)).as("n_hours"))
}
