package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/**
 * NPMRDS-shaped adapter views over the driver fixtures.
 *
 * The reference pipelines consume travel-time / sensor tables
 * (`tt`, `shp`, `raw_speed_data`, `raw_volume_data`, `raw_location_data`
 * — reference `1_AWS/README.md:75,106-109`, `5_dbt/READ.md:150-293`)
 * that don't exist in the fixture set, so each is DERIVED from `events`
 * and `nation` with deterministic arithmetic — reproducible by the
 * DuckDB oracle from the same parquet, no synthetic data written.
 *
 * Shapes: 50 TMCs / 20 sensor locations keyed off `user_id`, readings
 * keyed off `value` (travel time = value+30s, speed = value sanitized to
 * [0,120]), volumes off `event_id`.
 */
object Npmrds {

  /** Travel-time fact (reference `1_AWS/README.md:75,95-98`). */
  def tt(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      concat(lit("tmc_"), (col("user_id") % 50).cast("string")).as("tmc_code"),
      col("ts").as("measurement_tstamp"),
      (col("value") + lit(30d)).as("travel_time_seconds"))

  /** TMC identification dimension (reference `1_AWS/README.md:106-109`). */
  def shp(spark: SparkSession, dir: String): DataFrame = {
    val tmcs = spark.range(50).select(col("id").as("k"))
    val nat = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name").as("county"))
    tmcs.join(broadcast(nat), (col("k") % 25) === col("n_nationkey"))
      .select(concat(lit("tmc_"), col("k").cast("string")).as("tmc_code"),
        col("county"))
  }

  /** Raw speed-sensor feed (reference `5_dbt/READ.md:198-206`). */
  def rawSpeed(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      (col("user_id") % 20).as("sensor_id"),
      col("ts").as("timestamp"),
      col("value").as("speed"),
      (col("event_id") % 200).as("vehicle_count"),
      (lit(0.5) + (col("event_id") % 50).cast("double") / 100d).as("confidence_score"))

  /** Raw volume feed (reference `5_dbt/READ.md:150-159`). */
  def rawVolume(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      (col("user_id") % 20).as("location_id"),
      col("ts").as("recorded_time"),
      (col("event_id") % 300).as("vehicle_count"),
      col("value").as("average_speed"),
      (col("user_id") % 4 + 1).as("lane_count"))

  /** Location dimension (reference `5_dbt/READ.md:276-293`). */
  def locations(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir).filter(col("n_nationkey") < 20).select(
      col("n_nationkey").as("location_id"),
      col("n_name").as("road_name"),
      when(col("n_nationkey") % 3 === 0, "highway")
        .when(col("n_nationkey") % 3 === 1, "arterial")
        .otherwise("local").as("road_type"),
      (col("n_nationkey") % 4 + 1).as("lanes"),
      (lit(30) + (col("n_nationkey") % 7) * 5).cast("double").as("speed_limit"),
      (col("n_nationkey") % 3 === 0).as("is_highway"))

  /** Incident feed derived from error events (reference `5_dbt/READ.md:242-250`). */
  def rawIncidents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).filter(col("event_type") === "error").select(
      col("event_id").as("incident_id"),
      (col("user_id") % 20).as("location_id"),
      col("ts").as("start_time"),
      (col("event_id") % 4 + 1).as("severity"))
}
