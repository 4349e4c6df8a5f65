package graft.queries

import graft.pipelines._

/**
 * The five reference pipelines (SURVEY §3) registered end-to-end over the
 * NPMRDS-shaped fixture views (see [[graft.pipelines.Npmrds]]), each with
 * a full DuckDB oracle that rebuilds the same view chain in SQL.
 *
 * Ranking/ordering keys are 6-digit-rounded (+1e-9 half-boundary nudge)
 * on BOTH sides so top-k membership and tie groups are engine-stable.
 */
object PipelineQueries {

  /** events → travel-time fact (mirrors Npmrds.tt). */
  private val Tt =
    """tt AS (SELECT 'tmc_' || CAST(user_id % 50 AS VARCHAR) AS tmc_code,
      ts AS measurement_tstamp, value + 30.0 AS travel_time_seconds FROM events)"""

  /** range×nation → TMC dim (mirrors Npmrds.shp). */
  private val Shp =
    """shp AS (SELECT 'tmc_' || CAST(k AS VARCHAR) AS tmc_code, n_name AS county
      FROM range(50) t(k) JOIN nation ON n_nationkey = k % 25)"""

  /** The Tue–Sat period classifier (mirrors TimeExpr.period). */
  private def period(ts: String): String =
    s"""CASE WHEN isodow($ts) BETWEEN 2 AND 6 AND hour($ts) >= 6 AND hour($ts) < 10 THEN 'amp'
        WHEN isodow($ts) BETWEEN 2 AND 6 AND hour($ts) >= 10 AND hour($ts) < 16 THEN 'mid'
        WHEN isodow($ts) BETWEEN 2 AND 6 AND hour($ts) >= 16 AND hour($ts) < 20 THEN 'pmp'
        WHEN hour($ts) >= 6 AND hour($ts) < 20 THEN 'we' END"""

  /** Staged sensor views + hourly intermediate (mirrors CongestionMarts.*). */
  private val IntChain =
    """stg_speed AS (
        SELECT sensor_id AS location_id, date_trunc('hour', "timestamp") AS recorded_hour, speed
        FROM (SELECT user_id % 20 AS sensor_id, ts AS "timestamp",
                CASE WHEN value < 0 OR value > 120 THEN NULL ELSE value END AS speed,
                0.5 + (event_id % 50) / 100.0 AS confidence_score
              FROM events)
        WHERE confidence_score >= 0.5 AND speed IS NOT NULL),
      stg_volume AS (
        SELECT location_id, date_trunc('hour', recorded_time) AS recorded_hour,
               vehicle_count, lane_count
        FROM (SELECT user_id % 20 AS location_id, ts AS recorded_time,
                CASE WHEN event_id % 300 < 0 OR event_id % 300 > 10000 THEN NULL
                     ELSE CAST(event_id % 300 AS DOUBLE) END AS vehicle_count,
                user_id % 4 + 1 AS lane_count
              FROM events)
        WHERE vehicle_count IS NOT NULL),
      locations AS (
        SELECT n_nationkey AS location_id, n_name AS road_name,
               CASE WHEN n_nationkey % 3 = 0 THEN 'highway'
                    WHEN n_nationkey % 3 = 1 THEN 'arterial' ELSE 'local' END AS road_type,
               n_nationkey % 4 + 1 AS lanes,
               CAST(30 + (n_nationkey % 7) * 5 AS DOUBLE) AS speed_limit,
               n_nationkey % 3 = 0 AS is_highway
        FROM nation WHERE n_nationkey < 20),
      speed_m AS (
        SELECT location_id, recorded_hour,
               round(avg(speed) + 1e-9, 6) + 0 AS avg_speed, min(speed) AS min_speed,
               max(speed) AS max_speed, quantile_cont(speed, 0.5) AS median_speed,
               count(*) AS n_speed_readings
        FROM stg_speed GROUP BY 1, 2),
      vol_m AS (
        SELECT location_id, recorded_hour, sum(vehicle_count) AS total_volume,
               avg(vehicle_count) AS avg_volume, max(lane_count) AS lane_count
        FROM stg_volume GROUP BY 1, 2),
      inc AS (
        SELECT user_id % 20 AS location_id, date_trunc('hour', ts) AS recorded_hour,
               count(*) AS n_incidents, max(event_id % 4 + 1) AS max_severity
        FROM events WHERE event_type = 'error' GROUP BY 1, 2),
      merged AS (
        SELECT coalesce(s.location_id, v.location_id) AS location_id,
               coalesce(s.recorded_hour, v.recorded_hour) AS recorded_hour,
               avg_speed, min_speed, max_speed, median_speed, n_speed_readings,
               total_volume, avg_volume, lane_count
        FROM speed_m s FULL OUTER JOIN vol_m v
          ON s.location_id = v.location_id AND s.recorded_hour = v.recorded_hour),
      merged2 AS (
        SELECT m.*, coalesce(i.n_incidents, 0) AS n_incidents, i.max_severity
        FROM merged m LEFT JOIN inc i
          ON m.location_id = i.location_id AND m.recorded_hour = i.recorded_hour),
      intm AS (
        SELECT m.*, l.road_name, l.road_type, l.lanes, l.speed_limit, l.is_highway,
          round(CASE WHEN m.avg_speed IS NULL OR m.total_volume IS NULL THEN NULL
                WHEN m.avg_speed <= 0 THEN 1.0
                ELSE least((1.0 - m.avg_speed / nullif(l.speed_limit, 0)) *
                           (m.total_volume / nullif(2000.0 * l.lanes, 1)), 1.0)
                END + 1e-9, 6) + 0 AS congestion_index
        FROM merged2 m JOIN locations l USING (location_id))"""

  def defs: Seq[QueryDef] = Seq(

    // §3.1 AWS monthly Top-10 TTI/PTI (reference 1_AWS/README.md:69-120).
    QueryDef("pl_tti_monthly_top10", (s, dir) => TtiMonthly.run(s, dir),
      Some(s"""WITH $Tt, $Shp,
        base AS (SELECT tmc_code, travel_time_seconds,
            ${period("measurement_tstamp")} AS period
          FROM tt WHERE year(measurement_tstamp) = 2024 AND month(measurement_tstamp) = 1),
        pct AS (SELECT tmc_code, period,
            quantile_cont(travel_time_seconds, 0.5) AS tt50,
            quantile_cont(travel_time_seconds, 0.85) AS tt85,
            quantile_cont(travel_time_seconds, 0.95) AS tt95
          FROM base WHERE period IS NOT NULL GROUP BY 1, 2),
        m AS (SELECT tmc_code, period,
            round(tt85 / nullif(tt50, 0) + 1e-9, 6) AS tti,
            round(tt95 / nullif(tt50, 0) + 1e-9, 6) AS pti FROM pct)
        SELECT printf('%d-%02d', 2024, 1) AS analysis_period, tmc_code, county,
               period, tti, pti
        FROM m LEFT JOIN shp USING (tmc_code)
        WHERE county = 'NATION_3'
        ORDER BY tti DESC, tmc_code, period LIMIT 10""")),

    // §3 Azure yearly severity/variability Top-10 (reference 2_Azure/READ.md:50-107).
    QueryDef("pl_severity_top10", (s, dir) => SeverityVariability.run(s, dir),
      Some(s"""WITH $Tt,
        pct AS (SELECT tmc_code,
            quantile_cont(travel_time_seconds, 0.5) AS tt50,
            quantile_cont(travel_time_seconds, 0.85) AS tt85,
            quantile_cont(travel_time_seconds, 0.95) AS tt95
          FROM tt WHERE year(measurement_tstamp) = 2024 GROUP BY 1),
        m AS (SELECT tmc_code,
            round(tt85 / nullif(tt50, 0) + 1e-9, 6) AS tti,
            round(tt95 / nullif(tt50, 0) + 1e-9, 6) AS pti FROM pct),
        m2 AS (SELECT tmc_code, tti, pti,
            round((tti + pti) / 2 + 1e-9, 6) AS severity,
            round(pti / nullif(tti, 0) + 1e-9, 6) AS variability FROM m)
        SELECT CAST(2024 AS BIGINT) AS analysis_year, tmc_code, tti, pti,
               severity, variability
        FROM m2 ORDER BY severity DESC, tmc_code LIMIT 10""")),

    // §3.2 BigQuery TTI trends for the top-10 TMCs (reference 3_BigQuery/READ.md:47-116).
    QueryDef("pl_tti_trends", (s, dir) => TtiTrends.trends(s, dir),
      Some(s"""WITH $Tt,
        base AS (SELECT tmc_code, travel_time_seconds,
            CAST(measurement_tstamp AS DATE) AS day,
            ${period("measurement_tstamp")} AS period FROM tt),
        pct AS (SELECT tmc_code, day, period,
            quantile_cont(travel_time_seconds, 0.5) AS tt50,
            quantile_cont(travel_time_seconds, 0.85) AS tt85
          FROM base WHERE period IS NOT NULL GROUP BY 1, 2, 3),
        tti AS (SELECT tmc_code, day,
            round(tt85 / nullif(tt50, 0) + 1e-9, 6) AS tti FROM pct),
        top AS (SELECT tmc_code FROM (
            SELECT tmc_code, round(avg(tti) + 1e-9, 6) AS mean_tti
            FROM tti GROUP BY 1)
          ORDER BY mean_tti DESC, tmc_code LIMIT 10),
        daily AS (SELECT tmc_code, day, round(avg(tti) + 1e-9, 6) AS avg_tti
          FROM tti GROUP BY 1, 2)
        SELECT tmc_code, day, avg_tti,
          round(coalesce(avg_tti - lag(avg_tti)
            OVER (PARTITION BY tmc_code ORDER BY day), 0) + 1e-9, 6) AS tti_change
        FROM daily WHERE tmc_code IN (SELECT tmc_code FROM top)""")),

    // §3.2 exceedance rates (reference 3_BigQuery/READ.md:119-124).
    QueryDef("pl_tti_exceedance", (s, dir) => TtiTrends.exceedance(s, dir),
      Some(s"""WITH $Tt,
        base AS (SELECT tmc_code, travel_time_seconds,
            CAST(measurement_tstamp AS DATE) AS day,
            ${period("measurement_tstamp")} AS period FROM tt),
        pct AS (SELECT tmc_code, day, period,
            quantile_cont(travel_time_seconds, 0.5) AS tt50,
            quantile_cont(travel_time_seconds, 0.85) AS tt85
          FROM base WHERE period IS NOT NULL GROUP BY 1, 2, 3),
        tti AS (SELECT tmc_code,
            round(tt85 / nullif(tt50, 0) + 1e-9, 6) AS tti FROM pct)
        SELECT tmc_code,
          round(avg(CASE WHEN tti > 1.5 THEN 1.0 ELSE 0.0 END) + 1e-9, 6) AS exceed_rate,
          count(*) AS n_cells
        FROM tti GROUP BY 1""")),

    // §3 Snowflake LOTTR pivot (reference 4_Snowflake/READ.md:72-91).
    QueryDef("pl_lottr_pivot", (s, dir) => LottrYearly.pivoted(s, dir),
      Some(s"""WITH $Tt,
        base AS (SELECT tmc_code, travel_time_seconds,
            ${period("measurement_tstamp")} AS period
          FROM tt WHERE year(measurement_tstamp) = 2024),
        pct AS (SELECT tmc_code, period,
            quantile_cont(travel_time_seconds, 0.8) AS tt80,
            quantile_cont(travel_time_seconds, 0.5) AS tt50
          FROM base WHERE period IS NOT NULL GROUP BY 1, 2),
        l AS (SELECT tmc_code, period,
            round(tt80 / nullif(tt50, 0) + 1e-9, 6) AS lottr FROM pct)
        SELECT tmc_code,
          coalesce(max(CASE WHEN period = 'amp' THEN lottr END), 0) AS lottr_amp,
          coalesce(max(CASE WHEN period = 'mid' THEN lottr END), 0) AS lottr_mid,
          coalesce(max(CASE WHEN period = 'pmp' THEN lottr END), 0) AS lottr_pmp,
          coalesce(max(CASE WHEN period = 'we' THEN lottr END), 0) AS lottr_we
        FROM l GROUP BY 1""")),

    // §3 Snowflake per-day reliability summary + pct_change
    // (reference 4_Snowflake/READ.md:99-118).
    QueryDef("pl_lottr_daily_summary", (s, dir) => LottrYearly.dailySummary(s, dir),
      Some(s"""WITH $Tt,
        amp AS (SELECT CAST(measurement_tstamp AS DATE) AS day, travel_time_seconds
          FROM tt WHERE year(measurement_tstamp) = 2024
            AND ${period("measurement_tstamp")} = 'amp'),
        d AS (SELECT day,
            round(quantile_cont(travel_time_seconds, 0.8) /
              nullif(quantile_cont(travel_time_seconds, 0.5), 0) + 1e-9, 6) AS lottr_amp
          FROM amp GROUP BY 1)
        SELECT day, lottr_amp,
          round(coalesce((lottr_amp - lag(lottr_amp) OVER (ORDER BY day)) /
            lag(lottr_amp) OVER (ORDER BY day), 0) + 1e-9, 6) AS lottr_change
        FROM d""")),

    // §3.3 dbt mart: daily congestion rankings (reference 5_dbt/READ.md:541-590).
    QueryDef("pl_mart_daily_rankings", (s, dir) => CongestionMarts.martDailyRankings(s, dir),
      Some(s"""WITH $IntChain,
        daily AS (SELECT location_id, road_name, CAST(recorded_hour AS DATE) AS day,
            round(avg(congestion_index) + 1e-9, 6) AS avg_daily_congestion,
            round(max(congestion_index) + 1e-9, 6) AS peak_congestion,
            count(*) AS n_hours
          FROM intm WHERE congestion_index IS NOT NULL GROUP BY 1, 2, 3),
        ranked AS (SELECT *, rank() OVER (ORDER BY avg_daily_congestion DESC)
            AS congestion_rank FROM daily)
        SELECT location_id, road_name, day, avg_daily_congestion, peak_congestion,
          n_hours, congestion_rank,
          CASE WHEN avg_daily_congestion >= 0.8 THEN 'Severe'
               WHEN avg_daily_congestion >= 0.5 THEN 'High'
               WHEN avg_daily_congestion >= 0.3 THEN 'Moderate'
               ELSE 'Low' END AS congestion_severity
        FROM ranked WHERE congestion_rank <= 10""")),

    // §3.3 dbt mart: hourly patterns + PERCENT_RANK (reference 5_dbt/READ.md:602-650).
    QueryDef("pl_mart_hourly_patterns", (s, dir) => CongestionMarts.martHourlyPatterns(s, dir),
      Some(s"""WITH $IntChain,
        hourly AS (SELECT location_id, hour(recorded_hour) AS hour_of_day,
            round(avg(congestion_index) + 1e-9, 6) AS avg_congestion,
            round(avg(avg_speed) + 1e-9, 6) AS avg_speed,
            count(*) AS n_hours
          FROM intm WHERE congestion_index IS NOT NULL GROUP BY 1, 2)
        SELECT location_id, hour_of_day, avg_congestion, avg_speed, n_hours,
          round(percent_rank() OVER (PARTITION BY hour_of_day ORDER BY avg_congestion)
            + 1e-9, 6) AS congestion_pctile,
          CASE WHEN hour_of_day BETWEEN 6 AND 9 THEN 'Morning Rush (6-9am)'
               WHEN hour_of_day BETWEEN 15 AND 18 THEN 'Evening Rush (3-6pm)'
               WHEN hour_of_day BETWEEN 11 AND 13 THEN 'Midday (11am-1pm)'
               WHEN hour_of_day BETWEEN 19 AND 22 THEN 'Evening (7-10pm)'
               WHEN hour_of_day BETWEEN 22 AND 24 OR hour_of_day BETWEEN 0 AND 5
                 THEN 'Overnight (10pm-5am)'
               ELSE 'Other Daytime' END AS time_bucket
        FROM hourly""")),

    // §3.3 dbt mart: weekly volume trends (reference 5_dbt/READ.md:662-733).
    QueryDef("pl_mart_weekly_volume", (s, dir) => CongestionMarts.martWeeklyVolume(s, dir),
      Some(s"""WITH $IntChain,
        dailyv AS (SELECT location_id, CAST(recorded_hour AS DATE) AS day,
            sum(vehicle_count) AS daily_volume
          FROM stg_volume GROUP BY 1, 2),
        weekly AS (SELECT location_id, dayofweek(day) + 1 AS dow,
            round(avg(daily_volume) + 1e-9, 6) AS avg_daily_volume,
            count(*) AS n_days
          FROM dailyv GROUP BY 1, 2)
        SELECT location_id, dow, avg_daily_volume, n_days,
          rank() OVER (PARTITION BY dow ORDER BY avg_daily_volume DESC) AS volume_rank,
          CASE dow WHEN 1 THEN 'Sunday' WHEN 2 THEN 'Monday' WHEN 3 THEN 'Tuesday'
               WHEN 4 THEN 'Wednesday' WHEN 5 THEN 'Thursday' WHEN 6 THEN 'Friday'
               ELSE 'Saturday' END AS day_name,
          dow = 1 OR dow = 7 AS is_weekend
        FROM weekly""")),

    // §3.3 dbt intermediate: wide per-location stats (reference 5_dbt/READ.md:479-529).
    QueryDef("pl_mart_location_stats", (s, dir) => CongestionMarts.locationStats(s, dir),
      Some(s"""WITH $IntChain
        SELECT location_id, road_name, road_type, lanes, speed_limit, is_highway,
          round(sum(CAST(round(avg_speed * 1000000) AS BIGINT))
            / (count(avg_speed) * 1000000.0) + 1e-9, 6) AS mean_speed,
          round(sum(CAST(round(congestion_index * 1000000) AS BIGINT))
            / (count(congestion_index) * 1000000.0) + 1e-9, 6) AS mean_congestion,
          count(DISTINCT CAST(recorded_hour AS DATE)) AS active_days,
          CAST(sum(total_volume) AS BIGINT) AS total_volume,
          CAST(sum(n_incidents) AS BIGINT) AS total_incidents,
          count(*) AS n_hours
        FROM intm GROUP BY 1, 2, 3, 4, 5, 6""")),

    // SCD2 writer ↔ temporal-join round trip (r11 stretch): the
    // s16 snapshot writer's OUTPUT feeds the j17 temporal join directly
    // as one pipeline — snapshot twice with changed/deleted/new rows
    // between, then probe every history key at one date inside each
    // run's validity window. Proves the writer's (valid_from, valid_to,
    // is_current] intervals are exactly what the join consumes: the
    // January probe must see run-1 state (and MISS keys first seen in
    // run 2), the February probe must see the current state. The
    // versioned history is dimension-cardinality × versions, so it
    // broadcasts and the probe side never shuffles. The oracle rebuilds
    // the expected history algebraically (the s16 oracle's CTEs) and
    // runs the identical interval join; ISO date strings compare
    // lexicographically in both engines.
    QueryDef("pl_scd2_roundtrip", (s, dir) => {
      import org.apache.spark.sql.functions._
      import graft.core.Materialize._
      val name = "graft_pl_snap_orders"
      dropWithLocation(s, name)
      val base = graft.core.Tables.orders(s, dir)
        .filter(col("o_orderkey") % 50 === 0)
        .select("o_orderkey", "o_orderstatus")
      val state2 = base.filter(col("o_orderkey") % 7 =!= 0)
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 3 === 0, lit("X"))
            .otherwise(col("o_orderstatus")))
        .unionByName(graft.core.Tables.orders(s, dir)
          .filter(col("o_orderkey") % 50 === 1)
          .select("o_orderkey", "o_orderstatus"))
      snapshot(s, name, base, Seq("o_orderkey"), Seq("o_orderstatus"),
        "2024-01-01")
      val hist = snapshot(s, name, state2, Seq("o_orderkey"),
        Seq("o_orderstatus"), "2024-02-01")
      val probes = hist.select("o_orderkey").distinct()
        .select(col("o_orderkey"),
          explode(typedLit(Seq("2024-01-15", "2024-02-15"))).as("probe_date"))
      probes.join(broadcast(hist.alias("h")),
          probes("o_orderkey") === col("h.o_orderkey") &&
            col("h.valid_from") <= col("probe_date") &&
            (col("h.valid_to").isNull ||
              col("probe_date") < col("h.valid_to")))
        .select(probes("o_orderkey"), col("probe_date"),
          col("h.o_orderstatus").as("o_orderstatus"),
          col("h.is_current").as("is_current"))
    }, Some("""WITH s1 AS (
        SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 50 = 0),
      s2 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN 'X' ELSE o_orderstatus END
                 AS o_orderstatus
        FROM orders WHERE o_orderkey % 50 = 0 AND o_orderkey % 7 <> 0
        UNION ALL
        SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 50 = 1),
      changed AS (
        SELECT s1.o_orderkey FROM s1 JOIN s2 USING (o_orderkey)
        WHERE s1.o_orderstatus IS DISTINCT FROM s2.o_orderstatus),
      hist AS (
        SELECT s1.o_orderkey, s1.o_orderstatus, '2024-01-01' AS valid_from,
               '2024-02-01' AS valid_to, false AS is_current
        FROM s1 JOIN changed USING (o_orderkey)
        UNION ALL
        SELECT s2.o_orderkey, s2.o_orderstatus, '2024-02-01', NULL, true
        FROM s2 JOIN changed USING (o_orderkey)
        UNION ALL
        SELECT o_orderkey, o_orderstatus, '2024-01-01', NULL, true
        FROM s1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changed)
        UNION ALL
        SELECT o_orderkey, o_orderstatus, '2024-02-01', NULL, true
        FROM s2 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM s1)),
      probes AS (
        SELECT o_orderkey, unnest(['2024-01-15', '2024-02-15']) AS probe_date
        FROM (SELECT DISTINCT o_orderkey FROM hist))
      SELECT p.o_orderkey, p.probe_date, h.o_orderstatus, h.is_current
      FROM probes p JOIN hist h ON p.o_orderkey = h.o_orderkey
        AND h.valid_from <= p.probe_date
        AND (h.valid_to IS NULL OR p.probe_date < h.valid_to)"""))
  )
}
