package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Windows

/**
 * SURVEY §2.5 windows (W1-W7), §2.6 sorts/top-k (T1-T5) and §2.7 set ops
 * (U1-U2) as oracle-checkable queries.
 *
 * Every top-k carries a unique tiebreak key in BOTH engines' orderings
 * (SURVEY §7.4.3); rank-based QUALIFY entries deliberately have NO
 * tiebreak — equal ranks are kept on both sides, which is the semantics
 * difference T4 exists to pin down.
 */
object WindowQueries {

  def defs: Seq[QueryDef] = Seq(

    // W1: global RANK over an aggregated (small) frame (reference 5_dbt/READ.md:581).
    QueryDef("w1_rank_global", (s, dir) => {
      val bySeg = Tables.customer(s, dir).groupBy("c_mktsegment")
        .agg(round(avg(col("c_acctbal")), 4).as("avg_bal"))
      Windows.rankGlobal(bySeg, "bal_rank", desc("avg_bal"))
        .withColumn("bal_rank", col("bal_rank").cast("long"))
    }, Some("""SELECT c_mktsegment, round(avg(c_acctbal), 4) AS avg_bal,
      rank() OVER (ORDER BY round(avg(c_acctbal), 4) DESC) AS bal_rank
      FROM customer GROUP BY c_mktsegment""")),

    // W2: partitioned RANK (reference 5_dbt/READ.md:721).
    QueryDef("w2_rank_partitioned", (s, dir) =>
      Windows.rankBy(Tables.customer(s, dir), Seq("c_mktsegment"), "bal_rank",
        desc("c_acctbal"))
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          col("bal_rank").cast("long").as("bal_rank")),
      Some("""SELECT c_custkey, c_mktsegment, c_acctbal,
        rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS bal_rank
        FROM customer""")),

    // W3: PERCENT_RANK (reference 5_dbt/READ.md:630).
    QueryDef("w3_percent_rank", (s, dir) =>
      Windows.percentRank(Tables.events(s, dir), Seq("event_type"), "pr",
        col("value"))
        .select(col("event_id"), col("event_type"),
          round(col("pr"), 6).as("pr")),
      Some("""SELECT event_id, event_type,
        round(percent_rank() OVER (PARTITION BY event_type ORDER BY value), 6) AS pr
        FROM events""")),

    // W4: PERCENTILE_CONT window == group-key percentile aggregate
    // (reference 5_dbt/READ.md:403).
    QueryDef("w4_median_in_group", (s, dir) =>
      Windows.medianInGroup(Tables.events(s, dir), Seq("event_type"), "value",
        extraAggs = Seq(round(avg(col("value")), 6).as("avg_value"),
          count(lit(1)).as("n")))
        .withColumn("median_value", round(col("median_value"), 6)),
      Some("""SELECT event_type, round(quantile_cont(value, 0.5), 6) AS median_value,
        round(avg(value), 6) AS avg_value, count(*) AS n
        FROM events GROUP BY event_type""")),

    // W5/T4: QUALIFY rank <= k, tie-keeping (reference 5_dbt/READ.md:587-588).
    QueryDef("w5_qualify_topk", (s, dir) =>
      Windows.qualifyTopK(Tables.part(s, dir), Seq("p_brand"), 3,
        desc("p_retailprice"))
        .select("p_partkey", "p_brand", "p_retailprice"),
      Some("""SELECT p_partkey, p_brand, p_retailprice FROM (
        SELECT p_partkey, p_brand, p_retailprice,
          rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rk
        FROM part) WHERE rk <= 3""")),

    // W6: per-group lag diff, first row -> 0 (reference 3_BigQuery/READ.md:113-114).
    QueryDef("w6_lag_diff", (s, dir) => {
      val yearly = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("custkey"),
          year(col("o_orderdate")).cast("long").as("yr"))
        .agg(count(lit(1)).cast("double").as("n_orders"))
      Windows.lagDiff(yearly, Seq("custkey"), "yr", "n_orders", "yoy_diff")
    }, Some("""WITH yearly AS (
        SELECT o_custkey AS custkey, year(o_orderdate) AS yr,
          CAST(count(*) AS DOUBLE) AS n_orders
        FROM orders GROUP BY 1, 2)
      SELECT custkey, yr, n_orders,
        coalesce(n_orders - lag(n_orders) OVER (PARTITION BY custkey ORDER BY yr), 0)
          AS yoy_diff
      FROM yearly""")),

    // W7: pct_change over a year-ordered series (reference 4_Snowflake/READ.md:115-118).
    QueryDef("w7_pct_change", (s, dir) => {
      val yearly = Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(round(avg(col("o_totalprice")), 4).as("avg_price"))
      Windows.pctChange(yearly, Nil, "yr", "avg_price", "pct_change")
        .withColumn("pct_change", round(col("pct_change"), 6))
    }, Some("""WITH yearly AS (
        SELECT year(o_orderdate) AS yr, round(avg(o_totalprice), 4) AS avg_price
        FROM orders GROUP BY 1)
      SELECT yr, avg_price,
        round(coalesce((avg_price - lag(avg_price) OVER (ORDER BY yr)) /
          lag(avg_price) OVER (ORDER BY yr), 0), 6) AS pct_change
      FROM yearly""")),

    // T1: sort desc + limit 10, unique tiebreak (reference 1_AWS/README.md:112-113).
    QueryDef("t1_topk", (s, dir) =>
      Windows.topK(Tables.orders(s, dir), 10, desc("o_totalprice"), col("o_orderkey"))
        .select("o_orderkey", "o_totalprice"),
      Some("SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10")),

    // T2: nlargest (reference 2_Azure/READ.md:82).
    QueryDef("t2_nlargest", (s, dir) =>
      Windows.topK(Tables.part(s, dir), 10, desc("p_retailprice"), col("p_partkey"))
        .select("p_partkey", "p_retailprice"),
      Some("SELECT p_partkey, p_retailprice FROM part " +
        "ORDER BY p_retailprice DESC, p_partkey LIMIT 10")),

    // T3: top-k on a grouped mean (reference 3_BigQuery/READ.md:109).
    QueryDef("t3_topk_grouped_mean", (s, dir) => {
      val avgQty = Tables.lineitem(s, dir).groupBy("l_partkey")
        .agg(round(avg(col("l_quantity")), 6).as("avg_qty"))
      Windows.topK(avgQty, 10, desc("avg_qty"), col("l_partkey"))
    }, Some("""SELECT l_partkey, round(avg(l_quantity), 6) AS avg_qty FROM lineitem
      GROUP BY l_partkey ORDER BY avg_qty DESC, l_partkey LIMIT 10""")),

    // T4: RANK+QUALIFY on an integer column with real ties — the
    // tie-KEEPING semantics vs T1's exactly-k (reference 5_dbt/READ.md:581,587-588).
    QueryDef("t4_rank_ties", (s, dir) =>
      Windows.qualifyTopK(Tables.part(s, dir), Seq("p_brand"), 2, desc("p_size"))
        .select(col("p_partkey"), col("p_brand"), col("p_size").cast("long").as("p_size")),
      Some("""SELECT p_partkey, p_brand, CAST(p_size AS BIGINT) AS p_size FROM (
        SELECT p_partkey, p_brand, p_size,
          rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS rk
        FROM part) WHERE rk <= 2""")),

    // T6 (scale path): per-key top-k via the map-side-combining
    // aggregator — only per-partition winners shuffle, vs the window
    // form that shuffles every row. Exactly-k row_number semantics; the
    // oracle is the equivalent ROW_NUMBER query.
    QueryDef("t6_topk_aggregated", (s, dir) =>
      graft.functions.TopKAggregator.topKPerKey(
        Tables.part(s, dir), Seq("p_brand"),
        scoreCol = col("p_retailprice"), idCol = col("p_partkey"), k = 3,
        scoreName = "p_retailprice", idName = "p_partkey"),
      Some("""SELECT p_brand, p_retailprice, p_partkey FROM (
        SELECT p_brand, p_retailprice, CAST(p_partkey AS BIGINT) AS p_partkey,
          row_number() OVER (PARTITION BY p_brand
            ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part) WHERE rn <= 3""")),

    // T5: presentation ORDER BY before write (reference 5_dbt/READ.md:589-590).
    QueryDef("t5_order_by", (s, dir) =>
      Tables.customer(s, dir).orderBy(desc("c_acctbal"), col("c_custkey"))
        .select("c_custkey", "c_name", "c_acctbal"),
      Some("SELECT c_custkey, c_name, c_acctbal FROM customer " +
        "ORDER BY c_acctbal DESC, c_custkey")),

    // W8 (extension): rolling mean over an explicit frame spec — the
    // reference uses only default frames (SURVEY §2.5 note); rolling
    // windows are table stakes for a general engine.
    QueryDef("w8_rolling_avg", (s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).cast("double").as("n"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("d"))
        .rowsBetween(-6, 0)
      daily.withColumn("rolling_7d_avg", round(avg(col("n")).over(w) + lit(1e-9), 6))
    }, Some("""WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, CAST(count(*) AS DOUBLE) AS n
        FROM orders GROUP BY 1)
      SELECT d, n, round(avg(n) OVER (ORDER BY d
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) + 1e-9, 6) AS rolling_7d_avg
      FROM daily""")),

    // W9 (extension): NTILE quartiles within a partition.
    QueryDef("w9_ntile", (s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        ntile(4).over(org.apache.spark.sql.expressions.Window
          .partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal"), col("c_custkey"))).cast("long")
          .as("bal_quartile")),
      Some("""SELECT c_custkey, c_mktsegment, c_acctbal,
        ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
          AS bal_quartile FROM customer""")),

    // W10 (extension): LEAD — gap to the user's next event.
    QueryDef("w10_lead_gap", (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir).select(
        col("event_id"), col("user_id"),
        (lead(col("ts"), 1).over(w).cast("double") - col("ts").cast("double"))
          .as("gap_sec"))
        .withColumn("gap_sec", round(col("gap_sec") + lit(1e-9), 6))
    }, Some("""SELECT event_id, user_id,
        round(date_diff('microsecond', ts,
          lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) / 1000000.0
          + 1e-9, 6) AS gap_sec
      FROM events""")),

    // U1: union-all of homogeneous yearly frames (reference 3_BigQuery/READ.md:89,95).
    QueryDef("u1_union_all", (s, dir) => {
      val li = Tables.lineitem(s, dir)
      def slice(yr: Int) = li.filter(year(col("l_shipdate")) === yr)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          lit(yr.toLong).as("yr"))
      slice(1996).unionByName(slice(1997))
    }, Some("""SELECT l_orderkey, l_linenumber, l_quantity, 1996 AS yr FROM lineitem
        WHERE year(l_shipdate) = 1996
      UNION ALL
      SELECT l_orderkey, l_linenumber, l_quantity, 1997 AS yr FROM lineitem
        WHERE year(l_shipdate) = 1997""")),

    // U3/U4 (extension): INTERSECT / EXCEPT distinct set semantics —
    // absent from the reference (SURVEY §2.7) but core engine surface.
    // W11 (extension): gap-based sessionization in BATCH (the batch twin
    // of streaming mapGroupsWithState): a session starts when the
    // per-user event gap exceeds 30 min; session index = running count of
    // starts. One shuffle on user_id; both window passes share it.
    // Gap/duration arithmetic is integer floor-seconds on BOTH sides:
    // Spark `cast(ts as long)` == DuckDB `epoch_us(ts) // 1000000`. The
    // oracle deliberately avoids date_diff('second', ...) — its
    // boundary-crossing semantics on sub-second (ns-precision parquet)
    // timestamps vary by engine version, while epoch µs floor-division
    // is single-semantics everywhere (same class of divergence the w12
    // oracle dodges with real INTERVAL compares). Window order is pinned
    // to µs (epoch_us) so an ns-reading oracle sorts like Spark.
    // session_idx is CAST to BIGINT in the oracle: DuckDB's windowed
    // sum(INTEGER) returns HUGEINT, which pandas-based comparators
    // convert to float64 ("3.000000" vs Spark's int64 "3" → hash
    // mismatch even with identical values). Every oracle integer sum
    // must be wrapped this way; tools/dtype_parity.py enforces it.
    QueryDef("w11_sessionize_batch", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val ev = Tables.events(s, dir).select("user_id", "event_id", "ts")
      val flagged = ev.withColumn("gap_start",
        when(lag(col("ts"), 1).over(byUser).isNull ||
          col("ts").cast("long") - lag(col("ts"), 1).over(byUser).cast("long") > 1800L,
          1L).otherwise(0L))
      flagged
        .withColumn("session_idx", sum(col("gap_start")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          (max(col("ts")).cast("long") - min(col("ts")).cast("long"))
            .as("duration_sec"))
    }, Some("""WITH flagged AS (SELECT user_id, event_id,
          epoch_us(ts) AS ts_us,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR (epoch_us(ts) // 1000000)
                    - (epoch_us(lag(ts) OVER w) // 1000000) > 1800 THEN 1
               ELSE 0 END AS gap_start
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      sess AS (SELECT *, CAST(sum(gap_start) OVER (PARTITION BY user_id
          ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        FROM flagged)
      SELECT user_id, session_idx, count(*) AS n_events,
        CAST(max(ts_us // 1000000) - min(ts_us // 1000000) AS BIGINT) AS duration_sec
      FROM sess GROUP BY 1, 2""")),

    // W15 (extension): NTH_VALUE over the full partition frame — frame
    // explicit on both sides because the default frame stops at the
    // current row (the same trap as last_value, W13).
    QueryDef("w15_nth_value", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("c_nationkey")
        .orderBy(desc("c_acctbal"), col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"),
        nth_value(col("c_name"), 2).over(w).as("second_richest"))
    }, Some("""SELECT c_custkey, c_nationkey,
        nth_value(c_name, 2) OVER (PARTITION BY c_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          AS second_richest
      FROM customer""")),

    // W16 (extension): RANGE frame over a numeric order key — peers are
    // VALUE-based (all rows within 500 cents), so the frame is
    // tie-insensitive by construction; the summed measure is integer
    // cents so the window sum is exact in any accumulation order.
    QueryDef("w16_range_frame", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cents = round(col("c_acctbal") * 100).cast("long")
      val w = Window.partitionBy("c_nationkey").orderBy(col("bal_cents"))
        .rangeBetween(-50000L, 0L)
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"), cents.as("bal_cents"))
        .withColumn("nearby_sum_cents", sum(col("bal_cents")).over(w))
    }, Some("""SELECT c_custkey, c_nationkey, bal_cents,
        CAST(sum(bal_cents) OVER (PARTITION BY c_nationkey ORDER BY bal_cents
          RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS BIGINT)
          AS nearby_sum_cents
      FROM (SELECT c_custkey, c_nationkey,
          CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer)""")),

    // W17 (extension): LOCF gap-fill — resample a sparse per-location
    // daily series onto a contiguous day spine and carry the last
    // observation forward (the sensor-feed repair idiom: date spine ×
    // dimension cross, left join, last_value IGNORE NULLS). Gaps are
    // carved deterministically so both engines fill the same holes; days
    // before a location's first observation stay NULL by design.
    QueryDef("w17_locf_gapfill", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = graft.pipelines.CongestionMarts.stgVolume(s, dir)
        .groupBy(col("location_id"), to_date(col("recorded_hour")).as("day"))
        .agg(sum(col("vehicle_count")).cast("long").as("volume"))
        .filter(dayofmonth(col("day")) % (col("location_id") + 2) =!= 0)
      val spine = s.range(1).select(explode(sequence(
          to_date(lit("2024-01-01")), to_date(lit("2024-01-30")),
          expr("interval 1 day"))).as("day"))
        .crossJoin(daily.select("location_id").distinct())
      spine.join(daily, Seq("location_id", "day"), "left")
        .withColumn("volume_filled",
          last(col("volume"), ignoreNulls = true).over(
            Window.partitionBy("location_id").orderBy("day")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("location_id"), col("day"), col("volume_filled"))
    }, Some("""WITH stg_volume AS (
        SELECT location_id, date_trunc('hour', recorded_time) AS recorded_hour,
               vehicle_count
        FROM (SELECT user_id % 20 AS location_id, ts AS recorded_time,
                CASE WHEN event_id % 300 < 0 OR event_id % 300 > 10000 THEN NULL
                     ELSE CAST(event_id % 300 AS DOUBLE) END AS vehicle_count
              FROM events)
        WHERE vehicle_count IS NOT NULL),
      daily AS (SELECT location_id, CAST(recorded_hour AS DATE) AS day,
          CAST(sum(vehicle_count) AS BIGINT) AS volume
        FROM stg_volume GROUP BY 1, 2),
      gapped AS (SELECT * FROM daily
        WHERE day(day) % (location_id + 2) <> 0),
      spine AS (SELECT locs.location_id, d.day
        FROM (SELECT DISTINCT location_id FROM gapped) locs
        CROSS JOIN (SELECT CAST(unnest(generate_series(DATE '2024-01-01',
          DATE '2024-01-30', INTERVAL 1 DAY)) AS DATE) AS day) d)
      SELECT spine.location_id, spine.day,
        last_value(gapped.volume IGNORE NULLS) OVER (
          PARTITION BY spine.location_id ORDER BY spine.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS volume_filled
      FROM spine LEFT JOIN gapped
        ON spine.location_id = gapped.location_id AND spine.day = gapped.day""")),

    // W18 (extension): linear-interpolation gap-fill — the numeric twin
    // of W17's LOCF: missing days get the value interpolated between the
    // surrounding observations (sensor repair / resampling idiom). Days
    // outside the observed range stay NULL. Four window passes share one
    // shuffle on location_id.
    QueryDef("w18_interp_gapfill", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = graft.pipelines.CongestionMarts.stgVolume(s, dir)
        .groupBy(col("location_id"), to_date(col("recorded_hour")).as("day"))
        .agg(sum(col("vehicle_count")).cast("long").as("volume"))
        .filter(dayofmonth(col("day")) % (col("location_id") + 2) =!= 0)
      val spine = s.range(1).select(explode(sequence(
          to_date(lit("2024-01-01")), to_date(lit("2024-01-30")),
          expr("interval 1 day"))).as("day"))
        .crossJoin(daily.select("location_id").distinct())
      val back = Window.partitionBy("location_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = Window.partitionBy("location_id").orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      spine.join(daily, Seq("location_id", "day"), "left")
        .withColumn("pv", last(col("volume"), ignoreNulls = true).over(back))
        .withColumn("pd", last(when(col("volume").isNotNull, col("day")),
          ignoreNulls = true).over(back))
        .withColumn("nv", first(col("volume"), ignoreNulls = true).over(fwd))
        .withColumn("nd", first(when(col("volume").isNotNull, col("day")),
          ignoreNulls = true).over(fwd))
        .withColumn("volume_interp",
          when(col("volume").isNotNull, col("volume").cast("double"))
            .when(col("pv").isNotNull && col("nv").isNotNull,
              col("pv") + (col("nv") - col("pv")) *
                datediff(col("day"), col("pd")) /
                datediff(col("nd"), col("pd"))))
        .select(col("location_id"), col("day"),
          round(col("volume_interp") + lit(1e-9), 6).as("volume_interp"))
    }, Some("""WITH stg_volume AS (
        SELECT location_id, date_trunc('hour', recorded_time) AS recorded_hour,
               vehicle_count
        FROM (SELECT user_id % 20 AS location_id, ts AS recorded_time,
                CASE WHEN event_id % 300 < 0 OR event_id % 300 > 10000 THEN NULL
                     ELSE CAST(event_id % 300 AS DOUBLE) END AS vehicle_count
              FROM events)
        WHERE vehicle_count IS NOT NULL),
      daily AS (SELECT location_id, CAST(recorded_hour AS DATE) AS day,
          CAST(sum(vehicle_count) AS BIGINT) AS volume
        FROM stg_volume GROUP BY 1, 2),
      gapped AS (SELECT * FROM daily
        WHERE day(day) % (location_id + 2) <> 0),
      spine AS (SELECT locs.location_id, d.day
        FROM (SELECT DISTINCT location_id FROM gapped) locs
        CROSS JOIN (SELECT CAST(unnest(generate_series(DATE '2024-01-01',
          DATE '2024-01-30', INTERVAL 1 DAY)) AS DATE) AS day) d),
      joined AS (SELECT spine.location_id, spine.day, gapped.volume
        FROM spine LEFT JOIN gapped
          ON spine.location_id = gapped.location_id AND spine.day = gapped.day),
      ctx AS (SELECT location_id, day, volume,
          last_value(volume IGNORE NULLS) OVER wb AS pv,
          last_value(CASE WHEN volume IS NOT NULL THEN day END IGNORE NULLS)
            OVER wb AS pd,
          first_value(volume IGNORE NULLS) OVER wf AS nv,
          first_value(CASE WHEN volume IS NOT NULL THEN day END IGNORE NULLS)
            OVER wf AS nd
        FROM joined
        WINDOW wb AS (PARTITION BY location_id ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wf AS (PARTITION BY location_id ORDER BY day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT location_id, day,
        round(CASE WHEN volume IS NOT NULL THEN CAST(volume AS DOUBLE)
          WHEN pv IS NOT NULL AND nv IS NOT NULL
          THEN pv + (nv - pv) * date_diff('day', pd, day)
               / date_diff('day', pd, nd)
          END + 1e-9, 6) AS volume_interp
      FROM ctx""")),

    // T7 (extension): distributed global row index — RowIndex scaladoc
    // has the SinglePartition-exchange argument; the oracle IS the
    // single-reducer window form this replaces (identical numbers, the
    // order key is the unique o_orderkey).
    QueryDef("t7_zip_index", (s, dir) =>
      graft.ops.RowIndex.globalIndex(
        Tables.orders(s, dir)
          .filter(col("o_totalprice") > 100000)
          .select(col("o_orderkey"), col("o_totalprice")),
        Seq("o_orderkey")),
      Some("""SELECT o_orderkey, o_totalprice,
        CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS idx
      FROM orders WHERE o_totalprice > 100000""")),

    // T8 (extension): 2-D Pareto skyline — the multi-objective top-k
    // (price-size frontier of parts: rows no other part beats on BOTH).
    // Two-phase bucketed prune (Skyline scaladoc: local skyline per hash
    // bucket, global pass on the survivors — never a global sort over
    // raw rows); the oracle is the definitional NOT EXISTS dominance
    // test, so the hash match proves the pruning loses nothing and all
    // dominance ties are kept.
    QueryDef("t8_pareto_skyline", (s, dir) =>
      graft.ops.Skyline.skyline2D(
        Tables.part(s, dir).select("p_partkey", "p_size", "p_retailprice"),
        xCol = "p_retailprice", yCol = "p_size"),
      Some("""SELECT p_partkey, p_size, p_retailprice FROM part a
        WHERE NOT EXISTS (SELECT 1 FROM part b
          WHERE b.p_retailprice >= a.p_retailprice AND b.p_size >= a.p_size
            AND (b.p_retailprice > a.p_retailprice OR b.p_size > a.p_size))""")),

    // W14 (extension): CUME_DIST — fraction of partition rows at or below
    // the current order key (identical definition in both engines).
    QueryDef("w14_cume_dist", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"),
        round(cume_dist().over(
            Window.partitionBy("c_nationkey").orderBy(col("c_acctbal"), col("c_custkey")))
          + lit(1e-9), 6).as("bal_cume"))
    }, Some("""SELECT c_custkey, c_nationkey,
        round(cume_dist() OVER (PARTITION BY c_nationkey
          ORDER BY c_acctbal, c_custkey) + 1e-9, 6) AS bal_cume
      FROM customer""")),

    // W13 (extension): first_value/last_value over the full partition
    // frame (explicit unbounded-following — last_value's default frame
    // ends at the current row, the classic trap both engines share).
    QueryDef("w13_first_last_value", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, dir).select(col("user_id"), col("event_id"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"))
    }, Some("""SELECT user_id, event_id,
        first_value(event_type) OVER w AS first_type,
        last_value(event_type) OVER w AS last_type
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""")),

    // W12 (extension): the BUILT-IN session_window — same gap semantics
    // as w11 expressed declaratively (merge while next start < prev end;
    // an exact 30-min gap starts a new session, hence >= in the oracle).
    // The oracle compares the REAL time difference (interval), not
    // date_diff('second') boundary counts — session_window decides on
    // exact timestamps, and a 1799.3s gap straddling a second boundary
    // counts 1800 boundaries while being under the 30-min gap.
    QueryDef("w12_session_window", (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events")),
      Some("""WITH flagged AS (SELECT user_id, event_id, ts,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1
               ELSE 0 END AS gap_start
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (SELECT *, sum(gap_start) OVER (PARTITION BY user_id
          ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM flagged)
      SELECT user_id, min(ts) AS session_start,
        max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS n_events
      FROM sess GROUP BY user_id, session_idx""")),

    // U6 (extension): UNION DISTINCT — set-semantics union (vs U1's
    // union-all): one shuffle dedup over the concatenated branches.
    QueryDef("u6_union_distinct", (s, dir) => {
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      val finished = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F").select("o_custkey")
      urgent.union(finished).distinct()
    }, Some("""SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""")),

    // U5 (extension): unpivot/melt — the wide-to-long inverse of j5_pivot
    // (metrics become (metric, value) rows; common type double).
    QueryDef("u5_unpivot", (s, dir) => {
      val wide = Tables.orders(s, dir).groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("double").as("n"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
      wide.unpivot(Array(col("o_orderstatus")),
        Array(col("n"), col("revenue")), "metric", "value")
    }, Some("""WITH wide AS (SELECT o_orderstatus,
          CAST(count(*) AS DOUBLE) AS n, round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1)
      SELECT o_orderstatus, 'n' AS metric, n AS value FROM wide
      UNION ALL
      SELECT o_orderstatus, 'revenue' AS metric, revenue AS value FROM wide""")),

    QueryDef("u3_intersect", (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.filter(year(col("l_shipdate")) === 1996).select("l_orderkey")
        .intersect(li.filter(year(col("l_shipdate")) === 1997).select("l_orderkey"))
    }, Some("""SELECT l_orderkey FROM lineitem WHERE year(l_shipdate) = 1996
      INTERSECT
      SELECT l_orderkey FROM lineitem WHERE year(l_shipdate) = 1997""")),

    QueryDef("u4_except", (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.filter(year(col("l_shipdate")) === 1996).select("l_orderkey")
        .except(li.filter(year(col("l_shipdate")) === 1997).select("l_orderkey"))
    }, Some("""SELECT l_orderkey FROM lineitem WHERE year(l_shipdate) = 1996
      EXCEPT
      SELECT l_orderkey FROM lineitem WHERE year(l_shipdate) = 1997""")),

    // U7: MULTISET set ops — exceptAll/intersectAll keep duplicate
    // counts (bag semantics: an orderkey with 3 lineitems in '96 and 1
    // in '97 survives EXCEPT ALL twice), which the DISTINCT u3/u4 twins
    // erase. Spark plans these as a count-diff aggregation + generate,
    // not a join per duplicate. Output re-aggregated per key so the
    // multiplicity itself is what's hash-checked.
    QueryDef("u7_except_all", (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.filter(year(col("l_shipdate")) === 1996).select("l_orderkey")
        .exceptAll(li.filter(year(col("l_shipdate")) === 1997)
          .select("l_orderkey"))
        .groupBy("l_orderkey").agg(count(lit(1)).as("multiplicity"))
    }, Some("""SELECT l_orderkey, count(*) AS multiplicity FROM (
        SELECT l_orderkey FROM lineitem WHERE year(l_shipdate) = 1996
        EXCEPT ALL
        SELECT l_orderkey FROM lineitem WHERE year(l_shipdate) = 1997)
      GROUP BY 1""")),

    QueryDef("u8_intersect_all", (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.filter(year(col("l_shipdate")) === 1996).select("l_orderkey")
        .intersectAll(li.filter(year(col("l_shipdate")) === 1997)
          .select("l_orderkey"))
        .groupBy("l_orderkey").agg(count(lit(1)).as("multiplicity"))
    }, Some("""SELECT l_orderkey, count(*) AS multiplicity FROM (
        SELECT l_orderkey FROM lineitem WHERE year(l_shipdate) = 1996
        INTERSECT ALL
        SELECT l_orderkey FROM lineitem WHERE year(l_shipdate) = 1997)
      GROUP BY 1""")),

    // U2: per-year one-row summaries — the reference's row-dict
    // accumulation (4_Snowflake/READ.md:100-103) restructured as a single
    // groupBy over the year column (SURVEY §2.7 U2: one shuffle, no loop).
    QueryDef("u2_yearly_summary", (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(round(avg(col("o_totalprice")), 4).as("avg_price"),
          count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue")),
      Some("""SELECT year(o_orderdate) AS yr, round(avg(o_totalprice), 4) AS avg_price,
        count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1"""))
  )
}
