package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Aggregates, Joins}

/**
 * SURVEY §2.3 joins (J1-J7) and §2.4 aggregations (A1-A10) as
 * oracle-checkable queries.
 *
 * Scale shapes exercised here: dimension sides are explicitly broadcast
 * (no fact shuffle), the fold-of-left-joins has its one-shuffle pivot
 * twin, and exact percentiles ride one hash shuffle on the group keys.
 */
object JoinAggQueries {

  def defs: Seq[QueryDef] = Seq(

    // J1: left fact->dim broadcast join (reference 1_AWS/README.md:106).
    QueryDef("j1_left_broadcast", (s, dir) => {
      val dim = Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nationkey"), col("n_name"))
      Joins.leftBroadcast(Tables.customer(s, dir), dim, Seq("c_nationkey"))
        .select("c_custkey", "c_name", "n_name")
    }, Some("SELECT c_custkey, c_name, n_name FROM customer " +
      "LEFT JOIN nation ON c_nationkey = n_nationkey")),

    // J2: inner equi-join chain through two dims (reference 5_dbt/READ.md:505-507).
    QueryDef("j2_inner_broadcast", (s, dir) => {
      val nat = Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nationkey"), col("n_name"), col("n_regionkey"))
      val reg = Tables.region(s, dir)
        .select(col("r_regionkey").as("n_regionkey"), col("r_name"))
      Joins.innerBroadcast(
        Joins.innerBroadcast(Tables.supplier(s, dir), nat, Seq("s_nationkey")),
        reg, Seq("n_regionkey"))
        .select("s_suppkey", "s_name", "n_name", "r_name")
    }, Some("""SELECT s_suppkey, s_name, n_name, r_name FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey""")),

    // J3: full outer join of two metric aggregates (reference 5_dbt/READ.md:465-470).
    QueryDef("j3_full_outer", (s, dir) => {
      val orders = Tables.orders(s, dir)
      val open = orders.filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey").as("custkey")).agg(count(lit(1)).as("n_open"))
      val closed = orders.filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("custkey")).agg(count(lit(1)).as("n_closed"))
      Joins.fullOuter(open, closed, Seq("custkey"))
    }, Some("""WITH open AS (
        SELECT o_custkey AS custkey, count(*) AS n_open FROM orders
        WHERE o_orderstatus = 'O' GROUP BY 1),
      closed AS (
        SELECT o_custkey AS custkey, count(*) AS n_closed FROM orders
        WHERE o_orderstatus = 'F' GROUP BY 1)
      SELECT coalesce(open.custkey, closed.custkey) AS custkey, n_open, n_closed
      FROM open FULL OUTER JOIN closed ON open.custkey = closed.custkey""")),

    // J4: left join on COALESCE'd keys, materialized before the join
    // (reference 5_dbt/READ.md:471-477).
    QueryDef("j4_coalesce_key_join", (s, dir) => {
      val orders = Tables.orders(s, dir)
      val open = orders.filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey").as("open_key")).agg(count(lit(1)).as("n_open"))
      val closed = orders.filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("closed_key")).agg(count(lit(1)).as("n_closed"))
      val merged = open.join(closed, col("open_key") === col("closed_key"), "full_outer")
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey").as("custkey"), col("c_name"))
      Joins.coalesceKeyLeftJoin(merged, cust,
        Seq("custkey" -> Seq("open_key", "closed_key")))
        .select("custkey", "n_open", "n_closed", "c_name")
    }, Some("""WITH open AS (
        SELECT o_custkey AS open_key, count(*) AS n_open FROM orders
        WHERE o_orderstatus = 'O' GROUP BY 1),
      closed AS (
        SELECT o_custkey AS closed_key, count(*) AS n_closed FROM orders
        WHERE o_orderstatus = 'F' GROUP BY 1)
      SELECT coalesce(open_key, closed_key) AS custkey, n_open, n_closed, c_name
      FROM open FULL OUTER JOIN closed ON open_key = closed_key
      LEFT JOIN customer ON coalesce(open_key, closed_key) = c_custkey""")),

    // J5 (faithful): fold of per-priority frames with repeated left joins
    // + fillna(0) (reference 4_Snowflake/READ.md:87-91).
    QueryDef("j5_fold_left_joins", (s, dir) => {
      val orders = Tables.orders(s, dir)
      def frame(prio: String, outCol: String) =
        orders.filter(col("o_orderpriority") === prio)
          .groupBy(col("o_custkey").as("custkey"))
          .agg(round(avg(col("o_totalprice")) + lit(1e-9), 4).as(outCol))
      val base = frame("1-URGENT", "avg_urgent")
      Joins.foldLeftJoins(base,
        Seq(frame("2-HIGH", "avg_high"), frame("3-MEDIUM", "avg_medium")),
        Seq("custkey")).na.fill(0d)
    }, Some("""WITH f1 AS (SELECT o_custkey AS custkey, round(avg(o_totalprice) + 1e-9, 4) AS avg_urgent
        FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
      f2 AS (SELECT o_custkey AS custkey, round(avg(o_totalprice) + 1e-9, 4) AS avg_high
        FROM orders WHERE o_orderpriority = '2-HIGH' GROUP BY 1),
      f3 AS (SELECT o_custkey AS custkey, round(avg(o_totalprice) + 1e-9, 4) AS avg_medium
        FROM orders WHERE o_orderpriority = '3-MEDIUM' GROUP BY 1)
      SELECT f1.custkey, f1.avg_urgent,
        coalesce(f2.avg_high, 0) AS avg_high, coalesce(f3.avg_medium, 0) AS avg_medium
      FROM f1 LEFT JOIN f2 ON f1.custkey = f2.custkey
              LEFT JOIN f3 ON f1.custkey = f3.custkey""")),

    // J5 (scalable twin): one groupBy+pivot instead of N joins — one
    // shuffle, keeps every custkey (NULL where a priority is absent).
    QueryDef("j5_pivot", (s, dir) =>
      Joins.pivotInsteadOfJoins(
        Tables.orders(s, dir), "o_custkey", "o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM"),
        round(avg(col("o_totalprice")) + lit(1e-9), 4))
        .withColumnRenamed("o_custkey", "custkey")
        .withColumnRenamed("1-URGENT", "avg_urgent")
        .withColumnRenamed("2-HIGH", "avg_high")
        .withColumnRenamed("3-MEDIUM", "avg_medium"),
      Some("""SELECT o_custkey AS custkey,
        round(avg(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END) + 1e-9, 4) AS avg_urgent,
        round(avg(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END) + 1e-9, 4) AS avg_high,
        round(avg(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END) + 1e-9, 4) AS avg_medium
        FROM orders GROUP BY 1""")),

    // J6: semi-join against a top-k key set (reference 3_BigQuery/READ.md:109-110).
    QueryDef("j6_semi_join", (s, dir) => {
      val top = Tables.orders(s, dir)
        .orderBy(desc("o_totalprice"), col("o_orderkey")).limit(10)
        .select(col("o_orderkey").as("l_orderkey"))
      Joins.semiJoin(Tables.lineitem(s, dir), top, Seq("l_orderkey"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
    }, Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)""")),

    // J7: cross join vs a 1-row global-stats frame (reference 5_dbt/READ.md:842-860).
    QueryDef("j7_cross_stats", (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val stats = li.agg(avg(col("l_quantity")).as("mu"), stddev(col("l_quantity")).as("sd"))
      Joins.crossStats(li, stats)
        .filter(abs(col("l_quantity") - col("mu")) > lit(1.5) * col("sd"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
    }, Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      CROSS JOIN (SELECT avg(l_quantity) AS mu, stddev(l_quantity) AS sd FROM lineitem)
      WHERE abs(l_quantity - mu) > 1.5 * sd""")),

    // J8 (scale path): bucketed co-located join — both sides written
    // bucketed by the join key, so the sort-merge join plans with NO
    // exchange on either side (PlanSpec pins this). The merge hint stops
    // the small side from broadcasting, which would hide the point.
    QueryDef("j8_bucketed_join", (s, dir) => {
      import graft.core.Materialize
      val o = Materialize.bucketTable(s, "graft_b_orders",
        Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
        buckets = 8, bucketCols = Seq("o_custkey"))
      val c = Materialize.bucketTable(s, "graft_b_customer",
        Tables.customer(s, dir).select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment")),
        buckets = 8, bucketCols = Seq("o_custkey"))
      o.join(c.hint("merge"), Seq("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
    }, Some("""SELECT c_mktsegment, count(*) AS n_orders,
        round(sum(o_totalprice), 2) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment""")),

    // J9 (extension): AS-OF join — most recent prior incident per event,
    // per location. Spark lacks the operator; ops/AsOf expresses it as
    // union -> one window pass (one shuffle, no range cross-product).
    // DuckDB has native ASOF LEFT JOIN, which is the oracle.
    QueryDef("j9_asof_join", (s, dir) => {
      val ev = Tables.events(s, dir)
      val probes = ev.filter(col("event_type") =!= "error")
        .select(col("event_id"), (col("user_id") % 20).as("loc"), col("ts"))
      val incidents = ev.filter(col("event_type") === "error")
        .groupBy((col("user_id") % 20).as("loc"), col("ts").as("inc_ts"))
        .agg(max(col("event_id")).as("incident_id"))
      graft.ops.AsOf.asofJoin(probes, incidents, Seq("loc"),
        "ts", "inc_ts", Seq("incident_id"))
        .select("event_id", "loc", "incident_id")
    }, Some("""WITH left_t AS (
        SELECT event_id, user_id % 20 AS loc, ts FROM events
        WHERE event_type <> 'error'),
      right_t AS (
        SELECT user_id % 20 AS loc, ts AS inc_ts, max(event_id) AS incident_id
        FROM events WHERE event_type = 'error' GROUP BY 1, 2)
      SELECT l.event_id, l.loc, r.incident_id
      FROM left_t l ASOF LEFT JOIN right_t r
        ON l.loc = r.loc AND l.ts >= r.inc_ts""")),

    // J10 (extension): range join via range bucketing — interval
    // containment as an equi-join on bucket id + residual filter, never
    // a nested loop over all pairs. Oracle is the plain BETWEEN join.
    QueryDef("j10_range_join", (s, dir) => {
      val readings = Tables.events(s, dir).select(col("event_id"), col("value"))
      val bands = Tables.nation(s, dir).select(
        col("n_nationkey").as("band_id"),
        (col("n_nationkey") * 18).cast("double").as("lo"),
        (col("n_nationkey") * 18 + 25).cast("double").as("hi"))
      graft.ops.RangeJoin.bucketedRangeJoin(readings, "value", bands,
          "lo", "hi", bucketWidth = 25d)
        .groupBy("band_id").agg(count(lit(1)).as("n_readings"))
    }, Some("""SELECT n_nationkey AS band_id, count(*) AS n_readings
      FROM events JOIN nation
        ON value BETWEEN n_nationkey * 18 AND n_nationkey * 18 + 25
      GROUP BY 1""")),

    // A1: group-by exact multi-percentile in one pass
    // (reference 1_AWS/README.md:95-99; np.quantile linear == quantile_cont).
    QueryDef("a1_group_percentiles", (s, dir) =>
      Aggregates.groupPercentiles(Tables.lineitem(s, dir),
        Seq("l_returnflag"), "l_quantity",
        Map("tt50" -> 0.5, "tt85" -> 0.85, "tt95" -> 0.95))
        .select(col("l_returnflag"), round(col("tt50"), 6).as("tt50"),
          round(col("tt85"), 6).as("tt85"), round(col("tt95"), 6).as("tt95")),
      Some("""SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 6) AS tt50,
        round(quantile_cont(l_quantity, 0.85), 6) AS tt85,
        round(quantile_cont(l_quantity, 0.95), 6) AS tt95
        FROM lineitem GROUP BY l_returnflag""")),

    // A2: group-by mean (reference 3_BigQuery/READ.md:109).
    QueryDef("a2_group_mean", (s, dir) =>
      Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(round(avg(col("l_extendedprice")), 4).as("avg_price")),
      Some("SELECT l_returnflag, round(avg(l_extendedprice), 4) AS avg_price " +
        "FROM lineitem GROUP BY l_returnflag")),

    // A3: boolean-mean exceedance rate (reference 3_BigQuery/READ.md:119-122).
    QueryDef("a3_exceedance_rate", (s, dir) =>
      Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(round(Aggregates.exceedanceRate(col("l_quantity"), 25d), 6)
          .as("exceed_rate")),
      Some("""SELECT l_returnflag,
        round(avg(CASE WHEN l_quantity > 25 THEN 1.0 ELSE 0.0 END), 6) AS exceed_rate
        FROM lineitem GROUP BY l_returnflag""")),

    // A4: multi-stat hash agg (reference 5_dbt/READ.md:398-413).
    QueryDef("a4_multistat", (s, dir) =>
      Tables.orders(s, dir).groupBy("o_orderpriority")
        .agg(round(avg(col("o_totalprice")), 4).as("avg_value"),
          min(col("o_totalprice")).as("min_value"),
          max(col("o_totalprice")).as("max_value"),
          count(lit(1)).as("n_rows"),
          round(sum(col("o_totalprice")), 2).as("sum_value")),
      Some("""SELECT o_orderpriority, round(avg(o_totalprice), 4) AS avg_value,
        min(o_totalprice) AS min_value, max(o_totalprice) AS max_value,
        count(*) AS n_rows, round(sum(o_totalprice), 2) AS sum_value
        FROM orders GROUP BY o_orderpriority""")),

    // A5: COUNT(DISTINCT DATE(...)) (reference 5_dbt/READ.md:502).
    QueryDef("a5_count_distinct_date", (s, dir) =>
      Tables.orders(s, dir).groupBy("o_orderstatus")
        .agg(countDistinct(to_date(col("o_orderdate"))).as("active_days")),
      Some("SELECT o_orderstatus, count(DISTINCT CAST(o_orderdate AS DATE)) AS active_days " +
        "FROM orders GROUP BY o_orderstatus")),

    // A6: sample stddev (reference 5_dbt/READ.md:844).
    QueryDef("a6_stddev", (s, dir) =>
      Tables.events(s, dir).groupBy("event_type")
        .agg(round(stddev(col("value")), 6).as("sd_value")),
      Some("SELECT event_type, round(stddev(value), 6) AS sd_value " +
        "FROM events GROUP BY event_type")),

    // A7: wide multi-column group agg (reference 5_dbt/READ.md:488-511).
    QueryDef("a7_wide_group_agg", (s, dir) =>
      Tables.lineitem(s, dir).groupBy("l_returnflag", "l_linestatus")
        .agg(round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n_rows")),
      Some("""SELECT l_returnflag, l_linestatus, round(avg(l_quantity), 6) AS avg_qty,
        round(avg(l_extendedprice), 4) AS avg_price, round(avg(l_discount), 6) AS avg_disc,
        count(DISTINCT l_orderkey) AS n_orders, round(sum(l_quantity), 2) AS sum_qty,
        count(*) AS n_rows FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    // A8: re-aggregation — daily counts rolled up to day-of-week means
    // (reference 5_dbt/READ.md:695-716).
    QueryDef("a8_reagg_daily_weekly", (s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("daily_n"))
      daily.groupBy(dayofweek(col("d")).cast("long").as("dow"))
        .agg(round(avg(col("daily_n")), 6).as("avg_daily_n"))
    }, Some("""WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS daily_n FROM orders GROUP BY 1)
      SELECT dayofweek(d) + 1 AS dow, round(avg(daily_n), 6) AS avg_daily_n
      FROM daily GROUP BY 1""")),

    // A9: global 1-row aggregate (reference 5_dbt/READ.md:842-850).
    QueryDef("a9_global_agg", (s, dir) =>
      Tables.lineitem(s, dir).agg(
        round(avg(col("l_quantity")), 6).as("mu"),
        round(stddev(col("l_quantity")), 6).as("sd"),
        min(col("l_quantity")).as("min_q"),
        max(col("l_quantity")).as("max_q"),
        count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("revenue")),
      Some("""SELECT round(avg(l_quantity), 6) AS mu, round(stddev(l_quantity), 6) AS sd,
        min(l_quantity) AS min_q, max(l_quantity) AS max_q, count(*) AS n,
        round(sum(l_extendedprice), 2) AS revenue FROM lineitem""")),

    // A10: HAVING count threshold (reference 5_dbt/READ.md:836-837).
    QueryDef("a10_having", (s, dir) =>
      Aggregates.countHaving(Tables.lineitem(s, dir), Seq("l_partkey"), 40L),
      Some("SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY l_partkey " +
        "HAVING count(*) > 40")),

    // Skew path: two-phase SALTED aggregation must equal the plain
    // GROUP BY — the oracle IS the unsalted SQL. At 100 TB this is how a
    // hot key stops serializing one reducer; here it proves exactness.
    QueryDef("a11_salted_agg", (s, dir) =>
      graft.ops.Skew.saltedSumCount(Tables.lineitem(s, dir),
        Seq("l_returnflag"), "l_quantity", spreadCol = "l_orderkey", salts = 16)
        .withColumn("sum_l_quantity", round(col("sum_l_quantity"), 2)),
      Some("""SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_l_quantity,
        count(*) AS n_rows FROM lineitem GROUP BY l_returnflag""")),

    // A14 (extension): ROLLUP hierarchy totals — subtotal + grand-total
    // rows with NULL group markers, matching warehouse semantics.
    QueryDef("a14_rollup", (s, dir) =>
      Tables.orders(s, dir)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("revenue")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""")),

    // A15 (extension): deterministic grouped collection — sorted list
    // aggregation (collect_list order is nondeterministic; array_sort
    // pins it, and the oracle's list_sort agrees). Output is the joined
    // string form: array-typed result columns are unrepresentable in the
    // harness comparator, and '|'-joined scalars carry identical info.
    QueryDef("a15_collect_sorted", (s, dir) =>
      Tables.nation(s, dir).groupBy("n_regionkey")
        .agg(array_join(array_sort(collect_list(col("n_name"))), "|").as("nations")),
      Some("SELECT n_regionkey, array_to_string(list_sort(list(n_name)), '|') AS nations " +
        "FROM nation GROUP BY n_regionkey")),

    // J11 (extension): anti-join — customers who never placed an order
    // (broadcast LeftAnti; the complement of the J6 semi-join).
    QueryDef("j11_anti_join", (s, dir) =>
      graft.ops.Joins.antiJoin(
        Tables.customer(s, dir).select("c_custkey", "c_name", "c_nationkey"),
        Tables.orders(s, dir).select(col("o_custkey").as("c_custkey")).distinct(),
        Seq("c_custkey")),
      Some("""SELECT c_custkey, c_name, c_nationkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),

    // J12 (extension): shuffle-hash join by hint — when both sides are
    // too big to broadcast but one fits in memory per partition, SHJ
    // skips the sort both SortMergeJoin sides would pay. PlanSpec pins
    // the physical operator; the oracle only cares about the rows.
    QueryDef("j12_shuffle_hash_join", (s, dir) => {
      val qty = Tables.lineitem(s, dir).groupBy("l_orderkey")
        .agg(round(sum(col("l_quantity")), 2).as("qty"))
      Tables.orders(s, dir).select("o_orderkey", "o_orderstatus")
        .join(qty.hint("shuffle_hash"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("qty"))
    }, Some("""SELECT o_orderkey, o_orderstatus, qty
      FROM orders JOIN (SELECT l_orderkey, round(sum(l_quantity), 2) AS qty
        FROM lineitem GROUP BY 1) li ON o_orderkey = l_orderkey""")),

    // J13 (extension): Bloom-prefiltered join — the explicit runtime-
    // filter pattern: dim keys fold into a driver Bloom filter gating the
    // fact scan before the exchange; the exact join culls false
    // positives, so the result equals the plain join (which is exactly
    // what the oracle runs).
    QueryDef("j13_bloom_join", (s, dir) => {
      val dim = Tables.supplier(s, dir)
        .filter(col("s_nationkey") === 3)
        .select("s_suppkey", "s_name")
      Joins.bloomPrefilteredInner(
          Tables.lineitem(s, dir)
            .select("l_orderkey", "l_suppkey", "l_quantity"),
          dim, "l_suppkey", "s_suppkey", expectedDimKeys = 1000L)
        .groupBy("s_name")
        .agg(round(sum(col("l_quantity")), 2).as("total_qty"),
          count(lit(1)).as("n_lines"))
    }, Some("""SELECT s_name, round(sum(l_quantity), 2) AS total_qty,
        count(*) AS n_lines
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey = 3
      GROUP BY s_name""")),

    // A16 (extension): discrete percentile — the value actually present
    // in the data (percentile_disc), vs the interpolated A1 family.
    QueryDef("a16_percentile_disc", (s, dir) =>
      Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)")
          .as("p50_disc"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)")
            .as("p90_disc")),
      Some("""SELECT l_returnflag, quantile_disc(l_quantity, 0.5) AS p50_disc,
        quantile_disc(l_quantity, 0.9) AS p90_disc
        FROM lineitem GROUP BY l_returnflag""")),

    // A17 (extension): CUBE with grouping_id — all 4 grouping combinations
    // plus the bitmask that tells marts which subtotal a row is.
    QueryDef("a17_cube", (s, dir) =>
      Tables.orders(s, dir).cube("o_orderstatus", "o_orderpriority")
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("revenue")),
      Some("""SELECT o_orderstatus, o_orderpriority,
        CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        count(*) AS n, round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    // A18 (extension): argmin/argmax — the value of one column at
    // another's extremum (min_by/max_by == DuckDB arg_min/arg_max);
    // keyed on unique event_id so the answer is deterministic.
    QueryDef("a18_argminmax", (s, dir) =>
      Tables.events(s, dir).groupBy("user_id")
        .agg(min_by(col("event_type"), col("event_id")).as("first_type"),
          max_by(col("event_type"), col("event_id")).as("last_type"),
          count(lit(1)).as("n")),
      Some("""SELECT user_id, arg_min(event_type, event_id) AS first_type,
        arg_max(event_type, event_id) AS last_type, count(*) AS n
        FROM events GROUP BY user_id""")),

    // A20 (extension): correlation / covariance — the single-pass
    // co-moment family. 5-digit rounding (not the usual 6): both engines
    // accumulate co-moments in their own partition order, leaving
    // low-order fp noise the last digit must absorb.
    QueryDef("a20_corr_covar", (s, dir) =>
      Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")) + lit(1e-9), 5)
            .as("q_price_corr"),
          round(covar_samp(col("l_quantity"), col("l_discount")) + lit(1e-9), 5)
            .as("q_disc_covar"),
          count(lit(1)).as("n")),
      Some("""SELECT l_returnflag,
        round(corr(l_quantity, l_extendedprice) + 1e-9, 5) + 0 AS q_price_corr,
        round(covar_samp(l_quantity, l_discount) + 1e-9, 5) + 0 AS q_disc_covar,
        count(*) AS n
        FROM lineitem GROUP BY 1""")),

    // A21 (extension): linear-regression aggregates — slope/intercept/r²
    // of price on quantity per flag (the co-moment family again; slope/
    // intercept are ~1e4-magnitude so they round at 4 digits — a wider
    // noise margin than A20's unit-scale correlations need).
    QueryDef("a21_regr_slope", (s, dir) =>
      Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(round(regr_slope(col("l_extendedprice"), col("l_quantity")) + lit(1e-9), 4)
            .as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")) + lit(1e-9), 4)
            .as("intercept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")) + lit(1e-9), 5)
            .as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n")),
      Some("""SELECT l_returnflag,
        round(regr_slope(l_extendedprice, l_quantity) + 1e-9, 4) + 0 AS slope,
        round(regr_intercept(l_extendedprice, l_quantity) + 1e-9, 4) + 0 AS intercept,
        round(regr_r2(l_extendedprice, l_quantity) + 1e-9, 5) + 0 AS r2,
        CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        FROM lineitem GROUP BY 1""")),

    // A19 (extension): GROUPING SETS — the explicit subtotal list CUBE and
    // ROLLUP are special cases of (status totals, priority totals, grand
    // total; never the full cross combination).
    QueryDef("a19_grouping_sets", (s, dir) =>
      Tables.orders(s, dir).groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("revenue")),
      Some("""SELECT o_orderstatus, o_orderpriority,
        CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        count(*) AS n, round(sum(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")),

    // 100 TB escape hatches (SURVEY §2.4 A1/A5 notes): sketch-based
    // percentile and distinct-count. Sketch VALUES differ per engine, so
    // the registered output is the exact answer (oracle-computable) plus
    // a bound-check boolean computed in-query: the sketch estimate must
    // land inside an exact quantile/error window. DuckDB hashes a fully
    // deterministic row; the Spark side proves the sketch honored its
    // bound. AggregatesSpec additionally bounds the raw estimates.
    //
    // a12 bound: approx_percentile(accuracy=10000) guarantees rank error
    // <= N/accuracy (1e-4·N) — the exact [q-0.02, q+0.02] quantile
    // window is 200× looser, so the boolean is deterministically true
    // while still failing loudly on a broken sketch.
    QueryDef("a12_approx_percentile", (s, dir) =>
      Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)") + lit(1e-9), 2).as("p50_exact"),
          round(expr("percentile(l_quantity, 0.95)") + lit(1e-9), 2).as("p95_exact"),
          Aggregates.approxPct(col("l_quantity"), 0.5)
            .between(expr("percentile(l_quantity, 0.48)"),
              expr("percentile(l_quantity, 0.52)")).as("p50_in_bound"),
          Aggregates.approxPct(col("l_quantity"), 0.95)
            .between(expr("percentile(l_quantity, 0.93)"),
              expr("percentile(l_quantity, 0.97)")).as("p95_in_bound")),
      Some("""SELECT l_returnflag,
          round(quantile_cont(l_quantity, 0.5) + 1e-9, 2) AS p50_exact,
          round(quantile_cont(l_quantity, 0.95) + 1e-9, 2) AS p95_exact,
          true AS p50_in_bound, true AS p95_in_bound
        FROM lineitem GROUP BY 1""")),
    // a13 bound: HLL++ at default rsd 0.05 — 3σ (15%) relative window.
    QueryDef("a13_approx_count_distinct", (s, dir) =>
      Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("nd_exact"),
          (abs(approx_count_distinct(col("l_partkey")) -
              countDistinct(col("l_partkey"))) <=
            countDistinct(col("l_partkey")) * 0.15).as("within_rsd")),
      Some("""SELECT l_returnflag,
          count(DISTINCT l_partkey) AS nd_exact, true AS within_rsd
        FROM lineitem GROUP BY 1""")),

    // A24 (extension): equi-width histogram per group over the global
    // [min, max] — the profiling/binning aggregate. All arithmetic is
    // exact integer cents with floor division (`div` / `//`), so bucket
    // assignment can never flip between engines; the 1-row min/max
    // frame broadcasts into the scan.
    QueryDef("a24_histogram", (s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val mm = li.agg(min(col("cents")).as("minc"), max(col("cents")).as("maxc"))
      li.crossJoin(broadcast(mm))
        .withColumn("bucket", expr("(cents - minc) * 8 div (maxc - minc + 1)"))
        .groupBy("l_returnflag", "bucket")
        .agg(count(lit(1)).as("n"))
    }, Some("""WITH c AS (SELECT l_returnflag,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem),
      m AS (SELECT min(cents) AS minc, max(cents) AS maxc FROM c)
      SELECT l_returnflag, (cents - minc) * 8 // (maxc - minc + 1) AS bucket,
             count(*) AS n
      FROM c, m GROUP BY 1, 2""")),

    // A22 (extension): deterministic MODE. Spark's mode(col, true) returns
    // the LOWEST value among tied max-frequency values; DuckDB's mode is
    // first-encountered (order-dependent), so the oracle spells out the
    // same contract as count + rank + min — which is also the portable
    // form for engines without a deterministic mode.
    QueryDef("a22_mode", (s, dir) =>
      Tables.lineitem(s, dir).groupBy("l_linestatus")
        .agg(mode(col("l_returnflag"), deterministic = true).as("mode_flag"),
          count(lit(1)).as("n")),
      Some("""WITH c AS (
          SELECT l_linestatus, l_returnflag, count(*) AS cnt
          FROM lineitem GROUP BY 1, 2),
        r AS (SELECT l_linestatus, l_returnflag, cnt,
                rank() OVER (PARTITION BY l_linestatus ORDER BY cnt DESC) AS rk
              FROM c)
        SELECT l_linestatus, min(l_returnflag) AS mode_flag,
               (SELECT count(*) FROM lineitem li
                WHERE li.l_linestatus = r.l_linestatus) AS n
        FROM r WHERE rk = 1 GROUP BY 1, 3""")),

    // A23 (extension): MEDIAN builtin — sugar for the exact linear-
    // interpolated percentile(0.5), so DuckDB's median (== quantile_cont
    // 0.5 for numerics) matches bit-for-bit under the usual rounding.
    QueryDef("a23_median", (s, dir) =>
      Tables.orders(s, dir).groupBy("o_orderstatus")
        .agg(round(median(col("o_totalprice")) + lit(1e-9), 4).as("median_price"),
          count(lit(1)).as("n")),
      Some("""SELECT o_orderstatus,
        round(median(o_totalprice) + 1e-9, 4) AS median_price, count(*) AS n
        FROM orders GROUP BY 1""")),

    // A25 (extension): exact heavy hitters via per-partition Misra-Gries
    // candidates + a broadcast-verified exact count (HeavyHitters scaladoc
    // has the pigeonhole argument). The key is deliberately skewed (70% of
    // rows land on two hot keys, the rest are near-unique) so the query
    // demonstrates what the operator is FOR; output == the plain
    // GROUP BY/HAVING oracle under any partitioning.
    QueryDef("a25_heavy_hitters", (s, dir) => {
      val keyed = Tables.events(s, dir).select(
        when(col("event_id") % 10 < 7,
          concat(lit("hot_"), (col("user_id") % 2).cast("string")))
          .otherwise(concat(lit("cold_"), col("event_id").cast("string")))
          .as("k"))
      graft.ops.HeavyHitters.exact(keyed, "k", 10)
    }, Some("""WITH keyed AS (SELECT
          CASE WHEN event_id % 10 < 7
               THEN 'hot_' || CAST(user_id % 2 AS VARCHAR)
               ELSE 'cold_' || CAST(event_id AS VARCHAR) END AS k
        FROM events)
      SELECT k, count(*) AS n FROM keyed GROUP BY 1
      HAVING count(*) > (SELECT count(*) FROM keyed) // 10""")),

    // A26 (extension): mergeable HLL sketches — the re-aggregation story
    // for COUNT(DISTINCT) at 100 TB: sketch per shard (here: per ship
    // year), then UNION the binary sketches to coarser grains without
    // touching the raw data again. Exact distinct cannot re-aggregate
    // (distinct sets don't add); sketches do. The sketch binary is
    // engine-specific, so the registered output is the exact distinct
    // count (oracle-computable) plus an in-query boolean proving the
    // re-aggregated estimate landed within the sketch's error bound
    // (lgConfigK=12 → rsd ~1.6%; 5% window, same bound AggregatesSpec
    // pins on the raw estimate).
    QueryDef("a26_hll_mergeable", (s, dir) => {
      val perYear = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), year(col("l_shipdate")).as("yr"))
        .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      val merged = perYear.groupBy("l_returnflag")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("nd_estimate"))
      val exact = Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("nd_exact"))
      merged.join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("nd_exact"),
          (abs(col("nd_estimate") - col("nd_exact")) <=
            col("nd_exact") * 0.05).as("estimate_in_bound"))
    }, Some("""SELECT l_returnflag,
        count(DISTINCT l_partkey) AS nd_exact, true AS estimate_in_bound
      FROM lineitem GROUP BY 1""")),

    // J14 (extension): LATERAL correlated subquery — top-2 customers per
    // nation through the SQL text interface (the per-row dependent join
    // Spark plans as a DomainJoin / rewritten window). Same ANSI text
    // runs in DuckDB.
    QueryDef("j14_lateral_topn", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT n_name, c_name, c_acctbal
        FROM nation,
        LATERAL (SELECT c_name, c_acctbal FROM customer
                 WHERE c_nationkey = n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2)""")
    }, Some("""SELECT n_name, c_name, c_acctbal
      FROM nation,
      LATERAL (SELECT c_name, c_acctbal FROM customer
               WHERE c_nationkey = n_nationkey
               ORDER BY c_acctbal DESC, c_custkey LIMIT 2)""")),

    // J15 (extension): manually salted skewed join — the fact key is
    // spread over 8 salts, the dim replicated 8×, the join runs on
    // (key, salt); one hot key's rows land on 8 reducers instead of 1.
    // Result == the plain equi-join (the oracle), only the shuffle
    // distribution changes. For moderate skew AQE's runtime splitting
    // does this without dim replication (Skew scaladoc).
    QueryDef("j15_salted_join", (s, dir) => {
      val fact = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey").as("c_custkey"),
          col("o_totalprice"))
      val dim = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      graft.ops.Skew.saltedJoin(fact, dim, "c_custkey", "o_orderkey", 8)
        .select("o_orderkey", "c_custkey", "c_name", "c_nationkey")
    }, Some("""SELECT o_orderkey, o_custkey AS c_custkey, c_name, c_nationkey
      FROM orders JOIN customer ON o_custkey = c_custkey""")),

    // A27 (extension): KMV bottom-k distinct sketch — where the HLL row
    // (a26) can only pin its estimate inside an error-bound boolean
    // (engine-specific sketch binary), the KMV synopsis is FULLY
    // oracle-replayable: md5-hex order statistics both engines compute
    // bit-identically, so the ESTIMATE column itself hash-matches.
    // k=128 → expected |est−exact|/exact ≈ 1/√126 ≈ 9%; the fixture
    // groups land well inside. The sketch is also the set-expression
    // synopsis (union/intersection/Jaccard — ext_kmv_setops).
    QueryDef("a27_kmv_distinct", (s, dir) => {
      val k = 128
      val li = Tables.lineitem(s, dir)
      val est = graft.functions.KmvSketch.estimate(
        graft.functions.KmvSketch.bottomK(li, "l_partkey", k,
          Seq("l_returnflag")), k, Seq("l_returnflag"))
        .withColumnRenamed("est", "nd_estimate")
      val exact = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("nd_exact"))
      exact.join(est, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("nd_exact"), col("nd_estimate"),
          round(abs(col("nd_estimate") - col("nd_exact")) /
            col("nd_exact") + lit(1e-9), 6).as("rel_err"))
    }, Some("""WITH h AS (SELECT DISTINCT l_returnflag,
          substr(md5(CAST(l_partkey AS VARCHAR)), 1, 12) AS hash
        FROM lineitem WHERE l_partkey IS NOT NULL),
      r AS (SELECT l_returnflag, hash, row_number()
          OVER (PARTITION BY l_returnflag ORDER BY hash) AS rk FROM h),
      s AS (SELECT l_returnflag, count(*) AS n, max(hash) AS kth
        FROM r WHERE rk <= 128 GROUP BY 1),
      e AS (SELECT l_returnflag,
          round(CASE WHEN n < 128 THEN CAST(n AS DOUBLE)
            ELSE 127::DOUBLE * 281474976710656::DOUBLE / ('0x' || kth)::BIGINT END
            + 1e-9, 6) AS nd_estimate FROM s),
      x AS (SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_exact
        FROM lineitem GROUP BY 1)
      SELECT x.l_returnflag, nd_exact, nd_estimate,
        round(abs(nd_estimate - nd_exact) / nd_exact + 1e-9, 6) AS rel_err
      FROM x JOIN e USING (l_returnflag)""")),

    // A32: mergeable RANK-error quantile sketch (QuantileSketch — the
    // KLL-family sampler layer with md5-hex membership): per event
    // type, p50/p90 estimated from the ≤ k-pair bottom-k-by-hash
    // sample, alongside the exact n and the estimates' true ranks. The
    // estimate itself is a deterministic function of the input multiset
    // (the KMV posture — bit-replayable below), and the within_* flags
    // check the DKW guarantee |rank(est) − q·n| ≤ ε·n with
    // ε = sqrt(ln(2/δ)/2k) ≈ 0.102 at k = 256, δ = 1% — rank units,
    // no domain-width knob (the st_hist_quantile gap this closes).
    // The exact-count/true-rank legs are the verification anchor, one
    // hash aggregation + one broadcast-join pass each; the sketch leg
    // is map-side-bounded (≤ k pairs per group per task).
    QueryDef("a32_kll_quantile", (s, dir) => {
      val k = 256
      val ev = Tables.events(s, dir).filter(col("value").isNotNull)
      val sketch = graft.functions.QuantileSketch.bottomKSampleAgg(
        ev, "event_id", "value", k, Seq("event_type"))
      val ests = graft.functions.QuantileSketch.estimateQuantiles(
        sketch, Seq("est_p50" -> 0.5, "est_p90" -> 0.9), Seq("event_type"))
      val n = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      val ranks = ev.join(broadcast(ests), Seq("event_type"))
        .groupBy("event_type").agg(
          sum(when(col("value") <= col("est_p50"), 1L).otherwise(0L))
            .as("r50"),
          sum(when(col("value") <= col("est_p90"), 1L).otherwise(0L))
            .as("r90"))
      ests.join(n, Seq("event_type")).join(ranks, Seq("event_type"))
        .select(col("event_type"), col("n"), col("m"),
          col("est_p50"), col("est_p90"),
          (abs(col("r50") - lit(0.5) * col("n")) <= lit(0.102) * col("n"))
            .as("within_p50"),
          (abs(col("r90") - lit(0.9) * col("n")) <= lit(0.102) * col("n"))
            .as("within_p90"))
    }, Some("""WITH ev AS (SELECT event_type,
          substr(md5(CAST(event_id AS VARCHAR)), 1, 12) AS hash,
          CAST(value AS DOUBLE) AS val
        FROM events WHERE value IS NOT NULL),
      rk AS (SELECT event_type, hash, val, row_number()
          OVER (PARTITION BY event_type ORDER BY hash, val) AS rn
        FROM (SELECT DISTINCT event_type, hash, val FROM ev)),
      sm AS (SELECT event_type, val,
          row_number() OVER (PARTITION BY event_type ORDER BY val, hash)
            AS vrank,
          count(*) OVER (PARTITION BY event_type) AS m
        FROM rk WHERE rn <= 256),
      est AS (SELECT event_type, CAST(max(m) AS BIGINT) AS m,
          round(min(CASE WHEN vrank >= 0.5 * m THEN val END) + 1e-9, 6)
            AS est_p50,
          round(min(CASE WHEN vrank >= 0.9 * m THEN val END) + 1e-9, 6)
            AS est_p90
        FROM sm GROUP BY 1),
      cnt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        FROM events WHERE value IS NOT NULL GROUP BY 1),
      r AS (SELECT e.event_type,
          sum(CASE WHEN value <= est_p50 THEN 1 ELSE 0 END) AS r50,
          sum(CASE WHEN value <= est_p90 THEN 1 ELSE 0 END) AS r90
        FROM events ev2 JOIN est e ON ev2.event_type = e.event_type
        WHERE ev2.value IS NOT NULL GROUP BY 1)
      SELECT cnt.event_type, cnt.n, est.m, est.est_p50, est.est_p90,
        abs(r50 - 0.5 * cnt.n) <= 0.102 * cnt.n AS within_p50,
        abs(r90 - 0.9 * cnt.n) <= 0.102 * cnt.n AS within_p90
      FROM cnt JOIN est USING (event_type)
        JOIN r ON r.event_type = cnt.event_type""")),

    // A33: degenerate inputs through the quantile sketch, each with an
    // EXACTLY-known answer (the dq_adv_degenerate posture): a constant
    // column's every quantile is the constant; k ≥ n degenerates to the
    // exact lower quantiles; nulls contribute no sample point (m counts
    // only non-null); k = 2 ≪ n keeps exactly the two pairs with the
    // smallest hashes — a deterministic md5 order statistic the oracle
    // re-derives, NOT an approximation to wave through; a single-row
    // input answers that row at every q. Global (ungrouped) sketch
    // form: its rank windows run on ≤ k-pair frames (PlanAudit
    // allow-listed as bounded). Every value is exact until the standard
    // rounding, so the hash match is bit-level.
    QueryDef("a33_kll_degenerate", (s, dir) => {
      import graft.functions.QuantileSketch
      val keys = Tables.nation(s, dir)
        .select(col("n_nationkey").cast("long").as("k"))
      val const = QuantileSketch.estimateQuantiles(
        QuantileSketch.bottomKSample(
          keys.withColumn("v", lit(42.5)), "k", "v", 64),
        Seq("c_p50" -> 0.5, "c_p90" -> 0.9))
        .select(col("m").as("c_m"), col("c_p50"), col("c_p90"))
      val exact = QuantileSketch.estimateQuantiles(
        QuantileSketch.bottomKSample(
          keys.withColumn("v", col("k").cast("double")), "k", "v", 64),
        Seq("e_p50" -> 0.5, "e_p90" -> 0.9, "e_p100" -> 1.0))
        .select(col("m").as("e_m"), col("e_p50"), col("e_p90"),
          col("e_p100"))
      val nulls = QuantileSketch.estimateQuantiles(
        QuantileSketch.bottomKSample(
          keys.withColumn("v", when(col("k") % 5 === 0,
              lit(null).cast("double"))
            .otherwise(col("k").cast("double"))), "k", "v", 64),
        Seq("n_p50" -> 0.5))
        .select(col("m").as("n_m"), col("n_p50"))
      val tiny = QuantileSketch.estimateQuantiles(
        QuantileSketch.bottomKSample(
          keys.withColumn("v", col("k").cast("double")), "k", "v", 2),
        Seq("t_p50" -> 0.5, "t_p90" -> 0.9))
        .select(col("m").as("t_m"), col("t_p50"), col("t_p90"))
      val one = QuantileSketch.estimateQuantiles(
        QuantileSketch.bottomKSample(
          keys.filter(col("k") === 3).withColumn("v", lit(7.25)),
          "k", "v", 64),
        Seq("o_p50" -> 0.5, "o_p99" -> 0.99))
        .select(col("m").as("o_m"), col("o_p50"), col("o_p99"))
      const.crossJoin(exact).crossJoin(nulls).crossJoin(tiny)
        .crossJoin(one)
    }, Some("""WITH keys AS (SELECT CAST(n_nationkey AS BIGINT) AS k
          FROM nation),
      hk AS (SELECT k, substr(md5(CAST(k AS VARCHAR)), 1, 12) AS hash
        FROM keys),
      cstq AS (SELECT CAST(count(*) AS BIGINT) AS c_m,
          round(min(CASE WHEN vrank >= 0.5 * m THEN v END) + 1e-9, 6)
            AS c_p50,
          round(min(CASE WHEN vrank >= 0.9 * m THEN v END) + 1e-9, 6)
            AS c_p90
        FROM (SELECT v, row_number() OVER (ORDER BY v, hash) AS vrank,
            count(*) OVER () AS m
          FROM (SELECT DISTINCT hash, CAST(42.5 AS DOUBLE) AS v FROM hk))),
      exq AS (SELECT CAST(count(*) AS BIGINT) AS e_m,
          round(min(CASE WHEN vrank >= 0.5 * m THEN v END) + 1e-9, 6)
            AS e_p50,
          round(min(CASE WHEN vrank >= 0.9 * m THEN v END) + 1e-9, 6)
            AS e_p90,
          round(min(CASE WHEN vrank >= 1.0 * m THEN v END) + 1e-9, 6)
            AS e_p100
        FROM (SELECT v, row_number() OVER (ORDER BY v, hash) AS vrank,
            count(*) OVER () AS m
          FROM (SELECT DISTINCT hash, CAST(k AS DOUBLE) AS v FROM hk))),
      nlq AS (SELECT CAST(count(*) AS BIGINT) AS n_m,
          round(min(CASE WHEN vrank >= 0.5 * m THEN v END) + 1e-9, 6)
            AS n_p50
        FROM (SELECT v, row_number() OVER (ORDER BY v, hash) AS vrank,
            count(*) OVER () AS m
          FROM (SELECT DISTINCT hash, CAST(k AS DOUBLE) AS v FROM hk
            WHERE k % 5 <> 0))),
      tn AS (SELECT hash, v FROM (SELECT hash, CAST(k AS DOUBLE) AS v,
          row_number() OVER (ORDER BY hash, CAST(k AS DOUBLE)) AS rn
        FROM hk) WHERE rn <= 2),
      tnq AS (SELECT CAST(count(*) AS BIGINT) AS t_m,
          round(min(CASE WHEN vrank >= 0.5 * m THEN v END) + 1e-9, 6)
            AS t_p50,
          round(min(CASE WHEN vrank >= 0.9 * m THEN v END) + 1e-9, 6)
            AS t_p90
        FROM (SELECT v, row_number() OVER (ORDER BY v, hash) AS vrank,
            count(*) OVER () AS m FROM tn)),
      onq AS (SELECT CAST(count(*) AS BIGINT) AS o_m,
          round(min(CASE WHEN vrank >= 0.5 * m THEN v END) + 1e-9, 6)
            AS o_p50,
          round(min(CASE WHEN vrank >= 0.99 * m THEN v END) + 1e-9, 6)
            AS o_p99
        FROM (SELECT v, row_number() OVER (ORDER BY v, hash) AS vrank,
            count(*) OVER () AS m
          FROM (SELECT DISTINCT hash, CAST(7.25 AS DOUBLE) AS v FROM hk
            WHERE k = 3)))
      SELECT * FROM cstq CROSS JOIN exq CROSS JOIN nlq
        CROSS JOIN tnq CROSS JOIN onq""")),

    // J16: interval-OVERLAP join (both sides intervals) — per-user
    // daily activity spans [min ts, max ts] × synthetic maintenance
    // windows, tiled so no pair set is ever nested-loop'd and each
    // overlapping pair surfaces exactly once (first-shared-tile rule,
    // no post-join distinct). Endpoints are exact integer MICROseconds
    // on both engines (unix_micros / epoch_us), so the overlap
    // predicate has no float knife-edge.
    QueryDef("j16_interval_overlap", (s, dir) => {
      val spans = Tables.events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(min(unix_micros(col("ts"))).as("s_lo"),
          max(unix_micros(col("ts"))).as("s_hi"))
      val day0 = unix_micros(lit("2024-01-01 00:00:00").cast("timestamp"))
      val windows = Tables.nation(s, dir).select(
        col("n_nationkey").cast("long").as("win_id"),
        (day0 + col("n_nationkey") * lit(86400000000L) +
          col("n_nationkey") * lit(1800000000L)).as("w_lo"))
        .withColumn("w_hi", col("w_lo") + lit(21600000000L))
      graft.ops.RangeJoin.intervalOverlapJoin(
          spans, "s_lo", "s_hi", windows, "w_lo", "w_hi",
          bucketWidth = 21600000000d)
        .groupBy("win_id")
        .agg(count(lit(1)).as("n_user_days"),
          countDistinct(col("user_id")).as("n_users"))
    }, Some("""WITH spans AS (SELECT user_id, CAST(ts AS DATE) AS day,
          min(epoch_us(ts)) AS s_lo, max(epoch_us(ts)) AS s_hi
        FROM events GROUP BY 1, 2),
      win AS (SELECT CAST(n_nationkey AS BIGINT) AS win_id,
          epoch_us(TIMESTAMP '2024-01-01')
            + CAST(n_nationkey AS BIGINT) * 86400000000
            + CAST(n_nationkey AS BIGINT) * 1800000000 AS w_lo,
          epoch_us(TIMESTAMP '2024-01-01')
            + CAST(n_nationkey AS BIGINT) * 86400000000
            + CAST(n_nationkey AS BIGINT) * 1800000000
            + 21600000000 AS w_hi
        FROM nation)
      SELECT win_id, count(*) AS n_user_days,
        CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM spans JOIN win ON s_lo <= w_hi AND w_lo <= s_hi
      GROUP BY 1""")),

    // J17: effective-dated (SCD2 temporal) dimension join — each fact
    // joins the dimension VERSION valid at its event time, the classic
    // warehouse pattern the s16 snapshot produces and j9's as-of join
    // approximates. Equi-join on the natural key with the validity
    // range as a residual filter; the versioned dim is
    // dimension-cardinality × versions, so it broadcasts and the fact
    // side never shuffles. Validity endpoints are exact integer micros.
    QueryDef("j17_scd2_temporal", (s, dir) => {
      val day0 = unix_micros(lit("2024-01-01 00:00:00").cast("timestamp"))
      val tenDays = lit(864000000000L)
      val dim = Tables.nation(s, dir)
        .select(col("n_nationkey").cast("long").as("nk"),
          explode(sequence(lit(0L), lit(2L))).as("version"))
        .withColumn("from_us", day0 + col("version") * tenDays)
        .withColumn("to_us",
          when(col("version") < 2, col("from_us") + tenDays))
        .withColumn("attr",
          col("nk") * 100 + col("version"))
      val facts = Tables.events(s, dir)
        .select((col("user_id") % 25).as("nk"),
          unix_micros(col("ts")).as("tsus"))
      facts.join(broadcast(dim), Seq("nk"))
        .filter(col("tsus") >= col("from_us") &&
          (col("to_us").isNull || col("tsus") < col("to_us")))
        .groupBy("nk", "version")
        .agg(count(lit(1)).as("n_events"), max(col("attr")).as("attr"))
    }, Some("""WITH dim AS (SELECT CAST(n_nationkey AS BIGINT) AS nk,
          CAST(v AS BIGINT) AS version,
          epoch_us(TIMESTAMP '2024-01-01') + v * 864000000000 AS from_us,
          CASE WHEN v < 2 THEN epoch_us(TIMESTAMP '2024-01-01')
            + (v + 1) * 864000000000 END AS to_us,
          CAST(n_nationkey AS BIGINT) * 100 + v AS attr
        FROM nation CROSS JOIN range(0, 3) r(v)),
      f AS (SELECT user_id % 25 AS nk, epoch_us(ts) AS tsus FROM events)
      SELECT f.nk, version, CAST(count(*) AS BIGINT) AS n_events,
        max(attr) AS attr
      FROM f JOIN dim ON f.nk = dim.nk
        AND tsus >= from_us AND (to_us IS NULL OR tsus < to_us)
      GROUP BY 1, 2""")),

    // A28: robust location stats — 10%-trimmed mean (drop tails) and
    // winsorized mean (clamp tails) per group, off ONE exact-percentile
    // pass whose tiny per-group bounds broadcast back onto the fact
    // scan. The production outlier-resistant aggregate: a corrupt
    // billion-row feed moves the trimmed mean by at most the trim
    // fraction, unlike avg.
    QueryDef("a28_trimmed_robust", (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val bounds = li.groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, 0.1)").as("p10"),
          expr("percentile(l_extendedprice, 0.9)").as("p90"))
      li.join(broadcast(bounds), Seq("l_returnflag"))
        .groupBy("l_returnflag")
        .agg(
          round(avg(when(col("l_extendedprice").between(col("p10"),
              col("p90")), col("l_extendedprice"))) + lit(1e-9), 4)
            .as("trimmed_mean"),
          round(avg(greatest(least(col("l_extendedprice"), col("p90")),
            col("p10"))) + lit(1e-9), 4).as("winsor_mean"),
          round(avg(col("l_extendedprice")) + lit(1e-9), 4)
            .as("plain_mean"))
    }, Some("""WITH b AS (SELECT l_returnflag,
          quantile_cont(l_extendedprice, 0.1) AS p10,
          quantile_cont(l_extendedprice, 0.9) AS p90
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag,
        round(avg(CASE WHEN l_extendedprice BETWEEN p10 AND p90
          THEN l_extendedprice END) + 1e-9, 4) AS trimmed_mean,
        round(avg(greatest(least(l_extendedprice, p90), p10)) + 1e-9, 4)
          AS winsor_mean,
        round(avg(l_extendedprice) + 1e-9, 4) AS plain_mean
      FROM lineitem JOIN b USING (l_returnflag) GROUP BY 1""")),

    // A29: exponential time-decay aggregate — freshness-weighted volume
    // per event type with a 7-day half-life anchored at the corpus max
    // timestamp (deterministic, no current_timestamp). One scan + one
    // hash shuffle; the anchor rides along as a broadcast 1-row frame.
    QueryDef("a29_time_decay", (s, dir) => {
      val ev = Tables.events(s, dir)
      val anchor = ev.agg(max(unix_micros(col("ts"))).as("ref_us"))
      val age = (col("ref_us") - unix_micros(col("ts"))).cast("double") /
        lit(86400000000d)
      val w = pow(lit(0.5), age / lit(7.0))
      ev.crossJoin(broadcast(anchor))
        .groupBy("event_type")
        .agg(round(sum(col("value") * w) + lit(1e-9), 4)
            .as("decayed_value"),
          round(sum(w) + lit(1e-9), 4).as("decayed_n"),
          count(lit(1)).as("n"))
    }, Some("""WITH a AS (SELECT max(epoch_us(ts)) AS ref_us FROM events)
      SELECT event_type,
        round(sum(value * pow(0.5,
          (ref_us - epoch_us(ts)) / 86400000000.0 / 7.0)) + 1e-9, 4)
          AS decayed_value,
        round(sum(pow(0.5,
          (ref_us - epoch_us(ts)) / 86400000000.0 / 7.0)) + 1e-9, 4)
          AS decayed_n,
        count(*) AS n
      FROM events CROSS JOIN a GROUP BY 1""")),

    // A30: market-basket association rules — support / confidence /
    // lift over brand pairs co-purchased in one order. Pair generation
    // is a basket-keyed SELF-JOIN (never a per-basket pair explosion
    // through one row) with the apriori item prune broadcast onto both
    // sides first — see graft.ext.Association.
    QueryDef("a30_assoc_rules", (s, dir) => {
      val baskets = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("p_brand"))
      graft.ext.Association.pairRules(baskets, "l_orderkey", "p_brand",
          minItemSupport = 2, minPairSupport = 40)
        .select(col("item_a"), col("item_b"), col("n_ab"),
          round(col("support") + lit(1e-12), 8).as("support"),
          round(col("conf_a_b") + lit(1e-12), 8).as("conf_a_b"),
          round(col("lift") + lit(1e-12), 8).as("lift"))
    }, Some("""WITH items AS (SELECT DISTINCT l_orderkey AS basket,
          p_brand AS item
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      nb AS (SELECT count(DISTINCT basket) AS n_baskets FROM items),
      ic AS (SELECT item, count(*) AS n_item FROM items
        GROUP BY 1 HAVING count(*) >= 2),
      fi AS (SELECT basket, items.item FROM items JOIN ic USING (item)),
      pairs AS (SELECT a.item AS item_a, b.item AS item_b,
          count(*) AS n_ab
        FROM fi a JOIN fi b ON a.basket = b.basket AND a.item < b.item
        GROUP BY 1, 2 HAVING count(*) >= 40)
      SELECT item_a, item_b, n_ab,
        round(CAST(n_ab AS DOUBLE) / n_baskets + 1e-12, 8) AS support,
        round(CAST(n_ab AS DOUBLE) / ia.n_item + 1e-12, 8) AS conf_a_b,
        round(CAST(n_ab AS DOUBLE) * n_baskets /
          (ia.n_item * ib.n_item) + 1e-12, 8) AS lift
      FROM pairs
      JOIN ic ia ON ia.item = item_a
      JOIN ic ib ON ib.item = item_b
      CROSS JOIN nb""")),

    // A31: exact WEIGHTED median per group — the lower weighted median
    // (smallest value whose cumulative weight reaches half the total),
    // via one partitioned-ordered window pass: cumulative weight +
    // per-group total in the same window spec, then min(value) over the
    // qualifying rows. The threshold `2·cumw ≥ W` is integer-in-double
    // exact (quantities are whole numbers), and value ties are
    // threshold-invariant (the cumulative at the end of a tied run
    // doesn't depend on intra-tie order), so no tiebreak knife-edge.
    QueryDef("a31_weighted_median", (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag"))
      val wc = w.orderBy(col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      Tables.lineitem(s, dir)
        .withColumn("cumw", sum(col("l_quantity")).over(wc))
        .withColumn("tw", sum(col("l_quantity")).over(w))
        .groupBy("l_returnflag")
        .agg(round(min(when(col("cumw") * 2 >= col("tw"),
            col("l_extendedprice"))), 4).as("weighted_median"),
          round(sum(col("l_quantity")), 4).as("total_weight"))
    }, Some("""WITH c AS (SELECT l_returnflag, l_extendedprice, l_quantity,
          sum(l_quantity) OVER (PARTITION BY l_returnflag
            ORDER BY l_extendedprice, l_orderkey, l_linenumber
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
          sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
        FROM lineitem)
      SELECT l_returnflag,
        round(min(CASE WHEN cumw * 2 >= tw THEN l_extendedprice END), 4)
          AS weighted_median,
        round(sum(l_quantity), 4) AS total_weight
      FROM c GROUP BY 1"""))
  )
}
