package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/**
 * Classic TPC-H queries over the fixture tables (adapted to the fixture's
 * column subset — no l_comment/o_shippriority/p_mfgr) — the "a user of a
 * general analytics engine can run their existing warehouse workload"
 * demonstration. Each is the standard declarative DataFrame form; the
 * plans they produce (pushdown filters, broadcast dims for region/nation,
 * partial aggregation, TakeOrderedAndProject) are pinned elsewhere and
 * are exactly what the operator-level queries already exercise.
 *
 * FP rules as everywhere: 2-digit rounding on money sums (magnitude 1e9
 * at sf0.1 — summation-order error ~1e-3 sits far inside the half-step),
 * 6-digit on unit-scale averages, BIGINT counts, tiebroken orderings.
 */
object TpchQueries {

  def defs: Seq[QueryDef] = Seq(

    // Q1: pricing summary report — the canonical wide aggregate.
    QueryDef("tpch_q1", (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")) + lit(1e-9), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")) + lit(1e-9), 4).as("avg_price"),
          round(avg(col("l_discount")) + lit(1e-9), 6).as("avg_disc"),
          count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
          round(sum(l_quantity), 2) AS sum_qty,
          round(sum(l_extendedprice), 2) AS sum_base_price,
          round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
          round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
          round(avg(l_quantity) + 1e-9, 6) AS avg_qty,
          round(avg(l_extendedprice) + 1e-9, 4) AS avg_price,
          round(avg(l_discount) + 1e-9, 6) AS avg_disc,
          count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus""")),

    // Q3: shipping-priority top-10 (adapted: no o_shippriority column).
    QueryDef("tpch_q3", (s, dir) => {
      val cust = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ords = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1995-03-15"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1995-03-15"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    }, Some("""SELECT l_orderkey, o_orderdate,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < DATE '1995-03-15'
        AND l_shipdate > DATE '1995-03-15'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // Q5: local-supplier volume — the 5-way join with region/nation dims
    // broadcast (adapted: joins supplier by suppkey only; the fixture has
    // no c_nationkey=s_nationkey colocation requirement dropped).
    QueryDef("tpch_q5", (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val ords = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
        .select("o_orderkey")
      val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val nat = Tables.nation(s, dir).select("n_nationkey", "n_name", "n_regionkey")
      val reg = Tables.region(s, dir)
        .filter(col("r_name") === "ASIA").select("r_regionkey")
      li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
    }, Some("""SELECT n_name,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
      GROUP BY n_name""")),

    // Q10: returned-item reporting — the top-20 revenue-loss customers
    // (adapted: fixture customer has no address/phone/comment columns).
    QueryDef("tpch_q10", (s, dir) => {
      val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val ords = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1995-10-01") &&
          col("o_orderdate") < lit("1996-01-01"))
        .select("o_orderkey", "o_custkey")
      val cust = Tables.customer(s, dir)
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      val nat = Tables.nation(s, dir).select("n_nationkey", "n_name")
      li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("c_acctbal"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    }, Some("""SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= DATE '1995-10-01' AND o_orderdate < DATE '1996-01-01'
      GROUP BY 1, 2, 3, 4
      ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // Q14: promotion effect — conditional-sum ratio over a broadcast
    // part join.
    QueryDef("tpch_q14", (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-09-01") &&
          col("l_shipdate") < lit("1996-10-01"))
        .select("l_partkey", "l_extendedprice", "l_discount")
      val part = Tables.part(s, dir).select("p_partkey", "p_type")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type").startsWith("PROMO"),
            col("l_extendedprice") * (lit(1) - col("l_discount")))
            .otherwise(lit(0.0))) /
          sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          + lit(1e-9), 4).as("promo_revenue_pct"))
    }, Some("""SELECT round(100.0 *
        sum(CASE WHEN p_type LIKE 'PROMO%'
              THEN l_extendedprice * (1 - l_discount) ELSE 0 END) /
        sum(l_extendedprice * (1 - l_discount)) + 1e-9, 4) AS promo_revenue_pct
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= DATE '1996-09-01' AND l_shipdate < DATE '1996-10-01'""")),

    // Q6: forecasting revenue change — the pure pushdown-filter aggregate.
    QueryDef("tpch_q6", (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount").between(0.03, 0.05) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue")),
      Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.05
          AND l_quantity < 24""")),

    // Q2: minimum-cost supplier (adapted: the fixture has no partsupp, so
    // the part↔supplier relation and its "cost" come from lineitem — cost =
    // rounded avg unit price per (part, supplier)). The shape is the point:
    // a correlated scalar-min subquery decorrelated into groupBy-min +
    // equality join back, with the fp-equality made safe by rounding the
    // comparison key identically on both sides before the min.
    QueryDef("tpch_q2", (s, dir) => {
      val cost = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .agg(round(avg(col("l_extendedprice") / col("l_quantity")) + lit(1e-9), 4)
          .as("cost"))
      val minCost = cost.groupBy(col("pk").as("mpk"))
        .agg(min(col("cost")).as("min_cost"))
      val parts = Tables.part(s, dir).filter(col("p_size") === 15)
        .select("p_partkey", "p_name")
      val supp = Tables.supplier(s, dir).select("s_suppkey", "s_name")
      cost
        .join(minCost, col("pk") === col("mpk") && col("cost") === col("min_cost"))
        .join(broadcast(parts), col("pk") === col("p_partkey"))
        .join(broadcast(supp), col("sk") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("s_name"), col("cost"))
    }, Some("""WITH pc AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               round(avg(l_extendedprice / l_quantity) + 1e-9, 4) AS cost
        FROM lineitem GROUP BY 1, 2),
      m AS (SELECT pk AS mpk, min(cost) AS min_cost FROM pc GROUP BY 1)
      SELECT p_partkey, p_name, s_name, cost
      FROM pc
      JOIN m ON pk = mpk AND cost = min_cost
      JOIN part ON pk = p_partkey
      JOIN supplier ON sk = s_suppkey
      WHERE p_size = 15""")),

    // Q4: order-priority checking (adapted: no l_commitdate/l_receiptdate
    // in the fixture, so the EXISTS predicate is "some line was returned").
    // The shape — EXISTS decorrelated to a LEFT SEMI join, then a grouped
    // count — is the standard Q4 plan.
    QueryDef("tpch_q4", (s, dir) => {
      val ords = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1996-04-01"))
        .select("o_orderkey", "o_orderpriority")
      val returned = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R").select("l_orderkey")
      ords.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    }, Some("""SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      GROUP BY o_orderpriority""")),

    // Q12: shipping-mode priority counts (adapted: no l_shipmode — grouped
    // by l_returnflag instead). The shape is the conditional-sum pivot over
    // a fact→fact join with a pushdown date filter.
    QueryDef("tpch_q12", (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01"))
        .select("l_orderkey", "l_returnflag")
      val ords = Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
      li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0)
            .otherwise(1)).as("low_line_count"))
    }, Some("""SELECT l_returnflag,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      GROUP BY l_returnflag""")),

    // Q13: customer order-count distribution — the LEFT OUTER join with a
    // predicate ON the join (not a post-filter: unmatched customers keep
    // their row), COUNT(col) null semantics, then a re-aggregation.
    QueryDef("tpch_q13", (s, dir) => {
      val cust = Tables.customer(s, dir).select("c_custkey")
      val ords = Tables.orders(s, dir)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_orderkey", "o_custkey")
      cust.join(ords, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
    }, Some("""SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey)
      GROUP BY c_count""")),

    // Q15: top supplier by quarterly revenue — the "view + scalar max +
    // equality join back" shape, with the fp equality made safe by rounding
    // the revenue before the max on both sides.
    QueryDef("tpch_q15", (s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("total_revenue"))
      val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
      val supp = Tables.supplier(s, dir).select("s_suppkey", "s_name")
      rev.join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
        .join(broadcast(supp), col("supplier_no") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    }, Some("""WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM revenue, (SELECT max(total_revenue) AS max_revenue FROM revenue) m
      JOIN supplier ON supplier_no = s_suppkey
      WHERE total_revenue = max_revenue""")),

    // Q16: part/supplier relation counting (adapted: the part↔supplier
    // relation comes from lineitem instead of the missing partsupp, and the
    // "complaints" supplier exclusion is stood in by negative account
    // balance). Shape: anti-join exclusion + COUNT(DISTINCT) per group.
    QueryDef("tpch_q16", (s, dir) => {
      val rel = Tables.lineitem(s, dir).select(
        col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      val badSupp = Tables.supplier(s, dir)
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      val parts = Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#45" &&
          !col("p_type").isin("MEDIUM") &&
          col("p_size").isin(1, 9, 15, 25, 36, 49))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      rel.join(broadcast(badSupp), col("sk") === col("s_suppkey"), "left_anti")
        .join(broadcast(parts), col("pk") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("sk")).as("supplier_cnt"))
    }, Some("""SELECT p_brand, p_type, p_size,
        count(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#45' AND p_type <> 'MEDIUM'
        AND p_size IN (1, 9, 15, 25, 36, 49)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size""")),

    // Q17: small-quantity-order revenue — the correlated per-part average
    // decorrelated into a grouped aggregate broadcast back onto the fact
    // (avg of exact integer quantities, so the 0.2× threshold is
    // bit-identical in both engines).
    QueryDef("tpch_q17", (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val partAvg = li.groupBy(col("l_partkey").as("pk"))
        .agg((avg(col("l_quantity")) * 0.2).as("qty_threshold"))
      val brand = Tables.part(s, dir).filter(col("p_brand") === "Brand#23")
        .select("p_partkey")
      li.join(broadcast(brand), col("l_partkey") === col("p_partkey"))
        .join(broadcast(partAvg), col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < col("qty_threshold"))
        .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
    }, Some("""SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#23'
        AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = lineitem.l_partkey)""")),

    // Q18: large-volume customers — the HAVING-threshold semi-join feeding
    // a 3-way join and a tiebroken top-100.
    QueryDef("tpch_q18", (s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_quantity")
      val bigOrders = li.groupBy(col("l_orderkey").as("bk"))
        .agg(sum(col("l_quantity")).as("tq"))
        .filter(col("tq") > 300).select("bk")
      val ords = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val cust = Tables.customer(s, dir).select("c_custkey", "c_name")
      li.join(bigOrders, col("l_orderkey") === col("bk"), "left_semi")
        .join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), round(col("o_totalprice"), 2).as("o_totalprice"))
        .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(100)
    }, Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        round(o_totalprice, 2) AS o_totalprice,
        round(sum(l_quantity), 2) AS total_qty
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
      GROUP BY 1, 2, 3, 4, 5
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    // Q19: discounted revenue over an OR-of-ANDs predicate (adapted: the
    // p_container/l_shipmode legs become p_size/l_quantity ranges). The
    // point is the disjunctive join predicate: Catalyst extracts the common
    // p_partkey = l_partkey equi-condition and pushes the residual
    // disjunction as a post-join filter, never a nested-loop join.
    QueryDef("tpch_q19", (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      val part = Tables.part(s, dir).select("p_partkey", "p_brand", "p_size")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
    }, Some("""SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30)""")),

    // Q22: global sales opportunity (adapted: every fixture customer has
    // orders, so the NOT EXISTS leg excludes customers with urgent orders;
    // the country-code grouping becomes c_mktsegment). Shape: scalar-avg
    // subquery broadcast as a 1-row cross join + anti join + grouped agg.
    QueryDef("tpch_q22", (s, dir) => {
      val cust = Tables.customer(s, dir)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("avg_bal"))
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal")), 2).as("totacctbal"))
    }, Some("""SELECT c_mktsegment, count(*) AS numcust,
        round(sum(c_acctbal), 2) AS totacctbal
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment""")),

    // Q7: volume shipping between two nations — the double-nation-dim join
    // (supplier nation × customer nation) with the bilateral OR filter and
    // a year rollup. Both nation copies broadcast; the fact→fact
    // lineitem⋈orders join carries the only shuffle.
    QueryDef("tpch_q7", (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
          "l_shipdate")
      val ords = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
        .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
    }, Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        year(l_shipdate) AS l_year,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
      GROUP BY 1, 2, 3""")),

    // Q8: national market share — conditional-sum share of one supplier
    // nation inside a region/type-filtered order volume, per order year.
    QueryDef("tpch_q8", (s, dir) => {
      val part = Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
        .select("p_partkey")
      val li = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
          "l_discount")
      val ords = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val natC = Tables.nation(s, dir)
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
      val reg = Tables.region(s, dir).filter(col("r_name") === "EUROPE")
        .select("r_regionkey")
      val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val natS = Tables.nation(s, dir)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(natC), col("c_nationkey") === col("cn_key"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(natS), col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3", vol).otherwise(lit(0.0))) /
            sum(vol) + lit(1e-9), 6).as("mkt_share"))
    }, Some("""SELECT year(o_orderdate) AS o_year,
        round(sum(CASE WHEN n2.n_name = 'NATION_3'
                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END) /
              sum(l_extendedprice * (1 - l_discount)) + 1e-9, 6) AS mkt_share
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
        AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
      GROUP BY 1""")),

    // Q9: product-type profit by nation and year (adapted: the fixture has
    // no partsupp, so supply cost is stood in by a fixed 10% of
    // p_retailprice per unit — the join/agg shape, a 4-way star with the
    // part filter pushed into a broadcast, is unchanged).
    QueryDef("tpch_q9", (s, dir) => {
      val part = Tables.part(s, dir)
        .filter(col("p_name").contains("gear"))
        .select("p_partkey", "p_retailprice")
      val li = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_discount")
      val ords = Tables.orders(s, dir).select("o_orderkey", "o_orderdate")
      val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val nat = Tables.nation(s, dir).select("n_nationkey", "n_name")
      // profit is an exact 4-decimal quantity (2dp×2dp − 2dp×int), but its
      // subtraction cancels enough that a float sum can land a half-cent off
      // between engines at sf0.1 — so sum exact integer ten-thousandths
      // (|sum| ≪ 2^53) and rescale once at the end.
      val profit = col("l_extendedprice") * (lit(1) - col("l_discount")) -
        lit(0.1) * col("p_retailprice") * col("l_quantity")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(sum(round(profit * lit(10000))) / lit(10000) + lit(1e-9), 2)
          .as("sum_profit"))
    }, Some("""SELECT n_name AS nation, year(o_orderdate) AS o_year,
        round(sum(round((l_extendedprice * (1 - l_discount)
                  - 0.1 * p_retailprice * l_quantity) * 10000)) / 10000
              + 1e-9, 2) AS sum_profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%gear%'
      GROUP BY 1, 2""")),

    // Q11: important stock identification (adapted: no partsupp — "value"
    // per part is lineitem revenue from suppliers of a nation group). The
    // shape is the point: a grouped aggregate filtered against a scalar
    // fraction of its own total, decorrelated into a 1-row broadcast cross
    // join. Both the per-part value and the threshold are rounded to cents
    // before the compare so the strict > is engine-stable.
    QueryDef("tpch_q11", (s, dir) => {
      val supp = Tables.supplier(s, dir)
        .filter(col("s_nationkey").isin(5, 6, 7)).select("s_suppkey")
      val v = Tables.lineitem(s, dir)
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(round(sum(col("l_extendedprice")), 2).as("part_value"))
      val thr = v.agg(round(sum(col("part_value")) * lit(0.0012), 2).as("threshold"))
      v.crossJoin(broadcast(thr))
        .filter(col("part_value") > col("threshold"))
        .select("l_partkey", "part_value")
    }, Some("""WITH v AS (
        SELECT l_partkey, round(sum(l_extendedprice), 2) AS part_value
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                            WHERE s_nationkey IN (5, 6, 7))
        GROUP BY 1)
      SELECT l_partkey, part_value FROM v
      WHERE part_value > (SELECT round(sum(part_value) * 0.0012, 2) FROM v)""")),

    // Q20: potential part promotion (adapted: no partsupp availability —
    // a supplier qualifies when its 1996 shipped quantity of some red part
    // exceeds twice the part's per-supplier average, i.e. qty*cnt >
    // 2*total in exact integer-valued-double arithmetic so the strict
    // comparison can never flip between engines). Shape: nested correlated
    // INs decorrelated into two grouped aggregates and a semi-join chain.
    QueryDef("tpch_q20", (s, dir) => {
      val red = Tables.part(s, dir).filter(col("p_name").startsWith("red"))
        .select("p_partkey")
      val q96 = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01"))
        .join(broadcast(red), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("l_quantity")).as("qty"))
      val perPart = q96.groupBy(col("l_partkey").as("pk2"))
        .agg(sum(col("qty")).as("total_qty"), count(lit(1)).as("n_supp"))
      val good = q96
        .join(broadcast(perPart), col("l_partkey") === col("pk2"))
        .filter(col("qty") * col("n_supp") > lit(2) * col("total_qty"))
        .select("l_suppkey").distinct()
      Tables.supplier(s, dir).filter(col("s_nationkey").isin(4, 5))
        .join(good, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    }, Some("""WITH q AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
          AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        GROUP BY 1, 2),
      p AS (SELECT l_partkey AS pk2, sum(qty) AS total_qty, count(*) AS n_supp
            FROM q GROUP BY 1)
      SELECT s_suppkey, s_name FROM supplier
      WHERE s_nationkey IN (4, 5)
        AND s_suppkey IN (SELECT l_suppkey FROM q JOIN p ON l_partkey = pk2
                          WHERE qty * n_supp > 2 * total_qty)""")),

    // Q21: suppliers who kept orders waiting (adapted: no l_receiptdate/
    // l_commitdate — "late" is stood in by l_returnflag = 'R', as in Q4).
    // The shape is the classic double self-join: EXISTS (another supplier
    // on the order) decorrelated to a left-semi with a non-equi residual,
    // NOT EXISTS (another late supplier) to a left-anti.
    QueryDef("tpch_q21", (s, dir) => {
      val fOrders = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F").select("o_orderkey")
      val li = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_returnflag")
      val l1 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o1"), col("l_suppkey").as("s1"))
        .join(fOrders, col("o1") === col("o_orderkey"), "left_semi")
      val l2 = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val l3 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
      val supp = Tables.supplier(s, dir).select("s_suppkey", "s_name")
      l1.join(l2, col("o1") === col("o2") && col("s1") =!= col("s2"), "left_semi")
        .join(l3, col("o1") === col("o3") && col("s1") =!= col("s3"), "left_anti")
        .join(broadcast(supp), col("s1") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
        .limit(100)
    }, Some("""SELECT s_name, count(*) AS numwait
      FROM lineitem l1
      JOIN supplier ON l1.l_suppkey = s_suppkey
      JOIN orders ON l1.l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"""))
  )
}
