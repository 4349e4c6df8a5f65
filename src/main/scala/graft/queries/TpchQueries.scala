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
          AND l_quantity < 24"""))
  )
}
