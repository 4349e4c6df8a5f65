package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Window operators — SURVEY §2.5 W1-W7 and §2.6 T1-T5.
 *
 * Scale notes:
 *  - A global ORDER BY window (W1, reference `5_dbt/READ.md:581`) is
 *    single-partition by construction. The reference only ever applies it
 *    AFTER aggregation to dimension-cardinality frames (locations, TMCs),
 *    where it is cheap. [[topK]] is the scalable alternative for raw
 *    facts: Catalyst plans `TakeOrderedAndProject` (per-partition heap +
 *    driver merge — no full sort, no single-partition shuffle).
 *  - Partitioned windows (W2/W3/W6/W7) shuffle once on the partition keys
 *    and sort within partitions — the scalable shape.
 *  - QUALIFY (W5, reference `5_dbt/READ.md:587-588`) has no Spark SQL
 *    keyword; rank-then-filter is the idiom, and keeps ties (differs from
 *    LIMIT k — SURVEY §7.4.3; pick per query).
 */
object Windows {

  /** T1/T2: true top-k — plans TakeOrderedAndProject, never a full sort. */
  def topK(df: DataFrame, k: Int, ordering: Column*): DataFrame =
    df.orderBy(ordering: _*).limit(k)

  /** W1: global rank (only safe on small aggregated frames — see scale note). */
  def rankGlobal(df: DataFrame, rankName: String, ordering: Column*): DataFrame =
    df.withColumn(rankName, rank().over(Window.orderBy(ordering: _*)))

  /** W2: partitioned rank. */
  def rankBy(df: DataFrame, partitionCols: Seq[String], rankName: String,
             ordering: Column*): DataFrame =
    df.withColumn(rankName,
      rank().over(Window.partitionBy(partitionCols.map(col): _*).orderBy(ordering: _*)))

  /** W3: PERCENT_RANK over a partitioned ordering (reference `5_dbt/READ.md:630`). */
  def percentRank(df: DataFrame, partitionCols: Seq[String], outName: String,
                  ordering: Column*): DataFrame = {
    val w = if (partitionCols.isEmpty) Window.orderBy(ordering: _*)
            else Window.partitionBy(partitionCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn(outName, percent_rank().over(w))
  }

  /**
   * W4: PERCENTILE_CONT as a window whose partition equals the GROUP BY
   * keys (the BigQuery idiom at reference `5_dbt/READ.md:403`). Spark
   * computes it as an exact percentile AGGREGATE in the same groupBy —
   * semantically identical when partition == group keys, and it avoids a
   * second window shuffle.
   */
  def medianInGroup(df: DataFrame, keys: Seq[String], valueCol: String,
                    extraAggs: Seq[Column] = Nil): DataFrame = {
    val aggs = percentile(col(valueCol), lit(0.5)).as(s"median_$valueCol") +: extraAggs
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** W5: QUALIFY rank <= k — tie-keeping top-k (vs [[topK]]'s exactly-k). */
  def qualifyTopK(df: DataFrame, partitionCols: Seq[String], k: Int,
                  ordering: Column*): DataFrame = {
    val w = if (partitionCols.isEmpty) Window.orderBy(ordering: _*)
            else Window.partitionBy(partitionCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rk", rank().over(w)).filter(col("__rk") <= k).drop("__rk")
  }

  /**
   * W6: per-group lag difference (pandas `groupby(...).diff()`, reference
   * `3_BigQuery/READ.md:113-114`); first row per group → 0 via fillna.
   */
  def lagDiff(df: DataFrame, partitionCols: Seq[String], orderCol: String,
              valueCol: String, outName: String): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn(outName,
      coalesce(col(valueCol) - lag(col(valueCol), 1).over(w), lit(0d)))
  }

  /**
   * W7: pct_change over an ordered series (reference
   * `4_Snowflake/READ.md:115-118`); first row → 0 (pandas fillna(0)).
   */
  def pctChange(df: DataFrame, partitionCols: Seq[String], orderCol: String,
                valueCol: String, outName: String): DataFrame = {
    val w = if (partitionCols.isEmpty) Window.orderBy(col(orderCol))
            else Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    val prev = lag(col(valueCol), 1).over(w)
    df.withColumn(outName, coalesce((col(valueCol) - prev) / prev, lit(0d)))
  }

  /**
   * Two-sided CUSUM change detection over an ordered series (extension:
   * the sequential-analysis drift statistic, complementing the
   * distributional PSI/KS/χ² drift family with ORDER sensitivity —
   * a mean shift that never moves the histogram still trips CUSUM).
   *
   * The textbook form is recursive — `S⁺_t = max(0, S⁺_{t-1} + x_t − μ
   * − slack)` — which no window frame can express directly. It unrolls
   * exactly: with the prefix sum `P_t = Σ_{i≤t}(x_i − μ − slack)`,
   *
   *   `S⁺_t = P_t − min_{i ≤ t}(P_i, 0-prefix)`   (running min of P,
   *   seeded with 0 — every reset of the max(0, ·) recursion is the
   *   running min advancing). Symmetric for the downward side.
   *
   * So the whole detector is two cumulative sums + two running
   * extremes in ONE partitioned-ordered window pass — no recursion, no
   * driver loop, and per-series it shuffles once on the partition key.
   * An unpartitioned call is a single global ordering: apply it to
   * already-aggregated series (daily means), never raw facts.
   */
  def cusum(df: DataFrame, partitionCols: Seq[String], orderCol: String,
            valueCol: String, mean: Column, slack: Column,
            upName: String = "cusum_up",
            downName: String = "cusum_down"): DataFrame = {
    val w0 = if (partitionCols.isEmpty) Window.orderBy(col(orderCol))
             else Window.partitionBy(partitionCols.map(col): _*)
               .orderBy(col(orderCol))
    val w = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pUp = sum(col(valueCol) - mean - slack).over(w)
    val pDn = sum(col(valueCol) - mean + slack).over(w)
    df.withColumn(upName, pUp - least(min(pUp).over(w), lit(0d)))
      .withColumn(downName, greatest(max(pDn).over(w), lit(0d)) - pDn)
  }
}
