package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream analytics beyond the reference's aggregation marts
 * (`5_dbt/READ.md` ranks and summarizes; these derive sequence
 * structure): first-order transition models over per-user journeys.
 * Sessionization and funnels live in `streaming/EventStream` and the
 * registered `ext_funnel`/`ext_retention_cohorts` queries; this is the
 * Markov view the product-analytics stacks (Amplitude-style paths)
 * build on the same feed.
 */
object Events {

  /**
   * First-order Markov transition matrix over per-user event streams:
   * every (event, next event of the SAME user in `orderCols` order)
   * pair, counted, with row-normalized probabilities — P(to | from).
   * 6-digit rounded; deterministic given a totalizing order (include a
   * unique tiebreak column, as any window query must).
   *
   * Scale shape: one window exchange on the user key (per-row frame
   * state = one row), one (from, to) hash aggregation with map-side
   * combine — the matrix is |types|² rows at most, so normalization
   * joins a broadcast row-total frame. Nothing holds a user's whole
   * history beyond the sort.
   */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
                       orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(orderCols.map(col): _*)
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = pairs.groupBy("from_type").agg(sum("n").as("__tot"))
    pairs.join(broadcast(tot), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("__tot") + lit(1e-9), 6).as("p"))
  }
}
