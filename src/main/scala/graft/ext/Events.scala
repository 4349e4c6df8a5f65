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
   * Debounce: drop events closer than `minGap` to their key's PREVIOUS
   * event (kept or not) — the standard duplicate-fire suppressor for
   * chatty emitters (double-clicks, sensor bounce, retry storms). Gap
   * is measured to the immediate predecessor, so a long burst thins to
   * its gap-opening events; for keep-one-per-window semantics use
   * [[rateLimit]] instead.
   *
   * Scale shape: one window exchange on the key with a one-row lag
   * frame — no state beyond the sort, no join.
   */
  def debounce(events: DataFrame, keyCols: Seq[String], tsCol: String,
               minGap: String, tieCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieCols).map(col): _*)
    events.withColumn("__prev", lag(col(tsCol), 1).over(w))
      .filter(col("__prev").isNull ||
        col(tsCol) >= col("__prev") + expr(s"INTERVAL $minGap"))
      .drop("__prev")
  }

  /**
   * Per-key rate limit: at most `maxPerWindow` events per key per
   * `windowLen` tumbling window, earliest first (ties by `tieCols`) —
   * the ingestion guard that bounds any key's contribution per period
   * (the event-stream twin of [[graft.ext.Corpus.capPerGroup]]).
   *
   * Scale shape: one window exchange on (key, time bucket); the rank
   * never exceeds `maxPerWindow` rows of state per bucket.
   */
  def rateLimit(events: DataFrame, keyCols: Seq[String], tsCol: String,
                windowLen: String, maxPerWindow: Int,
                tieCols: Seq[String] = Nil): DataFrame = {
    require(maxPerWindow >= 1, s"maxPerWindow $maxPerWindow must be >= 1")
    val bucket = window(col(tsCol), windowLen).getField("start")
    val w = Window.partitionBy((keyCols.map(col) :+ bucket): _*)
      .orderBy((tsCol +: tieCols).map(col): _*)
    events.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerWindow)
      .drop("__rn")
  }

  /**
   * Multi-step funnel: how many users complete each prefix of an
   * ordered step sequence, where step i+1 must occur strictly AFTER the
   * user's earliest completion of step i (and within `maxGap` of it,
   * when given) — the N-ary generalization of the registered
   * 2-step `ext_funnel`. Earliest-completion semantics make the count
   * deterministic and monotonically non-increasing by stage.
   *
   * Scale shape: one user-keyed aggregation per stage over only that
   * stage's events (the type filter prunes the scan), chained by
   * user-keyed joins of 1-row-per-user frames — no window over the
   * whole event stream, no cross product; stage count frames are 1-row
   * unions. Stages are a short literal list, so the plan depth is
   * bounded by the funnel length.
   *
   * @return one row per stage: (stage 1-based, step, n_users)
   */
  def funnelSteps(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String],
                  maxGap: Option[String] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var stage = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    var out = stage.agg(count(lit(1)).as("n_users"))
      .select(lit(1L).as("stage"), lit(steps.head).as("step"), col("n_users"))
    steps.tail.zipWithIndex.foreach { case (st, i) =>
      val within = maxGap.map(g =>
          col("__ts2") <= col("__t") + expr(s"INTERVAL $g"))
        .getOrElse(lit(true))
      stage = events.filter(col(typeCol) === st)
        .select(col(userCol), col(tsCol).as("__ts2"))
        .join(stage, Seq(userCol))
        .filter(col("__ts2") > col("__t") && within)
        .groupBy(col(userCol)).agg(min(col("__ts2")).as("__t"))
      out = out.unionByName(stage.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 2L).as("stage"), lit(st).as("step"), col("n_users")))
    }
    out
  }

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
