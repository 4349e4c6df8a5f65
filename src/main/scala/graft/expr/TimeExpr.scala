package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Time expressions — SURVEY §2.8 F1-F4 and the period classifiers P7.
 *
 * All of these return pure [[Column]] expressions (when/otherwise chains),
 * NOT UDFs: the reference's row-wise `df.apply(get_period, axis=1)`
 * (reference `1_AWS/README.md:79-91`) is an interpreted per-row Python
 * loop; the Column version is vectorized and whole-stage-codegen'd by
 * Catalyst, and predicates over it still push down.
 *
 * Weekday-convention hazard (SURVEY §7.4.2): three numbering schemes are
 * in play in the reference. We expose each explicitly so a pipeline picks
 * one on purpose:
 *  - [[wdayPandas]]: Mon=1 … Sun=7 (pandas `.dt.weekday + 1`,
 *    reference `1_AWS/README.md:76`)
 *  - [[dowSql]]: Sun=1 … Sat=7 (SQL `EXTRACT(DAYOFWEEK)`, Spark
 *    `dayofweek`, reference `5_dbt/READ.md:671-680`)
 */
object TimeExpr {

  /** F1: parse a string column to timestamp (reference `1_AWS/README.md:75`). */
  def parseTs(c: Column): Column = c.cast("timestamp")

  /** pandas weekday convention: Mon=1 … Sun=7 (`weekday()+1`, Mon=0-based). */
  def wdayPandas(ts: Column): Column = weekday(ts) + lit(1)

  /** SQL DAYOFWEEK convention: Sun=1 … Sat=7. */
  def dowSql(ts: Column): Column = dayofweek(ts)

  /**
   * P7: NPMRDS analysis-period classifier (reference `1_AWS/README.md:79-91`):
   * weekday AM peak 6-10 → 'amp', midday 10-16 → 'mid', PM peak 16-20 →
   * 'pmp', weekend 6-20 → 'we', otherwise NULL (overnight readings are
   * dropped by the caller, reference `1_AWS/README.md:92`).
   *
   * `wday` uses the pandas convention (Mon=1 … Sun=7), so weekdays are
   * wday <= 5 and weekends wday >= 6.
   */
  def period(ts: Column): Column = {
    val wd = wdayPandas(ts)
    val h  = hour(ts)
    val weekdayRow = wd <= 5
    when(weekdayRow && h >= 6  && h < 10, "amp")
      .when(weekdayRow && h >= 10 && h < 16, "mid")
      .when(weekdayRow && h >= 16 && h < 20, "pmp")
      .when(!weekdayRow && h >= 6 && h < 20, "we")
      .otherwise(lit(null))
  }

  /**
   * P7 variant: BigQuery/Snowflake DAGs build the same four periods from
   * boolean masks `(wday>1)&(wday<7)&(hour>=6)&(hour<10)` etc. over the
   * pandas wday (reference `3_BigQuery/READ.md:66-76`,
   * `4_Snowflake/READ.md:65-70`) — i.e. weekday = Tue…Sat there. Kept
   * faithful as its own classifier.
   */
  def periodMasked(ts: Column): Column = {
    val wd = wdayPandas(ts)
    val h  = hour(ts)
    val mid = wd > lit(1) && wd < lit(7)
    when(mid && h >= 6  && h < 10, "amp")
      .when(mid && h >= 10 && h < 16, "mid")
      .when(mid && h >= 16 && h < 20, "pmp")
      .when((wd === 1 || wd === 7) && h >= 6 && h < 20, "we")
      .otherwise(lit(null))
  }

  /** P7: rush-hour bucketing macro (reference `5_dbt/READ.md:810-822`). */
  def timeBucket(ts: Column): Column = {
    val h = hour(ts)
    when(h >= 6 && h < 9, "morning_rush")
      .when(h >= 9 && h < 16, "midday")
      .when(h >= 16 && h < 19, "evening_rush")
      .otherwise("off_peak")
  }

  /** F2/P7: day-name decode (reference `5_dbt/READ.md:672-680`, DAYOFWEEK Sun=1). */
  def dayName(ts: Column): Column = {
    val d = dayofweek(ts)
    when(d === 1, "Sunday").when(d === 2, "Monday").when(d === 3, "Tuesday")
      .when(d === 4, "Wednesday").when(d === 5, "Thursday")
      .when(d === 6, "Friday").otherwise("Saturday")
  }

  /** F6: analysis-period label `f"{year}-{month:02d}"` (reference `1_AWS/README.md:130-131`). */
  def periodLabel(year: Column, month: Column): Column =
    format_string("%d-%02d", year, month)
}
