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
   * P7: the NPMRDS analysis-period classifier, faithful to ALL THREE
   * reference DAGs (reference `1_AWS/README.md:79-91`,
   * `3_BigQuery/READ.md:66-71`, `4_Snowflake/READ.md:65-70`), which share
   * the same masks over pandas `wday = weekday + 1` (Mon=1 … Sun=7):
   *   - "weekday" is `1 < wday < 7`, i.e. **Tue–Sat** (a reference quirk;
   *     Monday is NOT a weekday here);
   *   - 'amp' Tue–Sat 6-10h, 'mid' Tue–Sat 10-16h, 'pmp' Tue–Sat 16-20h;
   *   - 'we' is any REMAINING 6-20h row — Sunday AND Monday;
   *   - everything else (overnight) → NULL, dropped by the caller
   *     (reference `1_AWS/README.md:92`).
   */
  def period(ts: Column): Column = {
    val wd = wdayPandas(ts)
    val h  = hour(ts)
    val tueSat = wd > 1 && wd < 7
    when(tueSat && h >= 6  && h < 10, "amp")
      .when(tueSat && h >= 10 && h < 16, "mid")
      .when(tueSat && h >= 16 && h < 20, "pmp")
      .when(h >= 6 && h < 20, "we")
      .otherwise(lit(null))
  }

  /**
   * P7 variant (NOT reference parity — an intentional fix of the Tue–Sat
   * quirk): ISO weekdays Mon–Fri for the peak periods, Sat+Sun for 'we'.
   * Kept for users who want calendar-correct periods; [[period]] is the
   * reference-faithful classifier.
   */
  def periodIsoWeekday(ts: Column): Column = {
    val wd = wdayPandas(ts)
    val h  = hour(ts)
    val monFri = wd <= 5
    when(monFri && h >= 6  && h < 10, "amp")
      .when(monFri && h >= 10 && h < 16, "mid")
      .when(monFri && h >= 16 && h < 20, "pmp")
      .when(!monFri && h >= 6 && h < 20, "we")
      .otherwise(lit(null))
  }

  /**
   * P7: rush-hour bucketing macro, mirroring the reference CASE exactly —
   * same inclusive BETWEEN bounds, same branch order (hour 22 falls in
   * 'Evening (7-10pm)' because that branch wins), same labels
   * (reference `5_dbt/READ.md:810-822`).
   */
  def timeBucket(ts: Column): Column = {
    val h = hour(ts)
    when(h.between(6, 9), "Morning Rush (6-9am)")
      .when(h.between(15, 18), "Evening Rush (3-6pm)")
      .when(h.between(11, 13), "Midday (11am-1pm)")
      .when(h.between(19, 22), "Evening (7-10pm)")
      .when(h.between(22, 24) || h.between(0, 5), "Overnight (10pm-5am)")
      .otherwise("Other Daytime")
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
