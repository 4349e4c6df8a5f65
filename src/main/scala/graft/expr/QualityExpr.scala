package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Value-sanitization and guard expressions — SURVEY §2.2 P8/P9, §2.8 F7.
 *
 * The reference sanitizes out-of-range sensor readings to NULL at the
 * staging layer (`CASE WHEN vehicle_count < 0 THEN NULL WHEN > 10000 THEN
 * NULL …`, reference `5_dbt/READ.md:170-179,216-225`) and guards division
 * with `NULLIF(x, 0)` (`5_dbt/READ.md:523,801-803`).
 *
 * NULL-semantics hazards pinned here (SURVEY §7.4.4/5):
 *  - Spark `x / 0` already yields NULL (ANSI off), but we still route all
 *    ratio math through [[safeDiv]] so the intent is explicit and the
 *    duckdb oracle (which raises on /0 unless NULLIF'd) agrees.
 *  - Aggregates skip NULLs in both engines, but COUNT(*) vs COUNT(col)
 *    differ — pipelines mirror the reference's explicit IS NOT NULL
 *    filters rather than relying on skip-NULL behavior.
 */
object QualityExpr {

  /** P8: values outside [lo, hi] → NULL, else unchanged. */
  def sanitizeRange(c: Column, lo: Double, hi: Double): Column =
    when(c < lo || c > hi, lit(null)).otherwise(c)

  /** F7: division with NULLIF(denominator, 0) guard. */
  def safeDiv(num: Column, den: Column): Column = num / nullif(den, lit(0))

  /** P9: COALESCE to a constant (pandas `fillna`, reference `4_Snowflake/READ.md:91`). */
  def fillNull(c: Column, default: Double): Column = coalesce(c, lit(default))

  /** Clamp a ratio into [0, 1] (congestion-index macro, reference `5_dbt/READ.md:800-804`). */
  def clamp01(c: Column): Column = least(greatest(c, lit(0d)), lit(1d))
}
