package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Domain metric formulas — SURVEY §2.2 P2, §2.8 F8.
 *
 * Every travel-time metric in the reference is a scalar ratio of
 * aggregated percentiles/means:
 *  - TTI  = p85 / p50            (reference `1_AWS/README.md:102`)
 *  - PTI  = p95 / p50            (reference `1_AWS/README.md:103`)
 *  - severity    = (TTI + PTI)/2 (reference `2_Azure/READ.md:72`)
 *  - variability = PTI / TTI     (reference `2_Azure/READ.md:73`)
 *  - LOTTR = p80 / p50           (reference `4_Snowflake/READ.md:83`)
 *  - congestion index (the dbt macro — the reference's only "UDF"):
 *    `(1 - speed/limit) * (volume / (2000 * lanes))` clamped to [0,1]
 *    with NULLIF guards (reference `5_dbt/READ.md:786-807`).
 *
 * All are Column-returning Scala functions: zero serialization, fully
 * codegen'd, and Catalyst folds/pushes through them (SURVEY §2.10).
 */
object MetricExpr {
  import QualityExpr.{safeDiv, clamp01}

  def tti(p85: Column, p50: Column): Column = safeDiv(p85, p50)
  def pti(p95: Column, p50: Column): Column = safeDiv(p95, p50)
  def severity(tti: Column, pti: Column): Column = (tti + pti) / 2
  def variability(pti: Column, tti: Column): Column = safeDiv(pti, tti)
  def lottr(p80: Column, p50: Column): Column = safeDiv(p80, p50)

  /** Per-lane-hour capacity constant from the macro (reference `5_dbt/READ.md:794`). */
  val LaneCapacityPerHour = 2000d

  /**
   * F8: congestion index, faithful to the macro's CASE
   * (reference `5_dbt/READ.md:786-807`):
   *   - speed/volume NULL → NULL
   *   - speed <= 0 → 1.0 (max congestion)
   *   - else LEAST((1 - speed/NULLIF(limit,0)) * (volume/NULLIF(2000*lanes,1)), 1.0)
   * The macro clamps only from ABOVE (no lower clamp to 0). NULL factors
   * (speed_limit = 0, lanes NULL) propagate to NULL — the product is
   * guarded explicitly because Spark's `least` would otherwise skip the
   * NULL and return 1.0, violating the [0,1] ∪ {NULL} contract
   * (reference `5_dbt/READ.md:746-748`).
   */
  def congestionIndex(volume: Column, speed: Column, speedLimit: Column,
                      lanes: Column): Column = {
    val speedFactor  = lit(1d) - safeDiv(speed, speedLimit)
    val volumeFactor = volume / nullif(lit(LaneCapacityPerHour) * lanes, lit(1d))
    val product      = speedFactor * volumeFactor
    when(speed.isNull || volume.isNull, lit(null))
      .when(speed <= 0, lit(1d))
      .otherwise(when(product.isNull, lit(null)).otherwise(least(product, lit(1d))))
  }

  /** P2: speed ratio `avg_speed / speed_limit` (reference `5_dbt/READ.md:720`). */
  def speedRatio(speed: Column, limit: Column): Column = safeDiv(speed, limit)

  /** A3/F9: exceedance flag → rate is `avg(flag.cast(double))` (reference `3_BigQuery/READ.md:119-122`). */
  def exceeds(c: Column, threshold: Double): Column = (c > threshold).cast("double")
}
