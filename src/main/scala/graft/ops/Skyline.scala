package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * 2-D Pareto skyline — the multi-objective generalization of top-k
 * (T-family): keep every row no other row dominates, where "dominates"
 * means ≥ on BOTH objectives and > on at least one (the standard
 * Börzsönyi et al., ICDE'01 definition; ties on both axes are mutually
 * non-dominating and ALL kept). Minimizing an objective = negate the
 * column at the call site.
 *
 * Two-phase distributed shape (the classic skyline decomposition —
 * dominance inside any subset is valid global pruning, so a local
 * skyline pass can never drop a global-skyline point):
 *
 *  1. LOCAL prune per hash bucket: within each of `buckets` hash
 *     buckets, collapse to per-x max-y (one hash aggregation), then a
 *     per-bucket running max over x-descending order (window PARTITIONED
 *     by bucket — never a global sort) keeps x values whose max-y
 *     strictly beats everything at larger x in the bucket.
 *  2. GLOBAL pass over the survivors: the same per-x-max + running-max
 *     algorithm, unpartitioned. Survivors = the union of per-bucket
 *     skylines; for data in general position that is O(buckets ×
 *     |skyline|), and the skyline's own output size bounds the final
 *     window. (Worst case — all points Pareto-optimal — the output IS
 *     the input; that is inherent to the operator, not this plan.)
 *
 * A row survives iff its (x, y) pair sits on the global frontier:
 * y equals the frontier max-y at its x, and that max-y strictly exceeds
 * the running max over all strictly-larger x. Duplicate frontier points
 * are all returned (dominance is strict-somewhere by definition).
 *
 * Scale notes: phase 1 is one shuffle on (bucket, x) + a bucket-
 * partitioned window; phase 2 runs on the pruned frame only; the final
 * membership test is an inner equi-join of the input against the
 * frontier (x, y) pairs — broadcast-sized whenever the skyline is
 * (AQE decides). Nothing all-pairs anywhere.
 */
object Skyline {

  /** Frontier (x, y) pairs of `df` maximizing both columns — one row per
    * distinct frontier point, aliased (xCol, yCol). */
  private def frontier(pts: DataFrame, buckets: Int): DataFrame = {
    // local prune: per-bucket per-x max-y, then per-bucket running max
    // over strictly-larger x (one row per (bucket, x) after the agg, so
    // a rows-frame ending at -1 is exactly "all strictly larger x")
    val perX = pts
      .withColumn("__b", pmod(hash(col("__x"), col("__y")), lit(buckets)))
      .groupBy(col("__b"), col("__x")).agg(max(col("__y")).as("__my"))
    val wLoc = Window.partitionBy(col("__b")).orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = perX
      .withColumn("__pm", max(col("__my")).over(wLoc))
      .filter(col("__pm").isNull || col("__my") > col("__pm"))
      .select(col("__x"), col("__my"))
    // global pass on the pruned frame: same algorithm, unpartitioned —
    // runs over the union of per-bucket skylines only
    val perXg = local.groupBy(col("__x")).agg(max(col("__my")).as("__my"))
    val wGlob = Window.orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    perXg
      .withColumn("__pm", max(col("__my")).over(wGlob))
      .filter(col("__pm").isNull || col("__my") > col("__pm"))
      .select(col("__x"), col("__my").as("__y"))
  }

  /**
   * All rows of `df` on the Pareto frontier maximizing (`xCol`, `yCol`),
   * original schema preserved. `buckets` sizes the local-prune fan-out
   * (parallelism knob only — the result is bucket-independent because
   * local pruning is conservative).
   */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
                buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets $buckets must be positive")
    val pts = df.select(col(xCol).as("__x"), col(yCol).as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val front = frontier(pts, buckets)
      .select(col("__x").as(xCol), col("__y").as(yCol))
    df.join(front, Seq(xCol, yCol), "left_semi")
  }
}
