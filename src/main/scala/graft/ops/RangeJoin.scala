package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Range (interval-containment) join — extension beyond the reference's
 * equi-joins (SURVEY §2.3), the second operator the brief names that
 * Spark lacks natively.
 *
 * `left.value BETWEEN right.lo AND right.hi` naively plans as a
 * nested-loop over every pair. The scale-safe shape buckets the value
 * domain: each right interval explodes to the buckets it covers, each
 * left row maps to ONE bucket, and the join becomes an equi-join on
 * bucket id with a residual BETWEEN filter — shuffle volume is
 * O(rows + intervals × span/bucketWidth), never rows × intervals.
 *
 * Pick `bucketWidth` ≈ the typical interval span: too small explodes
 * the right side, too large degrades to per-bucket nested loops.
 */
object RangeJoin {

  def bucketedRangeJoin(left: DataFrame, leftVal: String,
                        right: DataFrame, lo: String, hi: String,
                        bucketWidth: Double): DataFrame = {
    val leftB = left.withColumn("__bucket",
      floor(col(leftVal) / bucketWidth).cast("long"))
    val rightB = right
      .withColumn("__bucket",
        explode(sequence(floor(col(lo) / bucketWidth).cast("long"),
          floor(col(hi) / bucketWidth).cast("long"))))
    leftB.join(rightB, Seq("__bucket"))
      .filter(col(leftVal).between(col(lo), col(hi)))
      .drop("__bucket")
  }

  /**
   * Interval-OVERLAP join — both sides are intervals and a pair matches
   * when `[lLo,lHi] ∩ [rLo,rHi] ≠ ∅` (closed endpoints). Distinct from
   * [[bucketedRangeJoin]]'s point-in-interval shape: the naive plan is
   * again a nested loop, and the tiling fix must now explode BOTH sides
   * over the tiles they cover, which makes every overlapping pair meet
   * once per SHARED tile. The usual post-join `distinct` re-shuffles the
   * whole pair set; instead each pair is kept only in its first shared
   * tile — `max(floor(lLo/w), floor(rLo/w))`, the tile where the
   * later-starting interval begins, which both rows of any overlapping
   * pair compute identically — so the output is exactly-once with zero
   * extra exchanges.
   *
   * Shuffle volume is O(Σ span/bucketWidth) over both inputs; pick
   * `bucketWidth` ≈ the typical interval span (same trade-off as
   * [[bucketedRangeJoin]]). Column names must not collide across sides.
   */
  def intervalOverlapJoin(left: DataFrame, lLo: String, lHi: String,
                          right: DataFrame, rLo: String, rHi: String,
                          bucketWidth: Double): DataFrame = {
    def tiled(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__tile",
        explode(sequence(floor(col(lo) / bucketWidth).cast("long"),
          floor(col(hi) / bucketWidth).cast("long"))))
    tiled(left, lLo, lHi).join(tiled(right, rLo, rHi), Seq("__tile"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__tile") ===
        greatest(floor(col(lLo) / bucketWidth).cast("long"),
          floor(col(rLo) / bucketWidth).cast("long")))
      .drop("__tile")
  }
}
