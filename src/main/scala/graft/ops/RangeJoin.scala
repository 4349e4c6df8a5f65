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
}
