package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Distributed global row index — the scale-safe replacement for
 * `row_number() OVER (ORDER BY ...)` with no PARTITION BY, which plans a
 * SinglePartition exchange: every row of the table flows through ONE
 * reducer to receive its number (the classic 100 TB cliff; fine at 10⁶
 * rows, fatal at 10¹¹).
 *
 * This operator assigns the same numbers without ever materializing a
 * single partition:
 *  1. range-repartition on the order keys (sampled boundaries, so
 *     partitions hold contiguous, ordered key ranges),
 *  2. sort within each partition (parallel, spillable),
 *  3. one count pass computes per-partition row counts; each partition
 *     then offsets its local sequence by the counts before it
 *     (`RDD.zipWithIndex` — the offsets are a P-element driver array).
 *
 * Output == `row_number() over (order by keys) - 1` EXACTLY whenever the
 * order keys are a total order (include a unique tiebreak column,
 * exactly as any deterministic window query must). Two passes over the
 * data instead of one — the price of unbounded parallelism.
 */
object RowIndex {

  /** Append a 0-based `idxCol` in ascending `orderCols` order. */
  def globalIndex(df: DataFrame, orderCols: Seq[String],
                  idxCol: String = "idx"): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = sorted.schema.add(idxCol, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(indexed, schema)
  }
}
