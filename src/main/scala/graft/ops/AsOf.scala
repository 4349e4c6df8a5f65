package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (most-recent-prior) join — an operator Spark's built-in joins
 * don't express (extension beyond the reference surface; the reference
 * has equi-joins only, SURVEY §2.3).
 *
 * Semantics: for each left row, attach the right row with the largest
 * `rightTime <= leftTime` within the same key group (LEFT OUTER flavor —
 * left rows with no prior right row keep NULLs). Matches DuckDB/kdb
 * ASOF JOIN semantics, which the oracle uses directly.
 *
 * Scale shape: implemented as union → single window pass (partition by
 * key, order by time), i.e. ONE shuffle on the key — never a range
 * cross-product and no per-row probing. The right side must be unique
 * per (key, time): pre-aggregate it (the API enforces this by taking
 * the already-aggregated frame).
 */
object AsOf {

  /**
   * @param left       probe rows
   * @param right      build rows, unique per (keys, rightTime)
   * @param keys       equi-key columns present on both sides
   * @param leftTime   event-time column name on `left`
   * @param rightTime  event-time column name on `right`
   * @param payload    right columns to carry onto matching left rows
   */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // one unioned relation: right rows first at equal timestamps so the
    // running last_value is inclusive (>= semantics, like ASOF JOIN)
    val taggedLeft = payload.foldLeft(
        left.withColumn("__t", col(leftTime)).withColumn("__isLeft", lit(1)))(
      (df, c) => df.withColumn(c, lit(null)))
    val taggedRight = leftCols.foldLeft(
        right.withColumn("__t", col(rightTime)).withColumn("__isLeft", lit(0)))(
      (df, c) => if (keys.contains(c)) df else df.withColumn(c, lit(null)))
    val unioned = taggedLeft.select((keys ++ leftCols.filterNot(keys.contains) ++
        payload ++ Seq("__t", "__isLeft")).distinct.map(col): _*)
      .unionByName(taggedRight.select((keys ++ leftCols.filterNot(keys.contains) ++
        payload ++ Seq("__t", "__isLeft")).distinct.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__isLeft"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    filled.filter(col("__isLeft") === 1).drop("__t", "__isLeft")
  }
}
