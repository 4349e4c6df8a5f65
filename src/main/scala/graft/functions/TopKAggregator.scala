package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Map-side-combining per-key top-k — the scale alternative to the
 * rank-window form (SURVEY §2.5 W5 / §2.6 T4).
 *
 * `rank().over(partitionBy(key))` shuffles EVERY row to its key's
 * reducer and sorts whole partitions. This Aggregator keeps a bounded
 * k-element buffer per key per map task, so only per-partition winners
 * (≤ k × partitions per key) reach the shuffle — at 100 TB the
 * difference between moving the table and moving a few thousand rows.
 * Spark's ObjectHashAggregate runs it with the standard partial/final
 * split; no custom SparkPlan needed.
 *
 * Ordering is (score DESC, id ASC) — exactly-k row_number semantics with
 * a deterministic tiebreak, NOT tie-keeping RANK (use
 * [[graft.ops.Windows.qualifyTopK]] when ties must survive).
 */
object TopKAggregator {

  type Entry = (Double, Long) // (score, tiebreak id)

  private def better(a: Entry, b: Entry): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  final class TopK(k: Int) extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    override def zero: List[Entry] = Nil

    // insert keeping the buffer sorted best-first and bounded at k —
    // k is small (top-10 shapes), so linear insert beats heap overhead
    private def insert(buf: List[Entry], e: Entry): List[Entry] = {
      val (prefix, suffix) = buf.span(better(_, e))
      val merged = prefix ::: (e :: suffix)
      if (merged.length > k) merged.take(k) else merged
    }

    override def reduce(buf: List[Entry], in: Entry): List[Entry] =
      if (buf.length == k && better(buf.last, in)) buf else insert(buf, in)

    override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      b.foldLeft(a)(insert)

    override def finish(r: List[Entry]): Seq[Entry] = r
    override def bufferEncoder: Encoder[List[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /**
   * Per-key top-k rows as (keys..., score, id): aggregate with the
   * bounded buffer, then explode the winners.
   */
  def topKPerKey(df: DataFrame, keys: Seq[String], scoreCol: Column,
                 idCol: Column, k: Int,
                 scoreName: String = "score", idName: String = "id"): DataFrame = {
    val agg = udaf(new TopK(k))
    df.groupBy(keys.map(col): _*)
      .agg(agg(scoreCol.cast("double"), idCol.cast("long")).as("__top"))
      .select((keys.map(col) :+ explode(col("__top")).as("__e")): _*)
      .select((keys.map(col) :+ col("__e._1").as(scoreName) :+
        col("__e._2").as(idName)): _*)
  }
}
