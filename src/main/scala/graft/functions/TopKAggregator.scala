package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
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
 *
 * Id contract ([[topKPerKey]]): integral ids (byte/short/int/long —
 * numeric-ascending tiebreak, emitted as long) or string ids
 * (UTF-8-binary-ascending tiebreak, the ordering Spark and DuckDB both
 * use for strings; JVM UTF-16 comparison diverges on supplementary-plane
 * characters, hence the explicit byte ordering). Any other id type
 * throws up front rather than silently NULL-casting.
 */
object TopKAggregator {

  type Entry = (Double, Long) // (score, tiebreak id)

  /** Insert keeping the buffer sorted best-first and bounded at k —
    * k is small (top-10 shapes), so linear insert beats heap overhead. */
  private def insertSorted[E](buf: List[E], e: E, k: Int,
                              better: (E, E) => Boolean): List[E] = {
    val (prefix, suffix) = buf.span(better(_, e))
    val merged = prefix ::: (e :: suffix)
    if (merged.length > k) merged.take(k) else merged
  }

  private def better(a: Entry, b: Entry): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Input twin of [[Entry]] with a BOXED id: a primitive Long input
    * field would make Spark's encoder coerce a NULL id to 0 before
    * reduce could see it — the boxed field keeps the null visible so
    * direct udaf users get the same dropped-not-phantom semantics as
    * [[TopKS]] (topKPerKey additionally pre-filters). */
  type EntryIn = (Double, java.lang.Long)

  final class TopK(k: Int) extends Aggregator[EntryIn, List[Entry], Seq[Entry]] {
    override def zero: List[Entry] = Nil

    override def reduce(buf: List[Entry], in0: EntryIn): List[Entry] = {
      if (in0._2 == null) return buf // null ids are dropped, not encoded as 0
      val in = (in0._1, in0._2.longValue)
      if (buf.length == k && better(buf.last, in)) buf
      else insertSorted(buf, in, k, better)
    }

    override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      b.foldLeft(a)((acc, e) => insertSorted(acc, e, k, better))

    override def finish(r: List[Entry]): Seq[Entry] = r
    override def bufferEncoder: Encoder[List[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  type EntryS = (Double, String)

  /** UTF-8 binary comparison — byte-wise unsigned, the collation Spark's
    * UTF8String and DuckDB's default both implement. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  private def betterS(a: EntryS, b: EntryS): Boolean =
    a._1 > b._1 || (a._1 == b._1 && utf8Lt(a._2, b._2))

  /** String-id twin of [[TopK]] — same bounded buffer, UTF-8-binary
    * ascending tiebreak. */
  final class TopKS(k: Int) extends Aggregator[EntryS, List[EntryS], Seq[EntryS]] {
    override def zero: List[EntryS] = Nil

    override def reduce(buf: List[EntryS], in: EntryS): List[EntryS] =
      if (in._2 == null) buf // null ids are dropped, not NPE'd in utf8Lt
      else if (buf.length == k && betterS(buf.last, in)) buf
      else insertSorted(buf, in, k, betterS)

    override def merge(a: List[EntryS], b: List[EntryS]): List[EntryS] =
      b.foldLeft(a)((acc, e) => insertSorted(acc, e, k, betterS))

    override def finish(r: List[EntryS]): Seq[EntryS] = r
    override def bufferEncoder: Encoder[List[EntryS]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[EntryS]]()
    override def outputEncoder: Encoder[Seq[EntryS]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[EntryS]]()
  }

  /**
   * Per-key top-k rows as (keys..., score, id): aggregate with the
   * bounded buffer, then explode the winners. Dispatches on the id
   * column's type — integral ids run the long buffer (id emitted as
   * long), string ids the UTF-8-ordered string buffer.
   *
   * NULL-id rows are dropped up front: the integral encoder would
   * silently coerce a NULL id to 0 and the string comparator would
   * NPE — neither is a sane ranking entry. A caller who needs
   * NULL-id rows ranked must key them explicitly (coalesce to a
   * sentinel) or use the tie-keeping window form.
   */
  def topKPerKey(df0: DataFrame, keys: Seq[String], scoreCol: Column,
                 idCol: Column, k: Int,
                 scoreName: String = "score", idName: String = "id"): DataFrame = {
    import org.apache.spark.sql.types._
    val df = df0.filter(idCol.isNotNull)
    val idType = df.select(idCol).schema.head.dataType
    val agg = idType match {
      case ByteType | ShortType | IntegerType | LongType => udaf(new TopK(k))
      case StringType => udaf(new TopKS(k))
      case other => throw new IllegalArgumentException(
        s"topKPerKey id column must be integral or string, got ${other.simpleString}")
    }
    val castId = idType match {
      case StringType => idCol
      case _          => idCol.cast("long")
    }
    df.groupBy(keys.map(col): _*)
      .agg(agg(scoreCol.cast("double"), castId).as("__top"))
      .select((keys.map(col) :+ explode(col("__top")).as("__e")): _*)
      .select((keys.map(col) :+ col("__e._1").as(scoreName) :+
        col("__e._2").as(idName)): _*)
  }
}
