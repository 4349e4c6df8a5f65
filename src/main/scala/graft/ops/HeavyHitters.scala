package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Exact φ-heavy hitters (all keys with count > n/k) without a full
 * distinct-key shuffle — the two-phase candidate/verify shape.
 *
 * A plain `GROUP BY key HAVING count(*) > n/k` shuffles one partial per
 * DISTINCT key per map task; at 10⁹⁺ distinct keys (URLs, user ids,
 * n-grams) the exchange is the cost even though the answer has at most
 * k − 1 rows. This operator instead:
 *
 *  1. runs a Misra-Gries summary of size k inside each partition
 *     (mapPartitions, bounded O(k) state, one pass, nothing spilled).
 *     Pigeonhole guarantee: a key with GLOBAL count > n/k must exceed
 *     size_p/k in at least one partition p (were it ≤ size_p/k in every
 *     one, summing across partitions gives ≤ n/k) — and Misra-Gries
 *     keeps every key whose partition count exceeds partitionSize/k, so
 *     the union of per-partition survivors is a SUPERSET of the true
 *     heavy hitters;
 *  2. broadcasts the candidate set (≤ k × partitions keys — kilobytes,
 *     independent of n) back over the data as a semi-join and
 *     exact-counts ONLY the candidates: the aggregation that shuffles
 *     now carries partials for a bounded key set, not the key universe;
 *  3. filters by the exact global threshold.
 *
 * The candidate set depends on partitioning; the verified OUTPUT does
 * not (it equals the plain GROUP BY/HAVING oracle exactly, under any
 * partitioning — the driver-collect of candidates is bounded by k × P,
 * the same scale contract as a broadcast build side).
 */
object HeavyHitters {

  /** Per-partition Misra-Gries: ≤ k (key, low-watermark-count) slots; a
    * key not in a full summary decrements all slots and evicts zeros.
    * Survivor set ⊇ every key with partition count > partitionSize/k. */
  private[graft] def misraGries(it: Iterator[Any], k: Int): Iterator[Any] = {
    val slots = new java.util.HashMap[Any, java.lang.Long](k * 2)
    it.foreach { key =>
      val cur = slots.get(key)
      if (cur != null) {
        slots.put(key, cur + 1L)
      } else if (slots.size < k) {
        slots.put(key, 1L)
      } else {
        val iter = slots.entrySet().iterator()
        while (iter.hasNext) {
          val e = iter.next()
          if (e.getValue <= 1L) iter.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    // copy: the iterator must not depend on the (mutable) map after return
    slots.keySet().asScala.toVector.iterator
  }

  /**
   * Exact heavy hitters: all values of `keyCol` with count > n/k, with
   * their exact counts, as columns (`keyCol`, `n`). Output is identical
   * to `SELECT keyCol, count(*) FROM df GROUP BY 1 HAVING count(*) > n/k`
   * (integer-floor threshold — equivalent for integer counts).
   */
  def exact(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 1, "k must be > 1")
    val spark = df.sparkSession
    val keyed = df.select(keyCol)
    // phase 1: candidate generation — O(k) state per task, no shuffle
    val candidates = keyed.rdd
      .mapPartitions(rows => misraGries(rows.map(_.get(0)), k))
      .distinct()
      .collect()
    val candDf = spark.createDataFrame(
      spark.sparkContext.parallelize(candidates.toSeq.map(Row(_)), 1),
      keyed.schema)
    // phase 2: exact count of the candidates only — the broadcast
    // semi-join culls the key universe BEFORE the exchange
    val total = keyed.count()
    keyed.join(broadcast(candDf), Seq(keyCol), "left_semi")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > total / k)
  }
}
