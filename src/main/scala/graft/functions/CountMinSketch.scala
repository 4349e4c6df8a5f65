package graft.functions

import org.apache.spark.sql.{Column, Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Count-Min sketch (Cormode & Muthukrishnan 2005) as a mergeable Spark
 * [[Aggregator]] — the fixed-size frequency summary a streaming or
 * multi-source pipeline keeps when exact per-key counts are too big to
 * hold: d hash rows × w counters, point estimate = min over rows of the
 * key's counter. Estimates NEVER undercount (every occurrence lands in
 * each row's counter; collisions only add), and overcount by at most
 * ‖stream‖·e/w with probability 1 − e^−d — the one-sided-error
 * complement to the registry's other sketches (HLL: distinct count,
 * Misra-Gries `HeavyHitters`: exact-candidate top-k).
 *
 * Mergeability is element-wise addition, so partial sketches combine
 * map-side and across sources/batches without rescanning — the same
 * contract `hll_union_agg` gives HLL. The whole sketch is d·w longs
 * (kilobytes), a legitimate driver value like the k-means centroid
 * array.
 *
 * Hashing is oracle-reproducible by construction (the
 * [[graft.ext.Classifier.tokenBucket]] convention, widened): row j
 * hashes key s to the first 16 bits of md5("j:s") mod w — any engine
 * with an md5 function recomputes every counter bit-identically, which
 * is what lets `ext_cms_vocab_freq` carry a full DuckDB oracle instead
 * of a bounds-only check. 16 bits caps the useful width at w ≤ 65536 —
 * enforced — and d·w stays driver-kilobytes well below that.
 */
object CountMinSketch {

  /** Row-j bucket of `key`: first 2 md5 bytes of "j:key" (== first 4 hex
    * chars parsed base-16) mod w. */
  def hashIdx(j: Int, key: String, w: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$key".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % w
  }

  /** The same bucket as a Column over Spark's md5 — for scoring a frame
    * of keys against a collected sketch without moving the keys to the
    * driver. Bit-identical to [[hashIdx]]. */
  def hashIdxCol(j: Int, key: Column, w: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$j:"), key)), 1, 4), 16, 10)
      .cast("int"), lit(w))

  /** Flat row-major d×w counter buffer; null keys are skipped (a null
    * cell has no frequency, matching COUNT semantics). */
  final class Sketch(d: Int, w: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(d >= 1 && w >= 2 && w <= 65536,
      s"need 1 <= d, 2 <= w <= 65536; got d=$d w=$w")
    override def zero: Array[Long] = new Array[Long](d * w)
    override def reduce(buf: Array[Long], key: String): Array[Long] = {
      if (key != null) {
        var j = 0
        while (j < d) { buf(j * w + hashIdx(j, key, w)) += 1; j += 1 }
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** One distributed pass → the merged d·w sketch on the driver (the
    * bounded-driver-state contract: kilobytes, like kmeans centroids). */
  def build(keys: Dataset[String], d: Int, w: Int): Array[Long] =
    keys.select(new Sketch(d, w).toColumn).head()

  /** Point estimate for one key (driver-side). */
  def estimate(sketch: Array[Long], d: Int, w: Int, key: String): Long = {
    require(sketch.length == d * w, s"sketch length ${sketch.length} != d*w")
    (0 until d).map(j => sketch(j * w + hashIdx(j, key, w))).min
  }

  /** Point-estimate Column: min over rows of the key's counter, the
    * sketch riding as a broadcast literal — scoring any frame of keys is
    * scan-only (no join, no shuffle). */
  def estimateCol(sketch: Array[Long], d: Int, w: Int, key: Column): Column = {
    require(sketch.length == d * w, s"sketch length ${sketch.length} != d*w")
    val skLit = typedLit(sketch.toSeq)
    least((0 until d).map(j =>
      element_at(skLit, lit(j * w) + hashIdxCol(j, key, w) + lit(1))): _*)
  }
}
