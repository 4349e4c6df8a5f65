package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Bloom filter with oracle-reproducible hashing — the third mergeable
 * sketch next to [[CountMinSketch]] (frequency) and [[HyperLogLog]]
 * (distinct count): k md5-derived bit positions per key, membership =
 * all k bits set, false positives possible, false negatives never.
 * Spark's built-in `stat.bloomFilter` stays the production default
 * where its opaque bits suffice (the incremental-dedup gate restores
 * exactness with an anti-join regardless — `Dedup.incrementalBloom`);
 * this implementation exists for what the built-in can't give:
 * engine-independent bits (any SQL engine with md5 rebuilds the filter
 * bit-for-bit → membership flags and the measured false-positive rate
 * carry a full DuckDB oracle) and a RELATIONAL filter form.
 *
 * The relational form is the interesting one at scale: the filter is a
 * table of DISTINCT set bit positions (≤ m rows of one int — kilobytes
 * for any practical m), so it merges by UNION, persists as an ordinary
 * table, broadcasts for probe joins, and a probe is membership-counting
 * against it — no bit arithmetic in SQL, no binary blob to ship.
 * [[Pack]] is the bit-packed typed twin (m/64 longs, merge = OR) for
 * driver-side gating, spec-asserted bit-identical.
 *
 * Hashing: position j of key s = first 16 bits of md5("j:s") mod m
 * (the [[CountMinSketch.hashIdx]] convention) — caps m at 65536,
 * enforced; pick m ≈ −n·ln(p)/ln(2)² and k ≈ (m/n)·ln 2 as usual.
 */
object BloomSketch {

  /** Bit position j of `key` (driver-side). */
  def posIdx(j: Int, key: String, m: Int): Int =
    CountMinSketch.hashIdx(j, key, m)

  /** The same position as a Column over Spark's md5 — bit-identical. */
  def posIdxCol(j: Int, key: Column, m: Int): Column =
    CountMinSketch.hashIdxCol(j, key, m)

  /**
   * Relational filter build: the DISTINCT bit positions set by `keys`
   * — one explode + one distinct-aggregation, ≤ m output rows. Merge
   * filters by unioning position tables (and re-distincting).
   */
  def positions(df: DataFrame, keyCol: String, k: Int, m: Int): DataFrame = {
    require(k >= 1 && m >= 2 && m <= 65536,
      s"need 1 <= k, 2 <= m <= 65536; got k=$k m=$m")
    df.filter(col(keyCol).isNotNull)
      .select(explode(array((0 until k).map(j =>
        posIdxCol(j, col(keyCol), m)): _*)).as("pos"))
      .distinct()
  }

  /**
   * Membership probe against a [[positions]] table: a key might be a
   * member iff ALL k of its positions are set. The positions table is
   * ≤ m rows — broadcast it; the probe is then one scan-side join +
   * count, no corpus shuffle. Probe keys are DISTINCTed up front
   * (one row out per distinct key): counting hits over a duplicated
   * key would see d·k semi-join survivors and fail the `=== k` test —
   * a false NEGATIVE, which the Bloom contract forbids.
   */
  def mightContain(probe: DataFrame, keyCol: String,
                   filterPositions: DataFrame, k: Int, m: Int): DataFrame = {
    val keys = probe.select(col(keyCol)).distinct()
    val exploded = keys
      .select(col(keyCol), explode(array((0 until k).map(j =>
        posIdxCol(j, col(keyCol), m)): _*)).as("pos"))
    exploded
      .join(broadcast(filterPositions.select(col("pos"))), Seq("pos"),
        "left_semi")
      .groupBy(col(keyCol)).agg(count(lit(1)).as("__hits"))
      .join(keys, Seq(keyCol), "right")
      .select(col(keyCol),
        (coalesce(col("__hits"), lit(0L)) === k).as("might_contain"))
  }

  /** Bit-packed typed twin: m/64 longs, reduce sets k bits, merge ORs —
    * the driver-gating form, spec-asserted identical to [[positions]]. */
  final class Pack(k: Int, m: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(k >= 1 && m >= 2 && m <= 65536 && m % 64 == 0,
      s"need 1 <= k, 2 <= m <= 65536, 64 | m; got k=$k m=$m")
    override def zero: Array[Long] = new Array[Long](m / 64)
    override def reduce(buf: Array[Long], key: String): Array[Long] = {
      if (key != null) {
        var j = 0
        while (j < k) {
          val p = posIdx(j, key, m)
          buf(p >> 6) |= (1L << (p & 63))
          j += 1
        }
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** One distributed pass → the packed filter on the driver. */
  def build(keys: Dataset[String], k: Int, m: Int): Array[Long] =
    keys.select(new Pack(k, m).toColumn).head()

  /** Driver-side membership against a packed filter. */
  def mightContainPacked(filter: Array[Long], k: Int, m: Int,
                         key: String): Boolean = {
    require(filter.length == m / 64, s"filter length ${filter.length} != m/64")
    (0 until k).forall { j =>
      val p = posIdx(j, key, m)
      (filter(p >> 6) & (1L << (p & 63))) != 0L
    }
  }
}
