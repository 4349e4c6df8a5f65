package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/**
 * KMV / bottom-k distinct-value sketch (Bar-Yossef et al. 2002; Beyer,
 * Haas, Reinwald, Sismanis & Gemulla, SIGMOD 2007 "On synopses for
 * distinct-value estimation") with oracle-reproducible hashing — the
 * sketch that completes what [[HyperLogLog]] cannot do: SET-EXPRESSION
 * cardinality. HLL registers union losslessly but intersect only via
 * inclusion-exclusion (variance explodes for small overlaps); a KMV
 * synopsis supports union, intersection, difference and Jaccard
 * directly, because the bottom-k hash values of a set ARE a uniform
 * size-k sample of the union's hash space.
 *
 * Hashing (the [[CountMinSketch]]/[[HyperLogLog]] md5 convention):
 * hash = first 12 md5 hex digits of the key, KEPT AS THE HEX STRING.
 * md5 hex is `[0-9a-f]` ASCII, so lexicographic string order equals
 * numeric order of the 48-bit value in Spark (UTF-8 binary) and DuckDB
 * alike — the sketch is an order statistic over strings both engines
 * sort identically, and no engine-specific integer hashing exists
 * anywhere in the pipeline. The numeric value is materialized exactly
 * once, for the k-th order statistic inside [[estimate]] (48 bits
 * < 2^53: exact in a double; DuckDB replays via `('0x' || h)::BIGINT`).
 *
 * Estimator (unbiased KMV): with U_(k) = h_k / 2^48 the k-th smallest
 * normalized hash, D ≈ (k-1) / U_(k). A group holding FEWER than k
 * distinct hashes degenerates to exact: the sketch IS the distinct set.
 * Determinism: h_k is a max over distinct strings (order-free); the
 * estimate is one constant-times-reciprocal IEEE operation; the
 * standard round(+1e-9, 6) absorbs cross-engine ulps, so the ESTIMATE
 * ITSELF hash-matches in DuckDB — a stronger oracle than the HLL row's
 * within-bound boolean.
 *
 * Intersection (Beyer et al. §4): build the union's bottom-k K∪ (just
 * the k smallest of the merged sketches — KMV is closed under union);
 * every hash in K∪ known to both sides is an intersection witness;
 *   |A∩B| ≈ (witnesses / k') · D̂(A∪B),   k' = |K∪| ≤ k,
 * which also degenerates to exact when the union carries fewer than k
 * hashes. Jaccard ≈ witnesses / k' directly.
 *
 * Scale: two physical forms, asserted bit-identical in `KmvSketchSpec`.
 * The relational [[bottomK]] is distinct-shuffle + per-group rank —
 * the same first stage as exact COUNT(DISTINCT), acceptable when a
 * distinct pass is already being paid. The typed [[MinK]] aggregator
 * is the 100 TB form: ObjectHashAggregate partials keep ≤ k hashes per
 * group per map task, so the shuffle moves k × partitions rows per
 * group instead of the distinct key universe — and the same ≤ k-string
 * state is the streaming/standing-table unit
 * ([[graft.streaming.SketchIngest.kmvIngest]]), mergeable across
 * batch/source/stream boundaries by construction (merge = sorted
 * union, truncate at k).
 */
object KmvSketch {

  /** Hex digits kept from md5: 12 → a 48-bit hash space. */
  val HexDigits = 12

  /** 16^12 = 2^48 as an exact double (well under 2^53). */
  val HashSpace: Double = 281474976710656.0

  /** The sketch hash of `key`: first 12 md5 hex digits, as the hex
    * string (lexicographic = numeric order; see object scaladoc). */
  def hashCol(key: Column): Column = substring(md5(key), 1, HexDigits)

  /** Numeric value of a hex hash string — exact in a long/double. */
  def hashValue(h: Column): Column = conv(h, 16, 10).cast("long")

  /**
   * Relational bottom-k synopsis: one row per (group, hash) with
   * `rank` ∈ [1, k], hashes distinct and ranked ascending. Empty
   * `groupCols` gives the global sketch (planned as
   * TakeOrderedAndProject — no single-reducer window). Null keys are
   * skipped (the sketch-family convention: a null contributes no
   * distinct value).
   */
  def bottomK(df: DataFrame, keyCol: String, k: Int,
              groupCols: Seq[String] = Nil): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    rerank(df.filter(col(keyCol).isNotNull)
      .select(groupCols.map(col) :+
        hashCol(col(keyCol).cast("string")).as("hash"): _*), k, groupCols)
  }

  /**
   * Distinct-count estimate per group from a [[bottomK]]-shaped table
   * (any frame of distinct (group, hash) rows with ≤ k per group
   * works — rank is not consulted). Emits (groupCols…, est) with est
   * rounded to 6 digits; a group with fewer than k hashes is exact by
   * construction.
   */
  def estimate(sketch: DataFrame, k: Int,
               groupCols: Seq[String] = Nil): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) sketch.groupBy()
      else sketch.groupBy(groupCols.map(col): _*)
    val agged = grouped.agg(
      count(lit(1)).as("__n"),
      max(col("hash")).as("__kth"))
    val raw = lit((k - 1).toDouble * HashSpace) /
      hashValue(col("__kth")).cast("double")
    agged.select(groupCols.map(col) :+
      round(when(col("__n") < k, col("__n").cast("double"))
        .otherwise(raw) + lit(1e-9), 6).as("est"): _*)
  }

  /**
   * Collapse any (groupCols…, hash) frame — appended batch sketches, a
   * standing ingest table, a merged pair — back to the bottom-k form:
   * distinct hashes, ranked ascending, rank ≤ k. KMV's closure under
   * union makes this THE maintenance/merge primitive: bottom-k of a
   * union equals bottom-k of the union of bottom-k's.
   */
  def rerank(hashes: DataFrame, k: Int,
             groupCols: Seq[String] = Nil): DataFrame = {
    val merged = hashes
      .select((groupCols :+ "hash").map(col): _*).distinct()
    if (groupCols.isEmpty)
      merged.orderBy(col("hash")).limit(k)
        .withColumn("rank", row_number().over(Window.orderBy(col("hash"))))
    else {
      val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("hash"))
      merged.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
    }
  }

  /**
   * Bottom-k of the UNION of two sketches (KMV is closed under union:
   * the k smallest of the merged distinct hash sets are exactly the
   * bottom-k of A∪B). Inputs are [[bottomK]]-shaped; group columns
   * must match.
   */
  def unionSketch(a: DataFrame, b: DataFrame, k: Int,
                  groupCols: Seq[String] = Nil): DataFrame = {
    val cols = (groupCols :+ "hash").map(col)
    rerank(a.select(cols: _*).unionByName(b.select(cols: _*)), k, groupCols)
  }

  /**
   * Set-expression estimates from two sketches (global form): ONE row
   * (union_est, inter_est, diff_est, jaccard_est), every figure
   * deterministic and DuckDB-replayable. `diff_est` is |A \ B| =
   * union − |B| (estimates), clamped at 0. Witnesses are counted with
   * k' = |K∪| so the small-union case degenerates to exact.
   */
  def setOps(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val u = unionSketch(a, b, k)
    val estU = estimate(u, k).select(col("est").as("__u"))
    val estB = estimate(b, k).select(col("est").as("__b"))
    val wit = u.join(a.select(col("hash")), Seq("hash"), "left_semi")
      .join(b.select(col("hash")), Seq("hash"), "left_semi")
      .agg(count(lit(1)).as("__w"))
    val kp = u.agg(count(lit(1)).as("__kp"))
    wit.crossJoin(kp).crossJoin(estU).crossJoin(estB).select(
      round(col("__u") + lit(1e-9), 6).as("union_est"),
      round(col("__w") / col("__kp") * col("__u") + lit(1e-9), 6)
        .as("inter_est"),
      round(greatest(col("__u") - col("__b"), lit(0.0)) + lit(1e-9), 6)
        .as("diff_est"),
      round(col("__w") / col("__kp") + lit(1e-9), 6).as("jaccard_est"))
  }

  /**
   * The same synopsis as a typed mergeable [[Aggregator]] — state is
   * the sorted ascending array of ≤ k distinct hash strings; merge is
   * sorted-union-truncate. Input is the RAW key (hashing happens in
   * reduce, via the same md5 layout as [[hashCol]]); null keys are
   * skipped. Partial aggregation bounds every map task's contribution
   * at k rows per group — the scale argument in the object scaladoc.
   */
  final class MinK(k: Int)
      extends Aggregator[String, List[String], Seq[String]] {
    require(k >= 2, s"KMV needs k >= 2, got $k")

    override def zero: List[String] = Nil

    override def reduce(buf: List[String], key: String): List[String] = {
      if (key == null) return buf
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val sb = new StringBuilder(HexDigits)
      var i = 0
      while (i < HexDigits / 2) {
        sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
        sb.append(Character.forDigit(d(i) & 0xf, 16))
        i += 1
      }
      insert(buf, sb.toString)
    }

    /** Keep sorted ascending, distinct, ≤ k; reject early when the
      * buffer is full and the hash is no smaller than the current max
      * (the common case once the buffer saturates). */
    private def insert(buf: List[String], h: String): List[String] = {
      if (buf.length == k && buf.last <= h) return buf
      val (lo, hi) = buf.span(_ < h)
      if (hi.nonEmpty && hi.head == h) buf
      else {
        val merged = lo ::: (h :: hi)
        if (merged.length > k) merged.init else merged
      }
    }

    override def merge(a: List[String], b: List[String]): List[String] =
      b.foldLeft(a)((acc, h) => insert(acc, h))

    override def finish(r: List[String]): Seq[String] = r

    override def bufferEncoder: Encoder[List[String]] =
      ExpressionEncoder[List[String]]()
    override def outputEncoder: Encoder[Seq[String]] =
      ExpressionEncoder[Seq[String]]()
  }

  /**
   * Grouped aggregator form → the same (group, hash, rank) shape as
   * [[bottomK]] (bit-identical; spec-pinned). The map-side-bounded
   * path for standing ingest and for corpora where the distinct pass
   * isn't otherwise being paid.
   */
  def bottomKAgg(df: DataFrame, keyCol: String, k: Int,
                 groupCols: Seq[String]): DataFrame = {
    val agg = udaf(new MinK(k))
    df.filter(col(keyCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col(keyCol).cast("string")).as("__hashes"))
      .select(groupCols.map(col) :+ posexplode(col("__hashes")): _*)
      .select(groupCols.map(col) :+ col("col").as("hash") :+
        (col("pos") + lit(1)).cast("int").as("rank"): _*)
  }
}
