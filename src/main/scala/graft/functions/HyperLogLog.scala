package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * HyperLogLog (Flajolet, Fusy, Gandouet & Meunier 2007) with
 * oracle-reproducible hashing — the fixed-size DISTINCT-count summary
 * that completes the registry's sketch family (Count-Min: frequency,
 * Misra-Gries `HeavyHitters`: top-k candidates). m = 64 registers, each
 * holding the max leading-zero rank seen in its hash sub-stream;
 * estimate = bias-corrected harmonic mean with the published
 * small-range linear-counting fallback. Spark's own
 * `approx_count_distinct` IS HLL++ and stays the production default
 * (`a13_approx_count_distinct`); this implementation exists for what
 * the built-in can't give: engine-independent registers (any SQL engine
 * with md5 rebuilds them bit-identically → a full DuckDB oracle, not a
 * tolerance check) and an explicit mergeable register array that
 * crosses batch/source/stream boundaries.
 *
 * Hashing (the [[CountMinSketch]] md5 convention): register index =
 * first 2 md5 hex digits of the key mod 64; rank ρ = 1 + leading zero
 * BITS of the next 8 hex digits (a 32-bit sub-hash), so ρ ∈ [1, 33].
 *
 * Determinism: register content is integer max — order-free. The
 * harmonic denominator Σ2^−ρ is a sum of ≤64 exact powers of two, every
 * partial representable (multiples of 2^−33 summing below 64 need ≤39
 * mantissa bits) — so the sum is EXACT regardless of summation order
 * and the raw estimate is bit-identical on any IEEE engine. Only the
 * linear-counting branch's ln() can differ by an ulp cross-engine;
 * the standard round(+1e-9, 6) absorbs it.
 *
 * Scale: the relational path is one (key-group, register) hash
 * aggregation with map-side combine — 64 rows per group out of the
 * shuffle no matter how many keys went in; the typed [[Sketch]]
 * aggregator carries the same registers as a 64-int array for
 * streaming state, multi-source merge, or driver-side estimation
 * (bounded driver state, the k-means-centroid contract).
 */
object HyperLogLog {

  val M = 64
  /** Published bias constant for m = 64 (Flajolet et al., fig. 3). */
  val Alpha = 0.709

  /** Register index of `key`: first 2 md5 hex digits mod 64. */
  def idxCol(key: Column): Column =
    pmod(conv(substring(md5(key), 1, 2), 16, 10).cast("int"), lit(M))

  /**
   * Rank ρ = 1 + leading zero bits of the 32-bit sub-hash (md5 hex
   * digits 3-10). String/CASE arithmetic only — no float, no log — so
   * any engine replays it exactly: z leading '0' hex digits contribute
   * 4z zero bits, the first nonzero digit d adds 3/2/1/0 more by its
   * high bit.
   */
  def rhoCol(key: Column): Column = {
    val h = substring(md5(key), 3, 8)
    val z = length(regexp_extract(h, "^(0*)", 1))
    val d = substring(h, z + lit(1), lit(1))
    val within = when(d === "1", 3)
      .when(d.isin("2", "3"), 2)
      .when(d.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    (when(z === 8, lit(32)).otherwise(z * 4 + within) + lit(1)).cast("int")
  }

  /**
   * Relational register table: one row per (group, register) with the
   * max rank — the distributed form of the sketch (64 rows per group
   * after one map-side-combined aggregation). `groupCols` empty gives
   * the global sketch.
   */
  def registers(df: DataFrame, keyCol: String,
                groupCols: Seq[String] = Nil): DataFrame =
    // null keys are skipped (the BloomSketch.positions / typed Sketch
    // convention): md5(NULL) would otherwise land a (NULL, NULL)
    // register row that counts toward __hit but not __hsum, skewing
    // the linear-counting zero-register estimate
    df.filter(col(keyCol).isNotNull)
      .select(groupCols.map(col) :+ idxCol(col(keyCol)).as("reg")
        :+ rhoCol(col(keyCol)).as("rho"): _*)
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max(col("rho")).as("rho"))

  /**
   * Distinct-count estimate per group from a [[registers]] table:
   * registers never hit contribute 2⁰ to the harmonic sum and count as
   * the zero registers V of the linear-counting correction (a present
   * register always has ρ ≥ 1). Emits (groupCols…, est) with est
   * rounded to 6 digits.
   */
  def estimate(regs: DataFrame, groupCols: Seq[String] = Nil): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) regs.groupBy()
      else regs.groupBy(groupCols.map(col): _*)
    // coalesce: a global estimate over an EMPTY frame is one row with
    // NULL hsum / 0 hits — all 64 registers zero, linear counting gives
    // exactly 0.0, not NULL
    val agged = grouped.agg(
      coalesce(sum(pow(lit(2.0), -col("rho"))), lit(0.0)).as("__hsum"),
      count(lit(1)).as("__hit"))
    val v = lit(M) - col("__hit")
    val denom = col("__hsum") + v.cast("double")
    val raw = lit(Alpha * M * M) / denom
    agged.select(groupCols.map(col) :+
      round(when(raw <= lit(2.5 * M) && v > 0,
          lit(M.toDouble) * log(lit(M.toDouble) / v.cast("double")))
        .otherwise(raw) + lit(1e-9), 6).as("est"): _*)
  }

  /**
   * The same sketch as a typed mergeable [[Aggregator]] — 64-int
   * register array, merge = element-wise max — for streaming state and
   * cross-source union without rescanning. [[registers]] and this
   * aggregator are asserted bit-identical in `HyperLogLogSpec`.
   */
  final class Sketch extends Aggregator[String, Array[Int], Array[Int]] {
    override def zero: Array[Int] = new Array[Int](M)
    override def reduce(buf: Array[Int], key: String): Array[Int] = {
      if (key != null) {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val i = (d(0) & 0xff) % M
        // 32-bit sub-hash = md5 bytes 1..4 (hex digits 3-10)
        val w = ((d(1) & 0xffL) << 24) | ((d(2) & 0xffL) << 16) |
          ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
        val rho = if (w == 0L) 33 else java.lang.Long.numberOfLeadingZeros(w) - 31
        if (rho > buf(i)) buf(i) = rho
      }
      buf
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(r: Array[Int]): Array[Int] = r
    override def bufferEncoder: Encoder[Array[Int]] =
      ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Array[Int]] =
      ExpressionEncoder[Array[Int]]()
  }

  /** One distributed pass → the merged 64-register sketch on the driver. */
  def build(keys: Dataset[String]): Array[Int] =
    keys.select(new Sketch().toColumn).head()

  // ---- parameterized register count (m ∈ {64, 256, 1024, …}) ----------
  //
  // m = 64 gives ~13% standard error (1.04/√m) — fine for the oracle
  // rows, coarse for a production reach monitor. The generalized forms
  // below accept any m dividing 65536: register index = first 4 md5 hex
  // digits (16 bits, uniform mod such m) and rank ρ = 1 + leading zero
  // bits of hex digits 5–12 — index and rank draw on DISJOINT hash bits
  // (at m = 1024 the legacy 2-digit index would overlap the rank
  // sub-hash, correlating register choice with rank). The m = 64
  // functions above keep their original digit layout — the registered
  // oracle rows and the streaming monitor state are pinned to it.

  /** Bias constant α(m) — Flajolet et al. fig. 3: published constants
    * below 128 registers, the asymptotic formula at and above. */
  def alphaM(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  private def requireM(m: Int): Unit =
    require(m >= 16 && m <= 65536 && 65536 % m == 0,
      s"need m in [16, 65536] dividing 65536 (a power of two), got $m")

  /** Register index for the generalized layout: first 4 md5 hex digits
    * (16 bits) mod m. */
  def idxColM(key: Column, m: Int): Column = {
    requireM(m)
    pmod(conv(substring(md5(key), 1, 4), 16, 10).cast("int"), lit(m))
  }

  /** Rank ρ = 1 + leading zero bits of the 32-bit sub-hash at hex
    * digits 5–12 (disjoint from the 4 index digits) — the [[rhoCol]]
    * CASE arithmetic at the shifted offset. */
  def rhoColM(key: Column): Column = {
    val h = substring(md5(key), 5, 8)
    val z = length(regexp_extract(h, "^(0*)", 1))
    val d = substring(h, z + lit(1), lit(1))
    val within = when(d === "1", 3)
      .when(d.isin("2", "3"), 2)
      .when(d.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    (when(z === 8, lit(32)).otherwise(z * 4 + within) + lit(1)).cast("int")
  }

  /** [[registers]] at a chosen register count (generalized layout). */
  def registersM(df: DataFrame, keyCol: String, m: Int,
                 groupCols: Seq[String] = Nil): DataFrame = {
    requireM(m)
    df.filter(col(keyCol).isNotNull)
      .select(groupCols.map(col) :+ idxColM(col(keyCol), m).as("reg")
        :+ rhoColM(col(keyCol)).as("rho"): _*)
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** [[estimate]] at a chosen register count: α(m)·m²/denominator with
    * the linear-counting fallback below 2.5m. (No 32-bit large-range
    * correction — cardinalities near 2³² want a 64-bit-hash sketch,
    * not a corrected 32-bit one.) */
  def estimateM(regs: DataFrame, m: Int,
                groupCols: Seq[String] = Nil): DataFrame = {
    requireM(m)
    val grouped =
      if (groupCols.isEmpty) regs.groupBy()
      else regs.groupBy(groupCols.map(col): _*)
    val agged = grouped.agg(
      coalesce(sum(pow(lit(2.0), -col("rho"))), lit(0.0)).as("__hsum"),
      count(lit(1)).as("__hit"))
    val v = lit(m) - col("__hit")
    val denom = col("__hsum") + v.cast("double")
    val raw = lit(alphaM(m) * m * m) / denom
    agged.select(groupCols.map(col) :+
      round(when(raw <= lit(2.5 * m) && v > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double")))
        .otherwise(raw) + lit(1e-9), 6).as("est"): _*)
  }

  /** Driver-side [[estimateM]] from a generalized register array. */
  def estimateRegistersM(regs: Array[Int], m: Int): Double = {
    requireM(m)
    require(regs.length == m, s"need $m registers, got ${regs.length}")
    val hsum = regs.map(r => math.pow(2.0, -r)).sum
    val v = regs.count(_ == 0)
    val raw = alphaM(m) * m * m / hsum
    val e = if (raw <= 2.5 * m && v > 0) m.toDouble * math.log(m.toDouble / v)
            else raw
    math.rint((e + 1e-9) * 1e6) / 1e6
  }

  /** Driver-side estimate from a register array ([[estimate]] math). */
  def estimateRegisters(regs: Array[Int]): Double = {
    require(regs.length == M, s"need $M registers, got ${regs.length}")
    val hsum = regs.map(r => math.pow(2.0, -r)).sum
    val v = regs.count(_ == 0)
    val raw = Alpha * M * M / hsum
    val e = if (raw <= 2.5 * M && v > 0) M.toDouble * math.log(M.toDouble / v)
            else raw
    math.rint((e + 1e-9) * 1e6) / 1e6
  }
}
