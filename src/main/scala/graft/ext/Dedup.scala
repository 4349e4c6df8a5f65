package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for LLM training-data pipelines: exact
 * (fingerprint hash-groupBy) and near-duplicate (MinHash + LSH banding →
 * bucket join → exact-Jaccard verification), plus SimHash.
 *
 * Scale design (the 100 TB shape):
 *  - Exact dedup is ONE shuffle on the 64-bit fingerprint; survivor choice
 *    is a per-group min — no sort, no window over raw text.
 *  - Near-dup NEVER compares all pairs. Docs are shuffled by
 *    (band, bandHash); only same-bucket docs meet, so cost is
 *    sum over buckets of |bucket|², driven by the banding parameters —
 *    the textbook MinHash-LSH layout. Exact Jaccard runs only on the
 *    candidate pairs that share a band.
 *  - Run [[exact]] BEFORE near-dup in production: thousands of byte-equal
 *    copies of one document would otherwise all land in the same LSH
 *    bucket and re-create the quadratic blowup.
 *  - Everything is built from codegen'd higher-order array functions —
 *    no UDFs, no driver-side collection.
 */
object Dedup {

  /** Whitespace/case-normalized text (the equality key for exact dedup). */
  def normalized(text: Column): Column =
    concat_ws(" ", TextOps.tokens(lower(text)))

  /**
   * Exact dedup: keep the lowest-id row per normalized-text fingerprint.
   * One shuffle on the 64-bit fingerprint; ties broken by id so the
   * survivor set is deterministic.
   */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    df.withColumn("__fp", TextOps.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /**
   * Exact-dedup summary: (survivor id, copy count) per distinct
   * normalized text — groupBy+min/count, cheaper than [[exact]] when the
   * full surviving rows aren't needed.
   */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextOps.fingerprint(col(textCol)).as("__fp"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_copies"))
      .drop("__fp")
      .select("survivor_id", "n_copies")

  /** Distinct hashed k-token shingles (the near-dup comparison set). */
  def shingleHashes(text: Column, k: Int = 3): Column =
    array_distinct(TextOps.windowFingerprints(text, k))

  /**
   * MinHash signature: for hash function i (xxhash64 seeded by i via an
   * extra hashed column), the min over the document's shingle hashes.
   * Signature length = numHashes; cost is O(shingles × numHashes) per doc
   * with zero shuffle.
   */
  def minhashSignature(shingles: Column, numHashes: Int = 64): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles, s => xxhash64(s, i))))

  /** LSH banding: one (bandIndex, bandHash) struct per band of the signature. */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))).as("bh")))

  /**
   * Materialized (id, shingles) frame, persisted. The persist() is a
   * correctness-of-cost barrier, not a cache nicety: higher-order array
   * expressions are interpreted (not codegen'd), and Catalyst's
   * CollapseProject would otherwise re-inline the shingle+minhash
   * expression into every downstream consumer — the 64-hash signature
   * would re-tokenize the document 64×, and the band explode another
   * 16×, turning a linear pass into a multiplicative blowup. At 100 TB
   * the same barrier is a checkpoint to storage instead.
   */
  private def shingleFrame(df: DataFrame, idCol: String, textCol: String,
                           shingleK: Int): DataFrame =
    df.select(col(idCol), shingleHashes(col(textCol), shingleK).as("__sh")).persist()

  /**
   * Candidate pairs via the LSH bucket join: explode bands, shuffle by
   * (band, bandHash), pair up within buckets only (id_a < id_b). This is
   * the step that replaces the O(n²) all-pairs comparison.
   */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
                     shingleK: Int = 3, numHashes: Int = 64,
                     bands: Int = 16): DataFrame =
    candidatesFromShingles(shingleFrame(df, idCol, textCol, shingleK),
      idCol, numHashes, bands)

  private def candidatesFromShingles(sh: DataFrame, idCol: String,
                                     numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val sig = sh.select(col(idCol),
      minhashSignature(col("__sh"), numHashes).as("__sig")).persist()
    val banded = sig.select(col(idCol),
        explode(bandHashes(col("__sig"), bands, r)).as("__b"))
      .select(col(idCol), col("__b.band").as("__band"), col("__b.bh").as("__bh"))
    banded.select(col("__band"), col("__bh"), col(idCol).as("id_a"))
      .join(banded.select(col("__band"), col("__bh"), col(idCol).as("id_b")),
        Seq("__band", "__bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard over two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /**
   * Near-duplicate pairs: LSH candidates verified by exact shingle
   * Jaccard >= threshold. Output: (id_a, id_b, jaccard).
   */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double, shingleK: Int = 3,
                   numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val sh = shingleFrame(df, idCol, textCol, shingleK)
    candidatesFromShingles(sh, idCol, numHashes, bands)
      .join(sh.select(col(idCol).as("id_a"), col("__sh").as("__sh_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("__sh").as("__sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("__sh_a"), col("__sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  private val BitPowers: Array[Long] = (0 until 64).map(1L << _).toArray

  /**
   * 64-bit SimHash: per token, hash to 64 bits; per bit position, count
   * +1/-1 across tokens; the sign vector packs into one long. Documents
   * within small Hamming distance are near-duplicates. Pure higher-order
   * column work — O(tokens × 64) per doc, no shuffle.
   */
  def simhash(text: Column): Column = {
    val ts = TextOps.tokens(lower(text))
    val counts = aggregate(ts, array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          b => call_function("shiftright", xxhash64(t), b).bitwiseAND(lit(1L))),
        (a, bit) => a + bit * 2L - 1L))
    aggregate(
      zip_with(counts, lit(BitPowers), (c, p) => when(c > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two 64-bit SimHashes. */
  def hamming(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b))
}
