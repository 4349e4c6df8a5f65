package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Content-defined chunking (CDC) — rolling-hash document fingerprinting.
 *
 * Fixed-size chunking breaks under insertion: one added byte shifts every
 * later boundary, so every downstream chunk fingerprint changes and
 * chunk-level dedup/delta-storage finds nothing to share. CDC instead
 * places boundaries where a rolling hash of the last `window` bytes hits
 * a mask condition — boundaries are a function of local CONTENT, so an
 * edit disturbs only the chunk it lands in (and at most its neighbor);
 * all other fingerprints survive byte-identical. This is the dedup
 * primitive under rsync / LBFS / backup stores, and at training-corpus
 * scale it is how near-identical crawl snapshots share storage and how
 * sub-document duplication (boilerplate paragraphs shared across pages)
 * is surfaced without any O(n²) comparison.
 *
 * Scale shape: embarrassingly parallel — one pass per document inside
 * mapPartitions (the same measured hot-path escape as the shingle/minhash
 * loops; per-byte work is a multiply-add, no allocation beyond the output
 * rows). Chunk-level dedup downstream is exact dedup on `chunk_fp` — one
 * shuffle on a 64-bit key. Nothing in the chunker itself shuffles.
 *
 * Determinism: the polynomial rolling hash uses fixed constants, byte
 * input is UTF-8, min/max bounds are enforced identically everywhere —
 * the same text always yields the same (boundary, fingerprint) sequence
 * on any partitioning, so chunk rows are engine-stable (ChunkingSpec
 * asserts the shift-invariance and determinism contracts).
 */
object Chunking {

  /** Polynomial base for the rolling window (odd, near golden ratio). */
  private val Base = 0x9e3779b97f4a7c15L
  /** Precomputed Base^(window-1) multiplier for the outgoing byte. */
  private def basePow(window: Int): Long = {
    var p = 1L; var i = 1
    while (i < window) { p *= Base; i += 1 }
    p
  }

  /** FNV-1a 64-bit over a byte range — the chunk content fingerprint. */
  private def fnv64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Boundary offsets (exclusive chunk ends) for one byte array. */
  private[ext] def boundaries(bytes: Array[Byte], window: Int, maskBits: Int,
                              minLen: Int, maxLen: Int): Array[Int] = {
    val mask = (1L << maskBits) - 1L
    val outMul = basePow(window)
    val ends = Array.newBuilder[Int]
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      val in = bytes(i) & 0xffL
      h = h * Base + in
      val winStart = i - window + 1
      if (winStart > start) h -= (bytes(winStart - 1) & 0xffL) * outMul * Base
      val len = i - start + 1
      if (len >= maxLen || (len >= minLen && (h & mask) == 0L)) {
        ends += i + 1
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < bytes.length) ends += bytes.length
    ends.result()
  }

  /**
   * Chunk every document: (idCol, chunk_idx, chunk_start, chunk_len,
   * chunk_fp). Offsets/lengths are in BYTES of the UTF-8 encoding.
   * `maskBits` sets the expected chunk size (2^maskBits bytes between
   * boundaries on random input); `minLen`/`maxLen` bound the tail cases
   * (runs that never/always match the mask).
   */
  def chunks(df: DataFrame, idCol: String, textCol: String,
             window: Int = 16, maskBits: Int = 6,
             minLen: Int = 16, maxLen: Int = 256): DataFrame = {
    require(window > 0 && minLen >= window && maxLen > minLen,
      "need window > 0, minLen >= window, maxLen > minLen")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { iter =>
        iter.flatMap { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val ends = boundaries(bytes, window, maskBits, minLen, maxLen)
          val out = new Array[(Long, Long, Long, Long, Long)](ends.length)
          var start = 0
          var idx = 0
          while (idx < ends.length) {
            val end = ends(idx)
            out(idx) = (id, idx.toLong, start.toLong, (end - start).toLong,
              fnv64(bytes, start, end))
            start = end
            idx += 1
          }
          out
        }
      }.toDF(idCol, "chunk_idx", "chunk_start", "chunk_len", "chunk_fp")
  }

  /**
   * Fixed-size sliding-window token chunking — the RAG/embedding-prep
   * chunker ([[chunks]] is its content-defined sibling for dedup
   * layout): windows of `chunkSize` whitespace tokens starting every
   * `stride` tokens, plus a final window anchored at the document end
   * so the tail is never orphaned (and never emitted twice when the
   * stride already lands there). Tokens keep their case — chunking is
   * payload prep, not normalization. Zero-token docs produce no chunks.
   *
   * Scale: a pure codegen'd projection — sequence/slice higher-order
   * ops, no shuffle, no state; output rows ≈ tokens/stride per doc and
   * each token appears in ≤ ceil(chunkSize/stride) chunks, which is the
   * storage amplification knob every embedding pipeline budgets for.
   */
  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
                    chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize (got chunkSize=$chunkSize stride=$stride)")
    val starts = {
      val seq0 = sequence(lit(1), col("__last"), lit(stride))
      when((col("__last") - 1) % stride === 0, seq0)
        .otherwise(concat(seq0, array(col("__last"))))
    }
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .withColumn("__last", greatest(col("__n") - (chunkSize - 1), lit(1)))
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(starts).as(Seq("__i", "__s")))
      .select(col(idCol),
        col("__i").cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("__toks"), col("__s"), lit(chunkSize)))
          .as("chunk_text"),
        least(lit(chunkSize), col("__n") - col("__s") + 1).cast("long")
          .as("chunk_tokens"))
  }

  /**
   * Contrastive positive-pair mining (the Contriever/ICT posture:
   * passages adjacent in one document are semantically related, so
   * consecutive chunks make cheap positives for a bi-encoder): the
   * token stream is partitioned into DISJOINT consecutive blocks of
   * `chunkSize` tokens — last block possibly short, never re-anchored
   * (unlike [[slidingChunks]]' tail, whose overlap would leak shared
   * tokens into both sides of a "positive") — and every
   * (block i, block i+1) pair of one document comes back as
   * (idCol, pair_idx = i, text_a, text_b). Paired blocks provably share
   * no token position.
   *
   * Scale: the blocking is a scan-only projection; pairing is one
   * `lead` window partitioned by document — a single exchange on the
   * doc id with one row of frame state, no self-join, and per-doc block
   * counts are bounded by doc length so no group outgrows a task.
   */
  def adjacentChunkPairs(df: DataFrame, idCol: String, textCol: String,
                         chunkSize: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize $chunkSize must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__ci"))
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(1), col("__n"), lit(chunkSize)))
          .as(Seq("__ci", "__s")))
      .select(col(idCol), col("__ci").cast("long"),
        concat_ws(" ", slice(col("__toks"), col("__s"), lit(chunkSize)))
          .as("__chunk"))
      .withColumn("__next", lead(col("__chunk"), 1).over(w))
      .filter(col("__next").isNotNull)
      .select(col(idCol), col("__ci").as("pair_idx"),
        col("__chunk").as("text_a"), col("__next").as("text_b"))
  }

  /**
   * Sub-document duplication report over a chunked corpus: for each
   * chunk fingerprint seen in more than one document, the documents
   * sharing it — exact dedup semantics on the 64-bit chunk key (one
   * shuffle), the CDC payoff query.
   */
  def sharedChunks(chunked: DataFrame, idCol: String): DataFrame =
    chunked.groupBy(col("chunk_fp"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") > 1)
}
