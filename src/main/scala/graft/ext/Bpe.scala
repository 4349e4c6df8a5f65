package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed BPE tokenizer induction — the byte-pair-encoding merge
 * loop (Sennrich et al., "Neural Machine Translation of Rare Words with
 * Subword Units", ACL'16) run as a Spark iteration, the way a
 * training-data pipeline derives a tokenizer FROM the corpus it just
 * curated.
 *
 * Shape: pass 1 collapses the corpus to a (word, count) table — the one
 * corpus-sized scan. Every merge round after that runs on the distinct-
 * word table only (vocabulary-sized, corpus-size-independent): count
 * adjacent symbol pairs weighted by word count (one map-side-combined
 * shuffle on pair keys), pick the argmax on the driver (one row — the
 * same kilobyte synchronization point as k-means centroids), and apply
 * the merge as a `replace` projection. Standard tokenizer trainers run
 * this loop single-node on exactly this word table; the distributed
 * form keeps the counting pass parallel and needs no driver copy of the
 * vocabulary.
 *
 * Symbolization is a delimited string, each symbol wrapped
 * individually: "ab" → `§a§§b§` (§ = U+001F, stripped from real text by
 * [[TextOps.cleanText]]). A merge of (l, r) is then the literal
 * non-overlapping left-to-right replace of `§l§§r§` with `§lr§` —
 * adjacent matches share no characters, so one replace pass equals the
 * canonical simultaneous merge ("aaaa" + merge(a,a) → aa,aa), and any
 * engine with a plain `replace` builtin replays a round bit-identically
 * (no floats anywhere; the whole training loop is exact integer/string
 * work, which is what lets `ext_bpe_merges` carry a full 16-round
 * DuckDB oracle).
 */
object Bpe {

  /** Symbol delimiter: the unit-separator control char, which
    * [[TextOps.cleanText]] guarantees absent from cleaned text. */
  val Sep = "\u001f"

  /** word → initial symbolization: every character wrapped in Sep
    * (`"ab"` → `§a§§b§`). */
  def delimit(word: Column): Column =
    regexp_replace(word, "(.)", Sep + "$1" + Sep)

  /** Delimited symbolization back to its symbol array. */
  def symbols(sym: Column): Column =
    filter(split(sym, Sep), s => length(s) > 0)

  /** One merge applied to a delimited symbolization: non-overlapping
    * left-to-right, the canonical simultaneous-merge semantics. */
  def applyMerge(sym: Column, lhs: String, rhs: String): Column =
    replace(sym,
      lit(Sep + lhs + Sep + Sep + rhs + Sep),
      lit(Sep + lhs + rhs + Sep))

  /** Encode a single word under a trained merge list (merges applied in
    * rank order, each as one non-overlapping pass). Returns the symbol
    * array. */
  def encodeWord(word: Column, merges: Seq[(String, String)]): Column =
    symbols(merges.foldLeft(delimit(word)) { case (c, (l, r)) =>
      applyMerge(c, l, r)
    })

  /** Adjacent-pair counts of a (cnt, sym) words frame, weighted by word
    * count — the per-round statistic the merge argmax reads. */
  def pairCounts(words: DataFrame): DataFrame = {
    val syms = symbols(col("sym"))
    words
      .select(col("cnt"),
        explode(zip_with(
          slice(syms, lit(1), size(syms) - 1),
          slice(syms, lit(2), size(syms) - 1),
          (l, r) => struct(l.as("lhs"), r.as("rhs")))).as("pr"))
      .select(col("pr.lhs").as("lhs"), col("pr.rhs").as("rhs"), col("cnt"))
      .groupBy("lhs", "rhs").agg(sum("cnt").as("pair_count"))
  }

  /**
   * Train `numMerges` BPE merges over the whitespace-token vocabulary of
   * `textCol` (lowercased). Returns (merges, words): merges =
   * (merge_rank, lhs, rhs, pair_count) in training order; words = the
   * final (word, cnt, sym) table whose `sym` column is the corpus
   * vocabulary segmented under all returned merges (feed it to a vocab
   * or compression-ratio readout without re-encoding).
   *
   * Each round cuts the words frame from its lineage (`checkpoint`,
   * default local) — the plan otherwise grows by one replace per round,
   * and at thousands of merges an uncut lineage, not the data, becomes
   * the bottleneck. Stops early when no pair is left to merge.
   */
  def bpeTrain(docs: DataFrame, textCol: String, numMerges: Int,
               checkpoint: graft.core.CheckpointStrategy =
                 graft.core.CheckpointStrategy.Local)
      : (DataFrame, DataFrame) = {
    require(numMerges >= 1, s"numMerges=$numMerges must be positive")
    val spark = docs.sparkSession
    var words = checkpoint.cut(
      docs.select(explode(TextOps.tokens(lower(col(textCol)))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .withColumn("sym", delimit(col("word"))))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(desc("pair_count"), col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rr, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r + 1L, l, rr, c))
        words = checkpoint.cut(
          words.withColumn("sym", applyMerge(col("sym"), l, rr)))
      }
      r += 1
    }
    import spark.implicits._
    (merges.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_count"), words)
  }
}
