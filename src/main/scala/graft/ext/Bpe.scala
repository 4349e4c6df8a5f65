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
                 graft.core.CheckpointStrategy.Local,
               maxDriverVocab: Int = 100000)
      : (DataFrame, DataFrame) = {
    require(numMerges >= 1, s"numMerges=$numMerges must be positive")
    val spark = docs.sparkSession
    var words = checkpoint.cut(
      docs.select(explode(TextOps.tokens(lower(col(textCol)))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .withColumn("sym", delimit(col("word"))))
    // The merge loop runs on the DISTINCT-WORD table, which is what
    // single-node tokenizer trainers hold in RAM — so below a vocab
    // bound, scheduling `numMerges` distributed rounds (2 jobs each)
    // pays pure overhead. Same guarded escape as the components loop's
    // driver union-find: identical output (asserted in BpeSpec), the
    // distributed loop stays the ≥ vocab-bound path.
    if (maxDriverVocab > 0 && words.count() <= maxDriverVocab)
      return bpeTrainDriver(spark,
        words.collect().map(r => (r.getString(0), r.getLong(1))), numMerges)
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

  /** UTF-8 byte order (Spark's UTF8String / DuckDB string comparison) —
    * Java's String.compareTo orders UTF-16 code units, which diverges
    * for supplementary characters. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Driver-side merge loop over a collected (word, cnt) vocabulary —
    * byte-for-byte the distributed loop's semantics: same delimited
    * symbolization (java.util.regex backs both `regexp_replace` and
    * `replaceAll`), same all-adjacent-pair counting weighted by word
    * count, same (count DESC, lhs, rhs) argmax in UTF-8 byte order,
    * same non-overlapping left-to-right replace. */
  private def bpeTrainDriver(spark: org.apache.spark.sql.SparkSession,
                             vocab: Array[(String, Long)], numMerges: Int)
      : (DataFrame, DataFrame) = {
    var syms = vocab.map { case (w, c) =>
      (w, c, w.replaceAll("(.)", Sep + "$1" + Sep))
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      syms.foreach { case (_, cnt, sym) =>
        val parts = sym.split(Sep).filter(_.nonEmpty)
        var i = 0
        while (i < parts.length - 1) {
          val k = (parts(i), parts(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + cnt)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ord = new Ordering[((String, String), Long)] {
          def compare(a: ((String, String), Long), b: ((String, String), Long)): Int = {
            if (a._2 != b._2) java.lang.Long.compare(b._2, a._2)
            else if (a._1._1 != b._1._1) { if (utf8Lt(a._1._1, b._1._1)) -1 else 1 }
            else if (a._1._2 != b._1._2) { if (utf8Lt(a._1._2, b._1._2)) -1 else 1 }
            else 0
          }
        }
        val ((l, rr), c) = counts.min(ord)
        merges += ((r + 1L, l, rr, c))
        val from = Sep + l + Sep + Sep + rr + Sep
        val to = Sep + l + rr + Sep
        syms = syms.map { case (w, cnt, sym) => (w, cnt, sym.replace(from, to)) }
      }
      r += 1
    }
    import spark.implicits._
    (merges.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_count"),
      syms.toSeq.toDF("word", "cnt", "sym"))
  }
}
