package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for LLM training-data pipelines (extension
 * surface, BASELINE.json north star): token counting, quality scoring,
 * language ID, document fingerprinting.
 *
 * Everything is a pure Column expression over built-in (codegen'd) string
 * and higher-order array functions — no UDFs, so these run inside
 * whole-stage codegen and scale linearly with input splits: per-document
 * work with no shuffle at all until an aggregation asks for one.
 */
object TextOps {

  /**
   * Let-binding for Column expressions: evaluates `bound` ONCE per row
   * and exposes it to `body` as a lambda variable. Higher-order array
   * functions are interpreted, and a lambda that references a subtree
   * re-evaluates it per element — binding first turns O(elements ×
   * subtree) into O(subtree + elements).
   */
  def letCol(bound: Column)(body: Column => Column): Column =
    element_at(transform(array(struct(bound.as("v"))),
      s => body(s.getField("v"))), 1)

  /** Whitespace tokenizer (split on runs of whitespace, drop empties). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Token count — whitespace definition. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /**
   * BPE-ish token count: alphanumeric runs plus each standalone
   * non-space symbol, the way a byte-pair tokenizer's pre-tokenizer
   * splits — approximates LLM token cost without a vocab file. Written
   * as an extraction (not a lookaround split) so RE2-based engines can
   * express the identical count.
   */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, 0d).otherwise(
      (n - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") / n)
  }

  /** Mean token length in characters (degenerate docs → 0). */
  def meanTokenLen(text: Column): Column = letCol(tokens(text)) { ts =>
    when(size(ts) === 0, 0d).otherwise(
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ts))
  }

  private val StopwordsEn = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "that", "for", "on", "with", "as", "at", "by")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column = letCol(tokens(text)) { ts =>
    when(size(ts) === 0, 0d).otherwise(
      size(filter(ts, t => lower(t).isin(StopwordsEn: _*))).cast("double") / size(ts))
  }

  /**
   * Composite quality score in [0,1]: length band + stopword presence +
   * low punctuation noise + sane mean token length. Heuristic weights in
   * the style of C4/Gopher quality filters (public recipes).
   */
  def qualityScore(text: Column): Column = {
    val lenScore  = least(length(text).cast("double") / 500d, lit(1d)) * 0.4
    val stopScore = least(stopwordRatio(text) * 5d, lit(1d)) * 0.3
    val punctOk   = when(punctRatio(text) < 0.2, 0.15).otherwise(0d)
    val tokLenOk  = when(meanTokenLen(text).between(2d, 12d), 0.15).otherwise(0d)
    lenScore + stopScore + punctOk + tokLenOk
  }

  private val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "to", "in", "that", "with"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "pour", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "en", "para", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "für", "nicht"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不"))

  /**
   * N-gram/stopword-marker language ID heuristic: score each candidate
   * language by marker-token hits, pick the argmax (deterministic
   * tie-break by language code; 'und' when nothing matches).
   */
  def langId(text: Column): Column = letCol(tokens(lower(text))) { ts =>
    val scored = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(size(filter(ts, t => t.isin(markers: _*))).as("hits"),
             lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  /**
   * Repeated n-gram fraction (a Gopher-style repetition signal):
   * 1 − distinct(n-grams)/total(n-grams). High values mark the looping,
   * boilerplate-heavy text a training corpus filters out. 0 for docs
   * shorter than n tokens.
   */
  def repetitionRatio(text: Column, n: Int = 2): Column =
    letCol(tokens(lower(text))) { ts =>
      // guard first: Spark's sequence(1, stop) DESCENDS when stop < 1
      // instead of producing an empty array
      when(size(ts) < n, 0d).otherwise(
        letCol(transform(sequence(lit(1), size(ts) - (n - 1)),
            i => concat_ws(" ", (0 until n).map(o => element_at(ts, i + o)): _*))) {
          grams =>
            lit(1d) - size(array_distinct(grams)).cast("double") / size(grams)
        })
    }

  /**
   * 64-bit document fingerprint: xxhash64 over the
   * whitespace-normalized, lowercased text — equal fingerprints ==
   * equal normalized content (modulo 64-bit collisions).
   */
  def fingerprint(text: Column): Column =
    xxhash64(concat_ws(" ", tokens(lower(text))))

  /**
   * Rolling-window fingerprints: hash of every k-token window
   * (winnowing-style; the min over windows is a cheap robust signature).
   */
  def windowFingerprints(text: Column, k: Int = 8): Column =
    letCol(tokens(lower(text))) { ts =>
      when(size(ts) < k, array(xxhash64(concat_ws(" ", ts))))
        .otherwise(transform(sequence(lit(1), size(ts) - (k - 1)),
          i => xxhash64(concat_ws(" ", slice(ts, i, lit(k))))))
    }
}
