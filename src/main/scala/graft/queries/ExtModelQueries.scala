package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Bpe, Chunking, Classifier, Corpus, Dedup, Similarity, TextOps}
import ExtQueries._

/**
 * Model-adjacent registry rows: the hashed bag-of-words quality
 * classifier (training / selection / holdout / PR curve), distributed
 * BPE induction and encoding, and content-defined + sliding chunking.
 *
 * Split from ExtCorpusQueries by family (zero behavior change, r8) —
 * shared fixture builders and DuckDB oracle fragments stay in
 * [[ExtQueries]].
 */
object ExtModelQueries {

  def defs: Seq[QueryDef] = Seq(



    // Quality classifier, trained: hashed bag-of-words batch perceptron
    // (the GPT-3/LLaMA-style linear quality filter). Positives = docs
    // mentioning a seed lexicon; negatives = the SAME docs with the
    // lexicon stripped — the curated-vs-raw construction real quality
    // classifiers train on, and linearly separable by design, so the
    // trainer provably converges. Everything is exact integer work;
    // the oracle replays all 12 rounds unrolled with zero rounding.
    QueryDef("ext_classifier_weights", (s, dir) => {
      val model = Classifier.perceptronTrain(classifierFixture(s, dir),
        "buckets", "y", numBuckets = 64, maxRounds = 12)
      model.weightsFrame(s)
    }, Some(s"""WITH ${duckPerceptron(rounds = 12, numBuckets = 64)}
      SELECT bucket, w AS weight FROM qw12
      UNION ALL SELECT CAST(-1 AS BIGINT) AS bucket, bias AS weight FROM qb12""")),



    // The trained model applied back as a selection gate: integer margin
    // per doc, keep score > 0. On this fixture the perceptron reaches
    // zero training errors, so `selected` equals the true label — the
    // spec asserts both that and the margin floor.
    QueryDef("ext_classifier_select", (s, dir) => {
      val feats = classifierFixture(s, dir)
      val model = Classifier.perceptronTrain(feats,
        "buckets", "y", numBuckets = 64, maxRounds = 12)
      Classifier.score(feats, "buckets", model)
        .select(col("doc_id"), col("y").as("label"), col("score"),
          (col("score") > 0).as("selected"))
    }, Some(s"""WITH ${duckPerceptron(rounds = 12, numBuckets = 64)}
      SELECT doc_id, y AS label, z AS score, z > 0 AS selected FROM qzf""")),



    // The train/test discipline a deployed filter needs: train on the
    // even-id half of the labeled pairs only (a twin shares its
    // original's parity — +100000 preserves it), then score the
    // UNSEEN odd half. The learned lexicon weights transfer, so the
    // held-out gate still recovers the labels — generalization, not
    // memorization, and the oracle replays both halves.
    QueryDef("ext_classifier_holdout", (s, dir) => {
      val feats = classifierFixture(s, dir)
      val model = Classifier.perceptronTrain(
        feats.filter(col("doc_id") % 2 === 0),
        "buckets", "y", numBuckets = 64, maxRounds = 12)
      Classifier.score(feats.filter(col("doc_id") % 2 === 1), "buckets", model)
        .select(col("doc_id"), col("y").as("label"), col("score"),
          (col("score") > 0).as("selected"))
    }, Some(s"""WITH ${duckPerceptron(rounds = 12, numBuckets = 64,
        trainWhere = "doc_id % 2 = 0")}
      SELECT doc_id, y AS label, z AS score, z > 0 AS selected FROM qzf
      WHERE doc_id % 2 = 1""")),



    // Precision/recall curve for the held-out classifier: the integer
    // margin sweeps a -8..8 threshold grid — exact integer confusion
    // counts per threshold, guarded ratios (nothing selected ⇒
    // precision 0, not a division error). The model-evaluation row the
    // selection queries' fixed cut (score > 0) is one point of.
    QueryDef("ext_classifier_pr_curve", (s, dir) => {
      val feats = classifierFixture(s, dir)
      val model = Classifier.perceptronTrain(
        feats.filter(col("doc_id") % 2 === 0),
        "buckets", "y", numBuckets = 64, maxRounds = 12)
      val scored = Classifier.score(
          feats.filter(col("doc_id") % 2 === 1), "buckets", model)
        .select(col("y"), col("score"))
      val grid = s.range(-4, 5).select((col("id") * 2).as("threshold"))
      scored.crossJoin(broadcast(grid))
        .groupBy("threshold")
        .agg(
          sum(when(col("score") > col("threshold") && col("y") === 1, 1L)
            .otherwise(0L)).as("tp"),
          sum(when(col("score") > col("threshold") && col("y") =!= 1, 1L)
            .otherwise(0L)).as("fp"),
          sum(when(col("score") <= col("threshold") && col("y") === 1, 1L)
            .otherwise(0L)).as("fn"))
        .select(col("threshold"), col("tp"), col("fp"), col("fn"),
          round(coalesce(col("tp").cast("double") /
            nullif(col("tp") + col("fp"), lit(0L)), lit(0.0)) + lit(1e-9), 6)
            .as("precision"),
          round(coalesce(col("tp").cast("double") /
            nullif(col("tp") + col("fn"), lit(0L)), lit(0.0)) + lit(1e-9), 6)
            .as("recall"))
    }, Some(s"""WITH ${duckPerceptron(rounds = 12, numBuckets = 64,
        trainWhere = "doc_id % 2 = 0")},
      ho AS (SELECT y, z FROM qzf WHERE doc_id % 2 = 1),
      g AS (SELECT CAST(x * 2 AS BIGINT) AS threshold FROM range(-4, 5) r(x)),
      c AS (SELECT threshold,
          CAST(sum(CASE WHEN z > threshold AND y = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS tp,
          CAST(sum(CASE WHEN z > threshold AND y <> 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS fp,
          CAST(sum(CASE WHEN z <= threshold AND y = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS fn
        FROM ho CROSS JOIN g GROUP BY 1)
      SELECT threshold, tp, fp, fn,
        round(coalesce(tp / CAST(nullif(tp + fp, 0) AS DOUBLE), 0) + 1e-9, 6)
          AS precision,
        round(coalesce(tp / CAST(nullif(tp + fn, 0) AS DOUBLE), 0) + 1e-9, 6)
          AS recall
      FROM c""")),


    // Reliability diagram + ECE terms for the held-out classifier: the
    // integer margin maps through a fixed temperature-4 sigmoid to a
    // 6-digit-rounded confidence, 10 equal-width bins, per-bin mean
    // confidence vs empirical positive rate. The calibration audit run
    // before scores become sampling weights; Σ ece_term = ECE. The
    // oracle replays the identical sigmoid/rounding/binning over the
    // unrolled perceptron's holdout margins.
    QueryDef("ext_classifier_calibration", (s, dir) => {
      val feats = classifierFixture(s, dir)
      val model = Classifier.perceptronTrain(
        feats.filter(col("doc_id") % 2 === 0),
        "buckets", "y", numBuckets = 64, maxRounds = 12)
      Classifier.calibrationCurve(
        Classifier.score(feats.filter(col("doc_id") % 2 === 1), "buckets", model),
        "score", "y", nBins = 10, temperature = 4.0)
    }, Some(s"""WITH ${duckPerceptron(rounds = 12, numBuckets = 64,
        trainWhere = "doc_id % 2 = 0")},
      ho AS (SELECT y,
          round(1.0 / (1.0 + exp(-CAST(z AS DOUBLE) / 4.0)) + 1e-9, 6) AS conf
        FROM qzf WHERE doc_id % 2 = 1),
      b AS (SELECT CAST(least(floor(conf * 10), 9) AS BIGINT) AS bin,
          CAST(round(conf * 1e6) AS BIGINT) AS confu,
          CASE WHEN y > 0 THEN 1 ELSE 0 END AS pos FROM ho),
      g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(pos) AS BIGINT) AS n_pos,
          CAST(sum(confu) AS BIGINT) AS sumu
        FROM b GROUP BY 1),
      r AS (SELECT bin, n, n_pos,
          round(CAST(sumu AS DOUBLE) / 1e6 / n + 1e-9, 6) AS mean_conf,
          round(CAST(n_pos AS DOUBLE) / n + 1e-9, 6) AS pos_rate
        FROM g)
      SELECT bin, n, n_pos, mean_conf, pos_rate,
        round(abs(mean_conf - pos_rate) + 1e-9, 6) AS gap,
        round(round(abs(mean_conf - pos_rate) + 1e-9, 6) * n
          / (SELECT sum(n) FROM r) + 1e-9, 6) AS ece_term
      FROM r""")),


    // BPE tokenizer induction: 16 merge rounds over the English
    // vocabulary. The oracle unrolls the identical loop round by round
    // (SQL has no iteration — same pattern as the k-means oracle); the
    // whole chain is exact integer/string work, so the match is
    // bit-identical, not rounded.
    QueryDef("ext_bpe_merges", (s, dir) =>
      Bpe.bpeTrain(Tables.documents(s, dir).filter(col("lang") === "en"),
        "text", numMerges = 16)._1,
      Some(s"""WITH ${duckBpeRounds(16)}
      ${(0 until 16).map(i =>
          s"SELECT CAST(${i + 1} AS BIGINT) AS merge_rank, lhs, rhs, " +
          s"c AS pair_count FROM m$i").mkString("\n      UNION ALL ")}""")),



    // The segmented vocabulary those merges induce: top-40 subword
    // tokens by corpus frequency after all 16 merges.
    QueryDef("ext_bpe_vocab", (s, dir) => {
      val words = Bpe.bpeTrain(
        Tables.documents(s, dir).filter(col("lang") === "en"),
        "text", numMerges = 16)._2
      words.select(col("cnt"), explode(Bpe.symbols(col("sym"))).as("token"))
        .groupBy("token").agg(sum("cnt").as("n"))
        .orderBy(desc("n"), col("token")).limit(40)
    },
      Some(s"""WITH ${duckBpeRounds(16)}
      SELECT token, CAST(sum(cnt) AS BIGINT) AS n FROM (
        SELECT cnt, unnest(list_filter(string_split(sym, chr(31)),
          x -> x <> '')) AS token FROM w16)
      GROUP BY 1 ORDER BY n DESC, token LIMIT 40""")),



    // The readout a tokenizer-induction run actually reports: corpus
    // fertility (subword tokens per word) and compression (chars per
    // subword token) under the 16 trained merges, straight off the final
    // words table — one vocabulary-sized agg, no corpus re-encode.
    QueryDef("ext_bpe_fertility", (s, dir) => {
      val words = Bpe.bpeTrain(
        Tables.documents(s, dir).filter(col("lang") === "en"),
        "text", numMerges = 16)._2
      words.select(col("cnt"), length(col("word")).as("chars"),
          size(Bpe.symbols(col("sym"))).as("toks"))
        .agg(count(lit(1)).as("n_vocab_words"),
          sum("cnt").as("n_corpus_words"),
          sum(col("cnt") * col("toks")).as("n_corpus_tokens"),
          round(sum(col("cnt") * col("toks")) / sum(col("cnt")) + lit(1e-9), 6)
            .as("fertility"),
          round(sum(col("cnt") * col("chars")) /
            sum(col("cnt") * col("toks")) + lit(1e-9), 6)
            .as("chars_per_token"))
    },
      Some(s"""WITH ${duckBpeRounds(16)},
      wf AS (SELECT cnt, len(word) AS chars,
          len(list_filter(string_split(sym, chr(31)), x -> x <> '')) AS toks
        FROM w16)
      SELECT CAST(count(*) AS BIGINT) AS n_vocab_words,
        CAST(sum(cnt) AS BIGINT) AS n_corpus_words,
        CAST(sum(cnt * toks) AS BIGINT) AS n_corpus_tokens,
        round(CAST(sum(cnt * toks) AS DOUBLE) / sum(cnt) + 1e-9, 6)
          AS fertility,
        round(CAST(sum(cnt * chars) AS DOUBLE) / sum(cnt * toks) + 1e-9, 6)
          AS chars_per_token
      FROM wf""")),



    // Applying the trained tokenizer to text it was NOT trained on — the
    // deployment half of tokenizer induction: encode the held-out
    // (non-English) vocabulary under the 16 English-trained merges, in
    // rank order. On the Spark side the merge list is a 16-row driver
    // collect and encoding is a fold of 16 non-overlapping replaces over
    // the held-out word table — one projection, no joins, no shuffles
    // beyond the vocab groupBy. The oracle replays training (m0..m15)
    // then applies each merge to the held-out words the same way.
    QueryDef("ext_bpe_encode", (s, dir) => {
      val merges = Bpe.bpeTrain(
        Tables.documents(s, dir).filter(col("lang") === "en"),
        "text", numMerges = 16)._1
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val held = Tables.documents(s, dir).filter(col("lang") =!= "en")
        .select(explode(TextOps.tokens(lower(col("text")))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
      held
        .withColumn("toks", Bpe.encodeWord(col("word"), merges))
        .select(col("word"), col("cnt"),
          size(col("toks")).cast("long").as("n_tokens"),
          array_join(col("toks"), " ").as("segmented"))
    }, Some(s"""WITH ${duckBpeRounds(16)},
      hw0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS cnt,
          regexp_replace(word, '(.)', chr(31) || '\\1' || chr(31), 'g') AS sym
        FROM (SELECT unnest($DuckToks) AS word FROM documents
              WHERE lang <> 'en')
        GROUP BY 1),
      ${(0 until 16).map(i =>
        s"""hw${i + 1} AS MATERIALIZED (SELECT word, cnt,
           CASE WHEN m.lhs IS NULL THEN sym
             ELSE replace(sym,
               chr(31) || m.lhs || chr(31) || chr(31) || m.rhs || chr(31),
               chr(31) || m.lhs || m.rhs || chr(31)) END AS sym
         FROM hw$i LEFT JOIN m$i m ON TRUE)""").mkString(",\n      ")},
      henc AS (SELECT word, cnt,
          list_filter(string_split(sym, chr(31)), x -> x <> '') AS toks
        FROM hw16)
      SELECT word, cnt, CAST(len(toks) AS BIGINT) AS n_tokens,
        array_to_string(toks, ' ') AS segmented FROM henc""")),



    // BPE induction over the degenerate head: empty/whitespace docs
    // contribute no words, 1-char emoji words contribute no pairs, the
    // 'word' family drives three count-3 merges, and then the count-1
    // tie between (U+FFFD,U+FFFD) and (U+1D552,U+1D552) must resolve in
    // UTF-8 BYTE order — a JVM UTF-16 compareTo would pick the other
    // pair and diverge from every SQL engine. Remaining rounds find no
    // pairs and no-op (the early-stop contract).
    QueryDef("ext_adv_bpe_merges", (s, dir) => {
      import s.implicits._
      Bpe.bpeTrain(AdvDegenHead.toDF("doc_id", "text"), "text",
        numMerges = 6)._1
    }, Some(s"""WITH ${duckBpeRounds(6, corpusSrc = DuckAdvDegenHead)}
      ${(0 until 6).map(i =>
          s"SELECT CAST(${i + 1} AS BIGINT) AS merge_rank, lhs, rhs, " +
          s"c AS pair_count FROM m$i").mkString("\n      UNION ALL ")}""")),



    // Classifier training with degenerate feature rows IN the training
    // set: the stripped negative twins of all-lexicon docs have EMPTY
    // token sets (margin = bias exactly — the null/empty-feature path),
    // and the emoji doc's negative twin carries only supplementary-plane
    // tokens through md5 bucketing. Fixed-round exact-integer replay on
    // both engines.
    QueryDef("ext_adv_classifier", (s, dir) => {
      val feats = advClassifierFixture(s, dir)
      val model = Classifier.perceptronTrain(feats,
        "buckets", "y", numBuckets = 64, maxRounds = 8)
      Classifier.score(feats, "buckets", model)
        .select(col("doc_id"), col("y").as("label"), col("score"),
          (col("score") > 0).as("selected"))
    }, Some(s"""WITH ${duckPerceptron(rounds = 8, numBuckets = 64,
        docsSrc = DuckAdvClassifierDocs)}
      SELECT doc_id, y AS label, z AS score, z > 0 AS selected FROM qzf""")),



    // Content-defined chunking: rolling-hash boundaries + per-chunk
    // fingerprints (Chunking scaladoc: why CDC survives insertions where
    // fixed-size chunking does not). Boundary positions are rolling-hash
    // internals DuckDB cannot reproduce, so the registered output is the
    // hash-independent TILING INVARIANT, checked in-query per document:
    // chunks start at 0, are contiguous, sum to exactly the document's
    // byte length (the one value the oracle computes independently), and
    // honor the [minLen, maxLen] bounds (the final chunk may run short).
    // ChunkingSpec additionally pins shift-invariance and determinism.
    QueryDef("ext_cdc_chunks", (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val ch = Chunking.chunks(docs, "doc_id", "text")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("chunk_idx")
      val flags = ch
        .withColumn("contig", col("chunk_start") ===
          coalesce(lag(col("chunk_start") + col("chunk_len"), 1).over(w), lit(0L)))
        .withColumn("is_last", lead(col("chunk_idx"), 1).over(w).isNull)
        .withColumn("len_ok", col("chunk_len").between(1L, 256L) &&
          (col("chunk_len") >= 16L || col("is_last")))
      val perDoc = flags.groupBy("doc_id").agg(
        bool_and(col("contig")).as("contig_all"),
        min(col("chunk_start")).as("min_start"),
        max(col("chunk_start") + col("chunk_len")).as("max_end"),
        sum(col("chunk_len")).as("sum_len"),
        bool_and(col("len_ok")).as("bounds_ok"))
      docs.select(col("doc_id"),
          octet_length(col("text")).cast("long").as("doc_bytes"))
        .join(perDoc, Seq("doc_id"))
        .select(col("doc_id"), col("doc_bytes"),
          (col("contig_all") && col("min_start") === 0L &&
            col("max_end") === col("doc_bytes") &&
            col("sum_len") === col("doc_bytes")).as("tiled"),
          col("bounds_ok"))
    }, Some("""SELECT doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS doc_bytes,
        true AS tiled, true AS bounds_ok
      FROM documents""")),



    // Fixed-size sliding-window chunking (the RAG/embedding-prep
    // chunker): 32-token windows every 24 tokens, plus an end-anchored
    // final window so no tail is orphaned — a pure projection, no
    // shuffle. The oracle rebuilds the identical start list and slices.
    QueryDef("ext_sliding_chunks", (s, dir) =>
      Chunking.slidingChunks(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        "doc_id", "text", chunkSize = 32, stride = 24),
      Some(s"""WITH t AS (SELECT doc_id, $DuckToksRaw AS toks,
          len($DuckToksRaw) AS n FROM documents),
      s AS (SELECT doc_id, toks, n, greatest(n - 31, 1) AS lst
        FROM t WHERE n > 0),
      st AS (SELECT doc_id, toks, n,
          CASE WHEN (lst - 1) % 24 = 0 THEN range(1, lst + 1, 24)
               ELSE list_append(range(1, lst + 1, 24), lst) END AS starts
        FROM s),
      e AS (SELECT doc_id, toks, n, unnest(starts) AS strt,
          generate_subscripts(starts, 1) - 1 AS ci FROM st)
      SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
        array_to_string(toks[strt:strt+31], ' ') AS chunk_text,
        CAST(least(32, n - strt + 1) AS BIGINT) AS chunk_tokens
      FROM e""")),



    // CDC payoff query: half the docs get a copy with an APPENDED tail.
    // The chunker's boundary decision at byte i depends only on the
    // preceding bytes and the position of the previous boundary, so an
    // append edit provably preserves every boundary inside the original
    // text: every orig chunk except the final one must reappear in the
    // edited copy fingerprint-identical — an unconditional invariant the
    // oracle can hash (a prefix edit resyncs only probabilistically;
    // that strictly-stronger-than-fixed-chunking behavior is pinned
    // empirically in ChunkingSpec at >60% fp survival). Each shared
    // fingerprint is also verified back to byte-equal substrings, so a
    // broken fp can't silently pass. Fp matching is exact-dedup
    // semantics on the 64-bit chunk fp — one shuffle at any scale.
    QueryDef("ext_cdc_shared", (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") % 2 === 0)
      val edited = planted
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" <<EDITED SUFFIX APPENDED")).as("text"))
      val ch = Chunking.chunks(planted.unionByName(edited), "doc_id", "text")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      val headChunks = ch.filter(col("doc_id") < 100000)
        .withColumn("last_idx", max("chunk_idx").over(w))
        .filter(col("chunk_idx") < col("last_idx"))
        .select(col("doc_id"), col("chunk_fp"),
          col("chunk_start"), col("chunk_len"))
      val editedChunks = ch.filter(col("doc_id") >= 100000)
        .select((col("doc_id") - 100000).as("doc_id"), col("chunk_fp"),
          col("chunk_start").as("e_start"), col("chunk_len").as("e_len"))
      val matched = headChunks
        .join(editedChunks, Seq("doc_id", "chunk_fp"), "left")
        .join(planted.select(col("doc_id"), col("text").as("o_text")), Seq("doc_id"))
        .join(edited.select((col("doc_id") - 100000).as("doc_id"),
          col("text").as("e_text")), Seq("doc_id"))
        // fixture text is ASCII (asserted by the doc_bytes oracle above),
        // so byte offsets are character offsets for substr
        .withColumn("content_eq", col("e_start").isNotNull &&
          col("o_text").substr(col("chunk_start").cast("int") + 1,
            col("chunk_len").cast("int")) ===
          col("e_text").substr(col("e_start").cast("int") + 1,
            col("e_len").cast("int")))
      val perPair = matched.groupBy("doc_id").agg(
        bool_and(col("e_start").isNotNull).as("head_chunks_shared"),
        bool_and(col("content_eq")).as("shared_contents_verified"))
      // single-chunk docs have no non-final chunks: vacuously true
      planted.select(col("doc_id").as("orig_id"),
          (col("doc_id") + 100000).as("edited_id"))
        .join(perPair.withColumnRenamed("doc_id", "orig_id"), Seq("orig_id"), "left")
        .select(col("orig_id"), col("edited_id"),
          coalesce(col("head_chunks_shared"), lit(true)).as("head_chunks_shared"),
          coalesce(col("shared_contents_verified"), lit(true))
            .as("shared_contents_verified"))
    }, Some("""SELECT doc_id AS orig_id, doc_id + 100000 AS edited_id,
        true AS head_chunks_shared, true AS shared_contents_verified
      FROM documents WHERE doc_id % 2 = 0""")),

    // Weight-of-evidence / information value — the classic feature-
    // screening statistic for a binary target (here: does the value
    // band predict a purchase event). Fixed-grid bins (no ntile tie
    // ambiguity), +0.5 Laplace smoothing on BOTH classes so empty
    // cells score finitely and identically on both engines; totals
    // ride along as a broadcast 1-row frame. One scan + one hash
    // shuffle on the bin key — the screening pass for thousands of
    // candidate features is this same shape unioned, never a loop of
    // collect()s.
    QueryDef("ext_woe_iv", (s, dir) => {
      val ev = Tables.events(s, dir)
      val bins = ev.groupBy(floor(col("value") / 50).cast("long").as("bin"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_good"),
          sum(when(col("event_type") === "purchase", 0L).otherwise(1L))
            .as("n_bad"))
      val tot = bins.agg(sum(col("n_good")).as("gt"),
        sum(col("n_bad")).as("bt"))
      val pg = (col("n_good") + lit(0.5)) / col("gt")
      val pb = (col("n_bad") + lit(0.5)) / col("bt")
      bins.crossJoin(broadcast(tot))
        .select(col("bin"), col("n_good"), col("n_bad"),
          round(log(pg / pb) + lit(1e-9), 6).as("woe"),
          round((pg - pb) * log(pg / pb) + lit(1e-9), 6).as("iv_term"))
    }, Some("""WITH b AS (SELECT CAST(floor(value / 50) AS BIGINT) AS bin,
          CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_good,
          CAST(sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END)
            AS BIGINT) AS n_bad
        FROM events GROUP BY 1),
      t AS (SELECT CAST(sum(n_good) AS BIGINT) AS gt,
          CAST(sum(n_bad) AS BIGINT) AS bt FROM b)
      SELECT bin, n_good, n_bad,
        round(ln(((n_good + 0.5) / gt) / ((n_bad + 0.5) / bt))
          + 1e-9, 6) AS woe,
        round((((n_good + 0.5) / gt) - ((n_bad + 0.5) / bt))
          * ln(((n_good + 0.5) / gt) / ((n_bad + 0.5) / bt))
          + 1e-9, 6) AS iv_term
      FROM b CROSS JOIN t"""))
  )
}
