package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Bpe, Chunking, Classifier, Corpus, Dedup, Multimodal, Similarity, TextOps}
import ExtQueries._

/**
 * Corpus-curation registry rows: curation chains, splits, mixtures,
 * sampling and caps, DSIR, the quality classifier, BPE induction,
 * sequence packing, PII scrubbing and CDC chunking.
 *
 * Split from ExtQueries by family (zero behavior change) — shared
 * fixture builders and DuckDB oracle fragments stay in [[ExtQueries]].
 */
object ExtCorpusQueries {

  def defs: Seq[QueryDef] = Seq(



    // End-to-end curation pipeline (the C4-style gate a training corpus
    // runs before tokenization): predicted-language gate → quality floor
    // → exact dedup, in that order so the cheap codegen'd filters prune
    // before the dedup shuffle. Output: surviving doc_ids + score. The
    // filter compares the ROUNDED score on both sides so the gate can
    // never straddle an fp boundary between engines.
    QueryDef("ext_curation_pipeline", (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"), col("lang"))
      val variants = docs.filter(col("lang") === "en" && col("doc_id") % 2 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          upper(concat(col("text"), lit("  "))).as("text"), col("lang"))
      val gated = docs.unionByName(variants)
        .withColumn("lang_pred", TextOps.langId(col("text")))
        .withColumn("quality_score",
          round(TextOps.qualityScoreFast(col("text")) + lit(1e-9), 4))
        .filter(col("lang_pred") === "en" && col("quality_score") >= 0.6)
      Dedup.exact(gated, "text", "doc_id").select("doc_id", "quality_score")
    }, Some(s"""WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000, upper(text || '  ') FROM documents
        WHERE lang = 'en' AND doc_id % 2 = 0),
      t AS (SELECT doc_id, text, $DuckToks AS ltoks, $DuckToksRaw AS rtoks
        FROM all_docs),
      lang AS (SELECT doc_id,
          CASE WHEN best LIKE '0000|%' THEN 'und' ELSE substr(best, 6) END AS lang_pred
        FROM (SELECT doc_id, greatest(
            printf('%04d|%s', len(list_filter(ltoks, x -> x IN ('der','die','das','und','ist','mit','für','nicht'))), 'de'),
            printf('%04d|%s', len(list_filter(ltoks, x -> x IN ('the','and','of','is','to','in','that','with'))), 'en'),
            printf('%04d|%s', len(list_filter(ltoks, x -> x IN ('el','la','los','y','es','en','para','que'))), 'es'),
            printf('%04d|%s', len(list_filter(ltoks, x -> x IN ('le','la','les','et','est','dans','pour','que'))), 'fr'),
            printf('%04d|%s', len(list_filter(ltoks, x -> x IN ('的','是','在','了','和','有','我','不'))), 'zh')) AS best
          FROM t)),
      q AS (SELECT doc_id,
          round(least(len(text) / 500.0, 1.0) * 0.4
            + least((CASE WHEN len(rtoks) = 0 THEN 0 ELSE
                CAST(len(list_filter(rtoks, x -> lower(x) IN ('the','a','an','and','or',
                  'of','to','in','is','it','that','for','on','with','as','at','by')))
                  AS DOUBLE) / len(rtoks) END) * 5, 1.0) * 0.3
            + (CASE WHEN (CASE WHEN len(text) = 0 THEN 0 ELSE
                CAST(len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
                  / len(text) END) < 0.2 THEN 0.15 ELSE 0 END)
            + (CASE WHEN (CASE WHEN len(rtoks) = 0 THEN 0 ELSE
                CAST(list_sum(list_transform(rtoks, x -> len(x))) AS DOUBLE) / len(rtoks) END)
                BETWEEN 2 AND 12 THEN 0.15 ELSE 0 END) + 1e-9, 4) AS quality_score
        FROM t),
      gated AS (SELECT t.doc_id, array_to_string(ltoks, ' ') AS norm, quality_score
        FROM t JOIN lang USING (doc_id) JOIN q USING (doc_id)
        WHERE lang_pred = 'en' AND quality_score >= 0.6),
      surv AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY norm)
      SELECT doc_id, quality_score FROM surv JOIN gated USING (doc_id)""")),



    // The FULL curation chain in one query — the end-to-end path a
    // training corpus takes: quality floor → exact dedup (normalized
    // fingerprint, min-id survivor) → MinHash-LSH near-dup clustering
    // with canonical (min-id) survivors → deterministic hash split +
    // token count. Synthetic exact copies (+200000) and near-dup tails
    // (+100000) are injected so every dedup stage provably fires. Stage
    // order is the 100 TB order: cheap codegen'd filters prune before
    // the dedup shuffles, exact dedup shrinks the near-dup input.
    QueryDef("ext_curation_full", (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val exactDups = docs.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 200000).as("doc_id"), col("text"))
      val nearDups = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" dup marker tail")).as("text"))
      // persist barrier: quality_score is interpreted-HOF-heavy and the
      // gated frame feeds the exact-dedup window, the near-dup chain, AND
      // the output projection — without the barrier CollapseProject
      // re-inlines the score computation into every consumer
      val gated = graft.core.CacheRegistry.persistTracked(
        docs.unionByName(exactDups).unionByName(nearDups)
          .withColumn("quality_score",
            round(TextOps.qualityScoreFast(col("text")) + lit(1e-9), 4))
          .filter(col("quality_score") >= 0.6))
      val exactSurv = Dedup.exact(gated, "text", "doc_id")
      val canon = exactSurv.join(
        Dedup.nearDupClusters(exactSurv.select("doc_id", "text"), "doc_id", "text",
            threshold = 0.5, numHashes = 64, bands = 32)
          .filter(col("is_canonical")).select("doc_id"),
        Seq("doc_id"))
      canon.select(col("doc_id"),
        Corpus.hashSplit(col("doc_id")).as("split"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
        col("quality_score"))
    }, Some(s"""WITH RECURSIVE all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 200000, text FROM documents WHERE doc_id % 4 = 0
        UNION ALL
        SELECT doc_id + 100000, text || ' dup marker tail' FROM documents
        WHERE doc_id % 5 = 0),
      t AS (SELECT doc_id, text, $DuckToks AS ltoks, $DuckToksRaw AS rtoks
        FROM all_docs),
      q AS (SELECT doc_id,
          round(least(len(text) / 500.0, 1.0) * 0.4
            + least((CASE WHEN len(rtoks) = 0 THEN 0 ELSE
                CAST(len(list_filter(rtoks, x -> lower(x) IN ('the','a','an','and','or',
                  'of','to','in','is','it','that','for','on','with','as','at','by')))
                  AS DOUBLE) / len(rtoks) END) * 5, 1.0) * 0.3
            + (CASE WHEN (CASE WHEN len(text) = 0 THEN 0 ELSE
                CAST(len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
                  / len(text) END) < 0.2 THEN 0.15 ELSE 0 END)
            + (CASE WHEN (CASE WHEN len(rtoks) = 0 THEN 0 ELSE
                CAST(list_sum(list_transform(rtoks, x -> len(x))) AS DOUBLE) / len(rtoks) END)
                BETWEEN 2 AND 12 THEN 0.15 ELSE 0 END) + 1e-9, 4) AS quality_score
        FROM t),
      gated AS (SELECT t.doc_id, array_to_string(ltoks, ' ') AS norm,
          CAST(len(rtoks) AS BIGINT) AS n_tokens, ltoks, quality_score
        FROM t JOIN q USING (doc_id) WHERE quality_score >= 0.6),
      surv AS (SELECT g.* FROM gated g
        JOIN (SELECT min(doc_id) AS doc_id FROM gated GROUP BY norm) m
          USING (doc_id)),
      sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ltoks) - 1),
               i -> array_to_string(ltoks[i:i+2], ' '))) AS shingles
             FROM surv),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
            (len(a.shingles) + len(b.shingles)
             - len(list_intersect(a.shingles, b.shingles))) >= 0.5),
      edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      walk(id, reach) AS (
        SELECT doc_id, doc_id FROM surv
        UNION
        SELECT w.id, e.b FROM walk w JOIN edges e ON w.reach = e.a),
      canon AS (SELECT id AS doc_id FROM walk GROUP BY id
        HAVING id = min(reach))
      SELECT s.doc_id,
        CASE WHEN substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
             WHEN substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
             ELSE 'test' END AS split,
        s.n_tokens, s.quality_score
      FROM surv s JOIN canon USING (doc_id)""")),



    // Curation PROVENANCE: every input doc labeled with the FIRST stage
    // of the ext_curation_full chain that dropped it (gate → exact_dup
    // → near_dup → kept) — the audit trail a data-governance review
    // asks for ("why is my document not in the release?"). Same fixture
    // and stage semantics as the full chain; the oracle re-walks the
    // chain and left-joins each stage's survivor set.
    QueryDef("ext_curation_provenance", (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val exactDups = docs.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 200000).as("doc_id"), col("text"))
      val nearDups = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" dup marker tail")).as("text"))
      val scored = graft.core.CacheRegistry.persistTracked(
        docs.unionByName(exactDups).unionByName(nearDups)
          .withColumn("quality_score",
            round(TextOps.qualityScoreFast(col("text")) + lit(1e-9), 4)))
      val gated = scored.filter(col("quality_score") >= 0.6)
      val exactSurv = graft.core.CacheRegistry.persistTracked(
        Dedup.exact(gated, "text", "doc_id"))
      val canon = Dedup.nearDupClusters(
          exactSurv.select("doc_id", "text"), "doc_id", "text",
          threshold = 0.5, numHashes = 64, bands = 32)
        .filter(col("is_canonical")).select("doc_id")
      scored.select(col("doc_id"))
        .join(gated.select(col("doc_id"), lit(true).as("__gate")),
          Seq("doc_id"), "left")
        .join(exactSurv.select(col("doc_id"), lit(true).as("__ex")),
          Seq("doc_id"), "left")
        .join(canon.select(col("doc_id"), lit(true).as("__cn")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("__gate").isNull, "gate")
            .when(col("__ex").isNull, "exact_dup")
            .when(col("__cn").isNull, "near_dup")
            .otherwise("kept").as("status"))
    }, Some(s"""WITH RECURSIVE all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 200000, text FROM documents WHERE doc_id % 4 = 0
        UNION ALL
        SELECT doc_id + 100000, text || ' dup marker tail' FROM documents
        WHERE doc_id % 5 = 0),
      t AS (SELECT doc_id, text, $DuckToks AS ltoks, $DuckToksRaw AS rtoks
        FROM all_docs),
      q AS (SELECT doc_id,
          round(least(len(text) / 500.0, 1.0) * 0.4
            + least((CASE WHEN len(rtoks) = 0 THEN 0 ELSE
                CAST(len(list_filter(rtoks, x -> lower(x) IN ('the','a','an','and','or',
                  'of','to','in','is','it','that','for','on','with','as','at','by')))
                  AS DOUBLE) / len(rtoks) END) * 5, 1.0) * 0.3
            + (CASE WHEN (CASE WHEN len(text) = 0 THEN 0 ELSE
                CAST(len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
                  / len(text) END) < 0.2 THEN 0.15 ELSE 0 END)
            + (CASE WHEN (CASE WHEN len(rtoks) = 0 THEN 0 ELSE
                CAST(list_sum(list_transform(rtoks, x -> len(x))) AS DOUBLE) / len(rtoks) END)
                BETWEEN 2 AND 12 THEN 0.15 ELSE 0 END) + 1e-9, 4) AS quality_score
        FROM t),
      gated AS (SELECT t.doc_id, array_to_string(ltoks, ' ') AS norm, ltoks
        FROM t JOIN q USING (doc_id) WHERE quality_score >= 0.6),
      surv AS (SELECT g.* FROM gated g
        JOIN (SELECT min(doc_id) AS doc_id FROM gated GROUP BY norm) m
          USING (doc_id)),
      sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ltoks) - 1),
               i -> array_to_string(ltoks[i:i+2], ' '))) AS shingles
             FROM surv),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
            (len(a.shingles) + len(b.shingles)
             - len(list_intersect(a.shingles, b.shingles))) >= 0.5),
      edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      walk(id, reach) AS (
        SELECT doc_id, doc_id FROM surv
        UNION
        SELECT w.id, e.b FROM walk w JOIN edges e ON w.reach = e.a),
      canon AS (SELECT id AS doc_id FROM walk GROUP BY id
        HAVING id = min(reach))
      SELECT a.doc_id,
        CASE WHEN g.doc_id IS NULL THEN 'gate'
             WHEN s.doc_id IS NULL THEN 'exact_dup'
             WHEN c.doc_id IS NULL THEN 'near_dup'
             ELSE 'kept' END AS status
      FROM all_docs a
      LEFT JOIN gated g USING (doc_id)
      LEFT JOIN surv s USING (doc_id)
      LEFT JOIN canon c ON c.doc_id = a.doc_id""")),



    // The DAILY-BATCH curation chain end to end: Gopher gates on both
    // sides -> incremental near-dup of the gated batch against the gated
    // accepted corpus -> deterministic train/val/test split. The
    // composition a 100 TB ingest runs every day; every stage reuses an
    // operator proven above (gates: ext_gopher_rules bounds; dedup:
    // ext_dedup_incremental_near; split: ext_split_hashmod cells), and
    // the oracle replays the whole chain in one SQL statement.
    QueryDef("ext_curation_incremental", (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val baseRaw = docs.filter(col("doc_id") % 3 =!= 0)
      val batchRaw = docs.filter(col("doc_id") % 3 === 0)
        .unionByName(docs.filter(col("doc_id") % 5 === 1)
          .select((col("doc_id") + 400000).as("doc_id"),
            concat(col("text"), lit(" dup marker tail")).as("text")))
      // the shared zero-shuffle gate (TextOps.gopherGate, r14): same
      // bounds and bit-identical keep-set as the former inline
      // explode + two-agg + semi-join form, minus its three exchanges
      def gated(df: org.apache.spark.sql.DataFrame) =
        TextOps.gopherGate(df, "doc_id", "text")
      Dedup.incrementalNearDup(gated(batchRaw), gated(baseRaw),
          "doc_id", "text", threshold = 0.5, numHashes = 64, bands = 32)
        .select(col("doc_id"), Corpus.hashSplit(col("doc_id")).as("split"),
          length(col("text")).cast("long").as("n_chars"))
    }, Some {
      def gateCtes(src: String, out: String) =
        s"""t_$out AS (SELECT doc_id, unnest($DuckToksRaw) AS tok FROM $src),
           pt_$out AS (SELECT doc_id, tok, count(*) AS c FROM t_$out GROUP BY 1, 2),
           m_$out AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
               round(CAST(sum(len(tok) * c) AS DOUBLE) / sum(c) + 1e-9, 4) AS mwl,
               round(CAST(max(c) AS DOUBLE) / sum(c) + 1e-9, 4) AS ttf
             FROM pt_$out GROUP BY doc_id),
           $out AS (SELECT s.doc_id, s.text FROM $src s
             JOIN m_$out m ON m.doc_id = s.doc_id
             WHERE m.n_words BETWEEN 20 AND 1000
               AND m.mwl BETWEEN 3.0 AND 10.0 AND m.ttf <= 0.2)"""
      def shCte(src: String, out: String) =
        s"""$out AS (SELECT doc_id, list_distinct(list_transform(
               range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')))
               AS shingles
             FROM (SELECT doc_id, $DuckToks AS toks FROM $src))"""
      s"""WITH batch_raw AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
          UNION ALL
          SELECT doc_id + 400000, text || ' dup marker tail' FROM documents
          WHERE doc_id % 5 = 1),
        base_raw AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
        ${gateCtes("batch_raw", "gb")},
        ${gateCtes("base_raw", "gp")},
        ${shCte("gb", "bsh")},
        ${shCte("gp", "psh")},
        drop_vs_base AS (SELECT DISTINCT b.doc_id FROM bsh b JOIN psh p
          ON CAST(len(list_intersect(b.shingles, p.shingles)) AS DOUBLE) /
             (len(b.shingles) + len(p.shingles)
              - len(list_intersect(b.shingles, p.shingles))) >= 0.5),
        fresh AS (SELECT * FROM bsh
          WHERE doc_id NOT IN (SELECT doc_id FROM drop_vs_base)),
        self_drops AS (SELECT DISTINCT b.doc_id FROM fresh b JOIN fresh a
          ON a.doc_id < b.doc_id
          AND CAST(len(list_intersect(b.shingles, a.shingles)) AS DOUBLE) /
              (len(b.shingles) + len(a.shingles)
               - len(list_intersect(b.shingles, a.shingles))) >= 0.5)
        SELECT d.doc_id,
          CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) < 'e6'
               THEN 'train'
               WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) < 'f3'
               THEN 'val' ELSE 'test' END AS split,
          CAST(length(d.text) AS BIGINT) AS n_chars
        FROM gb d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM drop_vs_base)
          AND d.doc_id NOT IN (SELECT doc_id FROM self_drops)"""
    }),



    // ---- Corpus management (splits, sampling, packing, PII) -----------

    // Deterministic train/val/test split: the md5-cell range split every
    // training pipeline needs — a pure projection (no shuffle, no RNG),
    // identical assignment in any engine, stable under appends.
    QueryDef("ext_split_hashmod", (s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
        Corpus.hashCell(col("doc_id")).as("cell"),
        Corpus.hashSplit(col("doc_id")).as("split")),
      Some("""SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS cell,
        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
             ELSE 'test' END AS split
      FROM documents""")),



    // Deterministic training-order shuffle: md5 permutation key →
    // 4 shards + within-shard position. One hash exchange + per-shard
    // sort — deliberately NO global sort; epoch re-shuffles are a salt
    // change. The oracle recomputes the identical permutation.
    QueryDef("ext_shuffle_order", (s, dir) =>
      Corpus.shuffleOrder(
        Tables.documents(s, dir).select(col("doc_id")),
        "doc_id", shards = 4),
      Some("""WITH k AS (SELECT doc_id,
          md5(CAST(doc_id AS VARCHAR)) AS key FROM documents),
        s AS (SELECT doc_id, key,
          CAST(((strpos('0123456789abcdef', substr(key, 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(key, 2, 1)) - 1)) % 4
            AS INTEGER) AS shard FROM k)
      SELECT doc_id, shard,
        CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id)
          AS BIGINT) AS pos
      FROM s""")),



    // Deterministic training mixture: short-named sources (src0..src9)
    // kept whole, long-named (src10..src19) downsampled to 64/256 via the
    // md5 cell-gate — the "N parts A to M parts B" corpus-mixing
    // primitive, reproducible with no RNG state.
    QueryDef("ext_mixture", (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
      Corpus.mixture(Seq(
        (docs.filter(length(col("source")) === 4), 1.0),
        (docs.filter(length(col("source")) === 5), 0.25)), "doc_id")
    }, Some("""SELECT doc_id, source FROM documents
      WHERE length(source) = 4
         OR (length(source) = 5
             AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40')""")),



    // Stratified 20% sample per language: exact per-stratum quotas via a
    // count window + deterministic (md5, id) ordering — one shuffle on the
    // stratum key, no driver loop, reproducible.
    QueryDef("ext_stratified_sample", (s, dir) =>
      Corpus.stratifiedSample(
        Tables.documents(s, dir).select(col("doc_id"), col("lang")),
        "lang", "doc_id", frac = 0.2),
      Some("""WITH t AS (SELECT doc_id, lang,
          count(*) OVER (PARTITION BY lang) AS n,
          row_number() OVER (PARTITION BY lang
            ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 2), doc_id) AS rn
        FROM documents)
      SELECT doc_id, lang FROM t WHERE rn <= ceil(n * 0.2)""")),



    // Per-source quota cap (RefinedWeb-style domain cap): an ABSOLUTE
    // ceiling per source — keep the 50 longest docs of each, lowest id
    // on ties — where the stratified sample above is proportional.
    QueryDef("ext_source_cap", (s, dir) =>
      Corpus.capPerGroup(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("n_chars")),
        "source", "doc_id", "n_chars", cap = 50),
      Some("""WITH t AS (SELECT doc_id, source, n_chars,
          row_number() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents)
      SELECT doc_id, source, n_chars FROM t WHERE rn <= 50""")),



    // Per-source RELATIVE quality gate (the FineWeb per-dump pruning
    // posture): keep each source's top quartile by score — an absolute
    // cutoff would starve clean sources and drown noisy ones. Exact
    // percentile threshold (A1 linear-interpolation semantics), one
    // one-row-per-source aggregate + broadcast join back, no window.
    QueryDef("ext_quality_pct_gate", (s, dir) =>
      Corpus.percentileGate(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("n_chars")),
        "source", "n_chars", q = 0.75),
      Some("""WITH thr AS (SELECT source,
          quantile_cont(n_chars, 0.75) AS t FROM documents GROUP BY source)
      SELECT d.doc_id, d.source, d.n_chars
      FROM documents d JOIN thr ON d.source = thr.source
      WHERE d.n_chars >= thr.t""")),



    // Token-budget mixture (the LLaMA-recipe knob: budgets in TOKENS,
    // not docs or rates): src0 capped at 2000 tokens, src1 at 3000,
    // everything else passes whole. Docs are taken in the md5-cell
    // order every RNG-free sampler here uses; the doc crossing the
    // budget line is kept (budgets are floors — exact truncation is
    // sequence packing's job downstream).
    QueryDef("ext_token_budget_mix", (s, dir) =>
      Corpus.tokenBudgetSample(
        Tables.documents(s, dir).select(col("doc_id"), col("source"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens")),
        "source", "doc_id", "n_tokens",
        budgets = Map("src0" -> 2000L, "src1" -> 3000L)),
      Some(s"""WITH t AS (SELECT doc_id, source,
          CAST(len($DuckToksRaw) AS BIGINT) AS n_tokens FROM documents),
        c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
            ROWS UNBOUNDED PRECEDING) AS cum FROM t)
      SELECT doc_id, source, n_tokens FROM c
      WHERE CASE source WHEN 'src0' THEN (cum - n_tokens) < 2000
                        WHEN 'src1' THEN (cum - n_tokens) < 3000
                        ELSE TRUE END""")),



    // DSIR importance log-weights (hashed-unigram likelihood ratio vs the
    // English subset as the target distribution): the md5-prefix bucket
    // is a builtin on both engines, so model build + scoring replay
    // bit-identically in SQL. 16^3 = 4096 buckets.
    QueryDef("ext_dsir_weights", (s, dir) =>
      Corpus.dsirWeights(Tables.documents(s, dir), "doc_id", "text",
          col("lang") === "en", hexChars = 3)
        .select(col("doc_id"),
          round(col("dsir_logweight") + lit(1e-9), 4).as("dsir_logweight")),
      Some(s"""WITH tok AS (SELECT doc_id, lang = 'en' AS t,
            unnest($DuckToks) AS tok FROM documents),
        b AS (SELECT doc_id, t, substr(md5(tok), 1, 3) AS bucket FROM tok),
        cnt AS (SELECT bucket, count(*) AS n_raw,
            sum(CASE WHEN t THEN 1 ELSE 0 END) AS n_tgt FROM b GROUP BY 1),
        tot AS (SELECT sum(n_raw) AS nr, sum(n_tgt) AS nt FROM cnt),
        model AS (SELECT bucket,
            ln((n_tgt + 1.0) / (nt + 4096.0))
          - ln((n_raw + 1.0) / (nr + 4096.0)) AS w FROM cnt, tot)
      SELECT b.doc_id, round(sum(model.w) + 1e-9, 4) AS dsir_logweight
      FROM b JOIN model USING (bucket) GROUP BY 1""")),



    // DSIR selection: the top-k documents by importance weight — ordered
    // on the ROUNDED weight with id tiebreak so the cut line is engine-
    // stable. Plans as TakeOrderedAndProject (no global sort).
    QueryDef("ext_dsir_select", (s, dir) =>
      Corpus.dsirWeights(Tables.documents(s, dir), "doc_id", "text",
          col("lang") === "en", hexChars = 3)
        .select(col("doc_id"),
          round(col("dsir_logweight") + lit(1e-9), 4).as("dsir_logweight"))
        .orderBy(col("dsir_logweight").desc, col("doc_id"))
        .limit(100),
      Some(s"""WITH tok AS (SELECT doc_id, lang = 'en' AS t,
            unnest($DuckToks) AS tok FROM documents),
        b AS (SELECT doc_id, t, substr(md5(tok), 1, 3) AS bucket FROM tok),
        cnt AS (SELECT bucket, count(*) AS n_raw,
            sum(CASE WHEN t THEN 1 ELSE 0 END) AS n_tgt FROM b GROUP BY 1),
        tot AS (SELECT sum(n_raw) AS nr, sum(n_tgt) AS nt FROM cnt),
        model AS (SELECT bucket,
            ln((n_tgt + 1.0) / (nt + 4096.0))
          - ln((n_raw + 1.0) / (nr + 4096.0)) AS w FROM cnt, tot),
        scored AS (SELECT b.doc_id,
            round(sum(model.w) + 1e-9, 4) AS dsir_logweight
          FROM b JOIN model USING (bucket) GROUP BY 1)
      SELECT doc_id, dsir_logweight FROM scored
      ORDER BY dsir_logweight DESC, doc_id LIMIT 100""")),



    // Sequence packing, strided layout: running-token-count binning into
    // 512-token context windows, packed WITHIN each language partition
    // (global concatenation order would serialize the corpus through one
    // task). Documents may straddle a bin boundary — downstream splits
    // them (see ext_pack_greedy for the capacity-invariant variant).
    QueryDef("ext_pack_sequences", (s, dir) =>
      Corpus.packSequencesStrided(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens")),
        "lang", "doc_id", "n_tokens", binSize = 512),
      Some(s"""WITH t AS (SELECT doc_id, lang,
          CAST(len($DuckToksRaw) AS BIGINT) AS n_tokens FROM documents),
        p AS (SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY lang
            ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0) AS prev FROM t)
      SELECT doc_id, lang, n_tokens,
        CAST(floor(prev / 512.0) AS BIGINT) AS bin,
        CAST(prev % 512 AS BIGINT) AS bin_offset
      FROM p""")),



    // Adversarial packing: the degenerate corpus (zero-token empty and
    // whitespace docs, a 20-copy identical block, emoji docs) through
    // strided packing — zero-size docs consume no capacity and land at
    // the current offset (prev unchanged), the identical block packs at
    // a constant stride, and the running sum stays exact integers.
    QueryDef("ext_adv_pack", (s, dir) =>
      Corpus.packSequencesStrided(
        advCorpus(s, dir).select(col("doc_id"),
          (col("doc_id") % 3).as("grp"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens")),
        "grp", "doc_id", "n_tokens", binSize = 64),
      Some(s"""WITH t AS (SELECT doc_id, doc_id % 3 AS grp,
          CAST(len($DuckToks) AS BIGINT) AS n_tokens FROM $DuckAdvCorpus),
        p AS (SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY grp
            ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0) AS prev FROM t)
      SELECT doc_id, grp, n_tokens,
        CAST(floor(prev / 64.0) AS BIGINT) AS bin,
        CAST(prev % 64 AS BIGINT) AS bin_offset
      FROM p""")),



    // Sequence packing, TRUE next-fit: a doc that doesn't fit starts a
    // new bin, so bin_offset + n_tokens <= 512 is an invariant (oversize
    // docs excluded by construction here: docs are capped at 512 via
    // least()). The sequential fill recurrence has no window-sum form —
    // the oracle walks each language partition with a recursive CTE.
    QueryDef("ext_pack_greedy", (s, dir) =>
      Corpus.packSequences(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"),
          least(TextOps.tokenCount(col("text")).cast("long"), lit(512L))
            .as("n_tokens")),
        "lang", "doc_id", "n_tokens", binSize = 512),
      Some(s"""WITH RECURSIVE t AS (SELECT doc_id, lang,
          least(CAST(len($DuckToksRaw) AS BIGINT), 512) AS n_tokens,
          row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        FROM documents),
      pack AS (
        SELECT doc_id, lang, n_tokens, rn,
          CAST(0 AS BIGINT) AS bin, CAST(0 AS BIGINT) AS bin_offset,
          n_tokens AS fill
        FROM t WHERE rn = 1
        UNION ALL
        SELECT t.doc_id, t.lang, t.n_tokens, t.rn,
          CASE WHEN p.fill + t.n_tokens > 512 THEN p.bin + 1 ELSE p.bin END,
          CASE WHEN p.fill + t.n_tokens > 512 THEN CAST(0 AS BIGINT) ELSE p.fill END,
          CASE WHEN p.fill + t.n_tokens > 512 THEN t.n_tokens
               ELSE p.fill + t.n_tokens END
        FROM pack p JOIN t ON t.lang = p.lang AND t.rn = p.rn + 1)
      SELECT doc_id, lang, n_tokens, bin, bin_offset FROM pack""")),



    // Deterministic weighted sampling (A-ES): 20 docs drawn with
    // probability proportional to length via hash-derived uniforms —
    // reproducible across engines, reruns, and cluster sizes.
    QueryDef("ext_weighted_sample", (s, dir) =>
      Corpus.weightedSample(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("n_chars")),
        "doc_id", "n_chars", k = 20),
      Some("""WITH t AS (SELECT doc_id, lang, n_chars,
          substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h FROM documents),
        u AS (SELECT doc_id, lang, n_chars,
          ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
            + strpos('0123456789abcdef', substr(h, 2, 1)) - 1 + 1.0) / 257.0 AS uu
          FROM t)
      SELECT doc_id, lang, n_chars FROM u
      ORDER BY ln(uu) / n_chars DESC, doc_id LIMIT 20""")),



    // PII scrubbing: redact emails and phone-shaped tokens (RE2-safe
    // patterns), with per-doc redaction counts for density gating.
    // Deterministic PII is injected on a doc_id stride so the redaction
    // path actually fires.
    QueryDef("ext_pii_scrub", (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val withPii = docs.withColumn("text",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or call 555-0142.")))
          .otherwise(col("text")))
      withPii.select(col("doc_id"),
        Corpus.emailCount(col("text")).cast("long").as("n_emails"),
        Corpus.phoneCount(col("text")).cast("long").as("n_phones"),
        Corpus.scrubPii(col("text")).as("scrubbed"))
    }, Some("""WITH t AS (SELECT doc_id,
          CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' ||
            CAST(doc_id AS VARCHAR) || '@example.com or call 555-0142.'
          ELSE text END AS text
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(text, '\d{3}-\d{4}')) AS BIGINT) AS n_phones,
        regexp_replace(regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\d{3}-\d{4}', '<PHONE>', 'g') AS scrubbed
      FROM t""")),



    // Temperature-scaled mixture (α=0.5, half the corpus): water-filled
    // acceptance rates — the budget constant c pins at the first source
    // (in saturation-threshold order) whose prefix-renormalized rate
    // stays below 1 — quantized to the 256-cell md5 gate. The oracle
    // replays the identical prefix-sum water-filling and cell
    // arithmetic, so the accepted id set matches exactly.
    QueryDef("ext_temperature_mix", (s, dir) =>
      Corpus.temperatureMix(
        Tables.documents(s, dir).select(col("doc_id"), col("source")),
        "doc_id", "source", alpha = 0.5, targetFrac = 0.5)
        .select(col("doc_id"), col("source")),
      Some("""WITH c0 AS (SELECT source, CAST(count(*) AS BIGINT) AS n
          FROM documents GROUP BY source),
        w AS (SELECT source, n, pow(CAST(n AS DOUBLE), 0.5) AS w,
            pow(CAST(n AS DOUBLE), 1 - 0.5) AS thr FROM c0),
        t AS (SELECT sum(w) AS sw, CAST(sum(n) AS DOUBLE) AS tot FROM w),
        pre AS (SELECT source, n, w, thr, sw, tot,
            coalesce(sum(CAST(n AS DOUBLE)) OVER (ORDER BY thr, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre_n,
            coalesce(sum(w) OVER (ORDER BY thr, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre_w
          FROM w CROSS JOIN t),
        cc AS (SELECT (0.5 * tot - pre_n) / (sw - pre_w) AS cstar
          FROM pre WHERE round((0.5 * tot - pre_n) / (sw - pre_w) + 1e-9, 6)
            < round(thr + 1e-9, 6)
          ORDER BY thr, source LIMIT 1),
        r AS (SELECT w.source, greatest(1.0, round(least(1.0,
              coalesce(cc.cstar, 1e308) * w.w / CAST(w.n AS DOUBLE)) * 256
              + 1e-9)) AS cells
          FROM w LEFT JOIN cc ON TRUE),
        d AS (SELECT doc_id, source,
            (strpos('0123456789abcdef',
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef',
               substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS cell
          FROM documents)
      SELECT d.doc_id, d.source FROM d JOIN r ON d.source = r.source
      WHERE d.cell < r.cells""")),



    // Temperature mixture under SATURATION (the branch the uniform
    // fixture sources never reach): a singleton source (thr 1) and a
    // 5-doc rare source (thr n^0.75) both saturate at rate 1 under
    // α=0.25 up-weighting; the water-filling must hand their unabsorbed
    // budget to the bulk source — two prefix rows are consumed before
    // the budget constant pins. The oracle replays the same two-step
    // saturation.
    QueryDef("ext_adv_temperature", (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        when(col("doc_id") === 1, "one")
          .when(col("doc_id") % 101 === 0, "rare")
          .otherwise("bulk").as("source"))
      Corpus.temperatureMix(docs, "doc_id", "source",
          alpha = 0.25, targetFrac = 0.5)
        .select(col("doc_id"), col("source"))
    }, Some("""WITH docs AS (SELECT doc_id,
          CASE WHEN doc_id = 1 THEN 'one'
               WHEN doc_id % 101 = 0 THEN 'rare'
               ELSE 'bulk' END AS source FROM documents),
      c0 AS (SELECT source, CAST(count(*) AS BIGINT) AS n
        FROM docs GROUP BY source),
      w AS (SELECT source, n, pow(CAST(n AS DOUBLE), 0.25) AS w,
          pow(CAST(n AS DOUBLE), 1 - 0.25) AS thr FROM c0),
      t AS (SELECT sum(w) AS sw, CAST(sum(n) AS DOUBLE) AS tot FROM w),
      pre AS (SELECT source, n, w, thr, sw, tot,
          coalesce(sum(CAST(n AS DOUBLE)) OVER (ORDER BY thr, source
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre_n,
          coalesce(sum(w) OVER (ORDER BY thr, source
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre_w
        FROM w CROSS JOIN t),
      cc AS (SELECT (0.5 * tot - pre_n) / (sw - pre_w) AS cstar
        FROM pre WHERE round((0.5 * tot - pre_n) / (sw - pre_w) + 1e-9, 6)
          < round(thr + 1e-9, 6)
        ORDER BY thr, source LIMIT 1),
      r AS (SELECT w.source, greatest(1.0, round(least(1.0,
            coalesce(cc.cstar, 1e308) * w.w / CAST(w.n AS DOUBLE)) * 256
            + 1e-9)) AS cells
        FROM w LEFT JOIN cc ON TRUE),
      d AS (SELECT doc_id, source,
          (strpos('0123456789abcdef',
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        + (strpos('0123456789abcdef',
             substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS cell
        FROM docs)
      SELECT d.doc_id, d.source FROM d JOIN r ON d.source = r.source
      WHERE d.cell < r.cells""")),



    // Per-source corpus datasheet ("data card" summary): doc/empty/token
    // counts, exact-integer means, and the exact-dup rate under the
    // dedup-family normalization — the release-gate report, one hash agg
    // per source.
    QueryDef("ext_corpus_report", (s, dir) =>
      Corpus.corpusReport(
        Tables.documents(s, dir).select(col("doc_id"), col("text"), col("source")),
        "doc_id", "text", "source"),
      Some("""WITH d AS (SELECT source,
          list_filter(string_split_regex(trim(lower(text)), '\s+'),
            x -> len(x) > 0) AS toks,
          CAST(len(text) AS BIGINT) AS nchar FROM documents),
        p AS (SELECT source, CAST(len(toks) AS BIGINT) AS ntok, nchar,
          md5(coalesce(array_to_string(toks, ' '), '')) AS fp FROM d)
      SELECT source,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN ntok = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
        CAST(sum(ntok) AS BIGINT) AS n_tokens,
        round(CAST(sum(ntok) AS DOUBLE) / count(*) + 1e-9, 6) AS mean_tokens,
        round(CAST(sum(nchar) AS DOUBLE) / count(*) + 1e-9, 6) AS mean_chars,
        CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct,
        round(1.0 - CAST(count(DISTINCT fp) AS DOUBLE) / count(*) + 1e-9, 6)
          AS dup_rate
      FROM p GROUP BY source""")),



    // Corpus snapshot diff: v2 drops every 7th doc, appends an edit to
    // every 5th-mod-1, and adds fresh ids — the audit must report
    // exactly those as removed/changed/added and stay silent on the
    // unchanged majority. Fingerprint equality engine-side ≡ normalized
    // text equality oracle-side (the ext_dedup_exact correspondence).
    QueryDef("ext_snapshot_diff", (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val v2 = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 1, concat(col("text"), lit(" v2 edit")))
            .otherwise(col("text")).as("text"))
        .unionByName(docs.filter(col("doc_id") % 11 === 3)
          .select((col("doc_id") + 200000).as("doc_id"), col("text")))
      Corpus.snapshotDiff(docs, v2, "doc_id", "text")
    }, Some(s"""WITH oldc AS (SELECT doc_id, text FROM documents),
      newc AS (
        SELECT doc_id, CASE WHEN doc_id % 5 = 1 THEN text || ' v2 edit'
          ELSE text END AS text FROM documents WHERE doc_id % 7 <> 0
        UNION ALL
        SELECT doc_id + 200000, text FROM documents WHERE doc_id % 11 = 3),
      o AS (SELECT doc_id,
        coalesce(array_to_string($DuckToks, ' '), '') AS norm FROM oldc),
      n AS (SELECT doc_id,
        coalesce(array_to_string($DuckToks, ' '), '') AS norm FROM newc),
      j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
          o.norm AS onorm, n.norm AS nnorm
        FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
      SELECT doc_id, CASE WHEN onorm IS NULL THEN 'added'
          WHEN nnorm IS NULL THEN 'removed'
          WHEN onorm <> nnorm THEN 'changed' END AS status
      FROM j
      WHERE onorm IS NULL OR nnorm IS NULL OR onorm <> nnorm""")),



    // Snapshot diff over the degenerate corpus: the empty doc rewritten
    // as whitespace and the 1-token doc case-folded are NOT changes
    // (normalized-content equality — the fingerprint contract), while a
    // real token append, a drop, and a fresh id report exactly once.
    QueryDef("ext_adv_snapshot_diff", (s, dir) => {
      import s.implicits._
      val v1 = advCorpus(s, dir)
      val v2 = v1.filter(col("doc_id") =!= 9000005L)
        .select(col("doc_id"),
          when(col("doc_id") === 9000001L, lit("   "))
            .when(col("doc_id") === 9000003L, lit("WORD"))
            .when(col("doc_id") === 9000008L, concat(col("text"), lit(" edit")))
            .otherwise(col("text")).as("text"))
        .unionByName(Seq((9999999L, "brand new doc")).toDF("doc_id", "text"))
      Corpus.snapshotDiff(v1, v2, "doc_id", "text")
    }, Some(s"""WITH v1 AS (SELECT doc_id, text FROM $DuckAdvCorpus),
      v2 AS (SELECT doc_id, CASE WHEN doc_id = 9000001 THEN '   '
            WHEN doc_id = 9000003 THEN 'WORD'
            WHEN doc_id = 9000008 THEN text || ' edit'
            ELSE text END AS text
          FROM v1 WHERE doc_id <> 9000005
        UNION ALL SELECT CAST(9999999 AS BIGINT), 'brand new doc'),
      o AS (SELECT doc_id,
        coalesce(array_to_string($DuckToks, ' '), '') AS norm FROM v1),
      n AS (SELECT doc_id,
        coalesce(array_to_string($DuckToks, ' '), '') AS norm FROM v2),
      j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
          o.norm AS onorm, n.norm AS nnorm
        FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
      SELECT doc_id, CASE WHEN onorm IS NULL THEN 'added'
          WHEN nnorm IS NULL THEN 'removed'
          WHEN onorm <> nnorm THEN 'changed' END AS status
      FROM j
      WHERE onorm IS NULL OR nnorm IS NULL OR onorm <> nnorm""")),



    // Curriculum ordering: n_chars as the ease signal (longest docs
    // schedule first here — the signal is caller-defined), 4
    // equal-population stages, md5-permuted within each stage. The
    // oracle replays the global rank, the exact integer bin split, and
    // the within-(bin, shard) permutation.
    QueryDef("ext_curriculum_order", (s, dir) =>
      Corpus.curriculumOrder(
        Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", bins = 4, shards = 4),
      Some("""WITH i AS (SELECT doc_id,
          row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS idx,
          count(*) OVER () AS n FROM documents),
        b AS (SELECT doc_id, (idx * 4) // n AS bin FROM i),
        k AS (SELECT doc_id, bin,
          md5(CAST(doc_id AS VARCHAR)) AS key FROM b),
        sh AS (SELECT doc_id, bin, key,
          CAST(((strpos('0123456789abcdef', substr(key, 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(key, 2, 1)) - 1)) % 4
            AS INTEGER) AS shard FROM k)
      SELECT doc_id, CAST(bin AS BIGINT) AS bin, shard,
        CAST(row_number() OVER (PARTITION BY bin, shard
          ORDER BY key, doc_id) AS BIGINT) AS pos
      FROM sh""")),



    // Contrastive positive pairs: DISJOINT consecutive 32-token blocks
    // of one document (last block possibly short, never re-anchored —
    // a pair provably never shares a token position). The oracle
    // rebuilds the same blocking and pairs via lead() per document.
    QueryDef("ext_contrastive_pairs", (s, dir) =>
      Chunking.adjacentChunkPairs(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        "doc_id", "text", chunkSize = 32),
      Some(s"""WITH t AS (SELECT doc_id, $DuckToksRaw AS toks,
          len($DuckToksRaw) AS n FROM documents),
        s AS (SELECT doc_id, toks, n FROM t WHERE n > 0),
        e AS (SELECT doc_id, toks, n, unnest(range(1, n + 1, 32)) AS strt,
            generate_subscripts(range(1, n + 1, 32), 1) - 1 AS ci FROM s),
        ch AS (SELECT doc_id, ci,
            array_to_string(toks[strt:strt+31], ' ') AS chunk_text FROM e),
        p AS (SELECT doc_id, CAST(ci AS BIGINT) AS pair_idx,
            chunk_text AS text_a,
            lead(chunk_text, 1) OVER (PARTITION BY doc_id ORDER BY ci)
              AS text_b FROM ch)
      SELECT doc_id, pair_idx, text_a, text_b FROM p
      WHERE text_b IS NOT NULL""")),

    // URL canonicalization — the normalization pass before exact URL
    // dedup (graft.ext.Urls): case-folded scheme/host, fragment and
    // tracking params stripped, query params sorted. Two deterministic
    // raw variants per doc (one noisy, one clean with swapped param
    // order) must collapse to ONE canonical form, whose full string is
    // hash-checked. Pure codegen'd projection — no shuffle beyond the
    // per-doc collapse.
    QueryDef("ext_url_canonicalize", (s, dir) => {
      val d = Tables.documents(s, dir)
      val id = col("doc_id").cast("string")
      val raw1 = concat(lit("HTTP://WWW.Example-"), col("source"),
        lit(".com/Docs/"), id, lit("?utm_source=feed&id="), id,
        lit("&lang="), col("lang"), lit("#sec"),
        (col("doc_id") % 5).cast("string"))
      val raw2 = concat(lit("http://www.example-"), col("source"),
        lit(".com/Docs/"), id, lit("?lang="), col("lang"),
        lit("&id="), id)
      d.select(col("doc_id"), explode(array(raw1, raw2)).as("url"))
        .withColumn("canon", graft.ext.Urls.canonicalizeUrl(col("url")))
        .groupBy("doc_id")
        .agg(countDistinct(col("url")).as("n_raw"),
          countDistinct(col("canon")).as("n_canon"),
          min(col("canon")).as("canon_url"))
    }, Some("""WITH raws AS (SELECT doc_id, unnest([
          'HTTP://WWW.Example-' || source || '.com/Docs/' || doc_id
            || '?utm_source=feed&id=' || doc_id || '&lang=' || lang
            || '#sec' || (doc_id % 5),
          'http://www.example-' || source || '.com/Docs/' || doc_id
            || '?lang=' || lang || '&id=' || doc_id]) AS url
        FROM documents),
      auth AS (SELECT doc_id, url, regexp_extract(url,
          '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS authority
        FROM raws),
      parts AS (SELECT doc_id, url,
          lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
            AS scheme,
          regexp_extract(authority, '^(.*@)', 1) ||
            lower(regexp_extract(authority, '([^@]*)$', 1)) AS host,
          regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
          array_to_string(list_sort(list_filter(
            string_split(regexp_extract(
              regexp_extract(url, '^([^#]*)', 1), '\?([^#]*)', 1), '&'),
            p -> len(p) > 0 AND substr(p, 1, 4) != 'utm_'
              AND substr(p, 1, 7) != 'fbclid='
              AND substr(p, 1, 6) != 'gclid=')), '&') AS params
        FROM auth),
      canon AS (SELECT doc_id, url,
          CASE WHEN len(scheme) = 0 THEN url
            ELSE scheme || '://' || host || pth ||
              CASE WHEN len(params) > 0 THEN '?' || params ELSE '' END
          END AS canon
        FROM parts)
      SELECT doc_id, CAST(count(DISTINCT url) AS BIGINT) AS n_raw,
        CAST(count(DISTINCT canon) AS BIGINT) AS n_canon,
        min(canon) AS canon_url
      FROM canon GROUP BY 1""")),

    // Adversarial URL edges (the ext_adv_* convention: degenerate
    // inputs through the same operator, oracle-visible): no query at
    // all, tracking-only query (the '?' must disappear), fragment-only
    // tail, an empty path with unsorted params, a fragment-router '?'
    // that must NOT be parsed as a query, a schemeless URL that must
    // pass through untouched, and a userinfo-bearing authority whose
    // credential case must SURVIVE while the host still folds — each
    // canonical string hash-checked in full.
    QueryDef("ext_adv_url", (s, dir) => {
      val d = Tables.documents(s, dir).filter(col("doc_id") % 7 === 0)
      val id = col("doc_id").cast("string")
      val urls = array(
        concat(lit("https://Host-"), col("source"), lit(".com/Path"), id),
        concat(lit("http://h"), id, lit(".com/p?utm_a=1&utm_b=2")),
        concat(lit("http://h"), id, lit(".com/p#frag"), id),
        concat(lit("http://H"), id, lit(".COM?b=2&a=1")),
        concat(lit("http://h"), id, lit(".com/p#!?page="), id),
        concat(lit("www.h"), id, lit(".com/Rel?b=2&a=1")),
        concat(lit("ftp://User"), id, lit(":Pw@H"), id, lit(".COM:21/F")))
      d.select(col("doc_id"), posexplode(urls).as(Seq("variant", "url")))
        .select(col("doc_id"), col("variant").cast("long").as("variant"),
          graft.ext.Urls.canonicalizeUrl(col("url")).as("canon_url"))
    }, Some("""WITH raws AS (SELECT doc_id,
          generate_subscripts(us, 1) - 1 AS variant, unnest(us) AS url
        FROM (SELECT doc_id, [
            'https://Host-' || source || '.com/Path' || doc_id,
            'http://h' || doc_id || '.com/p?utm_a=1&utm_b=2',
            'http://h' || doc_id || '.com/p#frag' || doc_id,
            'http://H' || doc_id || '.COM?b=2&a=1',
            'http://h' || doc_id || '.com/p#!?page=' || doc_id,
            'www.h' || doc_id || '.com/Rel?b=2&a=1',
            'ftp://User' || doc_id || ':Pw@H' || doc_id || '.COM:21/F'
            ] AS us
          FROM documents WHERE doc_id % 7 = 0)),
      auth AS (SELECT doc_id, variant, url, regexp_extract(url,
          '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS authority
        FROM raws),
      parts AS (SELECT doc_id, variant, url,
          lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
            AS scheme,
          regexp_extract(authority, '^(.*@)', 1) ||
            lower(regexp_extract(authority, '([^@]*)$', 1)) AS host,
          regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
          array_to_string(list_sort(list_filter(
            string_split(regexp_extract(
              regexp_extract(url, '^([^#]*)', 1), '\?([^#]*)', 1), '&'),
            p -> len(p) > 0 AND substr(p, 1, 4) != 'utm_'
              AND substr(p, 1, 7) != 'fbclid='
              AND substr(p, 1, 6) != 'gclid=')), '&') AS params
        FROM auth)
      SELECT doc_id, CAST(variant AS BIGINT) AS variant,
        CASE WHEN len(scheme) = 0 THEN url
          ELSE scheme || '://' || host || pth ||
            CASE WHEN len(params) > 0 THEN '?' || params ELSE '' END
        END AS canon_url
      FROM parts"""))
  )
}
