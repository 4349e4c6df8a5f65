package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Bpe, Chunking, Classifier, Corpus, Dedup, Multimodal, Similarity, TextOps}

/**
 * LLM-training-data extension operators (BASELINE north star): text
 * analysis, exact + near dedup, similarity search, multimodal plumbing —
 * each as an oracle-checkable query over `documents` / `embeddings`.
 *
 * Oracle strategy for hash-based operators (minhash/fingerprints use
 * xxhash64, which DuckDB cannot reproduce): the registered OUTPUT is
 * hash-independent — survivor groups, Jaccard-verified pairs — which the
 * oracle recomputes directly from the raw strings. A hash collision would
 * break the equivalence; at 64 bits over ≤1e3 docs the collision odds are
 * ~1e-13 and the fixtures are deterministic, so a local pass is a
 * permanent pass.
 *
 * Synthetic duplicates are derived in-query from the fixtures
 * (deterministic arithmetic on doc_id; uppercase/append-tail variants)
 * because the fixture corpus itself contains no duplicates.
 */
object ExtQueries {

  /** Shared DuckDB fragment: whitespace tokens of lowercased text. */
  private[queries] val DuckToks =
    """list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0)"""
  private[queries] val DuckToksRaw =
    """list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)"""

  /**
   * DuckDB twin of [[graft.ext.Bpe.bpeTrain]], unrolled (SQL has no
   * loops): emits CTEs `w0..w{rounds}` (the evolving word
   * symbolization, chr(31)-wrapped symbols) and `p0/m0..` (per-round
   * pair counts and the argmax merge). Mirrors the Spark side exactly:
   * same tokenization, same (count DESC, lhs, rhs) tie-break, and the
   * same non-overlapping `replace` as the merge step — all exact
   * integer/string work. A round with no pairs left degenerates to an
   * empty `m{i}` whose LEFT JOIN leaves `w{i+1}` = `w{i}`, matching the
   * Spark loop's early stop. Every CTE is `MATERIALIZED`: each `w{i}`
   * is referenced twice (pair count + next round), so DuckDB's default
   * inlining would expand the chain 2^rounds times — at 16 rounds that
   * is 65k scans of documents.parquet and an fd-exhaustion IO error,
   * not just slowness.
   */
  private[queries] def duckBpeRounds(rounds: Int,
      corpusSrc: String = "documents WHERE lang = 'en'"): String = {
    val w0 = s"""w0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS cnt,
        regexp_replace(word, '(.)', chr(31) || '\\1' || chr(31), 'g') AS sym
      FROM (SELECT unnest($DuckToks) AS word FROM $corpusSrc)
      GROUP BY 1)"""
    val rs = (0 until rounds).map { i =>
      s"""p$i AS MATERIALIZED (SELECT pr[1] AS lhs, pr[2] AS rhs,
          CAST(sum(cnt) AS BIGINT) AS c
        FROM (SELECT cnt, unnest(list_transform(range(1, len(syms)),
            j -> [syms[j], syms[j+1]])) AS pr
          FROM (SELECT cnt, list_filter(string_split(sym, chr(31)),
            x -> x <> '') AS syms FROM w$i))
        GROUP BY 1, 2),
      m$i AS MATERIALIZED (SELECT lhs, rhs, c FROM p$i ORDER BY c DESC, lhs, rhs LIMIT 1),
      w${i + 1} AS MATERIALIZED (SELECT word, cnt, CASE WHEN m.lhs IS NULL THEN sym
          ELSE replace(sym,
            chr(31) || m.lhs || chr(31) || chr(31) || m.rhs || chr(31),
            chr(31) || m.lhs || m.rhs || chr(31)) END AS sym
        FROM w$i LEFT JOIN m$i m ON TRUE)"""
    }
    (w0 +: rs).mkString(",\n      ")
  }

  /** DuckDB cosine of two double lists, fp-stabilized like the Spark
   *  side (`round(+1e-9, 6)`, NULL→-2 floor for zero-norm vectors). */
  private[queries] def duckCos(a: String, b: String): String =
    s"""coalesce(round(list_inner_product($a, $b) /
       |  nullif(sqrt(list_inner_product($a, $a))
       |       * sqrt(list_inner_product($b, $b)), 0) + 1e-9, 6), -2)""".stripMargin

  /**
   * DuckDB twin of [[Similarity.kmeansFit]] + final assignment, unrolled
   * (SQL has no loops): expects a CTE `v(vec_id, e)` with e =
   * list<double>, emits CTEs up to `af(vec_id, lbl, s)` — the per-vector
   * cluster + score against the centroids after `iters` Lloyd updates.
   * Mirrors the Spark side exactly: k lowest-id seeds labeled in id
   * order, fp-stabilized centroids each update, (score desc, label)
   * assignment tie-break, empty clusters keep their previous centroid.
   */
  /** Unrolled DuckDB replay of [[graft.ext.Similarity.kmeansFit]] over
    * source CTE `src` (vec_id, e). CTE names carry prefix `p` so several
    * replays (one per PQ subspace) can coexist in one statement; the
    * final assignment CTE is `${p}af`. */
  private[queries] def duckKmeans(k: Int, iters: Int, src: String = "v",
                         p: String = ""): String = {
    def assign(prev: String, out: String) =
      s"""$out AS (SELECT vec_id, lbl FROM (
         |  SELECT $src.vec_id, c.lbl, row_number() OVER (PARTITION BY $src.vec_id
         |      ORDER BY ${duckCos(s"$src.e", "c.cv")} DESC, c.lbl) AS rn
         |  FROM $src CROSS JOIN $prev c) WHERE rn = 1)""".stripMargin
    def update(ass: String, prev: String, out: String) =
      s"""d_$out AS (SELECT $ass.lbl, generate_subscripts($src.e, 1) AS dim,
         |    unnest($src.e) AS val
         |  FROM $src JOIN $ass ON $ass.vec_id = $src.vec_id),
         |m_$out AS (SELECT lbl, dim, round(avg(val) + 1e-9, 6) AS c
         |  FROM d_$out GROUP BY 1, 2),
         |u_$out AS (SELECT lbl, list(c ORDER BY dim) AS cv FROM m_$out GROUP BY lbl),
         |$out AS (SELECT p.lbl, coalesce(u_$out.cv, p.cv) AS cv
         |  FROM $prev p LEFT JOIN u_$out ON u_$out.lbl = p.lbl)""".stripMargin
    val seed =
      s"""${p}c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS lbl,
         |    list_transform(e, x -> round(x + 1e-9, 6)) AS cv
         |  FROM (SELECT * FROM $src ORDER BY vec_id LIMIT $k))""".stripMargin
    val steps = (1 to iters).map { i =>
      assign(s"${p}c${i - 1}", s"${p}a$i") + ",\n" +
        update(s"${p}a$i", s"${p}c${i - 1}", s"${p}c$i")
    }
    val fin =
      s"""${p}af AS (SELECT vec_id, lbl, s FROM (
         |  SELECT $src.vec_id, c.lbl, ${duckCos(s"$src.e", "c.cv")} AS s,
         |      row_number() OVER (PARTITION BY $src.vec_id
         |        ORDER BY ${duckCos(s"$src.e", "c.cv")} DESC, c.lbl) AS rn
         |  FROM $src CROSS JOIN ${p}c$iters c) WHERE rn = 1)""".stripMargin
    (seed +: steps :+ fin).mkString(",\n")
  }

  /** Seed lexicon for the classifier fixture: three tokens whose md5
    * buckets are collision-free in the fixture vocabulary at B=64, so
    * the learned weights are interpretable in the spec. */
  private[queries] val ClassifierLexicon = Seq("stream", "window", "merge")

  /**
   * DuckDB twin of [[graft.ext.Classifier.perceptronTrain]] over the
   * classifier fixture, unrolled (SQL has no loops). The entire replay
   * is exact integer arithmetic — binary presence features, unit
   * updates — so no rounding convention is needed anywhere: CTEs
   * `qw{i}`/`qb{i}` are the weights/bias entering round i, `qzf` the
   * final per-doc integer margin. Rounds after convergence select an
   * empty misclassified set and become no-ops, matching the trainer's
   * early stop wherever it lands. Sums are CAST AS BIGINT (DuckDB
   * integer sums return HUGEINT, which the driver's pandas path would
   * surface as float64).
   */
  private[queries] def duckPerceptron(rounds: Int, numBuckets: Int,
                             trainWhere: String = "TRUE",
                             docsSrc: String = "documents"): String = {
    val lex = ClassifierLexicon.map(t => s"'$t'").mkString("[", ",", "]")
    val bucket =
      s"""((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
         | + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1))
         | % $numBuckets""".stripMargin
    val head =
      s"""qdocs AS MATERIALIZED (SELECT doc_id, $DuckToks AS toks FROM $docsSrc),
         |qpos AS MATERIALIZED (SELECT doc_id, toks, CAST(1 AS BIGINT) AS y
         |  FROM qdocs WHERE len(list_intersect(toks, $lex)) > 0),
         |qcorp AS MATERIALIZED (SELECT * FROM qpos UNION ALL
         |  SELECT doc_id + 100000 AS doc_id,
         |    list_filter(toks, x -> NOT list_contains($lex, x)) AS toks,
         |    CAST(-1 AS BIGINT) AS y FROM qpos),
         |qlab AS MATERIALIZED (SELECT doc_id, y FROM qcorp),
         |qfb AS MATERIALIZED (SELECT DISTINCT doc_id, $bucket AS bucket
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM qcorp)),
         |qtlab AS MATERIALIZED (SELECT * FROM qlab WHERE $trainWhere),
         |qtfb AS MATERIALIZED (SELECT fb.* FROM qfb fb
         |  JOIN qtlab t ON t.doc_id = fb.doc_id),
         |qw0 AS MATERIALIZED (SELECT CAST(unnest(range(0, $numBuckets)) AS BIGINT)
         |    AS bucket, CAST(0 AS BIGINT) AS w),
         |qb0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS bias)""".stripMargin
    def z(i: Int, out: String, lab: String, fb: String) =
      s"""$out AS MATERIALIZED (SELECT l.doc_id, l.y,
         |  (SELECT bias FROM qb$i) + coalesce(CAST(sum(w.w) AS BIGINT), 0) AS z
         |  FROM $lab l LEFT JOIN $fb fb ON fb.doc_id = l.doc_id
         |  LEFT JOIN qw$i w ON w.bucket = fb.bucket GROUP BY 1, 2)""".stripMargin
    val steps = (0 until rounds).map { i =>
      s"""${z(i, s"qz$i", "qtlab", "qtfb")},
         |qg$i AS MATERIALIZED (SELECT fb.bucket, CAST(sum(z.y) AS BIGINT) AS dw
         |  FROM qz$i z JOIN qtfb fb USING (doc_id)
         |  WHERE z.y * z.z <= 0 GROUP BY 1),
         |qw${i + 1} AS MATERIALIZED (SELECT w.bucket, w.w + coalesce(g.dw, 0) AS w
         |  FROM qw$i w LEFT JOIN qg$i g USING (bucket)),
         |qb${i + 1} AS MATERIALIZED (SELECT (SELECT bias FROM qb$i) +
         |  coalesce((SELECT CAST(sum(y) AS BIGINT) FROM qz$i
         |            WHERE y * z <= 0), 0) AS bias)""".stripMargin
    }
    (head +: steps :+ z(rounds, "qzf", "qlab", "qfb")).mkString(",\n")
  }

  /**
   * Chained twin of [[duckPerceptron]] for the STREAMING trainer
   * ([[graft.streaming.ClassifierIngest]]): the corpus splits into
   * `batches` slices (`batchWhere(b)` over `qlab`), and each batch
   * continues the weight chain from the previous batch's final weights
   * for `roundsPerBatch` rounds — global round index g = b·R + r keeps
   * the qw/qb chain linear. All-integer replay, same fragments as the
   * batch oracle. Emits CTEs through `qw{batches·R}` / `qb{batches·R}`.
   */
  private[queries] def duckPerceptronChained(batches: Int, roundsPerBatch: Int,
      numBuckets: Int, batchWhere: Int => String,
      docsSrc: String = "documents"): String = {
    val lex = ClassifierLexicon.map(t => s"'$t'").mkString("[", ",", "]")
    val bucket =
      s"""((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
         | + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1))
         | % $numBuckets""".stripMargin
    val head =
      s"""qdocs AS MATERIALIZED (SELECT doc_id, $DuckToks AS toks FROM $docsSrc),
         |qpos AS MATERIALIZED (SELECT doc_id, toks, CAST(1 AS BIGINT) AS y
         |  FROM qdocs WHERE len(list_intersect(toks, $lex)) > 0),
         |qcorp AS MATERIALIZED (SELECT * FROM qpos UNION ALL
         |  SELECT doc_id + 100000 AS doc_id,
         |    list_filter(toks, x -> NOT list_contains($lex, x)) AS toks,
         |    CAST(-1 AS BIGINT) AS y FROM qpos),
         |qlab AS MATERIALIZED (SELECT doc_id, y FROM qcorp),
         |qfb AS MATERIALIZED (SELECT DISTINCT doc_id, $bucket AS bucket
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM qcorp)),
         |qw0 AS MATERIALIZED (SELECT CAST(unnest(range(0, $numBuckets)) AS BIGINT)
         |    AS bucket, CAST(0 AS BIGINT) AS w),
         |qb0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS bias)""".stripMargin
    def z(i: Int, out: String, lab: String, fb: String) =
      s"""$out AS MATERIALIZED (SELECT l.doc_id, l.y,
         |  (SELECT bias FROM qb$i) + coalesce(CAST(sum(w.w) AS BIGINT), 0) AS z
         |  FROM $lab l LEFT JOIN $fb fb ON fb.doc_id = l.doc_id
         |  LEFT JOIN qw$i w ON w.bucket = fb.bucket GROUP BY 1, 2)""".stripMargin
    val steps = (0 until batches).flatMap { b =>
      val batchCtes =
        s"""qtlab_$b AS MATERIALIZED (SELECT * FROM qlab WHERE ${batchWhere(b)}),
           |qtfb_$b AS MATERIALIZED (SELECT fb.* FROM qfb fb
           |  JOIN qtlab_$b t ON t.doc_id = fb.doc_id)""".stripMargin
      val rounds = (0 until roundsPerBatch).map { r =>
        val g = b * roundsPerBatch + r
        s"""${z(g, s"qz$g", s"qtlab_$b", s"qtfb_$b")},
           |qg$g AS MATERIALIZED (SELECT fb.bucket, CAST(sum(z.y) AS BIGINT) AS dw
           |  FROM qz$g z JOIN qtfb_$b fb USING (doc_id)
           |  WHERE z.y * z.z <= 0 GROUP BY 1),
           |qw${g + 1} AS MATERIALIZED (SELECT w.bucket, w.w + coalesce(g.dw, 0) AS w
           |  FROM qw$g w LEFT JOIN qg$g g USING (bucket)),
           |qb${g + 1} AS MATERIALIZED (SELECT (SELECT bias FROM qb$g) +
           |  coalesce((SELECT CAST(sum(y) AS BIGINT) FROM qz$g
           |            WHERE y * z <= 0), 0) AS bias)""".stripMargin
      }
      batchCtes +: rounds
    }
    (head +: steps).mkString(",\n")
  }

  /** Spark twin of [[duckPerceptron]]'s labeled corpus: positives =
    * fixture docs containing a lexicon token, negatives = the same docs
    * with lexicon tokens stripped (+100000 ids), features = sorted
    * md5-bucket presence at B=64, label ±1. */
  private[queries] def classifierFixture(s: org.apache.spark.sql.SparkSession,
                                dir: String): org.apache.spark.sql.DataFrame = {
    val lex = typedLit(ClassifierLexicon)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.ext.TextOps.tokens(lower(col("text"))).as("toks"))
      .filter(arrays_overlap(col("toks"), lex))
    val pos = docs.select(col("doc_id"), col("toks"), lit(1L).as("y"))
    val neg = docs.select((col("doc_id") + 100000).as("doc_id"),
      filter(col("toks"), t => !array_contains(lex, t)).as("toks"),
      lit(-1L).as("y"))
    pos.unionByName(neg)
      .select(col("doc_id"),
        Classifier.bucketsOf(col("toks"), numBuckets = 64).as("buckets"),
        col("y"))
  }

  /**
   * Degenerate corpus for the adversarial robustness rows (`ext_adv_*`):
   * empty and whitespace-only docs, a 1-token doc with exact and
   * case/padding twins, supplementary-plane emoji docs, a document whose
   * two words tie on pair count but whose UTF-8 byte order INVERTS the
   * JVM's UTF-16 code-unit order (U+FFFD = EF BF BD sorts BELOW
   * U+1D552 = F0 9D 95 92 in bytes, but its 0xFFFD code unit sorts ABOVE
   * the 0xD835 surrogate — the exact divergence `Bpe.utf8Lt` exists
   * for), and a 20-copy all-identical block. Unioned with a thin fixture
   * slice so organic text flows through the same plans. The SQL twin is
   * interpolated from the SAME Scala constants — one source of truth.
   */
  private[queries] val AdvEmojiDoc = "😀 🐍" // "😀 🐍"
  private[queries] val AdvTieDoc =
    "�� 𝕒𝕒" // "�� 𝕒𝕒"
  private[queries] val AdvBoiler =
    "identical boilerplate sentence repeated verbatim zzq"
  private[queries] val AdvDegenRows: Seq[(Long, String)] = Seq(
    (9000001L, ""), (9000002L, "   "), (9000003L, "word"),
    (9000004L, "word"), (9000005L, "Word  "),
    (9000006L, AdvEmojiDoc), (9000007L, AdvEmojiDoc), (9000008L, AdvTieDoc)) ++
    (1 to 20).map(i => (9000100L + i, AdvBoiler))
  private[queries] def advCorpus(s: org.apache.spark.sql.SparkSession,
                        dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    AdvDegenRows.toDF("doc_id", "text")
      .unionByName(Tables.documents(s, dir)
        .filter(col("doc_id") % 17 === 0).select(col("doc_id"), col("text")))
  }
  /** DuckDB derived-table twin of [[advCorpus]] (alias `adv`). */
  private[queries] lazy val DuckAdvCorpus: String = {
    val vals = AdvDegenRows.map { case (id, t) => s"($id, '$t')" }.mkString(", ")
    s"""(SELECT CAST(doc_id AS BIGINT) AS doc_id, text
        FROM (VALUES $vals) t(doc_id, text)
        UNION ALL SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0) adv"""
  }
  /** The degenerate rows alone (no boiler block, no fixture slice) — the
    * BPE corpus, small enough that the count-1 tie rounds are reached
    * within a few merges. */
  private[queries] val AdvDegenHead: Seq[(Long, String)] = AdvDegenRows.take(8)
  private[queries] lazy val DuckAdvDegenHead: String = {
    val vals = AdvDegenHead.map { case (id, t) => s"($id, '$t')" }.mkString(", ")
    s"""(SELECT CAST(doc_id AS BIGINT) AS doc_id, text
        FROM (VALUES $vals) t(doc_id, text)) advd"""
  }
  /** Lexicon-bearing degenerate docs for the classifier row: their
    * stripped negative twins have EMPTY or emoji-only feature sets. */
  private[queries] val AdvLexDocs: Seq[(Long, String)] = Seq(
    (9000011L, "stream"), (9000012L, "stream merge window"),
    (9000013L, s"stream $AdvEmojiDoc"))
  private[queries] lazy val DuckAdvClassifierDocs: String = {
    val vals = AdvLexDocs.map { case (id, t) => s"($id, '$t')" }.mkString(", ")
    s"""(SELECT doc_id, text FROM documents
        UNION ALL SELECT CAST(doc_id AS BIGINT), text
        FROM (VALUES $vals) t(doc_id, text)) advc"""
  }
  private[queries] def advClassifierFixture(s: org.apache.spark.sql.SparkSession,
                                   dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val lex = typedLit(ClassifierLexicon)
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .unionByName(AdvLexDocs.toDF("doc_id", "text"))
      .select(col("doc_id"),
        graft.ext.TextOps.tokens(lower(col("text"))).as("toks"))
      .filter(arrays_overlap(col("toks"), lex))
    val pos = docs.select(col("doc_id"), col("toks"), lit(1L).as("y"))
    val neg = docs.select((col("doc_id") + 100000).as("doc_id"),
      filter(col("toks"), t => !array_contains(lex, t)).as("toks"),
      lit(-1L).as("y"))
    pos.unionByName(neg)
      .select(col("doc_id"),
        Classifier.bucketsOf(col("toks"), numBuckets = 64).as("buckets"),
        col("y"))
  }

  /**
   * Degenerate embeddings for the similarity adversarial rows
   * (`ext_adv_sim_*`): a zero vector (zero norm — cosine is undefined;
   * the engine contract is NULL score, excluded from results), a uniform
   * all-ones vector, its tiny-magnitude parallel twin (1e-20 — cosine
   * exactly 1.0 with the ones vector, probing norm underflow), its
   * negation (cosine −1.0), and a single-hot axis vector. Unioned with a
   * fixture slice so organic vectors flow through the same plan. The
   * uniform fill values are shared Scala↔SQL as literal strings — one
   * source of truth for both engines.
   */
  private[queries] val AdvVecUniform: Seq[(Long, String)] = Seq(
    (9100001L, "0.0"), (9100002L, "1.0"), (9100003L, "1.0e-20"),
    (9100004L, "-1.0"))
  private[queries] val AdvVecHotId = 9100005L
  private[queries] def advVecs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val rows = AdvVecUniform.map { case (id, v) =>
      (id, Seq.fill(64)(v.toFloat))
    } :+ (AdvVecHotId, 1.0f +: Seq.fill(63)(0.0f))
    rows.toDF("vec_id", "embedding")
      .unionByName(Tables.embeddings(s, dir)
        .filter(col("vec_id") % 7 === 0).select("vec_id", "embedding"))
  }
  /** DuckDB derived-table twin of [[advVecs]] (alias `advv`). */
  private[queries] lazy val DuckAdvVecs: String = {
    val uni = AdvVecUniform.map { case (id, v) =>
      s"""SELECT CAST($id AS BIGINT) AS vec_id,
          list_transform(range(64), x -> CAST($v AS FLOAT)) AS embedding"""
    }
    val hot = s"""SELECT CAST($AdvVecHotId AS BIGINT),
        list_prepend(CAST(1.0 AS FLOAT),
          list_transform(range(63), x -> CAST(0.0 AS FLOAT)))"""
    s"""(${(uni :+ hot).mkString(" UNION ALL ")}
        UNION ALL SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % 7 = 0) advv"""
  }

  /** Shared (base, batch) fixture for the incremental near-dup family:
    * near-dups are seeded as tail-append copies (j ≈ 0.9) of fixture
    * docs, two overlapping modulo families so batch-vs-base AND
    * batch-self drops both occur. */
  private[queries] def incrementalNearFixture(s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
      .unionByName(docs.filter(col("doc_id") % 5 === 1)
        .select((col("doc_id") + 400000).as("doc_id"),
          concat(col("text"), lit(" dup marker tail")).as("text")))
      .unionByName(docs.filter(col("doc_id") % 15 === 0)
        .select((col("doc_id") + 500000).as("doc_id"),
          concat(col("text"), lit(" dup marker tail")).as("text")))
    (base, batch)
  }

  /** Brute-force Jaccard ground truth for [[incrementalNearFixture]] —
    * shared verbatim by ext_dedup_incremental_near and its
    * persisted-index twin (bands=32/r=2 puts LSH recall at the 0.5
    * threshold ≈ 1, so the exact oracle matches both). */
  private[queries] lazy val IncrementalNearOracleSql: String = s"""WITH all_docs AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        UNION ALL
        SELECT doc_id + 400000, text || ' dup marker tail' FROM documents
        WHERE doc_id % 5 = 1
        UNION ALL
        SELECT doc_id + 500000, text || ' dup marker tail' FROM documents
        WHERE doc_id % 15 = 0),
      base_docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
      bsh AS (SELECT doc_id, CASE WHEN len(toks) < 3
            THEN [array_to_string(toks, ' ')]
            ELSE list_distinct(list_transform(range(1, len(toks) - 1),
              i -> array_to_string(toks[i:i+2], ' '))) END AS shingles
          FROM (SELECT doc_id, $DuckToks AS toks FROM all_docs)),
      psh AS (SELECT doc_id, CASE WHEN len(toks) < 3
            THEN [array_to_string(toks, ' ')]
            ELSE list_distinct(list_transform(range(1, len(toks) - 1),
              i -> array_to_string(toks[i:i+2], ' '))) END AS shingles
          FROM (SELECT doc_id, $DuckToks AS toks FROM base_docs)),
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
      SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars
      FROM all_docs d
      WHERE d.doc_id NOT IN (SELECT doc_id FROM drop_vs_base)
        AND d.doc_id NOT IN (SELECT doc_id FROM self_drops)"""

  /** All ext_* rows — concatenation of the family files (split r7;
    * registry contents unchanged). */
  def defs: Seq[QueryDef] =
    ExtTextQueries.defs ++ ExtDedupQueries.defs ++ ExtCorpusQueries.defs ++
      ExtModelQueries.defs ++ ExtEventsQueries.defs ++
      ExtSimilarityQueries.defs ++ ExtMultimodalQueries.defs
}
