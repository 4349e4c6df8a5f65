package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.expr.QualityExpr
import graft.quality.Checks

/**
 * The dbt-test-equivalent data-quality family (SURVEY §5.2) wired to the
 * fixture tables as oracle-checkable queries, mirroring the reference's
 * quality gate (`run_data_quality_checks`, reference 5_dbt/READ.md:53-56)
 * and custom SQL tests (5_dbt/READ.md:826-879).
 *
 * Each check returns the VIOLATING rows (dbt's fail-if-rows-returned
 * contract); thresholded variants return a 1-row count so the oracle can
 * assert the exact violation tally.
 */
object QualityQueries {

  def defs: Seq[QueryDef] = Seq(

    // not_null over a sanitized column: violations = rows nulled by the
    // range check (reference 5_dbt/READ.md:300-305,826-838).
    QueryDef("dq_not_null", (s, dir) => {
      val cleaned = Tables.events(s, dir)
        .select(col("event_id"), QualityExpr.sanitizeRange(col("value"), 0, 100)
          .as("value_clean"))
      Checks.notNull(cleaned, Seq("value_clean")).select("event_id")
    }, Some("""SELECT event_id FROM (
      SELECT event_id, CASE WHEN value < 0 OR value > 100 THEN NULL ELSE value END
        AS value_clean FROM events) WHERE value_clean IS NULL""")),

    // unique: keys with more than one row (reference 5_dbt/READ.md:298-299).
    QueryDef("dq_unique", (s, dir) =>
      Checks.unique(Tables.lineitem(s, dir), Seq("l_orderkey")),
      Some("SELECT l_orderkey, count(*) AS n_rows FROM lineitem " +
        "WHERE l_orderkey IS NOT NULL " +
        "GROUP BY l_orderkey HAVING count(*) > 1")),

    // relationships: child keys with no parent in a restricted parent set
    // (reference 5_dbt/READ.md:306-311).
    QueryDef("dq_relationships", (s, dir) => {
      val goodCustomers = Tables.customer(s, dir).filter(col("c_acctbal") > 5000)
      Checks.relationships(Tables.orders(s, dir), "o_custkey",
        goodCustomers, "c_custkey")
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orphans"))
    }, Some("""SELECT o_custkey, count(*) AS n_orphans FROM orders
      WHERE o_custkey IS NOT NULL AND o_custkey NOT IN (
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      GROUP BY o_custkey""")),

    // accepted range: out-of-band readings (reference 5_dbt/READ.md:312-381).
    QueryDef("dq_accepted_range", (s, dir) =>
      Checks.acceptedRange(Tables.events(s, dir), "value", 0d, 95d)
        .select("event_id", "value"),
      Some("SELECT event_id, value FROM events " +
        "WHERE value IS NOT NULL AND (value < 0 OR value > 95)")),

    // accepted values: enum violations (empty result is itself the assertion).
    QueryDef("dq_accepted_values", (s, dir) =>
      Checks.acceptedValues(Tables.events(s, dir), "event_type",
        Seq("click", "view", "purchase"))
        .groupBy("event_type").agg(count(lit(1)).as("n_bad")),
      Some("""SELECT event_type, count(*) AS n_bad FROM events
      WHERE event_type IS NOT NULL
        AND event_type NOT IN ('click', 'view', 'purchase')
      GROUP BY event_type""")),

    // 3-sigma outlier test, thresholded count (reference 5_dbt/READ.md:841-864).
    QueryDef("dq_three_sigma", (s, dir) => {
      import s.implicits._
      val result = Checks.run("three_sigma",
        Checks.threeSigmaOutliers(Tables.events(s, dir), "value"))
      Seq(result.violations).toDF("violations")
    },
      Some("""SELECT count(*) AS violations FROM events
      CROSS JOIN (SELECT avg(value) AS mu, stddev(value) AS sd FROM events)
      WHERE abs(value - mu) > 3 * sd""")),

    // Robust MAD outliers per event type — the skew-immune twin of
    // dq_three_sigma (exact medians are engine-identical, so the
    // selected row set is too).
    QueryDef("dq_mad_outliers", (s, dir) =>
      Checks.madOutliers(
          Tables.events(s, dir).select("event_id", "event_type", "value"),
          "value", Seq("event_type"), k = 3.5)
        .select(col("event_id"), col("event_type"),
          round(col("value") + lit(1e-9), 6).as("value")),
      Some("""WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS m
          FROM events GROUP BY 1),
        dev AS (SELECT event_id, e.event_type, value, abs(value - m) AS d
          FROM events e JOIN med USING (event_type)),
        mad AS (SELECT event_type, quantile_cont(d, 0.5) AS md
          FROM dev GROUP BY 1)
        SELECT event_id, dev.event_type, round(value + 1e-9, 6) AS value
        FROM dev JOIN mad USING (event_type) WHERE d > 3.5 * md""")),

    // interval consistency: end < start (reference 5_dbt/READ.md:866-879).
    // Intervals derived deterministically: end = start + (key % 5 - 1) days.
    QueryDef("dq_end_before_start", (s, dir) => {
      val intervals = Tables.orders(s, dir).select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("start_d"),
        date_add(to_date(col("o_orderdate")),
          (col("o_orderkey") % 5 - 1).cast("int")).as("end_d"))
      Checks.endBeforeStart(intervals, "start_d", "end_d")
    }, Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS start_d,
        CAST(o_orderdate AS DATE) + CAST(o_orderkey % 5 - 1 AS INTEGER) AS end_d
      FROM orders
      WHERE CAST(o_orderdate AS DATE) + CAST(o_orderkey % 5 - 1 AS INTEGER)
        < CAST(o_orderdate AS DATE)""")),

    // source freshness (dbt's loaded_at_field test): users whose newest
    // event is staler than 12h against a pinned as-of instant — a pinned
    // literal, not now(), so the check is reproducible on both engines.
    QueryDef("dq_freshness", (s, dir) =>
      Checks.freshness(Tables.events(s, dir), "ts", Seq("user_id"),
        to_timestamp(lit("2024-02-01 00:00:00")), maxLagSec = 12 * 3600),
      Some("""SELECT user_id, max(ts) AS latest,
        CAST(date_diff('second', max(ts), TIMESTAMP '2024-02-01 00:00:00') AS BIGINT)
          AS lag_sec
        FROM events GROUP BY user_id
        HAVING date_diff('second', max(ts), TIMESTAMP '2024-02-01 00:00:00') > 43200""")),

    // column-level profile (dbt-docs / expectation-suite bootstrap): one
    // distributed pass produces null counts, exact distinct counts, and
    // stringified min/max per column. Oracle = one UNION ALL arm per
    // column over the same aggregates.
    QueryDef("dq_profile", (s, dir) =>
      Checks.profile(Tables.orders(s, dir),
        Seq("o_orderkey", "o_orderstatus", "o_orderpriority")),
      Some("""SELECT 'o_orderkey' AS "column",
          CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_nulls,
          CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
          min(CAST(o_orderkey AS VARCHAR)) AS min_str,
          max(CAST(o_orderkey AS VARCHAR)) AS max_str
        FROM orders
      UNION ALL
      SELECT 'o_orderstatus',
          CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          CAST(count(DISTINCT o_orderstatus) AS BIGINT),
          min(o_orderstatus), max(o_orderstatus)
        FROM orders
      UNION ALL
      SELECT 'o_orderpriority',
          CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          CAST(count(DISTINCT o_orderpriority) AS BIGINT),
          min(o_orderpriority), max(o_orderpriority)
        FROM orders""")),

    // k-anonymity audit (privacy release gate): quasi-identifier classes
    // (nation, market segment) shared by fewer than k=8 customers
    // re-identify their members — the violating classes and sizes are
    // the report. One hash aggregation; oracle = GROUP BY + HAVING.
    QueryDef("dq_k_anonymity", (s, dir) =>
      Checks.kAnonymity(Tables.customer(s, dir),
        Seq("c_nationkey", "c_mktsegment"), k = 8),
      Some("""SELECT c_nationkey, c_mktsegment,
          CAST(count(*) AS BIGINT) AS class_size
        FROM customer GROUP BY 1, 2 HAVING count(*) < 8"""))
  ) ++ Seq(

    // Rolling (trailing-window) anomaly: |value − trailing mean| > 3
    // trailing stddevs per event_type series, frame excluding the
    // current row, ≥10 predecessors, zero-variance histories unjudged.
    // The drift-aware twin of dq_three_sigma — the oracle replays the
    // identical frame and guards.
    QueryDef("dq_rolling_anomaly", (s, dir) =>
      graft.quality.Checks.rollingAnomalies(
          Tables.events(s, dir)
            .select("event_id", "event_type", "ts", "value"),
          "value", keyCols = Seq("event_type"), orderCols = Seq("ts", "event_id"),
          window = 20, minPrior = 10, k = 3.0)
        .select("event_id", "event_type", "z"),
      Some("""WITH w AS (SELECT event_id, event_type, value,
          avg(value) OVER win AS mu,
          stddev_samp(value) OVER win AS sd,
          count(value) OVER win AS n
        FROM events
        WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
      SELECT event_id, event_type,
        round((value - mu) / sd + 1e-9, 4) AS z
      FROM w WHERE n >= 10 AND sd > 0
        AND abs(round((value - mu) / sd + 1e-9, 4)) > 3""")),

    // Cohen's kappa between the documents fixture's STORED lang labels
    // and the n-gram lang-id heuristic's predictions — the label-audit
    // posture: is the cheap automatic rater actually agreeing with the
    // stored labels beyond what marginal-frequency chance predicts?
    // The oracle rebuilds the same contingency integers (agree, n,
    // s = Σ ca·cb) and the same single integer-ratio kappa.
    QueryDef("dq_label_agreement", (s, dir) =>
      Checks.cohenKappa(
        // widen before langId: the 5-language marker scoring is an
        // interpreted higher-order expression chain that otherwise runs
        // in the single-file scan's one task (guide §2.5)
        graft.core.Parallel.widen(Tables.documents(s, dir))
          .select(col("lang"),
            graft.ext.TextOps.langId(col("text")).as("lang_pred")),
        "lang", "lang_pred"),
      Some(s"""WITH t AS (SELECT doc_id, lang,
          list_filter(string_split_regex(trim(lower(text)), '\\s+'),
            x -> len(x) > 0) AS toks FROM documents),
        sc AS (SELECT doc_id, lang,
          len(list_filter(toks, t -> t IN ('der','die','das','und','ist','mit','für','nicht'))) AS h_de,
          len(list_filter(toks, t -> t IN ('the','and','of','is','to','in','that','with'))) AS h_en,
          len(list_filter(toks, t -> t IN ('el','la','los','y','es','en','para','que'))) AS h_es,
          len(list_filter(toks, t -> t IN ('le','la','les','et','est','dans','pour','que'))) AS h_fr,
          len(list_filter(toks, t -> t IN ('的','是','在','了','和','有','我','不'))) AS h_zh
          FROM t),
        pred AS (SELECT lang AS a,
            CASE WHEN best LIKE '0000|%' THEN 'und' ELSE substr(best, 6) END AS b
          FROM (SELECT lang, greatest(
              printf('%04d|%s', h_de, 'de'), printf('%04d|%s', h_en, 'en'),
              printf('%04d|%s', h_es, 'es'), printf('%04d|%s', h_fr, 'fr'),
              printf('%04d|%s', h_zh, 'zh')) AS best FROM sc)
          WHERE lang IS NOT NULL),
        cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
          FROM pred GROUP BY 1, 2),
        tot AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n,
          CAST(coalesce(sum(CASE WHEN a = b THEN c ELSE 0 END), 0) AS BIGINT)
            AS agree FROM cells),
        ch AS (SELECT CAST(coalesce(sum(ma.ca * mb.cb), 0) AS BIGINT) AS s
          FROM (SELECT a, sum(c) AS ca FROM cells GROUP BY 1) ma
          JOIN (SELECT b, sum(c) AS cb FROM cells GROUP BY 1) mb
            ON ma.a = mb.b)
      SELECT n,
        round(CAST(agree AS DOUBLE) / nullif(n, 0) + 1e-9, 6) AS po,
        round(CAST(s AS DOUBLE) / nullif(n * n, 0) + 1e-9, 6) AS pe,
        round(CAST(agree * n - s AS DOUBLE)
          / nullif(CAST(n * n - s AS DOUBLE), 0.0) + 1e-9, 6) AS kappa
      FROM tot CROSS JOIN ch""")),

    // Fleiss' kappa across THREE deterministic quality raters (token
    // count, char count, EN-stopword presence — all integer-threshold
    // gates, zero fp in the votes): do independent quality heuristics
    // agree on which documents are keepable beyond chance? The oracle
    // rebuilds the (item, category) cells and replays the same single
    // integer-ratio kappa (Checks.fleissKappa scaladoc).
    QueryDef("dq_multi_rater_agreement", (s, dir) => {
      val docs = Tables.documents(s, dir)
      val t = graft.ext.TextOps.tokens(lower(col("text")))
      val stops = size(filter(t, x =>
        x.isin("the", "and", "of", "is", "to", "in", "that", "with")))
      def vote(c: org.apache.spark.sql.Column) =
        when(c, "ok").otherwise("bad")
      val ratings = docs
        .select(col("doc_id"), vote(size(t) >= 50).as("cat"))
        .unionByName(docs.select(col("doc_id"),
          vote(col("n_chars") >= 280).as("cat")))
        .unionByName(docs.select(col("doc_id"),
          vote(stops >= 1).as("cat")))
      Checks.fleissKappa(ratings, "doc_id", "cat", raters = 3)
    }, Some(s"""WITH t AS (SELECT doc_id,
          list_filter(string_split_regex(trim(lower(text)), '\\s+'),
            x -> len(x) > 0) AS toks, n_chars FROM documents),
      r AS (
        SELECT doc_id, CASE WHEN len(toks) >= 50 THEN 'ok' ELSE 'bad' END
          AS cat FROM t
        UNION ALL
        SELECT doc_id, CASE WHEN n_chars >= 280 THEN 'ok' ELSE 'bad' END
          FROM t
        UNION ALL
        SELECT doc_id, CASE WHEN len(list_filter(toks, x -> x IN
            ('the','and','of','is','to','in','that','with'))) >= 1
          THEN 'ok' ELSE 'bad' END FROM t),
      cells AS (SELECT doc_id AS i, cat AS j, CAST(count(*) AS BIGINT) AS n
        FROM r GROUP BY 1, 2),
      keep AS (SELECT i FROM cells GROUP BY i HAVING sum(n) = 3),
      kc AS (SELECT c.* FROM cells c JOIN keep USING (i)),
      item AS (SELECT CAST(coalesce(sum(n * n), 0) AS BIGINT) AS s2,
          CAST(count(DISTINCT i) AS BIGINT) AS n_items FROM kc),
      cat AS (SELECT CAST(coalesce(sum(cj * cj), 0) AS BIGINT) AS c2
        FROM (SELECT j, sum(n) AS cj FROM kc GROUP BY 1)),
      f AS (SELECT n_items, s2, c2, n_items * 3 AS nr
        FROM item CROSS JOIN cat)
      SELECT n_items, CAST(3 AS BIGINT) AS raters,
        round(CAST(s2 - nr AS DOUBLE) / nullif(nr * 2, 0) + 1e-9, 6) AS pbar,
        round(CAST(c2 AS DOUBLE) / nullif(nr * nr, 0) + 1e-9, 6) AS pe,
        round(CAST((s2 - nr) * (nr * nr) - c2 * (nr * 2) AS DOUBLE)
          / nullif(CAST((nr * 2) * (nr * nr - c2) AS DOUBLE), 0.0)
          + 1e-9, 6) AS kappa
      FROM f""")),

    // Chi-square category-balance audit over the stored lang labels:
    // χ² vs the uniform expectation collapses to k·ΣO²/n − n — two
    // exact integer aggregates and one division (Checks scaladoc), so
    // the oracle replays it to the digit.
    QueryDef("dq_chi_square", (s, dir) =>
      Checks.chiSquareUniform(Tables.documents(s, dir), "lang"),
      Some("""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS o
          FROM documents WHERE lang IS NOT NULL GROUP BY 1),
        a AS (SELECT CAST(count(*) AS BIGINT) AS k,
            CAST(coalesce(sum(o), 0) AS BIGINT) AS n,
            CAST(sum(o * o) AS BIGINT) AS ssq FROM c)
      SELECT k, n,
        round(CAST(k * ssq AS DOUBLE) / nullif(n, 0)
          - CAST(n AS DOUBLE) + 1e-9, 6) AS chi2,
        k - 1 AS dof FROM a""")),

    // Benford first-digit audit of n_chars — the synthetic-data
    // detector. Leading digits come from integer-to-string rendering
    // (never log10 on the data), so the digit histogram is
    // engine-exact; only the published log10(1+1/d) expectations are
    // floats, rounded identically on both sides.
    QueryDef("dq_benford", (s, dir) =>
      Checks.benfordAudit(Tables.documents(s, dir), "n_chars"),
      Some("""WITH obs AS (SELECT CAST(substr(CAST(CAST(n_chars AS BIGINT)
              AS VARCHAR), 1, 1) AS BIGINT) AS digit,
            CAST(count(*) AS BIGINT) AS observed
          FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
          GROUP BY 1),
        t AS (SELECT CAST(coalesce(sum(observed), 0) AS BIGINT) AS n
          FROM obs),
        d AS (SELECT CAST(x AS BIGINT) AS digit FROM range(1, 10) r(x))
      SELECT d.digit,
        CAST(coalesce(obs.observed, 0) AS BIGINT) AS observed,
        round(CAST(coalesce(obs.observed, 0) AS DOUBLE)
          / nullif(t.n, 0) + 1e-9, 6) AS obs_share,
        round(log10(1.0 + 1.0 / d.digit) + 1e-9, 6) AS exp_share,
        round(round(CAST(coalesce(obs.observed, 0) AS DOUBLE)
            / nullif(t.n, 0) + 1e-9, 6)
          - round(log10(1.0 + 1.0 / d.digit) + 1e-9, 6) + 1e-9, 6) AS dev
      FROM d LEFT JOIN obs USING (digit) CROSS JOIN t""")),

    // CUSUM change detection over the daily value means — the
    // SEQUENTIAL drift statistic complementing the distributional
    // psi/ks/χ² family: a mean shift that never reshapes the histogram
    // still accumulates here. The textbook max(0, ·) recursion is
    // unrolled into prefix-sum minus running-extreme (see
    // graft.ops.Windows.cusum), so the whole detector is one window
    // pass over the PRE-AGGREGATED daily series, never the raw facts.
    QueryDef("dq_cusum_shift", (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(avg(col("value")).as("x"))
      val mu = daily.agg(avg(col("x")).as("mu"))
      graft.ops.Windows.cusum(
          daily.crossJoin(broadcast(mu)), Seq.empty, "day", "x",
          mean = col("mu"), slack = lit(2.0))
        .select(col("day"), round(col("x") + lit(1e-9), 4).as("x"),
          round(col("cusum_up") + lit(1e-9), 4).as("cusum_up"),
          round(col("cusum_down") + lit(1e-9), 4).as("cusum_down"))
    }, Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
          avg(value) AS x FROM events GROUP BY 1),
      m AS (SELECT avg(x) AS mu FROM daily),
      p AS (SELECT day, x,
          sum(x - mu - 2.0) OVER w AS p_up,
          sum(x - mu + 2.0) OVER w AS p_dn
        FROM daily CROSS JOIN m
        WINDOW w AS (ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT day, round(x + 1e-9, 4) AS x,
        round(p_up - least(min(p_up) OVER w2, 0.0) + 1e-9, 4) AS cusum_up,
        round(greatest(max(p_dn) OVER w2, 0.0) - p_dn + 1e-9, 4)
          AS cusum_down
      FROM p
      WINDOW w2 AS (ORDER BY day
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")),

    // Concentration audit of the per-user traffic distribution — the
    // corpus-balance statistics a training-data pipeline reports per
    // source: Herfindahl index (Σ share²) and the Gini coefficient via
    // the sorted-rank identity G = 2·Σ(rank·cₛₒᵣₜₑ𝒹)/(n·Σc) − (n+1)/n.
    // Rank ties are broken by user id on both engines, and Σ rank·c is
    // tie-invariant (equal values swap ranks freely), so the statistic
    // is exact-integer until two final divisions. The rank is assigned
    // by RowIndex.globalIndex (range-repartition + zipWithIndex), NOT a
    // bare row_number() window: the per-user frame is data-proportional
    // (10⁸–10⁹ users at 100 TB), so a SinglePartition WindowExec over it
    // would be the exact cliff RowIndex documents. Both denominators are
    // cast to double BEFORE multiplying — total² wraps Long past ~3e9
    // events while the DuckDB oracle's HUGEINT sums do not.
    QueryDef("dq_gini_concentration", (s, dir) => {
      val byUser = Tables.events(s, dir)
        .groupBy("user_id").agg(count(lit(1)).as("c"))
      graft.ops.RowIndex.globalIndex(byUser, Seq("c", "user_id"), "idx")
        .withColumn("rk", col("idx") + lit(1L))
        .agg(count(lit(1)).as("n_users"), sum(col("c")).as("total"),
          sum(col("c") * col("c")).as("sum_sq"),
          sum(col("rk") * col("c")).as("rank_dot"))
        .select(col("n_users"), col("total"),
          round(col("sum_sq").cast("double") /
            (col("total").cast("double") * col("total")) + lit(1e-9), 6)
            .as("hhi"),
          round(lit(2d) * col("rank_dot") /
            (col("n_users").cast("double") * col("total"))
            - (col("n_users") + lit(1)).cast("double") / col("n_users")
            + lit(1e-9), 6).as("gini"))
    }, Some("""WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1),
      r AS (SELECT c, user_id,
          row_number() OVER (ORDER BY c, user_id) AS rk FROM c)
      SELECT CAST(count(*) AS BIGINT) AS n_users,
        CAST(sum(c) AS BIGINT) AS total,
        round(CAST(sum(c * c) AS DOUBLE) / (sum(c) * sum(c)) + 1e-9, 6)
          AS hhi,
        round(2.0 * sum(rk * c) / (count(*) * sum(c))
          - CAST(count(*) + 1 AS DOUBLE) / count(*) + 1e-9, 6) AS gini
      FROM r""")),

    // Seasonal-baseline residual audit: each (type, day, hour) cell's
    // mean vs the month-long hour-of-day baseline for that type — the
    // calendar-seasonality twin of dq_rolling_anomaly (which is blind
    // to recurring daily shape). Two hash aggregations + one broadcast
    // join of the tiny (type × 24) baseline onto the daily cells; the
    // raw facts are scanned once per aggregation and never windowed.
    QueryDef("dq_seasonal_residual", (s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"),
        to_date(col("ts")).as("day"), hour(col("ts")).cast("long").as("hr"),
        col("value"))
      val baseline = ev.groupBy("event_type", "hr")
        .agg(avg(col("value")).as("base"))
      val cells = ev.groupBy("event_type", "day", "hr")
        .agg(count(lit(1)).as("n"), avg(col("value")).as("cell_mean"))
      cells.join(broadcast(baseline), Seq("event_type", "hr"))
        .select(col("event_type"), col("day"), col("hr"), col("n"),
          round(col("cell_mean") - col("base") + lit(1e-9), 4).as("resid"))
        .filter(abs(col("resid")) > 60)
    }, Some("""WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
          CAST(hour(ts) AS BIGINT) AS hr, value FROM events),
      base AS (SELECT event_type, hr, avg(value) AS base
        FROM e GROUP BY 1, 2),
      cells AS (SELECT event_type, day, hr,
          CAST(count(*) AS BIGINT) AS n, avg(value) AS cell_mean
        FROM e GROUP BY 1, 2, 3)
      SELECT cells.event_type, day, cells.hr, n,
        round(cell_mean - base + 1e-9, 4) AS resid
      FROM cells JOIN base
        ON cells.event_type = base.event_type AND cells.hr = base.hr
      WHERE abs(round(cell_mean - base + 1e-9, 4)) > 60""")),

    // Tie-corrected Mann-Whitney U — the nonparametric two-sample test
    // completing the dq test battery (χ² needs categories, KS a full
    // CDF; MWU ranks). Computed ENTIRELY FROM BIN COUNTS: per bucket,
    // the average rank is cum_before + (t+1)/2, so rank sums, U, and
    // the tie-corrected normal z all derive from one (bucket, n1, n2)
    // aggregation + one bins-sized window — the raw facts are never
    // globally sorted (this IS the tie-corrected MWU on the binned
    // values; at 100 TB the bin pass is the only honest shape). Every
    // intermediate is integer or dyadic-rational (.5s), so both engines
    // agree bit-for-bit until the final sqrt.
    QueryDef("dq_mann_whitney", (s, dir) =>
      Checks.mannWhitneyBinned(
          Tables.events(s, dir)
            .filter(col("event_type").isin("purchase", "click")),
          "value", col("event_type") === "purchase", binWidth = 4d)
        .select(col("m"), col("n"), round(col("u1"), 4).as("u1"),
          round(col("z") + lit(1e-9), 6).as("z")),
      Some("""WITH ev AS (SELECT event_type, value FROM events
        WHERE event_type IN ('purchase', 'click')
          AND value IS NOT NULL),
      bins AS (SELECT CAST(floor(value / 4) AS BIGINT) AS b,
          CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n1,
          CAST(sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END)
            AS BIGINT) AS n2
        FROM ev GROUP BY 1),
      ranked AS (SELECT b, n1, n2, n1 + n2 AS t,
          CAST(coalesce(sum(n1 + n2) OVER (ORDER BY b
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS cumBefore
        FROM bins),
      agg AS (SELECT CAST(sum(n1) AS BIGINT) AS m,
          CAST(sum(n2) AS BIGINT) AS n,
          sum(n1 * (cumBefore + CAST(t + 1 AS DOUBLE) / 2)) AS r1,
          sum(CAST(t AS DOUBLE) * t * t - t) AS tiesum
        FROM ranked),
      u AS (SELECT m, n, r1 - CAST(m AS DOUBLE) * (m + 1) / 2 AS u1,
          CAST(m AS DOUBLE) * n / 12 *
            ((m + n + 1) - tiesum /
              (CAST(m + n AS DOUBLE) * (m + n - 1))) AS vvar FROM agg)
      SELECT m, n, round(u1, 4) AS u1,
        round(CASE WHEN vvar > 0 AND isfinite(vvar)
          THEN (u1 - CAST(m AS DOUBLE) * n / 2) / sqrt(vvar) + 1e-9
          END, 6) AS z
      FROM u""")),
    // ^ degenerate-input guard mirrors the Spark side (quality/Checks
    //   .scala mannWhitneyBinned): one group empty (m*n = 0 → vvar = 0)
    //   or all values in one bin (tie correction cancels vvar) yields
    //   NULL z on BOTH engines, never inf/NaN. BOTH engines order NaN
    //   above every number (Spark's GreaterThan is NaN-safe, so
    //   `vvar > 0` alone would be TRUE for NaN) — hence the explicit
    //   NaN conjunct on EACH side: `!isnan(variance)` in Spark,
    //   `isfinite(vvar)` here, pinning the m+n=1 0/0 case to NULL.

    // Lag-1..7 autocorrelation of the daily value means — is yesterday
    // predictive of today (the weekly-seasonality fingerprint the CUSUM
    // and seasonal-residual rows don't expose directly)? Day indices
    // come from one dimension-cardinality window; each lag is an
    // index-offset self-join of the 30-row daily frame against a
    // 7-row lag spine — never a window per lag over the raw facts.
    QueryDef("dq_autocorr", (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(avg(col("value")).as("x"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("day"))))
      val stats = daily.agg(avg(col("x")).as("xbar"),
        sum(col("x") * col("x")).as("sxx"), count(lit(1)).as("nd"),
        sum(col("x")).as("sx"))
      val lags = Tables.nation(s, dir)
        .filter(col("n_nationkey").between(1, 7))
        .select(col("n_nationkey").cast("long").as("k"))
      val a = daily.select(col("rn").as("ra"), col("x").as("xa"))
      val b = daily.select(col("rn").as("rb"), col("x").as("xb"))
      a.crossJoin(broadcast(lags))
        .join(b, col("ra") === col("rb") + col("k"))
        .crossJoin(broadcast(stats))
        .groupBy("k")
        .agg(count(lit(1)).cast("long").as("n_pairs"),
          round(sum((col("xa") - col("xbar")) * (col("xb") - col("xbar")))
            / first(col("sxx") - col("sx") * col("sx") / col("nd"))
            + lit(1e-9), 6).as("acf"))
    }, Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
          avg(value) AS x FROM events GROUP BY 1),
      idx AS (SELECT x, row_number() OVER (ORDER BY day) AS rn FROM daily),
      st AS (SELECT avg(x) AS xbar, sum(x * x) AS sxx,
          count(*) AS nd, sum(x) AS sx FROM daily)
      SELECT k, CAST(count(*) AS BIGINT) AS n_pairs,
        round(sum((a.x - xbar) * (b.x - xbar))
          / any_value(sxx - sx * sx / nd) + 1e-9, 6) AS acf
      FROM idx a CROSS JOIN range(1, 8) r(k)
      JOIN idx b ON a.rn = b.rn + r.k
      CROSS JOIN st GROUP BY k""")),

    // Degenerate inputs through the r11 robust statistics, each with an
    // EXACTLY-known answer (the ext_adv_* posture for the dq family):
    // trimmed/winsorized mean of a constant column must equal the
    // constant; Gini of perfectly uniform counts is exactly 0 and HHI
    // exactly 1/n; the equal-weight weighted median is the lower
    // median. Every value is exact integer/dyadic arithmetic, so the
    // hash match is bit-level, not tolerance-level.
    QueryDef("dq_adv_degenerate", (s, dir) => {
      val keys = Tables.nation(s, dir)
        .select(col("n_nationkey").cast("long").as("k"))
      // constant column: trimmed == winsorized == plain == 42.5
      val const = keys.withColumn("v", lit(42.5))
      val bounds = const.agg(
        expr("percentile(v, 0.1)").as("p10"),
        expr("percentile(v, 0.9)").as("p90"))
      val robust = const.crossJoin(broadcast(bounds)).agg(
        avg(when(col("v").between(col("p10"), col("p90")), col("v")))
          .as("trimmed_mean"),
        avg(greatest(least(col("v"), col("p90")), col("p10")))
          .as("winsor_mean"))
      // uniform counts: every key count 4 → gini 0, hhi 1/25
      val uni = keys.withColumn("c", lit(4L))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("c"), col("k"))
      val conc = uni.withColumn("rk", row_number().over(w)).agg(
        (sum(col("c") * col("c")).cast("double") /
          (sum(col("c")) * sum(col("c")))).as("hhi"),
        (lit(2d) * sum(col("rk") * col("c")) /
          (count(lit(1)) * sum(col("c"))) -
          (count(lit(1)) + lit(1)).cast("double") / count(lit(1)))
          .as("gini"))
      // equal weights over values 1..25 → lower weighted median 13
      val wm = org.apache.spark.sql.expressions.Window.orderBy(col("k"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1))
      val med = keys.withColumn("cumw", sum(lit(1L)).over(wm))
        .withColumn("tw", sum(lit(1L)).over(wAll))
        .agg(min(when(col("cumw") * 2 >= col("tw"),
          (col("k") + 1).cast("double"))).as("weighted_median"))
      robust.crossJoin(conc).crossJoin(med)
    }, Some("""WITH keys AS (SELECT CAST(n_nationkey AS BIGINT) AS k
          FROM nation),
      cst AS (SELECT k, CAST(42.5 AS DOUBLE) AS v FROM keys),
      b AS (SELECT quantile_cont(v, 0.1) AS p10,
          quantile_cont(v, 0.9) AS p90 FROM cst),
      robust AS (SELECT
          avg(CASE WHEN v BETWEEN p10 AND p90 THEN v END) AS trimmed_mean,
          avg(greatest(least(v, p90), p10)) AS winsor_mean
        FROM cst CROSS JOIN b),
      uni0 AS (SELECT k, CAST(4 AS BIGINT) AS c FROM keys),
      uni AS (SELECT k, c, row_number() OVER (ORDER BY c, k) AS rk
        FROM uni0),
      conc AS (SELECT
          CAST(sum(c * c) AS DOUBLE) / (sum(c) * sum(c)) AS hhi,
          2.0 * sum(rk * c) / (count(*) * sum(c))
            - CAST(count(*) + 1 AS DOUBLE) / count(*) AS gini
        FROM uni),
      wm AS (SELECT k,
          CAST(sum(1) OVER (ORDER BY k
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cumw,
          CAST(count(*) OVER () AS BIGINT) AS tw FROM keys),
      med AS (SELECT min(CASE WHEN cumw * 2 >= tw
          THEN CAST(k + 1 AS DOUBLE) END) AS weighted_median FROM wm)
      SELECT * FROM robust CROSS JOIN conc CROSS JOIN med"""))
  )
}
