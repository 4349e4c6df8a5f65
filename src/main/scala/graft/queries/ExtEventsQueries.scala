package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Bpe, Chunking, Classifier, Corpus, Dedup, Similarity, TextOps}
import ExtQueries._

/**
 * Event-analytics and drift registry rows: funnels, retention cohorts,
 * debounce / rate-limit, journey transition matrices, and the PSI / KS
 * distribution-drift pair.
 *
 * Split from ExtCorpusQueries by family (zero behavior change, r8) —
 * shared fixture builders and DuckDB oracle fragments stay in
 * [[ExtQueries]].
 */
object ExtEventsQueries {

  def defs: Seq[QueryDef] = Seq(



    // Funnel conversion: users whose first click converts to a purchase
    // within 1 hour — event-sequence analytics over the same feed the
    // streaming attribution join consumes. One row out.
    QueryDef("ext_funnel", (s, dir) => {
      val ev = Tables.events(s, dir)
      val firstClick = ev.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min(col("ts")).as("first_click"))
      val converted = firstClick
        .join(ev.filter(col("event_type") === "purchase"), Seq("user_id"))
        .filter(col("ts") >= col("first_click") &&
          col("ts") <= col("first_click") + expr("INTERVAL 1 HOUR"))
        .select("user_id").distinct()
      firstClick.agg(count(lit(1)).as("n_clicked"))
        .crossJoin(converted.agg(count(lit(1)).as("n_converted")))
        .withColumn("conversion_rate", round(
          col("n_converted").cast("double") / col("n_clicked") + lit(1e-9), 6))
    }, Some("""WITH fc AS (SELECT user_id, min(ts) AS first_click
          FROM events WHERE event_type = 'click' GROUP BY 1),
      conv AS (SELECT DISTINCT fc.user_id FROM fc JOIN events e
          ON e.user_id = fc.user_id AND e.event_type = 'purchase'
          AND e.ts >= fc.first_click
          AND e.ts <= fc.first_click + INTERVAL 1 HOUR)
      SELECT (SELECT count(*) FROM fc) AS n_clicked,
        (SELECT count(*) FROM conv) AS n_converted,
        round(CAST((SELECT count(*) FROM conv) AS DOUBLE) /
          (SELECT count(*) FROM fc) + 1e-9, 6) AS conversion_rate""")),



    // Cohort retention: users grouped by first-seen week, activity
    // counted per week offset — the classic retention triangle. Two
    // hash aggs + one user-keyed join + a broadcast of cohort sizes;
    // no window anywhere, the shape that holds at any user count.
    QueryDef("ext_retention_cohorts", (s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
      val first = ev.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      val act = ev.join(first, Seq("user_id"))
        .select(col("user_id"), col("cohort_week"),
          (datediff(date_trunc("week", col("ts")), col("cohort_week")) / 7)
            .cast("long").as("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct(col("user_id")).as("active_users"))
      val sizes = act.filter(col("week_offset") === 0)
        .select(col("cohort_week"), col("active_users").as("cohort_size"))
      act.join(broadcast(sizes), Seq("cohort_week"))
        .select(col("cohort_week").cast("date").as("cohort_week"),
          col("week_offset"), col("active_users"), col("cohort_size"),
          round(col("active_users").cast("double") / col("cohort_size")
            + lit(1e-9), 6).as("retention"))
    }, Some("""WITH f AS (SELECT user_id, date_trunc('week', min(ts))
          AS cohort_week FROM events GROUP BY 1),
      j AS (SELECT e.user_id, f.cohort_week,
          CAST(date_diff('day', f.cohort_week, date_trunc('week', e.ts)) // 7
            AS BIGINT) AS week_offset
        FROM events e JOIN f USING (user_id)),
      act AS (SELECT cohort_week, week_offset,
          CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
        FROM j GROUP BY 1, 2),
      sz AS (SELECT cohort_week, active_users AS cohort_size FROM act
        WHERE week_offset = 0)
      SELECT CAST(a.cohort_week AS DATE) AS cohort_week, a.week_offset,
        a.active_users, s.cohort_size,
        round(CAST(a.active_users AS DOUBLE) / s.cohort_size + 1e-9, 6)
          AS retention
      FROM act a JOIN sz s USING (cohort_week)""")),



    // Debounce: per (user, type), drop events under 30 minutes from
    // their immediate predecessor. One lag window — the oracle replays
    // it.
    QueryDef("ext_event_debounce", (s, dir) =>
      graft.ext.Events.debounce(Tables.events(s, dir),
          keyCols = Seq("user_id", "event_type"), tsCol = "ts",
          minGap = "30 MINUTE", tieCols = Seq("event_id"))
        .select("event_id", "user_id", "event_type"),
      Some("""WITH w AS (SELECT event_id, user_id, event_type, ts,
          lag(ts) OVER (PARTITION BY user_id, event_type
            ORDER BY ts, event_id) AS prev
        FROM events)
      SELECT event_id, user_id, event_type FROM w
      WHERE prev IS NULL OR ts >= prev + INTERVAL 30 MINUTE""")),



    // Per-key rate limit: at most 2 events per user per 1-hour tumbling
    // window, earliest (event_id-tiebroken) first. Spark's window() and
    // DuckDB's time_bucket share hour-aligned epoch boundaries.
    QueryDef("ext_event_rate_limit", (s, dir) =>
      graft.ext.Events.rateLimit(Tables.events(s, dir),
          keyCols = Seq("user_id"), tsCol = "ts",
          windowLen = "1 hour", maxPerWindow = 2, tieCols = Seq("event_id"))
        .select("event_id", "user_id"),
      Some("""WITH b AS (SELECT event_id, user_id, ts,
          time_bucket(INTERVAL 1 HOUR, ts) AS w FROM events),
        r AS (SELECT *, row_number() OVER (PARTITION BY user_id, w
            ORDER BY ts, event_id) AS rn FROM b)
      SELECT event_id, user_id FROM r WHERE rn <= 2""")),



    // Multi-step funnel view → click → purchase, each step within 2
    // hours of the previous step's earliest completion — the N-ary
    // generalization of ext_funnel. The oracle chains the same
    // earliest-completion CTEs.
    QueryDef("ext_funnel_steps", (s, dir) =>
      graft.ext.Events.funnelSteps(Tables.events(s, dir),
        "user_id", "event_type", "ts",
        steps = Seq("view", "click", "purchase"), maxGap = Some("2 HOUR")),
      Some("""WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
          WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
          JOIN s1 ON s1.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > s1.t
            AND e.ts <= s1.t + INTERVAL 2 HOUR GROUP BY 1),
        s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
          JOIN s2 ON s2.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s2.t
            AND e.ts <= s2.t + INTERVAL 2 HOUR GROUP BY 1)
      SELECT CAST(1 AS BIGINT) AS stage, 'view' AS step,
        CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
      UNION ALL SELECT CAST(2 AS BIGINT), 'click',
        CAST((SELECT count(*) FROM s2) AS BIGINT)
      UNION ALL SELECT CAST(3 AS BIGINT), 'purchase',
        CAST((SELECT count(*) FROM s3) AS BIGINT)""")),



    // First-order Markov transitions over per-user event journeys:
    // (from, next-of-same-user) counts + row-normalized P(to | from).
    // One user-keyed window + one (from, to) hash agg; the oracle
    // replays the lead() pairing and normalization.
    QueryDef("ext_event_transitions", (s, dir) =>
      graft.ext.Events.transitionMatrix(
        Tables.events(s, dir)
          .select("event_id", "user_id", "event_type", "ts"),
        "user_id", "event_type", orderCols = Seq("ts", "event_id")),
      Some("""WITH s AS (SELECT user_id, event_type,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS nxt
        FROM events),
      p AS (SELECT event_type AS from_type, nxt AS to_type,
          CAST(count(*) AS BIGINT) AS n
        FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
      t AS (SELECT from_type, sum(n) AS tot FROM p GROUP BY 1)
      SELECT p.from_type, p.to_type, p.n,
        round(p.n / CAST(t.tot AS DOUBLE) + 1e-9, 6) AS p
      FROM p JOIN t USING (from_type)""")),



    // PSI distribution drift between two corpus releases (n_chars,
    // 500-wide bins): v2 drops every 3rd doc and inflates every
    // 5th-mod-1 length by 300 — the per-bin (p_new − p_old)·ln ratio
    // terms must match the oracle's exactly, epsilon smoothing included.
    QueryDef("ext_psi_drift", (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
      val v2 = docs.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 1, col("n_chars") + 300)
            .otherwise(col("n_chars")).as("n_chars"))
      Corpus.psiDrift(docs, v2, "n_chars", binWidth = 500.0)
    }, Some("""WITH o AS (SELECT CAST(floor(n_chars / 500.0) AS BIGINT) AS bin,
          CAST(count(*) AS BIGINT) AS n_old FROM documents GROUP BY 1),
      v2 AS (SELECT doc_id, CASE WHEN doc_id % 5 = 1 THEN n_chars + 300
          ELSE n_chars END AS n_chars FROM documents WHERE doc_id % 3 <> 0),
      nn AS (SELECT CAST(floor(n_chars / 500.0) AS BIGINT) AS bin,
          CAST(count(*) AS BIGINT) AS n_new FROM v2 GROUP BY 1),
      j AS (SELECT coalesce(o.bin, nn.bin) AS bin,
          coalesce(o.n_old, 0) AS n_old, coalesce(nn.n_new, 0) AS n_new
        FROM o FULL OUTER JOIN nn ON o.bin = nn.bin),
      t AS (SELECT CAST(sum(n_old) AS DOUBLE) AS do_,
          CAST(sum(n_new) AS DOUBLE) AS dn FROM j)
      SELECT bin, n_old, n_new,
        round((n_new / dn + 1e-6 - (n_old / do_ + 1e-6))
          * ln((n_new / dn + 1e-6) / (n_old / do_ + 1e-6)) + 1e-9, 6)
          AS psi_term
      FROM j CROSS JOIN t""")),



    // Binned two-sample KS drift over the same snapshot pair as
    // ext_psi_drift: cumulative per-bin CDFs and their gap — the
    // max-gap statistic classical drift tests threshold, complementing
    // PSI's per-bin localization. The cumulative window runs over the
    // bins-sized frame only.
    QueryDef("ext_ks_drift", (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
      val v2 = docs.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 1, col("n_chars") + 300)
            .otherwise(col("n_chars")).as("n_chars"))
      Corpus.ksDrift(docs, v2, "n_chars", binWidth = 500.0)
    }, Some("""WITH o AS (SELECT CAST(floor(n_chars / 500.0) AS BIGINT) AS bin,
          CAST(count(*) AS BIGINT) AS n_old FROM documents GROUP BY 1),
      v2 AS (SELECT doc_id, CASE WHEN doc_id % 5 = 1 THEN n_chars + 300
          ELSE n_chars END AS n_chars FROM documents WHERE doc_id % 3 <> 0),
      nn AS (SELECT CAST(floor(n_chars / 500.0) AS BIGINT) AS bin,
          CAST(count(*) AS BIGINT) AS n_new FROM v2 GROUP BY 1),
      j AS (SELECT coalesce(o.bin, nn.bin) AS bin,
          coalesce(o.n_old, 0) AS n_old, coalesce(nn.n_new, 0) AS n_new
        FROM o FULL OUTER JOIN nn ON o.bin = nn.bin),
      t AS (SELECT CAST(sum(n_old) AS DOUBLE) AS do_,
          CAST(sum(n_new) AS DOUBLE) AS dn FROM j),
      c AS (SELECT bin, n_old, n_new,
          round(sum(n_old) OVER (ORDER BY bin
              ROWS UNBOUNDED PRECEDING) / do_ + 1e-9, 6) AS cdf_old,
          round(sum(n_new) OVER (ORDER BY bin
              ROWS UNBOUNDED PRECEDING) / dn + 1e-9, 6) AS cdf_new
        FROM j CROSS JOIN t)
      SELECT bin, n_old, n_new, cdf_old, cdf_new,
        round(abs(cdf_old - cdf_new) + 1e-9, 6) AS gap FROM c""")),



    // Binned two-sample chi-square drift over the same snapshot pair —
    // the third classical statistic (PSI localizes, KS bounds the worst
    // cumulative point, chi-square weights EVERY bin): per-bin
    // (K1·n_new − K2·n_old)²/(n_old+n_new) terms with K = √(T_old/T_new)
    // scaling, summed against a χ²(bins−1) critical value by the alert
    // reader. Bins-sized arithmetic after the two scan-side collapses.
    QueryDef("ext_chisq_drift", (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
      val v2 = docs.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 1, col("n_chars") + 300)
            .otherwise(col("n_chars")).as("n_chars"))
      Corpus.chiSqDrift(docs, v2, "n_chars", binWidth = 500.0)
    }, Some("""WITH o AS (SELECT CAST(floor(n_chars / 500.0) AS BIGINT) AS bin,
          CAST(count(*) AS BIGINT) AS n_old FROM documents GROUP BY 1),
      v2 AS (SELECT doc_id, CASE WHEN doc_id % 5 = 1 THEN n_chars + 300
          ELSE n_chars END AS n_chars FROM documents WHERE doc_id % 3 <> 0),
      nn AS (SELECT CAST(floor(n_chars / 500.0) AS BIGINT) AS bin,
          CAST(count(*) AS BIGINT) AS n_new FROM v2 GROUP BY 1),
      j AS (SELECT coalesce(o.bin, nn.bin) AS bin,
          coalesce(o.n_old, 0) AS n_old, coalesce(nn.n_new, 0) AS n_new
        FROM o FULL OUTER JOIN nn ON o.bin = nn.bin),
      t AS (SELECT sqrt(CAST(sum(n_old) AS DOUBLE) / sum(n_new)) AS k1,
          sqrt(CAST(sum(n_new) AS DOUBLE) / sum(n_old)) AS k2 FROM j)
      SELECT bin, n_old, n_new,
        round(pow(k1 * n_new - k2 * n_old, 2) / (n_old + n_new) + 1e-9, 6)
          AS chisq_term
      FROM j CROSS JOIN t"""))
  )
}
