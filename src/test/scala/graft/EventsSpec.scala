package graft

import org.apache.spark.sql.functions._
import graft.ext.{Corpus, Events}

class EventsSpec extends SparkSpec {
  import spark.implicits._

  test("transitionMatrix: per-user pairing, row-normalized probabilities") {
    // user 1: a→b→a→c ; user 2: a→b — transitions from 'a': b,c,b
    val ev = Seq(
      (1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "a"), (4L, 1L, "c"),
      (5L, 2L, "a"), (6L, 2L, "b")).toDF("event_id", "user_id", "event_type")
    val m = Events.transitionMatrix(ev, "user_id", "event_type",
        orderCols = Seq("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(m(("a", "b"))._1 == 2L && math.abs(m(("a", "b"))._2 - 2.0 / 3) < 1e-5)
    assert(m(("a", "c"))._1 == 1L && math.abs(m(("a", "c"))._2 - 1.0 / 3) < 1e-5)
    assert(m(("b", "a"))._1 == 1L && m(("b", "a"))._2 == 1.0)
    // the last event of each user opens no transition; cross-user pairs never form
    assert(!m.contains(("c", "a")) && !m.contains(("b", "c")))
  }

  test("funnelSteps: earliest-completion chaining, gap cutoff, monotone counts") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    // u1 completes all 3 in order; u2 clicks BEFORE viewing (never
    // advances); u3's purchase misses the 30-minute gap
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(5)), (1L, "purchase", ts(10)),
      (2L, "click", ts(0)), (2L, "view", ts(5)),
      (3L, "view", ts(0)), (3L, "click", ts(5)), (3L, "purchase", ts(50))
    ).toDF("user_id", "event_type", "ts")
    val out = Events.funnelSteps(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), maxGap = Some("30 MINUTE"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.map(_._3).toSeq == Seq(3L, 2L, 1L),
      s"view 3 users → click 2 (u2 clicked first) → purchase 1 (u3 over gap), got ${out.toSeq}")
  }

  test("debounce vs rateLimit: gap thinning vs per-window caps") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    // burst at 0, 10, 25, 59 minutes for one key
    val ev = Seq(
      (1L, 7L, "c", ts(0)), (2L, 7L, "c", ts(10)),
      (3L, 7L, "c", ts(25)), (4L, 7L, "c", ts(59)))
      .toDF("event_id", "user_id", "event_type", "ts")
    // 15-min debounce: keep 0 (first), drop 10 (gap 10), keep 25
    // (gap 15 from its PREDECESSOR 10, kept or not), keep 59
    val kept = Events.debounce(ev, Seq("user_id"), "ts", "15 MINUTE",
        tieCols = Seq("event_id"))
      .select("event_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
    // 2-per-hour cap: earliest two of the 10:00 window survive
    val limited = Events.rateLimit(ev, Seq("user_id"), "ts", "1 hour",
        maxPerWindow = 2, tieCols = Seq("event_id"))
      .select("event_id").as[Long].collect().toSet
    assert(limited == Set(1L, 2L))
  }

  test("psiDrift: identical snapshots score ~0, a shifted one scores positive") {
    val v1 = (1L to 400L).map(i => (i, (i % 20) * 100.0)).toDF("id", "v")
    val same = Corpus.psiDrift(v1, v1, "v", binWidth = 500.0)
    assert(same.agg(sum(abs(col("psi_term")))).head().getDouble(0) < 1e-4,
      "identical distributions must have ~zero PSI")
    val v2 = (1L to 400L).map(i => (i, (i % 20) * 100.0 + 1000.0)).toDF("id", "v")
    val shifted = Corpus.psiDrift(v1, v2, "v", binWidth = 500.0)
      .agg(sum(col("psi_term"))).head().getDouble(0)
    assert(shifted > 0.25, s"a full-bin shift must exceed the 0.25 alarm, got $shifted")
    // empty old snapshot (first-release bootstrap): finite maximal-drift
    // terms, never a division by zero
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    val boot = Corpus.psiDrift(empty, v1, "v", binWidth = 500.0)
      .agg(sum(col("psi_term"))).head().getDouble(0)
    assert(!boot.isNaN && !boot.isInfinite && boot > 0.25,
      s"bootstrap drift must be finite and large, got $boot")
  }
}
