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

  test("psiDrift: identical snapshots score ~0, a shifted one scores positive") {
    val v1 = (1L to 400L).map(i => (i, (i % 20) * 100.0)).toDF("id", "v")
    val same = Corpus.psiDrift(v1, v1, "v", binWidth = 500.0)
    assert(same.agg(sum(abs(col("psi_term")))).head().getDouble(0) < 1e-4,
      "identical distributions must have ~zero PSI")
    val v2 = (1L to 400L).map(i => (i, (i % 20) * 100.0 + 1000.0)).toDF("id", "v")
    val shifted = Corpus.psiDrift(v1, v2, "v", binWidth = 500.0)
      .agg(sum(col("psi_term"))).head().getDouble(0)
    assert(shifted > 0.25, s"a full-bin shift must exceed the 0.25 alarm, got $shifted")
  }
}
