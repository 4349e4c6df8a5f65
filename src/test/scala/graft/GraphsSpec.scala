package graft

import graft.ext.Graphs
import org.apache.spark.sql.functions._

/** PageRank: hand-checkable trajectories on tiny graphs. */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("a directed cycle stays uniform at 1/n every round") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src_id", "dst_id")
    val pr = Graphs.pageRank(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val third = math.rint((1.0 / 3 + 1e-9) * 1e6) / 1e6
    assert(pr.values.toSet === Set(third))
    graft.core.CacheRegistry.releaseAll()
  }

  test("a sink-of-attention node outranks its pointers") {
    // 1,2,3 all point at 4; 4 points back at 1 only
    val edges = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 1L))
      .toDF("src_id", "dst_id")
    val pr = Graphs.pageRank(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // mass oscillates between 4 and its sole successor 1; both dominate
    // the leaf nodes, and the symmetric leaves tie exactly
    assert(pr(4L) > pr(2L) && pr(1L) > pr(2L))
    assert(pr(2L) === pr(3L), "symmetric nodes must tie")
    // round-1 hand fold from uniform 0.25: node 4 gets 3 full shares
    // (out-degree 1 each): 0.15/4 + 0.85 * 0.75
    val expected4r1 = math.rint((0.15 / 4 + 0.85 * 0.75 + 1e-9) * 1e6) / 1e6
    val pr1 = Graphs.pageRank(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr1(4L) === expected4r1)
    graft.core.CacheRegistry.releaseAll()
  }

  test("labelPropagation: a triangle converges to its min id; a 2-cycle oscillates deterministically") {
    import spark.implicits._
    // triangle 1-2-3 (given directed, symmetrized internally) + the
    // isolated edge 10-11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L))
      .toDF("src_id", "dst_id")
    // hand trace — r1: 1→min(2,3)=2, 2→min(1,3)=1, 3→min(1,2)=1,
    //              10↔11 swap; r2: 1→1 (both nbrs carry 1), 2→min(2,1)=1,
    //              3→min(2,1)=1, 10/11 swap back
    val l2 = Graphs.labelPropagation(edges, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(l2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 11L))
    // determinism: same rounds, same labels
    val again = Graphs.labelPropagation(edges, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(again == l2)
    graft.core.CacheRegistry.releaseAll()
  }

  test("triangleStats: K4 is all-triangles, a pendant edge is none") {
    // K4 on 1-4 (each node: deg 3, 3 triangles, lcc 1.0) plus pendant
    // 4-5 (node 4 → deg 4, still 3 triangles, lcc 3/6 = 0.5; node 5 →
    // deg 1, lcc 0.0). Edges given with duplicates, reversals, and a
    // self-loop to exercise canonicalization.
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 3L), (4L, 5L), (5L, 5L)
    ).toDF("src_id", "dst_id")
    val got = Graphs.triangleStats(edges)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((3L, 3L, 1.0)))
    assert(got(2L) === ((3L, 3L, 1.0)))
    assert(got(3L) === ((3L, 3L, 1.0)))
    assert(got(4L) === ((4L, 3L, 0.5)))
    assert(got(5L) === ((1L, 0L, 0.0)))
    // total triangle incidences = 3 × #triangles
    assert(got.values.map(_._2).sum === 12L)
    graft.core.CacheRegistry.releaseAll()
  }

  test("kCore: chain peels off a K4 core round by round; too-high k empties") {
    // K4 on 1-4 plus a pendant chain 4-5-6-7: at k=2 the chain peels
    // one node per round (7 -> 6 -> 5) and K4 survives with deg 3
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L)).toDF("src_id", "dst_id")
    val core = Graphs.kCore(edges, k = 2, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // already converged: one more round changes nothing
    val more = Graphs.kCore(edges, k = 2, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(more == core)
    // k above the max degree peels everything
    assert(Graphs.kCore(edges, k = 5, iters = 2).count() === 0)
    graft.core.CacheRegistry.releaseAll()
  }

  test("kCore: deep iters is bounded (per-round lineage cut) and fixpoint-stable") {
    // K4 plus a 16-node pendant chain: at k=2 the chain peels from its
    // single free end one node per round (~16 rounds to the K4 fixpoint).
    // Before the per-round cut, `degrees` consuming `alive` twice
    // doubled the logical plan every round — iters = 25 hung plan
    // analysis before any data moved; with the cut this completes in
    // seconds, and the monotone-peel early exit makes the post-fixpoint
    // rounds free. Deterministic either way, so the deep-budget answer
    // must equal both the K4 core and the answer one round deeper.
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val chain = (100L until 116L).sliding(2).map(p => (p.head, p.last)).toSeq :+
      ((4L, 100L))
    val edges = (k4 ++ chain).toDF("src_id", "dst_id")
    val t0 = System.nanoTime()
    val deep = Graphs.kCore(edges, k = 2, iters = 25)
      .as[(Long, Long)].collect().toMap
    val sec = (System.nanoTime() - t0) / 1e9
    assert(deep == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(sec < 120.0, s"25-round peel took ${sec}s — lineage cut regressed?")
    val deeper = Graphs.kCore(edges, k = 2, iters = 26)
      .as[(Long, Long)].collect().toMap
    assert(deeper == deep)
    graft.core.CacheRegistry.releaseAll()
  }

  test("triangleStats: a pure star has zero triangles; a 5-cycle too") {
    val star = (1 to 6).map(i => (0L, i.toLong)).toDF("src_id", "dst_id")
    assert(Graphs.triangleStats(star).filter(col("tri") > 0).count() === 0)
    val cycle = (0 until 5).map(i => (i.toLong, ((i + 1) % 5).toLong))
      .toDF("src_id", "dst_id")
    val c = Graphs.triangleStats(cycle)
      .as[(Long, Long, Long, Double)].collect()
    assert(c.forall(r => r._2 == 2L && r._3 == 0L && r._4 == 0.0))
    graft.core.CacheRegistry.releaseAll()
  }
}
