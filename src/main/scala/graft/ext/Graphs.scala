package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph analytics over similarity graphs — centrality for data
 * curation: PageRank over the kNN graph ranks documents/embeddings by
 * how much of the corpus points at them, a standard signal for
 * selecting prototypical or influential training examples (the inverse
 * of the prototypicality-pruning use case).
 *
 * Reference scope: the reference's marts rank by aggregated metrics
 * (`5_dbt/READ.md:531-733`); graph centrality is an extension in the
 * same spirit as the other `ext` operators. Connected components (the
 * other graph op the corpus pipelines need) lives in [[Dedup]].
 *
 * Scale shape: per power-iteration round, ONE shuffle of the edge list
 * keyed by src (to pick up the current rank) and one hash aggregation
 * keyed by dst — edges move, never an adjacency matrix; rank state is
 * one row per node. Iteration count is a constant (the caller's
 * convergence budget), so total cost is iters × O(|E|) — the same
 * shape GraphX/Pregel implementations converge to, expressed
 * declaratively.
 */
object Graphs {

  /**
   * Damped PageRank by unrolled power iteration. Ranks are rounded to
   * 6 digits each round (`round(x + 1e-9, 6)`) so the trajectory is
   * reproducible across engines and summation orders — the same
   * fp-stabilization convention as the k-means family.
   *
   * @param edges      (src_id, dst_id) directed edges; nodes are the
   *                   union of both endpoint sets
   * @param iters      power-iteration rounds
   * @param damping    the classic 0.85
   * @param checkpoint where the final ranks' lineage cut lives —
   *                   [[graft.core.CheckpointStrategy.Local]] (default)
   *                   or `Reliable(dir)` on a cluster (the
   *                   connectedComponents convention)
   * @return (id, pr) after `iters` rounds
   */
  def pageRank(edges: DataFrame, iters: Int,
               damping: Double = 0.85,
               checkpoint: graft.core.CheckpointStrategy =
                 graft.core.CheckpointStrategy.Local): DataFrame = {
    // The edge list is often EXPENSIVE to derive (a kNN-graph build);
    // cache it first so nodes/out-degree/iterations all read one
    // materialization instead of re-deriving it per consumer (three
    // derivations before this change — the dominant cost of
    // ext_pagerank_knn, measured in SCALE.md r8)
    val e0 = graft.core.CacheRegistry.persistTracked(
      edges.select(col("src_id"), col("dst_id")))
    val nodes = graft.core.CacheRegistry.persistTracked(
      e0.select(col("src_id").as("id"))
        .unionByName(e0.select(col("dst_id").as("id"))).distinct())
    val n = nodes.count()
    // out-degree folded into the edge list ONCE — each iteration then
    // pays a single src-keyed join instead of two
    val outdeg = e0.groupBy("src_id").agg(count(lit(1)).as("outdeg"))
    val e = graft.core.CacheRegistry.persistTracked(e0.join(outdeg, Seq("src_id")))
    var pr = nodes.select(col("id"),
      round(lit(1.0 / n) + lit(1e-9), 6).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(pr.withColumnRenamed("id", "src_id"), Seq("src_id"))
        .select(col("dst_id").as("id"), (col("pr") / col("outdeg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("m"))
      pr = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          round(lit((1.0 - damping) / n)
            + lit(damping) * coalesce(col("m"), lit(0.0)) + lit(1e-9), 6)
            .as("pr"))
    }
    // Cut the final ranks (one small row per node) from their lineage,
    // THEN drop the per-call caches — a long-lived session running many
    // rankings must not accrete cached frames per call. The cut is what
    // makes the release safe: unpersisting an upstream cache
    // cascade-invalidates dependent cached plans, so a merely-persisted
    // result would silently recompute the whole iteration chain uncached
    // at its next action.
    val out = checkpoint.cut(pr)
    graft.core.CacheRegistry.release(e)
    graft.core.CacheRegistry.release(nodes)
    graft.core.CacheRegistry.release(e0)
    out
  }

  /**
   * Deterministic synchronous label propagation (Raghavan et al. 2007,
   * "Near linear time algorithm to detect community structures"):
   * community detection over a similarity graph — the coarser,
   * density-driven complement to [[graft.ext.Dedup.connectedComponents]]
   * (components merge through ANY edge; LPA communities form around
   * densely-linked cores, e.g. topic clusters in a kNN graph).
   * Labels start as node ids; each round every node takes the most
   * frequent label among its UNDIRECTED neighbors, smallest label on
   * ties — integer counts and id tiebreaks end to end, so the
   * trajectory is bit-reproducible on any engine with no fp
   * stabilization needed (the property that lets an unrolled SQL oracle
   * replay it). Synchronous updates on a fixed round budget: the
   * classic bipartite oscillation is deterministic too, not a
   * divergence.
   *
   * Scale shape per round: one edge-list shuffle keyed by src (label
   * pickup), one (node, label) hash aggregation with map-side combine,
   * and one per-node max(struct) — edges move, never an adjacency
   * matrix; label state is one row per node. iters × O(|E|), the
   * Pregel shape, declaratively.
   *
   * @param checkpoint where the final labels' lineage cut lives —
   *                   Local (default) or Reliable(dir) on a cluster
   * @return (id, label) after `iters` rounds — nodes sharing a label
   *         are one community
   */
  def labelPropagation(edges: DataFrame, iters: Int,
                       checkpoint: graft.core.CheckpointStrategy =
                         graft.core.CheckpointStrategy.Local): DataFrame = {
    // cache the raw edge list first (same rationale as pageRank: the
    // caller's edge derivation is the expensive part and feeds both
    // union arms of the symmetrization)
    val e0 = graft.core.CacheRegistry.persistTracked(
      edges.select(col("src_id"), col("dst_id")))
    val sym = graft.core.CacheRegistry.persistTracked(
      e0.unionByName(e0.select(col("dst_id").as("src_id"),
        col("src_id").as("dst_id"))).distinct())
    val nodes = graft.core.CacheRegistry.persistTracked(
      sym.select(col("src_id").as("id")).distinct())
    var lab = nodes.select(col("id"), col("id").as("label"))
    for (_ <- 1 to iters) {
      val neigh = sym
        .join(lab.withColumnRenamed("id", "src_id"), Seq("src_id"))
        .groupBy(col("dst_id").as("id"), col("label"))
        .agg(count(lit(1)).as("c"))
      // smallest-label-on-ties WITHOUT negating the label column: node
      // ids (= labels) may be strings/UUIDs, where arithmetic negation
      // NULL-casts silently (non-ANSI) or throws (ANSI). min_by over
      // (-c, label) keeps the label in its own type: smallest -c is the
      // max count, lexicographic/numeric-ascending label breaks ties.
      val best = neigh.groupBy("id")
        .agg(min_by(col("label"),
          struct((-col("c")).as("nc"), col("label"))).as("label"))
      lab = nodes.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id")).as("label"))
    }
    // lineage-cut then release, same rationale as pageRank's tail: the
    // cut keeps the upstream unpersists from cascade-invalidating the
    // result, the releases keep a long-lived session from accreting two
    // cached frames per call
    val out = checkpoint.cut(lab)
    graft.core.CacheRegistry.release(nodes)
    graft.core.CacheRegistry.release(sym)
    graft.core.CacheRegistry.release(e0)
    out
  }

  /**
   * k-core peeling over the undirected view of the edge list: nodes
   * with fewer than k neighbors are removed, degrees recomputed, and
   * the peel repeated `iters` rounds — the density filter that isolates
   * the stable cohesive core of a similarity graph (dense topic/near-dup
   * cores survive; chains, pendants, and sparse bridges peel away).
   * A fixed round budget approximates the fixpoint FROM ABOVE (every
   * survivor set is a superset of the true k-core, shrinking each
   * round); convergence needs at most |V| rounds and in practice a
   * handful — raise `iters` until the survivor count stops moving
   * (deterministic either way, so the budget is replayable).
   *
   * Scale shape per round: two semi-joins of the symmetrized edge list
   * against the alive set (both endpoint gates) + one src-keyed hash
   * aggregation — edges move, never a matrix; alive-set state is one
   * row per node. iters × O(|E|), the [[pageRank]]/[[labelPropagation]]
   * Pregel shape. Ids stay generic (no arithmetic on the id column).
   *
   * Each round's alive set is lineage-CUT (`checkpoint.cut`): `degrees`
   * consumes it twice (both endpoint semi-joins), so an uncut loop
   * doubles the logical plan every round — plan ANALYSIS becomes the
   * exponential cost long before any data moves (the
   * [[graft.ext.Dedup.connectedComponents]] failure mode). The cut also
   * makes each round's survivor count a free byproduct, and because the
   * peel is monotone (alive_{t+1} ⊆ alive_t — `degrees` only emits ids
   * from its input), an unchanged count IS the fixpoint: remaining
   * rounds are skipped with bit-identical output, so "raise iters until
   * it stops moving" costs only the rounds that still peel.
   *
   * @return survivors after `iters` rounds: (id, core_deg) with the
   *         node's degree INSIDE the surviving subgraph
   */
  def kCore(edges: DataFrame, k: Int, iters: Int,
            checkpoint: graft.core.CheckpointStrategy =
              graft.core.CheckpointStrategy.Local): DataFrame = {
    require(k >= 1 && iters >= 1, "need k >= 1 and iters >= 1")
    val e0 = graft.core.CacheRegistry.persistTracked(
      edges.filter(col("src_id") =!= col("dst_id"))
        .select(least(col("src_id"), col("dst_id")).as("a"),
          greatest(col("src_id"), col("dst_id")).as("b"))
        .distinct())
    val sym = graft.core.CacheRegistry.persistTracked(
      e0.select(col("a").as("s"), col("b").as("d"))
        .unionByName(e0.select(col("b").as("s"), col("a").as("d"))))
    var alive = checkpoint.cut(sym.select(col("s").as("id")).distinct())
    var aliveN = alive.count()
    def degrees(a: DataFrame): DataFrame = sym
      .join(a.withColumnRenamed("id", "s"), Seq("s"), "left_semi")
      .join(a.withColumnRenamed("id", "d"), Seq("d"), "left_semi")
      .groupBy(col("s").as("id")).agg(count(lit(1)).as("core_deg"))
    var converged = false
    for (_ <- 1 to iters if !converged) {
      val next = checkpoint.cut(
        degrees(alive).filter(col("core_deg") >= k).select("id"))
      val n = next.count()
      // monotone shrink ⇒ equal counts ⇒ equal sets ⇒ every later
      // round reproduces this one — stopping here changes nothing
      converged = n == aliveN
      alive = next
      aliveN = n
    }
    // survivors with their degree in the FINAL subgraph; a survivor
    // whose last neighbors peeled in the final round reports 0
    val out = checkpoint.cut(
      alive.join(degrees(alive), Seq("id"), "left")
        .select(col("id"), coalesce(col("core_deg"), lit(0L)).as("core_deg")))
    graft.core.CacheRegistry.release(sym)
    graft.core.CacheRegistry.release(e0)
    out
  }

  /**
   * Per-node triangle counts and local clustering coefficient over an
   * undirected view of the edge list — the density diagnostic for a
   * similarity graph: high-LCC nodes sit in tight near-duplicate or
   * topic cliques, LCC≈0 hubs are the "connects everything, belongs to
   * nothing" rows that distort [[labelPropagation]] communities.
   *
   * Algorithm: degree-ordered orientation (Suri & Vassilvitskii,
   * WWW'11 "Counting triangles and the curse of the last reducer") —
   * each undirected edge is directed from its lower-(degree, id)
   * endpoint to the higher, making the graph a DAG where every
   * triangle is counted exactly once as wedge (u→v, u→w) + closing
   * edge (v→w).
   *
   * Scale shape: the orientation is THE scale lever — a degree-D hub
   * generates O(D²) wedges undirected, but oriented its out-degree is
   * bounded by O(√|E|) (arboricity), so the heaviest reducer holds
   * O(|E|) wedges total instead of the hub's square. Two shuffles (the
   * wedge self-join keyed by u, the closing join keyed by (v, w)) plus
   * one map-side-combined hash aggregation; edges move, never an
   * adjacency matrix. Self-loops dropped, duplicate/reverse edges
   * collapse in the canonicalization.
   *
   * Ids may be any orderable type (the (degree, id) key compares as a
   * struct — no numeric coercion, the [[labelPropagation]] contract).
   *
   * @return (id, deg, tri, lcc): undirected degree, triangles through
   *         the node, and lcc = 2·tri / (deg·(deg−1)) rounded to 6
   *         digits (0.0 when deg < 2)
   */
  def triangleStats(edges: DataFrame,
                    checkpoint: graft.core.CheckpointStrategy =
                      graft.core.CheckpointStrategy.Local): DataFrame = {
    // canonical undirected edges: (a, b) with a < b, loops dropped —
    // cached because it feeds the degree table AND the orientation
    val canon = graft.core.CacheRegistry.persistTracked(
      edges.filter(col("src_id") =!= col("dst_id"))
        .select(least(col("src_id"), col("dst_id")).as("a"),
          greatest(col("src_id"), col("dst_id")).as("b"))
        .distinct())
    val deg = graft.core.CacheRegistry.persistTracked(
      canon.select(col("a").as("id"))
        .unionByName(canon.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg")))
    // orient low-(deg, id) → high; keep the head's key for the wedge
    // ordering so the self-join needs no further degree lookups
    val aKey = struct(col("da"), col("a"))
    val bKey = struct(col("db"), col("b"))
    val o = graft.core.CacheRegistry.persistTracked(
      canon
        .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
        .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
        .select(
          when(aKey < bKey, col("a")).otherwise(col("b")).as("u"),
          when(aKey < bKey, col("b")).otherwise(col("a")).as("v"),
          when(aKey < bKey, col("db")).otherwise(col("da")).as("dv")))
    // wedges (u→v, u→w) with key(v) < key(w), closed by oriented (v→w)
    val wedges = o.as("e1").join(o.as("e2"),
        col("e1.u") === col("e2.u") &&
          struct(col("e1.dv"), col("e1.v")) < struct(col("e2.dv"), col("e2.v")))
      .select(col("e1.u").as("tu"), col("e1.v").as("tv"), col("e2.v").as("tw"))
    val tris = wedges.join(
      o.select(col("u").as("tv"), col("v").as("tw")), Seq("tv", "tw"))
    val perNode = tris
      .select(explode(array(col("tu"), col("tv"), col("tw"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("tri"))
    val out = checkpoint.cut(
      deg.join(perNode, Seq("id"), "left")
        .select(col("id"), col("deg"),
          coalesce(col("tri"), lit(0L)).as("tri"),
          when(col("deg") >= 2,
            round(lit(2.0) * coalesce(col("tri"), lit(0L)).cast("double")
              / (col("deg") * (col("deg") - lit(1))).cast("double")
              + lit(1e-9), 6))
            .otherwise(lit(0.0)).as("lcc")))
    graft.core.CacheRegistry.release(o)
    graft.core.CacheRegistry.release(deg)
    graft.core.CacheRegistry.release(canon)
    out
  }
}
