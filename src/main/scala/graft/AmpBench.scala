package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Measured scale point BEYOND the sf0.1 fixtures (r12 verdict task 3):
 * materializes a ×`mult` amplified copy of the FACT tables (lineitem,
 * orders, events, documents — sf0.1 × 10 = sf1-equivalent, ~6 M
 * lineitem rows) to a scratch dir, leaving the read-only fixtures
 * untouched and the DIMENSION tables symlinked unamplified (dims grow
 * slower than facts in any real warehouse), then times the core query
 * family plus the adjudicated expensive tail on the amplified data.
 * The same amplified parquet is timed in DuckDB via
 * tools/duckdb_bench.py, so the constant-amortization trend table in
 * SCALE.md gets a measured sf1 column instead of an extrapolation —
 * and any superlinear term shows up here before production.
 *
 * Amplification preserves join/key structure with DERIVED strides (the
 * ScaleProbe rule — a literal stride silently collides once the
 * fixture grows): copy c shifts o_orderkey/l_orderkey by c×(max
 * orderkey + 1) so orders↔lineitem join fanout is exactly preserved;
 * events shift event_id AND user_id (distinct users scale with the
 * data, so rank/concentration paths see ×mult input, not ×mult
 * duplicates of fixed keys); documents shift doc_id and tag-prefix
 * every token (a bijection on the token alphabet — within-copy shingle
 * structure mirrors the original exactly, cross-copy Jaccard is 0, so
 * candidate counts in the prefix join scale linearly, not
 * quadratically, matching a real corpus-growth pattern).
 *
 *   # write the amplified dir (once)
 *   sbt "runMain graft.AmpBench write /root/testdata/sf0.1 /dev/shm/graft_sf1 10"
 *   # timed pass (repeat; merge minima externally)
 *   sbt "runMain graft.AmpBench bench /dev/shm/graft_sf1"
 */
object AmpBench {

  /** Fact tables amplified; everything else symlinked. Embeddings
    * joined the amplified set in r14 (verdict task 8 — the similarity
    * family previously had no scale point at all). */
  private val Amplified =
    Seq("lineitem", "orders", "events", "documents", "embeddings")
  private val Linked =
    Seq("region", "nation", "customer", "supplier", "part")

  /** The adjudicated expensive tail measured alongside the core family
    * (r12 verdict: the queries whose vs-DuckDB ratios were individually
    * adjudicated and should be re-checked at a real scale point). */
  private val Tail = Set("a25_heavy_hitters", "j8_bucketed_join",
    "ext_jaccard_prefix_join", "dq_gini_concentration")

  /** The heaviest ext COMPUTE rows (r13 verdict task 1): the LSH/
    * near-dup, connected-components, decontamination, IVF-PQ, BM25 and
    * graph surfaces — the LLM-pipeline operators whose scale behavior
    * is the engine's reason to exist. Persisted-index write rows stay
    * out (their wall prices table writes, the named-exclusion class);
    * the DuckDB-lower-bound rows stay IN on the Spark side — at ×10
    * their oracle timeouts simply remain lower bounds. */
  private val ExtAmp = Set(
    "ext_dedup_exact", "ext_dedup_near_minhash", "ext_dedup_keep_best",
    "ext_dedup_components_reliable", "ext_dedup_incremental_near",
    "ext_dedup_span_cut", "ext_dedup_substring", "ext_edit_join",
    "ext_decontaminate", "ext_decontaminate_semantic",
    "ext_cross_dup_ngrams", "ext_jaccard_pairs",
    "ext_sim_ivf_pq", "ext_adv_sim_topk", "ext_knn_graph_approx",
    "ext_bm25_topk", "ext_bm25_prf", "ext_rrf_hybrid",
    "ext_hybrid_weighted", "ext_graph_kcore", "ext_graph_triangles",
    "ext_lpa_knn", "ext_pagerank_knn", "ext_er_score",
    "ext_curation_full", "ext_gopher_rules", "ext_mm_neardup",
    "ext_mm_pixel_dedup", "ext_winnow_pairs")

  /** Streaming rows whose OUTPUT carries the state-store trajectory —
    * the two watermark-eviction scale-killers. Driven by [[st]] along
    * with an instrumented session-window drain. */
  private val StAmp = Seq("st_state_eviction", "st_join_state_eviction")

  private def famOf(n: String): String = n.split("_")(0) match {
    case f @ ("tpch" | "pl" | "st" | "ext" | "dq") => f
    case _ => "core"
  }

  /** Core + tpch families + the adjudicated tail + the heavy ext
    * compute set — derived from the registry so it can't drift. tpch
    * rides along because it is the most externally comparable SQL
    * family; the ext set is the r13-task-1 widening. */
  def benchNames: Seq[String] =
    SparkEntry.queries.keys.toSeq
      .filter(n => famOf(n) == "core" || famOf(n) == "tpch" || Tail(n) ||
        ExtAmp(n))
      .sorted

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: AmpBench write <src> <out> [mult] | bench <dir> | st <dir> | ann <dir>")
    args(0) match {
      case "write" =>
        val (src, out) = (args(1), args(2))
        val mult = if (args.length > 3) args(3).toInt else 10
        write(src, out, mult)
      case "bench" => bench(args(1))
      case "st" => st(args(1))
      case "ann" => ann(args(1))
      case "graphs" => graphs(args(1))
      case other => sys.error(s"unknown mode $other")
    }
  }

  /**
   * The graph family's documented scale path, MEASURED (r14): the four
   * registered graph rows (kcore / lpa / pagerank / triangles) feed
   * from the EXACT all-pairs knn graph — O(n²) by construction, and
   * the ×10 bench shows exactly that (65–83× slopes at ×10 vectors).
   * The knnGraph scaladoc names the corpus-scale path: LSH-bucketed
   * candidate generation ([[graft.ext.Similarity.knnGraphApprox]]),
   * exact scoring within buckets. This mode runs the SAME graph ops on
   * the approx feeder at ×10 and reports wall + feeder edge recall vs
   * the exact graph — the demonstration that the quadratic term lives
   * in the feeder choice, not the graph operators (which are linear in
   * edges per iteration). Persists bench_results/amp_r{N}_graphs.json.
   */
  private def graphs(dir: String): Unit = {
    import graft.ext.{Graphs, Similarity}
    val spark = graft.core.GraftSession.local(32, "graft-amp-graphs")
    spark.sparkContext.setLogLevel("WARN")
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    vecs.persist(); val n = vecs.count()
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def approxEdges(k: Int) = Similarity.knnGraphApprox(
      vecs, "vec_id", "embedding", k = k, bits = 8, tables = 8,
      multiprobeHamming = 1).select("src_id", "dst_id")
    // feeder edge recall on a bounded probe subset (exact top-3 for 50
    // sources via the fused operator — cheap; the FULL exact graph is
    // the 400 M-pair scan this mode exists to avoid)
    val probeIds = vecs.orderBy(col("vec_id")).limit(50)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val exact50 = Similarity.bruteForceTopKFused(vecs, "vec_id", "embedding",
        probeIds, "probe_id", "probe_vec", k = 4)
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("probe_id"))
          .orderBy(desc("score"), col("vec_id"))))
      .filter(col("__rn") <= 3)
      .select(col("probe_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (ae, aeSec) = timed {
      // lineage CUT, not a registry persist: each graph op below caches
      // and releases its own edge frame, and a registry release of an
      // equal plan would evict this one too — the downstream ops would
      // then silently recompute the 60 s feeder and time as feeder+op
      // (the r11 cascade-invalidation lesson, re-learned here: the
      // first pass measured pagerank at 60 s for a 60 k-edge graph)
      val e = graft.core.CheckpointStrategy.Local.cut(approxEdges(3))
      e.count(); e
    }
    val approx50 = ae.join(
        probeIds.select(col("probe_id").as("src_id")), Seq("src_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val edgeRecall = (exact50 & approx50).size.toDouble /
      math.max(1, exact50.size)
    val (_, kcSec) = timed(Graphs.kCore(ae, k = 5, iters = 2).count())
    val (_, lpaSec) = timed(Graphs.labelPropagation(ae, iters = 2).count())
    val (_, prSec) = timed(Graphs.pageRank(ae, iters = 2).count())
    val (_, triSec) = timed(Graphs.triangleStats(ae).count())
    val line = f"""{"n_vectors":$n,"feeder":"knnGraphApprox(k=3,bits=8,tables=8,multiprobe=1)",""" +
      f""""feeder_wall_sec":$aeSec%.3f,"feeder_edge_recall_at3":$edgeRecall%.4f,""" +
      f""""kcore_sec":$kcSec%.3f,"lpa_sec":$lpaSec%.3f,""" +
      f""""pagerank_sec":$prSec%.3f,"triangles_sec":$triSec%.3f,""" +
      f""""dir":"$dir"}"""
    try {
      val repo = new java.io.File(sys.props.getOrElse("user.dir", "."))
      val outDir = new java.io.File(repo, "bench_results")
      outDir.mkdirs()
      val f = new java.io.File(outDir, f"amp_r${roundNo(repo)}%02d_graphs.json")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.println(line) finally w.close()
      System.err.println(s"[amp-graphs] wrote ${f.getPath}")
    } catch { case e: Throwable =>
      System.err.println(s"amp graphs artifact write failed: $e") }
    try spark.stop() catch { case _: Throwable => () }
    println(line)
    System.out.flush()
  }

  private def write(src: String, out: String, mult: Int): Unit = {
    val spark = graft.core.GraftSession.local(32, "graft-amp-write")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(out).mkdirs()

    def stride(df: DataFrame, c: String): Long =
      df.agg(max(col(c)).cast("long")).head().getLong(0) + 1L

    val orders = spark.read.parquet(s"$src/orders.parquet")
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    // one stride for BOTH sides of the orderkey join, derived from the
    // union's max so no copy of either table can collide
    val okStride = math.max(stride(orders, "o_orderkey"), stride(li, "l_orderkey"))
    def amp(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until mult).map(c => shift(df, c)).reduce(_ unionByName _)

    amp(orders) { (df, c) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(c * okStride))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")

    amp(li) { (df, c) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(c * okStride))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    val ev = spark.read.parquet(s"$src/events.parquet")
    val (evS, userS) = (stride(ev, "event_id"), stride(ev, "user_id"))
    amp(ev) { (df, c) =>
      df.withColumn("event_id", col("event_id") + lit(c * evS))
        .withColumn("user_id", col("user_id") + lit(c * userS))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docS = stride(docs, "doc_id")
    amp(docs) { (df, c) =>
      if (c == 0) df
      else df.withColumn("doc_id", col("doc_id") + lit(c * docS))
        .withColumn("text",
          regexp_replace(col("text"), "(\\S+)", s"z${c}q$$1"))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    // embeddings (r14): copy c applies a DERIVED id stride plus a
    // deterministic ORTHOGONAL transform — a coordinate rotation by
    // (17·c mod 64) composed with per-coordinate sign flips — so every
    // copy's within-copy dot products (hence its ANN neighbor
    // structure) mirror the original EXACTLY while cross-copy cosines
    // are scrambled: candidate sets grow linearly with the corpus, the
    // real corpus-growth pattern, never ×mult duplicates of fixed
    // vectors (which would make every bucket mult× denser and every
    // top-k degenerate with ties).
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val vecS = stride(emb, "vec_id")
    amp(emb) { (df, c) =>
      if (c == 0) df
      else {
        val rot = (17 * c) % 64
        df.withColumn("vec_id", col("vec_id") + lit(c * vecS))
          .withColumn("embedding",
            transform(sequence(lit(0), lit(63)), i =>
              (element_at(col("embedding"),
                  pmod(i + lit(rot), lit(64)) + 1) *
                when(pmod(i * lit(c % 7 + 2) + lit(c), lit(2)) === 0,
                  lit(1.0)).otherwise(lit(-1.0))).cast("float")))
      }
    }.repartition(8).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    for (t <- Linked) {
      val link = java.nio.file.Paths.get(out, s"$t.parquet")
      java.nio.file.Files.deleteIfExists(link)
      java.nio.file.Files.createSymbolicLink(link,
        java.nio.file.Paths.get(src, s"$t.parquet"))
    }
    println(s"[amp] wrote x$mult fact tables to $out " +
      s"(${Amplified.mkString(", ")}); linked ${Linked.mkString(", ")}")
    spark.stop()
  }

  private def bench(dir: String): Unit = {
    val spark = graft.core.GraftSession.local(32, "graft-amp-bench")
    spark.sparkContext.setLogLevel("WARN")
    // same single-thread host fingerprint as Bench, so amp timings can
    // be host-normalized against the round floors they sit beside
    val calibSec = {
      var x = 0L; var i = 0L
      val t0 = System.nanoTime()
      while (i < 400000000L) { x += i * 31 + (x >> 3); i += 1 }
      val s = (System.nanoTime() - t0) / 1e9
      if (x == 42) println("")
      s
    }
    try { // same warm-up as Bench: classload/codegen paid outside timings
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      li.filter(col("l_quantity") > 0)
        .groupBy("l_returnflag").agg(count(lit(1))).count()
    } catch { case _: Throwable => () }
    spark.catalog.clearCache()
    var errors = List.empty[String]
    val results = benchNames.map { name =>
      val t0 = System.nanoTime()
      val ok = try { SparkEntry.queries(name)(spark, dir).count(); true }
               catch { case e: Throwable =>
                 errors ::= s"$name: ${e.getClass.getSimpleName}"; false }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.err.println(f"[amp] $name $sec%.3f ${if (ok) "" else "ERROR"}")
      (name, sec, ok)
    }
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) f"$v%.3f" else "\"ERROR\"")
    }.mkString("{", ",", "}")
    val errStr = errors.map(e => "\"" + e.replace("\"", "'") + "\"")
      .mkString("[", ",", "]")
    // durable artifact (r13 verdict task 5): min-merge this run into
    // bench_results/amp_r{N}_spark.json — the same floor semantics and
    // fcntl lock as the round floors, so the next round can diff amp
    // passes the way floor_diff.py diffs floors instead of fishing raw
    // runs out of /tmp.
    try persistAmp("spark",
      results.collect { case (k, v, true) => k -> v }.toMap, calibSec, dir)
    catch { case e: Throwable =>
      System.err.println(s"amp artifact write failed: $e") }
    try spark.sparkContext.setLogLevel("OFF") catch { case _: Throwable => () }
    try spark.stop() catch { case _: Throwable => () }
    println(s"""{"queries":$qs,"n":${results.size},"errors":$errStr,""" +
      f""""calib_sec":$calibSec%.3f,"dir":"$dir"}""")
    System.out.flush()
  }

  /** The current round number, derived exactly like Bench: one past the
    * highest BENCH_r{N}.json the driver has written. */
  private def roundNo(repo: java.io.File): Int = {
    val roundRe = "BENCH_r(\\d+)\\.json".r
    Option(repo.listFiles()).toSeq.flatten.map(_.getName)
      .collect { case roundRe(n) => n.toInt }.foldLeft(0)(math.max) + 1
  }

  /** Min-merge a (queries → sec) map into
    * `bench_results/amp_r{N}_{side}.json`, bumping per-query run depth —
    * Bench's floor file shape, parsed by Bench.readFloors, written
    * under the shared fcntl lock. */
  private def persistAmp(side: String, timed: Map[String, Double],
                         calibSec: Double, dir: String): Unit = {
    val repo = new java.io.File(sys.props.getOrElse("user.dir", "."))
    val outDir = new java.io.File(repo, "bench_results")
    outDir.mkdirs()
    val f = new java.io.File(outDir, f"amp_r${roundNo(repo)}%02d_$side.json")
    Bench.withBenchLock(outDir) {
      val prior = Bench.readFloors(f)
      val priorQ = prior.queries.filter(_._2 > 0)
      val mergedQ = (priorQ.keySet ++ timed.keySet).toSeq.sorted.map { k =>
        (k, (priorQ.get(k).toSeq ++ timed.get(k).toSeq).min)
      }
      val runs = mergedQ.map { case (k, _) =>
        k -> (prior.runs.getOrElse(k, 0) + (if (timed.contains(k)) 1 else 0))
      }.toMap
      val calibMin = math.min(calibSec, prior.calibMin.getOrElse(calibSec))
      val qj = mergedQ.map { case (k, v) => f""""$k":$v%.3f""" }
        .mkString("{", ",", "}")
      val rj = mergedQ.map { case (k, _) => s""""$k":${runs(k)}""" }
        .mkString("{", ",", "}")
      val body = s"""{"queries":$qj,"runs":$rj,"n_queries":${mergedQ.size},""" +
        s""""merged_runs":${prior.mergedRuns + 1},""" +
        f""""calib_min_sec":$calibMin%.3f,"dir":"$dir"}"""
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.println(body) finally w.close()
    }
    System.err.println(s"[amp] merged into ${f.getPath}")
  }

  /**
   * Streaming state at ×10 event volume (r13 verdict task 1): drives
   * the two eviction queries — whose OUTPUT is the engine's own
   * per-trigger state-store trajectory — over the amplified dir, plus
   * an instrumented session-window drain whose per-trigger
   * stateOperators metrics are captured here directly. Emits one JSON
   * line and persists it as bench_results/amp_r{N}_st.json. The claim
   * under test: state tracks OPEN windows/sessions (watermark-bounded),
   * not cumulative input — the classic 100× streaming killer.
   */
  private def st(dir: String): Unit = {
    val spark = graft.core.GraftSession.local(32, "graft-amp-st")
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    // (a) the two eviction rows: run the REGISTERED queries — their
    // output columns are the state trajectory the oracle replays at
    // sf0.1; here the interest is the numbers at ×10.
    for (name <- StAmp) {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val cols = rows.headOption.map(_.schema.fieldNames.mkString(","))
        .getOrElse("")
      val rj = rows.map(r => r.toSeq.map {
        case b: Boolean => b.toString
        case x => x.toString
      }.mkString("[", ",", "]")).mkString("[", ",", "]")
      sb.append(s""""$name":{"wall_sec":${f"$sec%.3f"},"cols":"$cols","rows":$rj},""")
      System.err.println(f"[amp-st] $name $sec%.3f s, ${rows.length} triggers")
    }
    // (b) session-window state: stage the amplified events into 4
    // id-range chunk files (ascending mtimes pin trigger order), drain
    // sessionWindowStats one file per trigger, and read the state-store
    // rows off the engine's own progress metrics.
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val mx = ev.agg(max(col("event_id"))).head().getLong(0)
    val step = mx / 4 + 1
    val stage = java.nio.file.Files.createTempDirectory("graft_amp_sess").toString
    (0 until 4).foreach { i =>
      ev.filter(col("event_id") >= i * step && col("event_id") < (i + 1) * step)
        .coalesce(1).write.mode("append").parquet(stage)
      Thread.sleep(1100) // distinct mtimes → deterministic file order
    }
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val t0 = System.nanoTime()
    val q = graft.streaming.EventStream.sessionWindowStats(
        graft.streaming.EventStream.readEvents(spark, stage,
          globFilter = "*.parquet", maxFilesPerTrigger = 1))
      .writeStream.format("memory").queryName("graft_amp_sess")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val sec = (System.nanoTime() - t0) / 1e9
    val prog = q.recentProgress.toSeq
      .filter(p => p.numInputRows > 0 && p.stateOperators.nonEmpty)
      .map(p => (p.batchId, p.numInputRows,
        p.stateOperators.head.numRowsTotal,
        p.stateOperators.head.numRowsRemoved))
    val nUsers = ev.select("user_id").distinct().count()
    val total = ev.count()
    val pj = prog.map { case (b, n, s2, r) => s"[$b,$n,$s2,$r]" }
      .mkString("[", ",", "]")
    sb.append(s""""st_session_state":{"wall_sec":${f"$sec%.3f"},""" +
      s""""cols":"batch_id,n_input,state_rows,rows_removed","rows":$pj,""" +
      s""""n_users":$nUsers,"n_events":$total}""")
    val line = s"{${sb.toString}}"
    try {
      val repo = new java.io.File(sys.props.getOrElse("user.dir", "."))
      val outDir = new java.io.File(repo, "bench_results")
      outDir.mkdirs()
      val f = new java.io.File(outDir, f"amp_r${roundNo(repo)}%02d_st.json")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.println(line) finally w.close()
      System.err.println(s"[amp-st] wrote ${f.getPath}")
    } catch { case e: Throwable =>
      System.err.println(s"amp st artifact write failed: $e") }
    try spark.stop() catch { case _: Throwable => () }
    println(line)
    System.out.flush()
  }

  /**
   * ANN at ×10 vectors (r13 verdict task 8): ground truth = the fused
   * brute-force cosine top-k (CosineTopKExec — probe broadcast, no
   * Exchange); measured against it: multi-table sign-LSH with
   * hamming-1 multiprobe, IVF, and IVF-PQ with exact re-rank at the
   * recommended rerankFrom = 4k. Reports recall@k and wall per method,
   * persists bench_results/amp_r{N}_ann.json. The structural claims
   * under test at ×10: probe-side broadcast holds (no all-pairs
   * fallback at any width) and bucket/cell fanout keeps candidate
   * counts sublinear in the corpus.
   */
  private def ann(dir: String): Unit = {
    import graft.ext.Similarity
    val spark = graft.core.GraftSession.local(32, "graft-amp-ann")
    spark.sparkContext.setLogLevel("WARN")
    val k = 10
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    vecs.persist(); val n = vecs.count()
    // 20 probes spread across copies: every copy's neighbor structure
    // is exercised, not just copy 0's
    val probes = vecs.withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))))
      .filter(col("__rn") % (n / 20).toInt === 1).limit(20)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    probes.persist(); probes.count()
    def topkSet(df: org.apache.spark.sql.DataFrame,
                pid: String, vid: String): Map[Long, Set[Long]] =
      df.select(col(pid).cast("long"), col(vid).cast("long"))
        .collect().groupBy(_.getLong(0))
        .map { case (p, rs) => p -> rs.map(_.getLong(1)).toSet }
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (truth, truthSec) = timed(topkSet(
      Similarity.bruteForceTopKFused(vecs, "vec_id", "embedding",
        probes, "probe_id", "probe_vec", k), "probe_id", "vec_id"))
    def recallOf(m: Map[Long, Set[Long]]): Double = {
      val hits = truth.map { case (p, t) =>
        (m.getOrElse(p, Set.empty) & t).size }.sum
      hits.toDouble / (truth.size * k)
    }
    val (lsh, lshSec) = timed(topkSet(
      Similarity.annTopKMultiTable(vecs, "vec_id", "embedding",
        probes, "probe_id", "probe_vec", k, bits = 4, tables = 8,
        multiprobeHamming = 1), "probe_id", "vec_id"))
    val (ivf, ivfSec) = timed(topkSet(
      Similarity.ivfTopK(vecs, "vec_id", "embedding",
        probes, "probe_id", "probe_vec", k, nlist = 64, nprobe = 8),
      "probe_id", "vec_id"))
    // PQ codebooks train on the bounded id-ordered copy-0 sample
    // (standard practice: training cost independent of corpus size) at
    // the production codebook size k=256 (the ScaleProbe ivfpq256
    // operating point — 8 bits per subspace)
    val trainN = math.max(500L, n / 10)
    val (books, trainSec) = timed(Similarity.pqTrain(
      vecs.filter(col("vec_id") < trainN), "vec_id", "embedding",
      dim = 64, m = 4, k = 256, iters = 3))
    val (ivfpq, ivfpqSec) = timed(topkSet(
      Similarity.ivfPqTopK(vecs, "vec_id", "embedding",
        probes, "probe_id", "probe_vec", books, k,
        nlist = 64, nprobe = 8, rerankFrom = 4 * k),
      "probe_id", "vec_id"))
    // a second operating point: double the cell coverage and the
    // re-rank window — the knob a production deployment turns when the
    // corpus geometry is adversarial (uniform sphere: cluster-pruning
    // recall is bounded by cell coverage, unlike the margin-driven LSH)
    val (ivfpq2, ivfpq2Sec) = timed(topkSet(
      Similarity.ivfPqTopK(vecs, "vec_id", "embedding",
        probes, "probe_id", "probe_vec", books, k,
        nlist = 64, nprobe = 16, rerankFrom = 8 * k),
      "probe_id", "vec_id"))
    val line =
      f"""{"n_vectors":$n,"k":$k,"n_probes":${truth.size},""" +
      f""""brute_force":{"wall_sec":$truthSec%.3f,"recall":1.0},""" +
      f""""lsh_multitable":{"wall_sec":$lshSec%.3f,"recall":${recallOf(lsh)}%.4f},""" +
      f""""ivf":{"wall_sec":$ivfSec%.3f,"recall":${recallOf(ivf)}%.4f,"coverage":0.125},""" +
      f""""ivf_pq_rerank":{"wall_sec":$ivfpqSec%.3f,"recall":${recallOf(ivfpq)}%.4f,"train_sec":$trainSec%.3f,"coverage":0.125},""" +
      f""""ivf_pq_rerank_wide":{"wall_sec":$ivfpq2Sec%.3f,"recall":${recallOf(ivfpq2)}%.4f,"coverage":0.25},""" +
      f""""dir":"$dir"}"""
    try {
      val repo = new java.io.File(sys.props.getOrElse("user.dir", "."))
      val outDir = new java.io.File(repo, "bench_results")
      outDir.mkdirs()
      val f = new java.io.File(outDir, f"amp_r${roundNo(repo)}%02d_ann.json")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.println(line) finally w.close()
      System.err.println(s"[amp-ann] wrote ${f.getPath}")
    } catch { case e: Throwable =>
      System.err.println(s"amp ann artifact write failed: $e") }
    try spark.stop() catch { case _: Throwable => () }
    println(line)
    System.out.flush()
  }
}
