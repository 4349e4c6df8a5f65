package graft

/**
 * Plan-shape audit main: prints, for each registered query matching the
 * optional name prefix, the physical-plan facts the 100 TB review cares
 * about — Exchange count, join strategies, cartesian products, and
 * whole-stage-codegen span count. Usage:
 *
 *   runMain graft.PlanAudit <sfDir> [namePrefix]
 *
 * Read-only: plans are built (and AQE left to re-plan at execution), no
 * query is executed — streaming drains and index-building queries DO
 * execute their build side when the plan is forced, so the audit runs
 * each query function but never collects results.
 *
 * Standing gate (r10): a FULL sweep (no prefix) also persists the
 * per-query plan facts to `bench_results/planaudit_r{N}.json` (N = the
 * round in progress, the Bench convention) and prints a one-line diff
 * against the latest prior round's file — plan regressions (new
 * cartesians, shuffle-count growth) diff mechanically instead of by
 * hand-rerun.
 */
object PlanAudit {

  private case class Facts(shuffles: Int, bex: Int, bhj: Int, smj: Int,
                           cart: Boolean, spw: Int)

  /**
   * Single-partition-window allow-list (r11 task 6): the audit counted
   * shuffles and cartesians but was blind to the WindowExec-over-
   * SinglePartition cliff — every row of the window's input flows
   * through ONE reducer (the dq_gini miss that motivated this gate).
   * A query may carry an unpartitioned window ONLY when its input frame
   * is provably bounded (dimension-, bin-, or top-k-sized) or the
   * unpartitioned ranking IS the reference semantics at mart
   * cardinality. Anything else fails the audit loudly.
   */
  private val spWindowAllowed: Map[String, String] = Map(
    // reference semantics: global ranking/lag over a MART-sized frame
    // (daily/yearly aggregates — thousands of rows by construction,
    // adjudicated in the r11 verdict's window audit)
    "w1_rank_global" -> "reference global RANK over the congestion mart",
    "w7_pct_change" -> "reference pct_change lag over the aggregated series",
    "w8_rolling_avg" -> "reference rolling mean over the daily series",
    "pl_lottr_daily_summary" -> "reference LOTTR rank over the daily mart",
    "pl_mart_daily_rankings" -> "reference dbt mart global rankings",
    // bounded frames: the window input is O(bins), O(sources), O(k) or
    // a TakeOrderedAndProject-limited result — never data-proportional.
    // The BM25/fuzzy/hybrid family all share dfDerivedQueries'
    // ≤(10+n·perQuery)-row rank (Retrieval.scala — the partitionBy(lit)
    // key is constant-folded away, so it reads as unpartitioned here).
    "t8_pareto_skyline" -> "global pass runs on the locally-pruned skyline frame",
    "dq_cusum_shift" -> "prefix sums over the pre-aggregated daily series",
    "dq_autocorr" -> "lag window over the pre-aggregated daily series",
    "dq_mann_whitney" -> "cumulative counts over the bin frame (O(bins))",
    "dq_adv_degenerate" -> "degenerate battery over the 25-row nation frame",
    "a33_kll_degenerate" -> "global-form sketch ranks over ≤k-pair frames (25-row nation)",
    "ext_bm25_topk" -> "df-derived query-set rank over a ≤22-row top-k",
    "ext_bm25_forget" -> "df-derived query-set rank over a ≤22-row top-k",
    "ext_bm25_persisted" -> "df-derived query-set rank over a ≤22-row top-k",
    "ext_bm25_prf" -> "df-derived query-set ranks over ≤22-row top-ks",
    "ext_fuzzy_bm25" -> "df-derived query-set rank over a ≤22-row top-k",
    "ext_fuzzy_terms" -> "df-derived query-set rank over a ≤22-row top-k",
    "ext_hybrid_weighted" -> "df-derived query-set rank over a ≤22-row top-k",
    "ext_rrf_hybrid" -> "df-derived query-set rank over a ≤22-row top-k",
    "ext_retrieval_metrics" -> "df-derived query-set ranks over ≤22-row top-ks",
    "st_bm25_ingest" -> "df-derived query-set rank over a ≤22-row top-k",
    "ext_collocations" -> "vocab rank over the ≤40-row top-df frame",
    "ext_ks_drift" -> "CDF prefix sums over the bin frame (O(bins))",
    "ext_classifier_calibration" -> "curve over the 10-bin calibration frame",
    "ext_temperature_mix" -> "water-filling prefix sums over the per-source frame",
    "ext_adv_temperature" -> "water-filling prefix sums over the per-source frame")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val prefix = if (args.length > 1) args(1) else ""
    val spark = graft.core.GraftSession.local(8, "graft-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    val facts = scala.collection.mutable.LinkedHashMap[String, Facts]()
    var errs = List.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith(prefix)).foreach { case (name, fn) =>
        try {
          val planObj = fn(spark, sfDir).queryExecution.executedPlan
          val p = planObj.toString
          // shuffle exchanges ONLY: "Exchange hashpartitioning/range-
          // partitioning/SinglePartition" — BroadcastExchange is a
          // different (cheap, dim-sized) animal and ReusedExchange is
          // free, counting either would overstate the shuffle inventory
          def occ(k: String): Int = {
            var i = p.indexOf(k); var c = 0
            while (i >= 0) { c += 1; i = p.indexOf(k, i + 1) }
            c
          }
          val f = Facts(
            Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
              "Exchange SinglePartition").map(occ).sum,
            p.linesIterator.count(_.contains("BroadcastExchange")),
            p.linesIterator.count(_.contains("BroadcastHashJoin")),
            p.linesIterator.count(_.contains("SortMergeJoin")),
            p.contains("CartesianProduct"),
            countSpWindows(planObj))
          facts(name) = f
          if (f.spw > 0 && !spWindowAllowed.contains(name))
            System.err.println(s"[planaudit] UNLISTED single-partition " +
              s"window in $name (spw=${f.spw}) — bounded-frame queries " +
              "go on spWindowAllowed with a justification; " +
              "data-proportional frames go through RowIndex.globalIndex")
          println(f"[planaudit] $name%-36s shuffles=${f.shuffles}%-3d " +
            f"broadcasts=${f.bex}%-3d bhj=${f.bhj}%-3d smj=${f.smj}%-3d " +
            f"cartesian=${f.cart}%-5s spw=${f.spw}")
        } catch { case e: Throwable =>
          errs ::= name
          println(s"[planaudit] $name ERROR ${e.getClass.getSimpleName}")
        }
        spark.catalog.clearCache()
      }
    if (prefix.isEmpty) persistAndDiff(facts.toSeq, errs.reverse)
    spark.stop()
    // The SP-window gate must fail the PROCESS, not just the artifact:
    // automation that keys on exit status (rather than parsing the
    // planaudit JSON) would otherwise sail past an unlisted
    // WindowExec-over-SinglePartition regression. Prefix-filtered runs
    // gate too — a local iteration that introduces one should fail at
    // the desk, not at the round gate.
    val unlisted = facts.collect {
      case (n, f) if f.spw > 0 && !spWindowAllowed.contains(n) => n }
    if (unlisted.nonEmpty) {
      System.err.println(s"[planaudit] exiting 1: unlisted " +
        s"single-partition windows in ${unlisted.mkString(", ")}")
      sys.exit(1)
    }
  }

  /** Count WindowExec/WindowGroupLimitExec nodes with an EMPTY partition
    * spec — the plan shape whose required child distribution is
    * AllTuples, i.e. one reducer sees the whole frame. Recurses into the
    * AQE wrapper (a leaf node to TreeNode traversal) via its initial
    * plan, which is the pre-execution shape the audit reads everywhere
    * else. */
  private def countSpWindows(
      plan: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    val self = plan match {
      case w: WindowExec if w.partitionSpec.isEmpty => 1
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => 1
      case _ => 0
    }
    val kids = plan match {
      case a: AdaptiveSparkPlanExec => Seq(a.initialPlan)
      case other => other.children
    }
    self + kids.map(countSpWindows).sum
  }

  private def persistAndDiff(facts: Seq[(String, Facts)],
                             errs: List[String]): Unit = try {
    val repo = new java.io.File(sys.props.getOrElse("user.dir", "."))
    val roundRe = "BENCH_r(\\d+)\\.json".r
    val round = Option(repo.listFiles()).toSeq.flatten.map(_.getName)
      .collect { case roundRe(n) => n.toInt }.foldLeft(0)(math.max) + 1
    val outDir = new java.io.File(repo, "bench_results")
    outDir.mkdirs()
    val qs = facts.map { case (n, f) =>
      s""""$n":{"sh":${f.shuffles},"bex":${f.bex},"bhj":${f.bhj},""" +
        s""""smj":${f.smj},"cart":${f.cart},"spw":${f.spw}}"""
    }.mkString("{", ",", "}")
    val errStr = errs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val cartN = facts.count(_._2.cart)
    // the gate: any unpartitioned window outside the justified
    // allow-list is a named failure in the artifact, not a warning
    val unlisted = facts.collect {
      case (n, f) if f.spw > 0 && !spWindowAllowed.contains(n) => n }
    val unlistedStr = unlisted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val spwN = facts.map(_._2.spw).sum
    val body = s"""{"round":$round,"n_queries":${facts.size},""" +
      s""""n_cartesian":$cartN,"n_sp_windows":$spwN,""" +
      s""""sp_unlisted":$unlistedStr,"errors":$errStr,"queries":$qs}"""
    val out = new java.io.File(outDir, f"planaudit_r$round%02d.json")
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(body) finally w.close()
    println(s"[planaudit] wrote ${out.getPath} (n=${facts.size}, " +
      s"cartesians=$cartN, sp_windows=$spwN, unlisted=${unlisted.size}, " +
      s"errors=${errs.size})")
    if (unlisted.nonEmpty)
      System.err.println(s"[planaudit] SP-WINDOW GATE FAILED: " +
        unlisted.mkString(", "))
    // diff vs the latest prior round's audit
    val auditRe = "planaudit_r(\\d+)\\.json".r
    val priorRound = Option(outDir.listFiles()).toSeq.flatten.map(_.getName)
      .collect { case auditRe(n) if n.toInt < round => n.toInt }
      .sorted.lastOption
    priorRound.foreach { pr =>
      val txt = scala.io.Source.fromFile(
        new java.io.File(outDir, f"planaudit_r$pr%02d.json"), "UTF-8").mkString
      // spw is optional: r11-and-earlier audit files predate the field
      val entryRe =
        """"([^"]+)":\{"sh":(\d+),"bex":(\d+),"bhj":(\d+),"smj":(\d+),"cart":(true|false)(?:,"spw":(\d+))?\}""".r
      val prior = entryRe.findAllMatchIn(txt).map(m =>
        m.group(1) -> Facts(m.group(2).toInt, m.group(3).toInt,
          m.group(4).toInt, m.group(5).toInt, m.group(6).toBoolean,
          Option(m.group(7)).map(_.toInt).getOrElse(0))).toMap
      val cur = facts.toMap
      val newCart = facts.collect {
        case (n, f) if f.cart && prior.get(n).exists(!_.cart) => n }
      val shuffleUp = facts.collect {
        case (n, f) if prior.get(n).exists(_.shuffles < f.shuffles) =>
          s"$n(${prior(n).shuffles}->${f.shuffles})" }
      val shuffleDown = facts.count { case (n, f) =>
        prior.get(n).exists(_.shuffles > f.shuffles) }
      val added = facts.collect { case (n, _) if !prior.contains(n) => n }
      println(s"[planaudit] diff vs r$pr: +${added.size} new queries, " +
        s"${shuffleUp.size} shuffle-count increases" +
        (if (shuffleUp.nonEmpty) s" [${shuffleUp.mkString(", ")}]" else "") +
        s", $shuffleDown decreases, ${newCart.size} new cartesians" +
        (if (newCart.nonEmpty) s" [${newCart.mkString(", ")}]" else ""))
    }
  } catch { case e: Throwable =>
    System.err.println(s"planaudit persist failed: $e") }
}
