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
                           cart: Boolean)

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
          val p = fn(spark, sfDir).queryExecution.executedPlan.toString
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
            p.contains("CartesianProduct"))
          facts(name) = f
          println(f"[planaudit] $name%-36s shuffles=${f.shuffles}%-3d " +
            f"broadcasts=${f.bex}%-3d bhj=${f.bhj}%-3d smj=${f.smj}%-3d " +
            f"cartesian=${f.cart}")
        } catch { case e: Throwable =>
          errs ::= name
          println(s"[planaudit] $name ERROR ${e.getClass.getSimpleName}")
        }
        spark.catalog.clearCache()
      }
    if (prefix.isEmpty) persistAndDiff(facts.toSeq, errs.reverse)
    spark.stop()
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
        s""""smj":${f.smj},"cart":${f.cart}}"""
    }.mkString("{", ",", "}")
    val errStr = errs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val cartN = facts.count(_._2.cart)
    val body = s"""{"round":$round,"n_queries":${facts.size},""" +
      s""""n_cartesian":$cartN,"errors":$errStr,"queries":$qs}"""
    val out = new java.io.File(outDir, f"planaudit_r$round%02d.json")
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(body) finally w.close()
    println(s"[planaudit] wrote ${out.getPath} (n=${facts.size}, " +
      s"cartesians=$cartN, errors=${errs.size})")
    // diff vs the latest prior round's audit
    val auditRe = "planaudit_r(\\d+)\\.json".r
    val priorRound = Option(outDir.listFiles()).toSeq.flatten.map(_.getName)
      .collect { case auditRe(n) if n.toInt < round => n.toInt }
      .sorted.lastOption
    priorRound.foreach { pr =>
      val txt = scala.io.Source.fromFile(
        new java.io.File(outDir, f"planaudit_r$pr%02d.json"), "UTF-8").mkString
      val entryRe =
        """"([^"]+)":\{"sh":(\d+),"bex":(\d+),"bhj":(\d+),"smj":(\d+),"cart":(true|false)\}""".r
      val prior = entryRe.findAllMatchIn(txt).map(m =>
        m.group(1) -> Facts(m.group(2).toInt, m.group(3).toInt,
          m.group(4).toInt, m.group(5).toInt, m.group(6).toBoolean)).toMap
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
