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
 */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val prefix = if (args.length > 1) args(1) else ""
    val spark = graft.core.GraftSession.local(8, "graft-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
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
          val shuffles = Seq("Exchange hashpartitioning",
            "Exchange rangepartitioning", "Exchange SinglePartition")
            .map(occ).sum
          val bex = p.linesIterator.count(_.contains("BroadcastExchange"))
          val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
          val smj = p.linesIterator.count(_.contains("SortMergeJoin"))
          val cart = p.contains("CartesianProduct")
          println(f"[planaudit] $name%-36s shuffles=$shuffles%-3d " +
            f"broadcasts=$bex%-3d bhj=$bhj%-3d smj=$smj%-3d cartesian=$cart")
        } catch { case e: Throwable =>
          println(s"[planaudit] $name ERROR ${e.getClass.getSimpleName}")
        }
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
