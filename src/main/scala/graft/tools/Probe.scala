package graft.tools

/**
 * Scratch diagnostics main (not part of the library surface): time named
 * registry queries in isolation, with repeats, under the same session
 * config as [[graft.Bench]].
 *
 * Usage: runMain graft.tools.Probe <sfDir> <reps> <queryName>...
 * With no names: times every query once (a bench dry-run).
 * Set SPARK_GRAFT_EXPLAIN=1 to dump the formatted plan per query.
 */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val reps = if (args.length > 1) args(1).toInt else 1
    val names = if (args.length > 2) args.drop(2).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.local(cpus.toInt, "graft-probe")
    spark.sparkContext.setLogLevel("WARN")
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"[probe] $name: NOT REGISTERED")
        case Some(fn) =>
          (1 to reps).foreach { i =>
            val t0 = System.nanoTime()
            val n = fn(spark, dir).count()
            val sec = (System.nanoTime() - t0) / 1e9
            println(f"[probe] $name rep$i: $sec%.2fs rows=$n")
            spark.catalog.clearCache()
          }
          if (explain) println(fn(spark, dir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
