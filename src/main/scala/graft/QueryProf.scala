package graft

/**
 * Per-query optimization harness (r14): times named registry queries
 * exactly like Bench (same session factory, same `.count()` action,
 * cache-cleared between reps) and dumps each query's
 * `.explain("formatted")` to a file so before/after plan shapes are
 * committable evidence (`plans/r14/<name>_{before,after}.txt`).
 *
 * Usage:
 *   SPARK_GRAFT_SF_DIR=... runMain graft.QueryProf <names-csv> <reps> [planOutDir] [suffix]
 *
 * `names-csv` accepts exact names or prefixes ending in '*'. Timing
 * methodology matches Bench (count() on a fresh plan per rep) so the
 * numbers compare 1:1 with bench_results floors.
 */
object QueryProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val wanted = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 1) args(1).toInt else 3
    val planDir = if (args.length > 2) Some(args(2)) else None
    val suffix = if (args.length > 3) args(3) else ""
    val spark = graft.core.GraftSession.local(cpus, "graft-queryprof")
    spark.sparkContext.setLogLevel("WARN")
    // job/stage/task counters: stage-count × per-stage-constant is the
    // dominant term for most sub-5s rows at sf0.1 (guide §1.1 — decide
    // whether time goes to scheduling or compute before optimizing)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val jobStarts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val verboseJobs = sys.env.contains("GRAFT_PROF_JOBS")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (verboseJobs) jobStarts.put(j.jobId, (System.nanoTime(),
            Option(j.properties)
              .flatMap(p => Option(p.getProperty("callSite.short")))
              .getOrElse("?")))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          if (verboseJobs) Option(jobStarts.remove(j.jobId)).foreach {
            case (t0, site) => println(
              f"[prof-job] id=${j.jobId}%-4d ${(System.nanoTime() - t0) / 1e9}%6.3f s  $site")
          }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks)
          if (verboseJobs) {
            val i = s.stageInfo
            val dur = (for (a <- i.completionTime; b <- i.submissionTime)
              yield (a - b) / 1e3).getOrElse(-1.0)
            if (dur >= 0.25) println(
              f"[prof-stage] id=${i.stageId}%-4d $dur%6.3f s tasks=${i.numTasks}%-3d ${i.name.take(90)}")
          }
        }
      })
    // same warm-up as Bench so the first timed rep doesn't absorb JVM /
    // codegen / parquet-reader startup
    try {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.filter(col("l_quantity") > 0)
        .groupBy("l_returnflag").agg(count(lit(1))).count()
    } catch { case _: Throwable => () }
    spark.catalog.clearCache()
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      wanted.exists(w => if (w.endsWith("*")) n.startsWith(w.dropRight(1))
                         else n == w)
    }
    selected.foreach { case (name, fn) =>
      val times = (0 until reps).map { i =>
        val (j0, s0, k0) = (jobs.get, stages.get, tasks.get)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        if (i == reps - 1)
          println(s"[prof-shape] $name jobs=${jobs.get - j0} " +
            s"stages=${stages.get - s0} tasks=${tasks.get - k0}")
        sec
      }
      println(f"[prof] $name%-38s min=${times.min}%.3f " +
        times.map(t => f"$t%.3f").mkString("[", ",", "]"))
      planDir.foreach { d =>
        try {
          new java.io.File(d).mkdirs()
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(
            new java.io.File(d, s"$name$suffix.txt"), "UTF-8")
          try w.println(plan) finally w.close()
          spark.catalog.clearCache()
        } catch { case e: Throwable =>
          System.err.println(s"[prof] plan dump failed for $name: $e")
        }
      }
    }
    spark.stop()
  }
}
