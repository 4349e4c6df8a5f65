package graft

import org.apache.spark.sql.SparkSession

/**
 * Streaming diagnostics main: runs selected st_* registry entries N times
 * and prints every micro-batch's durationMs breakdown (queryPlanning,
 * addBatch, walCommit, commitOffsets, …) from the query's progress
 * events, so drain wall-time can be attributed to engine phases instead
 * of guessed at. Usage:
 *   SPARK_GRAFT_SF_DIR=… SPARK_GRAFT_ONLY=st_stream SPARK_GRAFT_REPS=3 \
 *     sbt "runMain graft.StreamDiag"
 */
object StreamDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
    val spark = graft.core.GraftSession.local(32, "graft-stdiag")
    spark.sparkContext.setLogLevel("ERROR")

    val progressLog =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          progressLog.add((Option(p.name).getOrElse("?"), p.json)); ()
        }
      })

    val sel = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => n.startsWith("st_") }
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    for (r <- 1 to reps; (name, fn) <- sel) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"== rep$r $name%-28s $sec%7.3f s")
      var e = progressLog.poll()
      while (e != null) {
        println(s"   [${e._1}] ${e._2}")
        e = progressLog.poll()
      }
    }
    spark.stop()
  }
}
