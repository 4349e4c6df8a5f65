package graft

import org.apache.spark.sql.functions._
import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
import org.scalatest.time.{Millis, Seconds, Span}

import graft.core.{Metrics, Tables}

/** Execution-metrics listener: records arrive asynchronously on the
  * listener bus, so assertions poll with a timeout. */
class MetricsSpec extends SparkSpec {

  test("listener captures scan rows, scan bytes, and shuffle volume") {
    val l = Metrics.install(spark)
    try {
      Tables.orders(spark, sfDir)
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect()
      eventually(timeout(Span(10, Seconds)), interval(Span(100, Millis))) {
        val recs = l.drain()
        assert(recs.nonEmpty, "listener should have received the action")
        val r = recs.last
        assert(r.scanRows > 0, s"scan rows: $r")
        assert(r.scanBytes > 0, s"scan bytes: $r")
        assert(r.numScans == 1, s"one parquet scan: $r")
        assert(r.numExchanges >= 1 && r.shuffleRecords > 0,
          s"groupBy must shuffle partial aggregates: $r")
        assert(r.shuffleRecords < r.scanRows,
          s"map-side partial agg must shrink the shuffle: $r")
      }
    } finally Metrics.uninstall(spark, l)
  }

  test("broadcast join records zero-ish shuffle vs shuffle join") {
    val l = Metrics.install(spark)
    try {
      val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
      val nat = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
      cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .collect()
      eventually(timeout(Span(10, Seconds)), interval(Span(100, Millis))) {
        val recs = l.drain()
        assert(recs.nonEmpty)
        val r = recs.last
        assert(r.shuffleBytes == 0,
          s"broadcast join should move no shuffle bytes: $r")
        assert(r.scanRows > 0 && r.numScans == 2, s"$r")
      }
    } finally Metrics.uninstall(spark, l)
  }
}
