package graft.core

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * Execution observability: a [[QueryExecutionListener]] that distills each
 * completed action's physical plan into one flat record — rows produced,
 * rows scanned, bytes of files read, shuffle bytes/records written — the
 * numbers a pipeline SLO dashboard and a cost regression gate need.
 *
 * Why plan metrics and not counters in operators: Spark already maintains
 * SQLMetrics on every physical node; this walks the EXECUTED plan
 * (descending through AQE's adaptive root and materialized query stages,
 * which hide the real operators from a naive `children` traversal) and
 * aggregates them post-hoc — zero overhead on the hot path, works for any
 * query, including ones written with no graft API at all.
 *
 * Usage: `val l = Metrics.install(spark)` … run actions …
 * `l.drain()` returns the records (oldest first) and clears the buffer.
 */
object Metrics {

  /** One completed action. `shuffleBytes` is the total written across all
    * exchanges — the first number to watch at 100 TB, since it is the one
    * that scales with data movement rather than data size. */
  final case class ActionRecord(
      action: String,
      durationMs: Long,
      outputRows: Long,       // root operator's numOutputRows (-1 if absent)
      scanRows: Long,         // sum of scan-node output rows
      scanBytes: Long,        // sum of file sizes read by scans
      shuffleBytes: Long,     // sum of shuffle bytes written
      shuffleRecords: Long,   // sum of shuffle records written
      numScans: Int,
      numExchanges: Int)

  final class Listener extends QueryExecutionListener {
    private val buf = new ConcurrentLinkedQueue[ActionRecord]()

    override def onSuccess(funcName: String,
                           qe: org.apache.spark.sql.execution.QueryExecution,
                           durationNs: Long): Unit = {
      val nodes = flatten(qe.executedPlan)
      def sumMetric(sel: SparkPlan => Boolean, key: String): Long =
        nodes.filter(sel).flatMap(_.metrics.get(key)).map(_.value).sum
      val isScan = (p: SparkPlan) => p.nodeName.startsWith("Scan")
      val isExchange = (p: SparkPlan) => p.nodeName.contains("Exchange")
      buf.add(ActionRecord(
        action = funcName,
        durationMs = durationNs / 1000000L,
        outputRows = qe.executedPlan.metrics.get("numOutputRows")
          .map(_.value).getOrElse(-1L),
        scanRows = sumMetric(isScan, "numOutputRows"),
        scanBytes = sumMetric(isScan, "filesSize"),
        shuffleBytes = sumMetric(isExchange, "shuffleBytesWritten"),
        shuffleRecords = sumMetric(isExchange, "shuffleRecordsWritten"),
        numScans = nodes.count(isScan),
        numExchanges = nodes.count(isExchange)))
    }

    override def onFailure(funcName: String,
                           qe: org.apache.spark.sql.execution.QueryExecution,
                           exception: Exception): Unit = ()

    /** Return all buffered records (oldest first) and clear the buffer. */
    def drain(): Seq[ActionRecord] = {
      val out = Seq.newBuilder[ActionRecord]
      var r = buf.poll()
      while (r != null) { out += r; r = buf.poll() }
      out.result()
    }
  }

  /** Register a fresh listener on the session and return it. Callers own
    * the listener's lifecycle; `uninstall` detaches it. */
  def install(spark: SparkSession): Listener = {
    val l = new Listener
    spark.listenerManager.register(l)
    l
  }

  def uninstall(spark: SparkSession, l: Listener): Unit =
    spark.listenerManager.unregister(l)

  /** Walk the executed plan INCLUDING what AQE hides: the adaptive root's
    * current plan and each materialized query stage's inner plan. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
    case s: QueryStageExec => p +: flatten(s.plan)
    case _ => p +: p.children.flatMap(flatten)
  }
}
