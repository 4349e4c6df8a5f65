package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/**
 * Streaming observability: a [[StreamingQueryListener]] distilling every
 * micro-batch progress event into one flat record — input rows, rates,
 * batch latency, and stateful-operator footprint (rows and memory in the
 * state stores). The streaming twin of [[graft.core.Metrics]].
 *
 * The state numbers are the ones to watch at scale: input rate tells you
 * whether the cluster keeps up, but state rows growing without bound
 * means a watermark is missing or lagging — the failure mode that turns
 * a streaming job into an OOM three days after deploy. Zero overhead on
 * the hot path: Spark already publishes these in the progress event;
 * this only records them.
 *
 * Usage: `val m = StreamMetrics.install(spark)` … run drains …
 * `m.drain()` returns records oldest-first and clears; `m.uninstall()`
 * detaches the listener.
 */
object StreamMetrics {

  final case class BatchRecord(
      queryName: String,
      batchId: Long,
      inputRows: Long,
      inputRowsPerSecond: Double,
      processedRowsPerSecond: Double,
      batchDurationMs: Long,
      stateRows: Long,        // total rows across stateful operators (-1 if none)
      stateBytes: Long)       // total memory used by state stores (-1 if none)

  final class Listener extends StreamingQueryListener {
    private val buf = new ConcurrentLinkedQueue[BatchRecord]()

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val states = p.stateOperators
      val (sr, sb) =
        if (states == null || states.isEmpty) (-1L, -1L)
        else (states.map(_.numRowsTotal).sum, states.map(_.memoryUsedBytes).sum)
      buf.add(BatchRecord(
        queryName = Option(p.name).getOrElse(""),
        batchId = p.batchId,
        inputRows = p.numInputRows,
        inputRowsPerSecond = nz(p.inputRowsPerSecond),
        processedRowsPerSecond = nz(p.processedRowsPerSecond),
        batchDurationMs = p.batchDuration,
        stateRows = sr,
        stateBytes = sb))
      ()
    }

    private def nz(d: Double): Double = if (d.isNaN || d.isInfinite) 0d else d

    /** Records so far, oldest first; clears the buffer. */
    def drain(): Seq[BatchRecord] = {
      val out = Seq.newBuilder[BatchRecord]
      var r = buf.poll()
      while (r != null) { out += r; r = buf.poll() }
      out.result()
    }
  }

  final class Handle(spark: SparkSession, val listener: Listener) {
    def drain(): Seq[BatchRecord] = listener.drain()
    def uninstall(): Unit = spark.streams.removeListener(listener)
  }

  def install(spark: SparkSession): Handle = {
    val l = new Listener
    spark.streams.addListener(l)
    new Handle(spark, l)
  }
}
