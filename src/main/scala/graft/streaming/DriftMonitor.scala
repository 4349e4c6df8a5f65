package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming distribution-drift monitor: every micro-batch is scored
 * against a FIXED reference distribution with BOTH
 * [[graft.ext.Corpus.psiDrift]] (sum of per-bin terms — localizes where
 * mass moved) and [[graft.ext.Corpus.ksDrift]] (max CDF gap — the
 * statistic classical drift tests threshold), and one
 * (batch_id, psi, ks, n_rows) row is appended to a standing monitor
 * table — the production posture where an ingest feed is continuously
 * audited against the last release and an alert fires when PSI crosses
 * the 0.25 line (or KS its test-specific critical value). The reference
 * is deliberately static (drift is measured against a pinned baseline,
 * not a moving average); refreshing it is a new monitor run.
 *
 * Per-trigger work: the REFERENCE is pre-binned once at stream start
 * (a pinned, persisted (bin, count) frame — the baseline is never
 * re-scanned), and each batch collapses to its own bin counts in ONE
 * pass (the per-trigger bin frame is cached scoped, so psi and ks both
 * read it without a second batch scan); all drift arithmetic after that
 * is bins-sized regardless of baseline size or monitor age. The
 * appended row is O(1). Replay-guarded by batch id: a crash-replayed
 * trigger finds its row already present and appends nothing.
 */
object DriftMonitor {

  def psiIngest(stream: DataFrame, ref: DataFrame, valueCol: String,
                binWidth: Double, tablePrefix: String,
                checkpoint: Option[String] = None): StreamingQuery = {
    val spark = ref.sparkSession
    val table = tablePrefix + "_psi"
    val refBins = graft.core.CacheRegistry.persistTracked(
      graft.ext.Corpus.binCounts(ref, valueCol, binWidth))
    refBins.count() // pin the baseline before the first trigger
    val writer = stream.writeStream.outputMode("append")
    checkpoint.foreach(cp => writer.option("checkpointLocation", cp))
    writer.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val replayed = spark.catalog.tableExists(table) &&
        spark.table(table).filter(col("batch_id") === batchId).count() > 0
      if (!replayed) graft.core.CacheRegistry.scoped {
        val bb = graft.core.CacheRegistry.persistTracked(
          graft.ext.Corpus.binCounts(batch.toDF(), valueCol, binWidth))
        val psiRow = graft.ext.Corpus.psiDriftFromBins(refBins, bb)
          .agg(round(sum(col("psi_term")) + lit(1e-9), 6).as("psi"),
            sum(col("n_new")).as("n_rows"))
        val ksRow = graft.ext.Corpus.ksDriftFromBins(refBins, bb)
          .agg(max(col("gap")).as("ks"))
        val scored = psiRow.crossJoin(ksRow)
          .select(lit(batchId).as("batch_id"), col("psi"), col("ks"),
            col("n_rows"))
          .filter(col("n_rows") > 0) // empty replay/trigger: no row
        scored.write.mode("append").format("parquet").saveAsTable(table)
      }
    }.start()
  }
}
