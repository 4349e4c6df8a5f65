package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming cardinality monitor: every micro-batch folds its keys into
 * a standing [[graft.functions.HyperLogLog]] register table and appends
 * one estimate row per group — the production posture where an ingest
 * feed continuously reports "how many distinct X have we seen per
 * source" without ever holding the key universe (vocabulary growth,
 * user-id reach, URL frontier size).
 *
 * Tables: `<prefix>_hll_regs` (group, reg, rho) is APPEND-ONLY — the
 * batch's own 64-registers-per-group are appended each trigger and
 * readers collapse with max(rho). Replay needs no guard here: a
 * crash-replayed trigger appends byte-identical register rows that
 * collapse in the max — the bm25Ingest replay-dupes-are-exact argument
 * strengthened to full idempotence (max ∘ max = max).
 * `<prefix>_hll_est` (batch_id, group, est, n_new) holds the
 * per-trigger estimate trajectory; it IS batch-id replay-guarded
 * (estimate rows are not idempotent), and written LAST — the
 * marks-write-last watermark: a crash between the two writes replays
 * into harmless register dupes plus the missing estimate row.
 *
 * Per-trigger cost: one batch-sized register aggregation (64 rows per
 * group out of the shuffle) + a collapse of the standing register
 * table (groups × 64 × triggers-so-far rows — kilobytes; run
 * [[graft.core.Materialize.bucketCompact]]-style maintenance or
 * periodic re-write if a monitor lives for millions of triggers).
 * Estimates derive from registers alone, so the trajectory row is
 * O(groups), never O(keys).
 */
object SketchIngest {

  def hllIngest(stream: DataFrame, keyCol: String, groupCol: String,
                tablePrefix: String,
                checkpoint: Option[String] = None): StreamingQuery = {
    val spark = stream.sparkSession
    val regsT = tablePrefix + "_hll_regs"
    val estT = tablePrefix + "_hll_est"
    val writer = stream.writeStream.outputMode("append")
    checkpoint.foreach(cp => writer.option("checkpointLocation", cp))
    writer.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      applyBatch(batch.toDF(), batchId, keyCol, groupCol, tablePrefix)
    }.start()
  }

  /** One trigger's work, exposed for direct at-least-once testing (the
    * CorpusIngest.applyBatch convention). */
  def applyBatch(batch: DataFrame, batchId: Long, keyCol: String,
                 groupCol: String, tablePrefix: String): Unit = {
    val spark = batch.sparkSession
    val regsT = tablePrefix + "_hll_regs"
    val estT = tablePrefix + "_hll_est"
    val replayed = spark.catalog.tableExists(estT) &&
      spark.table(estT).filter(col("batch_id") === batchId).count() > 0
    if (!replayed) graft.core.CacheRegistry.scoped {
      val b = graft.core.CacheRegistry.persistTracked(batch)
      val nNew = b.count()
      if (nNew > 0) {
        graft.functions.HyperLogLog
          .registers(b, keyCol, Seq(groupCol))
          .write.mode("append").format("parquet").saveAsTable(regsT)
        spark.catalog.refreshTable(regsT)
        val merged = spark.table(regsT)
          .groupBy(col(groupCol), col("reg"))
          .agg(max(col("rho")).as("rho"))
        graft.functions.HyperLogLog.estimate(merged, Seq(groupCol))
          .select(lit(batchId).as("batch_id"), col(groupCol), col("est"),
            lit(nNew).as("n_new"))
          .write.mode("append").format("parquet").saveAsTable(estT)
      }
    }
  }
}
