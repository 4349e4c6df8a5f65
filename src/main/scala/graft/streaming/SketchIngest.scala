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

  /**
   * Streaming novelty gate: flag each micro-batch key as novel
   * (never seen before, certain) or probably-seen (Bloom membership —
   * false positives possible, false negatives never) WITHOUT holding
   * the key universe anywhere — the state is the ≤ m-row relational
   * Bloom position table, not the keys (first-contact detection over
   * user ids, URL frontier membership, vocabulary growth).
   *
   * Tables: `<prefix>_bloom_pos` (batch_id, pos) is APPEND-ONLY and
   * carries batch provenance: the probe for batch b reads positions
   * WHERE batch_id < b, so the pre-batch filter it sees is
   * deterministic even if a crash-replayed trigger already appended
   * b's own positions — replay dupes carry the same batch_id and
   * collapse in the probe's DISTINCT (the HLL-register idempotence
   * argument, with provenance replacing max-collapse).
   * `<prefix>_bloom_novel` (batch_id, key, novel) is the replay guard,
   * written LAST: a crash between the writes replays into harmless
   * position dupes plus the missing novelty rows, recomputed against
   * the same batch_id < b filter state.
   *
   * Per-trigger cost: k positions per distinct batch key (one explode)
   * + a broadcast semi-join against the ≤ m-row collapsed filter —
   * no shuffle of anything wider than the batch, state O(m) forever.
   */
  def bloomNoveltyIngest(stream: DataFrame, keyCol: String,
                         tablePrefix: String, k: Int, m: Int,
                         checkpoint: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream.outputMode("append")
    checkpoint.foreach(cp => writer.option("checkpointLocation", cp))
    writer.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      applyBloomBatch(batch.toDF(), batchId, keyCol, tablePrefix, k, m)
    }.start()
  }

  /** One novelty-gate trigger, exposed for direct at-least-once testing. */
  def applyBloomBatch(batch: DataFrame, batchId: Long, keyCol: String,
                      tablePrefix: String, k: Int, m: Int): Unit = {
    val spark = batch.sparkSession
    val posT = tablePrefix + "_bloom_pos"
    val novT = tablePrefix + "_bloom_novel"
    val replayed = spark.catalog.tableExists(novT) &&
      spark.table(novT).filter(col("batch_id") === batchId).count() > 0
    if (!replayed) graft.core.CacheRegistry.scoped {
      val keys = graft.core.CacheRegistry.persistTracked(
        batch.filter(col(keyCol).isNotNull).select(keyCol).distinct())
      if (keys.count() > 0) {
        graft.functions.BloomSketch.positions(keys, keyCol, k, m)
          .select(lit(batchId).as("batch_id"), col("pos"))
          .write.mode("append").format("parquet").saveAsTable(posT)
        spark.catalog.refreshTable(posT)
        val prior = spark.table(posT)
          .filter(col("batch_id") < batchId).select("pos").distinct()
        graft.functions.BloomSketch.mightContain(keys, keyCol, prior, k, m)
          .select(lit(batchId).as("batch_id"), col(keyCol),
            (!col("might_contain")).as("novel"))
          .write.mode("append").format("parquet").saveAsTable(novT)
      }
    }
  }

  /**
   * Streaming frequency monitor — the Count-Min side of the sketch
   * trio (HLL = distinct reach, Bloom = novelty, CMS = frequency):
   * every micro-batch folds its key counts into a standing d×w bucket
   * table and appends one estimate row per tracked heavy-hitter
   * candidate — "what are the hottest keys and how hot, trigger by
   * trigger" without holding per-key counts (trending queries,
   * vocabulary heavy hitters, hot-shard detection).
   *
   * Tables: `<prefix>_cms_cnt` (batch_id, j, pos, cnt) is APPEND-ONLY
   * with batch provenance; readers collapse by dropping
   * (batch_id, j, pos) duplicates (crash-replay rows are bit-identical
   * — counts are deterministic per batch) then summing per (j, pos),
   * and filter batch_id <= b so a replayed trigger can never see a
   * later batch's counts. `<prefix>_cms_cand` (batch_id, key) grows by
   * the batch-local top-N keys (TakeOrderedAndProject — bounded,
   * deterministic (count desc, key) tiebreak); same idempotence.
   * `<prefix>_cms_est` (batch_id, key, est) is the replay guard,
   * written LAST: est(b, key) = the CMS point estimate (min over d
   * rows of the cumulative bucket sums through batch b) for every
   * candidate tracked so far.
   *
   * Per-trigger cost: one batch-sized count agg + d×w standing rows
   * (kilobytes — broadcast into the candidate probe) + ≤ N×batches
   * candidate point-queries. State is O(d×w + N×triggers), never
   * O(keys).
   */
  def cmsIngest(stream: DataFrame, keyCol: String, tablePrefix: String,
                d: Int, w: Int, topN: Int,
                checkpoint: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream.outputMode("append")
    checkpoint.foreach(cp => writer.option("checkpointLocation", cp))
    writer.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      applyCmsBatch(batch.toDF(), batchId, keyCol, tablePrefix, d, w, topN)
    }.start()
  }

  /** One frequency-monitor trigger, exposed for at-least-once testing. */
  def applyCmsBatch(batch: DataFrame, batchId: Long, keyCol: String,
                    tablePrefix: String, d: Int, w: Int, topN: Int): Unit = {
    val spark = batch.sparkSession
    val cntT = tablePrefix + "_cms_cnt"
    val candT = tablePrefix + "_cms_cand"
    val estT = tablePrefix + "_cms_est"
    val replayed = spark.catalog.tableExists(estT) &&
      spark.table(estT).filter(col("batch_id") === batchId).count() > 0
    if (!replayed) graft.core.CacheRegistry.scoped {
      val counts = graft.core.CacheRegistry.persistTracked(
        batch.filter(col(keyCol).isNotNull)
          .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt")))
      if (counts.count() > 0) {
        counts.select(posexplode(array((0 until d).map(j =>
            graft.functions.CountMinSketch.hashIdxCol(j, col(keyCol), w)): _*))
            .as(Seq("j", "pos")), col("cnt"))
          .groupBy(col("j"), col("pos")).agg(sum(col("cnt")).as("cnt"))
          .select(lit(batchId).as("batch_id"), col("j"), col("pos"), col("cnt"))
          .write.mode("append").format("parquet").saveAsTable(cntT)
        counts.orderBy(desc("cnt"), col(keyCol)).limit(topN)
          .select(lit(batchId).as("batch_id"), col(keyCol).as("key"))
          .write.mode("append").format("parquet").saveAsTable(candT)
        spark.catalog.refreshTable(cntT)
        spark.catalog.refreshTable(candT)
        val buckets = spark.table(cntT).filter(col("batch_id") <= batchId)
          .dropDuplicates("batch_id", "j", "pos")
          .groupBy(col("j"), col("pos")).agg(sum(col("cnt")).as("cnt"))
        val cand = spark.table(candT).filter(col("batch_id") <= batchId)
          .select(col("key")).distinct()
        cand.select(col("key"), posexplode(array((0 until d).map(j =>
            graft.functions.CountMinSketch.hashIdxCol(j, col("key"), w)): _*))
            .as(Seq("j", "pos")))
          .join(broadcast(buckets), Seq("j", "pos"), "left")
          .groupBy(col("key"))
          .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
          .select(lit(batchId).as("batch_id"), col("key"), col("est"))
          .write.mode("append").format("parquet").saveAsTable(estT)
      }
    }
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
