package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
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
 * table. Batch-carrying tables are physically partitioned by a derived
 * `__pb` copy of batch_id (the data column keeps its type/position;
 * the partition copy exists purely so replay-guard and provenance
 * filters prune to one partition instead of scanning the full trigger
 * history), and bounded sketch-state writes are coalesced to one file
 * per trigger so standing-table reads list O(triggers) files, not
 * O(triggers × tasks). For a monitor that lives beyond thousands of
 * triggers, [[compactHll]]/[[compactBloom]]/[[compactCms]] rewrite the
 * standing state to its collapsed form without breaking the replay
 * arguments (each scaladoc carries the proof obligation) — either on
 * the operator's own schedule (quiesced relative to triggers) or wired
 * in-trigger via the ingests' `compactEvery` knob, where quiescence is
 * structural.
 */
object SketchIngest {

  /** Partition-column twin of batch_id: `filter(col(PB) === b)` prunes
    * to one partition at the catalog level. Kept SEPARATE from the
    * batch_id data column so reader-visible schemas (types, column
    * order) are unchanged by the physical layout. */
  private val PB = "__pb"

  /** Append `df` (which must carry `batch_id`) to `table`, partitioned
    * by the derived `__pb`. `bounded` marks frames whose size is capped
    * by sketch geometry (≤ m positions, d×w buckets, top-N candidates)
    * — those coalesce to ONE file per trigger; unbounded frames (per-key
    * novelty/estimate rows) keep their task parallelism. A standing
    * table written before the `__pb` layout keeps its unpartitioned
    * shape (appending the partition column would be rejected) — the
    * read path already tolerates both via [[bcol]]. Recovers a
    * half-swapped compaction first ([[recoverSwap]]): a crash between
    * the rewrite's renames must not let this append recreate the table
    * EMPTY while the real state sits under `__cpt_old`. */
  private def appendByBatch(df: DataFrame, table: String,
                            bounded: Boolean): Unit = {
    val spark = df.sparkSession
    recoverSwap(spark, table)
    val out = if (bounded) df.coalesce(1) else df
    val legacy = spark.catalog.tableExists(table) &&
      !spark.table(table).columns.contains(PB)
    if (legacy)
      out.write.mode("append").format("parquet").saveAsTable(table)
    else
      out.withColumn(PB, col("batch_id"))
        .write.mode("append").format("parquet").partitionBy(PB)
        .saveAsTable(table)
  }

  /** Finish (or roll back) a compaction that crashed mid-swap. Three
    * crash positions leave a `__cpt_old` twin behind, and ALL of them
    * must be healed before any append or rewrite touches the table —
    * the append would otherwise recreate the table empty, and the next
    * rewrite's cleanup would delete the survivor:
    *
    *  1. between the two renames — `table` ABSENT, survivor under
    *     `__cpt_old`: rename the survivor back in (+ MSCK — the rename
    *     moved its directory out from under its partition metadata).
    *  2. after the second rename but before the MSCK — `table` EXISTS
    *     but a partitioned table READS EMPTY (partition metadata still
    *     points at the stage table's pre-move paths): re-run the MSCK;
    *     if the table still reads empty while the survivor doesn't,
    *     restore the survivor (defense in depth — a swap that lost its
    *     directory entirely must not become permanent data loss).
    *  3. after the MSCK but before the old-copy cleanup — `table` reads
    *     fine: just finish the cleanup.
    *
    * Reading the table to decide (an `isEmpty` probe) costs one
    * metadata-pruned task and only runs when a survivor table exists —
    * i.e. only in the trigger immediately after a crashed compaction. */
  private def recoverSwap(spark: SparkSession, table: String): Unit = {
    val old = s"${table}__cpt_old"
    if (!spark.catalog.tableExists(old)) return
    def repair(): Unit = {
      if (spark.table(table).columns.contains(PB))
        spark.sql(s"MSCK REPAIR TABLE `$table`")
      spark.catalog.refreshTable(table)
    }
    if (!spark.catalog.tableExists(table)) { // crash position 1
      spark.sql(s"ALTER TABLE `$old` RENAME TO `$table`")
      repair()
      return
    }
    if (spark.table(table).isEmpty) { // crash position 2 (or empty state)
      repair()
      if (spark.table(table).isEmpty && survivorHasData(spark, old)) {
        dropSurvivor(spark, table)
        spark.sql(s"ALTER TABLE `$old` RENAME TO `$table`")
        repair()
        return
      }
    }
    // crash position 3 (or a healed 2): the swapped-in copy reads —
    // finish the interrupted cleanup ([[dropSurvivor]]: the twin's
    // stale partition metadata points INTO the live table's directory,
    // so a plain managed-table drop would delete the data it guards)
    dropSurvivor(spark, old)
  }

  /** Whether the survivor twin holds any data bytes — probed through the
    * FILESYSTEM, never the catalog: after `RENAME TO __cpt_old` the
    * survivor's partition metadata still points at its PRE-move paths
    * (the original table directory), which the stage rename then
    * repopulates with the NEW generation — so a catalog read of the
    * survivor returns the new data, or nothing at all when the swap lost
    * the directory. In that lost-directory case a catalog-read gate sees
    * table-empty AND survivor-empty (both reads hit the same dead
    * location) and would delete the last good copy. The survivor's real
    * bytes sit under its own moved directory; list that. */
  private def survivorHasData(spark: SparkSession, old: String): Boolean = {
    // the survivor's TABLE location (rename updates it — only the
    // PARTITION metadata goes stale), read from the catalog so named
    // databases and custom locations resolve; hand-building
    // <warehouse>/<name> here would make the gate silently pass (and
    // the cleanup delete the last good copy) for any non-default layout
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(old)).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(p).exists { st =>
        val n = st.getPath.getName
        if (st.isDirectory) !n.startsWith(".") && walk(st.getPath)
        else st.getLen > 0 && !n.startsWith("_") && !n.startsWith(".")
      }
    fs.exists(loc) && walk(loc)
  }

  /** The pruning column of `df`: the `__pb` partition copy when the
    * table carries it, else the plain batch_id data column (tolerates
    * standing tables written before the partitioned layout). */
  private def bcol(df: DataFrame) =
    if (df.columns.contains(PB)) col(PB) else col("batch_id")

  /** Has this batch already committed its LAST (guard) write? One
    * partition-pruned count — metadata + at most one tiny partition,
    * never a scan of the full trigger history. Falls back to a
    * batch_id filter for pre-partitioning tables (an old monitor's
    * standing tables predating the `__pb` layout). */
  private def committed(spark: SparkSession, guardTable: String,
                        batchId: Long): Boolean =
    spark.catalog.tableExists(guardTable) && {
      val t = spark.table(guardTable)
      t.filter(bcol(t) === batchId).count() > 0
    }

  /** Rewrite `table` with `compacted`, keeping the `__pb` layout when
    * the frame carries it — via the [[graft.core.Materialize.bucketRewrite]]
    * staged rename-swap: the compacted copy is FULLY written to a stage
    * table (reading the original, so no lineage cut and no
    * executor-memory copy), then two catalog renames swap it in. A
    * crash before the swap leaves the original untouched; between the
    * renames the data survives under `<table>__cpt_old`, never lost.
    * Run quiesced relative to TRIGGERS (a trigger appending mid-rewrite
    * would be dropped with the old generation) — the OPTIMIZE/VACUUM
    * posture. */
  private def rewrite(spark: SparkSession, table: String,
                      compacted: DataFrame): Unit = {
    val stage = s"${table}__cpt_stage"
    val old = s"${table}__cpt_old"
    // a prior compaction may have crashed mid-swap: restore the
    // survivor BEFORE the cleanup below can delete it
    recoverSwap(spark, table)
    graft.core.Materialize.dropWithLocation(spark, stage)
    graft.core.Materialize.dropWithLocation(spark, old)
    val w = compacted.write.mode("overwrite").format("parquet")
    (if (compacted.columns.contains(PB)) w.partitionBy(PB) else w)
      .saveAsTable(stage)
    spark.sql(s"ALTER TABLE `$table` RENAME TO `$old`")
    spark.sql(s"ALTER TABLE `$stage` RENAME TO `$table`")
    // RENAME moves a managed table's directory but leaves partition
    // metadata pointing at the pre-move paths — a partitioned table
    // reads EMPTY after the swap until its partitions are re-discovered
    // from the moved directory
    if (compacted.columns.contains(PB))
      spark.sql(s"MSCK REPAIR TABLE `$table`")
    spark.catalog.refreshTable(table)
    // cleanup gate: every compaction preserves emptiness (group-bys and
    // unions of the original), so a swapped-in table that reads empty
    // against a non-empty survivor means the swap LOST data (stale
    // metadata, moved-out directory) — keep the survivor for
    // recoverSwap instead of deleting the last good copy. The survivor
    // is probed on the FILESYSTEM ([[survivorHasData]]): its catalog
    // metadata points at the pre-rename paths and can read empty (or
    // the new generation) exactly when the gate matters most.
    if (spark.table(table).isEmpty && survivorHasData(spark, old))
      throw new IllegalStateException(
        s"compaction swap of `$table` reads empty against a non-empty " +
        s"`$old` — survivor retained for recoverSwap")
    dropSurvivor(spark, old)
  }

  /**
   * Drop a RENAMED-AWAY twin without touching anyone else's data.
   *
   * `ALTER TABLE RENAME` moves a managed table's directory but leaves
   * its catalog PARTITION metadata pointing at the pre-move paths —
   * which, after the swap's second rename, is the LIVE table's
   * directory. `DROP TABLE` on a managed partitioned table deletes
   * every registered partition location, so a plain drop of the twin
   * deletes the just-swapped-in generation through those stale entries
   * (observed: standing table left with only `_SUCCESS` after a
   * compaction from a catalog-partition-tracking session; the
   * foreachBatch path escapes only because its session clone doesn't
   * register catalog partitions). Forgetting the partition METADATA
   * first (`retainData = true`) makes the drop touch exactly the
   * twin's own moved directory.
   */
  private def dropSurvivor(spark: SparkSession, table: String): Unit = {
    forgetPartitions(spark, table)
    graft.core.Materialize.dropWithLocation(spark, table)
  }

  /** Remove `table`'s catalog partition metadata WITHOUT deleting the
    * partition directories (`retainData = true`). No-op for
    * unpartitioned/legacy tables and sessions that don't track
    * filesource partitions in the catalog (the benign
    * AnalysisException from listPartitions). A FAILED dropPartitions
    * is NOT swallowed: falling through to DROP TABLE with the stale
    * entries still registered would delete the live table's data —
    * recovery must fail-stop there, not destroy the swapped-in
    * generation. */
  private def forgetPartitions(spark: SparkSession, table: String): Unit = {
    val cat = spark.sessionState.catalog
    val id = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val specs =
      try cat.listPartitions(id).map(_.spec)
      catch { case _: org.apache.spark.sql.AnalysisException => Seq.empty }
    if (specs.nonEmpty)
      cat.dropPartitions(id, specs, ignoreIfNotExists = true,
        purge = false, retainData = true)
  }

  /** `compactEvery` (0 = never; DEFAULT 8, the measured recommendation
    * — SCALE.md's trigger-growth table shows uncompacted state walls
    * growing ×2–4 by trigger 128 while cadence 8 stays flat in age, so
    * a monitor built with defaults gets the production posture) wires
    * the maintenance pass into the monitor itself: every N committed
    * batches the standing state is compacted from INSIDE the
    * foreachBatch, where quiescence is structural — a micro-batch sink
    * cannot race its own next trigger, so the "run quiesced relative to
    * triggers" obligation the manual compactions carry is discharged by
    * construction. Cadence is (batchId + 1) % N == 0, so replaying a
    * compaction-bearing trigger re-runs the (idempotent) compaction. */
  def hllIngest(stream: DataFrame, keyCol: String, groupCol: String,
                tablePrefix: String,
                checkpoint: Option[String] = None,
                compactEvery: Int = 8): StreamingQuery = {
    val writer = stream.writeStream.outputMode("append")
    checkpoint.foreach(cp => writer.option("checkpointLocation", cp))
    writer.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      applyBatch(batch.toDF(), batchId, keyCol, groupCol, tablePrefix)
      if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
        compactHll(batch.sparkSession, tablePrefix)
    }.start()
  }

  /**
   * Streaming SET-EXPRESSION cardinality monitor: every micro-batch
   * folds its keys into a standing [[graft.functions.KmvSketch]]
   * bottom-k hash table and appends one estimate row per group. Where
   * [[hllIngest]] answers "how many distinct X per source", the KMV
   * state additionally supports cross-group union/INTERSECTION/Jaccard
   * after the fact ([[graft.functions.KmvSketch.setOps]]) — "how many
   * users did feeds A and B both see this week" — off the same ≤ k
   * hashes per group, no re-scan.
   *
   * Tables: `<prefix>_kmv_hashes` (group, hash) is APPEND-ONLY — the
   * batch's own bottom-k per group is appended each trigger and
   * readers collapse with DISTINCT + re-rank ≤ k (KMV is closed under
   * union). Replay needs no guard here: a crash-replayed trigger
   * appends byte-identical hash rows that vanish in the DISTINCT — the
   * HLL-register idempotence argument with set-union replacing
   * max-collapse. `<prefix>_kmv_est` (batch_id, group, est, n_new)
   * holds the estimate trajectory; it IS batch-id replay-guarded and
   * written LAST (marks-write-last).
   *
   * Per-trigger cost: one map-side-bounded MinK aggregation over the
   * batch (≤ k hashes per group reach the shuffle) + a collapse of the
   * standing table (≤ k × triggers-since-compaction rows per group;
   * `compactEvery` keeps it ≤ 2k amortized).
   */
  def kmvIngest(stream: DataFrame, keyCol: String, groupCol: String,
                tablePrefix: String, k: Int = 256,
                checkpoint: Option[String] = None,
                compactEvery: Int = 8): StreamingQuery = {
    val writer = stream.writeStream.outputMode("append")
    checkpoint.foreach(cp => writer.option("checkpointLocation", cp))
    writer.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      applyBatchKmv(batch.toDF(), batchId, keyCol, groupCol, tablePrefix, k)
      if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
        compactKmv(batch.sparkSession, tablePrefix, k)
    }.start()
  }

  /** One KMV trigger's work, exposed for direct at-least-once testing
    * (the [[applyBatch]] convention). */
  def applyBatchKmv(batch: DataFrame, batchId: Long, keyCol: String,
                    groupCol: String, tablePrefix: String, k: Int): Unit = {
    val spark = batch.sparkSession
    val hashT = tablePrefix + "_kmv_hashes"
    val estT = tablePrefix + "_kmv_est"
    if (!committed(spark, estT, batchId)) graft.core.CacheRegistry.scoped {
      val b = graft.core.CacheRegistry.persistTracked(batch)
      val nNew = b.count()
      if (nNew > 0) {
        // heal a half-swapped compaction BEFORE the raw append (the
        // appendByBatch invariant): a crashed compactKmv can leave the
        // standing table absent/empty with the survivor under
        // __cpt_old; an unguarded append would recreate it holding
        // only this batch's hashes and the next recoverSwap would then
        // drop the survivor — silent loss of all prior sketch state.
        recoverSwap(spark, hashT)
        graft.functions.KmvSketch
          .bottomKAgg(b, keyCol, k, Seq(groupCol))
          .select(col(groupCol), col("hash"))
          .coalesce(1) // ≤ k rows per group — one file per trigger
          .write.mode("append").format("parquet").saveAsTable(hashT)
        spark.catalog.refreshTable(hashT)
        val collapsed = graft.functions.KmvSketch
          .rerank(spark.table(hashT), k, Seq(groupCol))
        appendByBatch(
          graft.functions.KmvSketch.estimate(collapsed, k, Seq(groupCol))
            .select(lit(batchId).as("batch_id"), col(groupCol), col("est"),
              lit(nNew).as("n_new")),
          estT, bounded = false)
      }
    }
  }

  /**
   * Compact the KMV standing hash table to its bottom-k collapse —
   * ≤ k rows per group TOTAL instead of ≤ k per trigger. Replay stays
   * correct because KMV is closed under union: bottom-k(compacted ∪
   * replayed-dupes ∪ future) = bottom-k(all appends) — hashes above
   * the k-th per group can never re-enter any future bottom-k, so
   * dropping them commutes with every future merge. No batch
   * provenance needed or kept (the [[compactHll]] argument, with
   * set-union replacing max).
   */
  def compactKmv(spark: SparkSession, tablePrefix: String, k: Int): Unit = {
    val hashT = tablePrefix + "_kmv_hashes"
    recoverSwap(spark, hashT)
    if (!spark.catalog.tableExists(hashT)) return
    val t = spark.table(hashT)
    val groupCols = t.columns.filterNot(_ == "hash").toSeq
    rewrite(spark, hashT,
      graft.functions.KmvSketch.rerank(t, k, groupCols)
        .select(t.columns.map(col): _*))
  }

  /**
   * Streaming RANK-error quantile monitor — the
   * [[graft.functions.QuantileSketch]] bottom-k-by-hash sample as the
   * standing state unit, closing [[histQuantileIngest]]'s domain-width
   * gap: no `width` knob, error in rank units (DKW ε = sqrt(ln(2/δ)/2k))
   * whatever the value distribution. Each trigger folds the batch's own
   * ≤ k-pair sample per group into a standing sample table and appends
   * one p50/p90 estimate row per group.
   *
   * Tables: `<prefix>_qsk_sample` (group, hash, val) is APPEND-ONLY —
   * readers collapse with DISTINCT + re-rank ≤ k on (hash, val)
   * (closure under union, the KMV argument: a pair outside a side's
   * bottom-k is outside the union's). Replay needs no guard here: a
   * crash-replayed trigger appends byte-identical (hash, val) rows
   * that vanish in the DISTINCT. `<prefix>_qsk_q`
   * (batch_id, group, m, p50, p90, n_new) holds the estimate
   * trajectory; it IS batch-id replay-guarded and written LAST
   * (marks-write-last).
   *
   * Per-trigger cost: one map-side-bounded MinKSample aggregation over
   * the batch (≤ k pairs per group reach the shuffle) + a collapse of
   * the standing table (≤ k × triggers-since-compaction rows per
   * group; `compactEvery` keeps it ≤ 2k amortized).
   */
  def qskIngest(stream: DataFrame, idCol: String, valCol: String,
                groupCol: String, tablePrefix: String, k: Int = 256,
                checkpoint: Option[String] = None,
                compactEvery: Int = 8): StreamingQuery = {
    val writer = stream.writeStream.outputMode("append")
    checkpoint.foreach(cp => writer.option("checkpointLocation", cp))
    writer.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      applyBatchQsk(batch.toDF(), batchId, idCol, valCol, groupCol,
        tablePrefix, k)
      if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
        compactQsk(batch.sparkSession, tablePrefix, k)
    }.start()
  }

  /** One quantile-sketch trigger's work, exposed for direct
    * at-least-once testing (the [[applyBatch]] convention). */
  def applyBatchQsk(batch: DataFrame, batchId: Long, idCol: String,
                    valCol: String, groupCol: String, tablePrefix: String,
                    k: Int): Unit = {
    val spark = batch.sparkSession
    val sampleT = tablePrefix + "_qsk_sample"
    val estT = tablePrefix + "_qsk_q"
    if (!committed(spark, estT, batchId)) graft.core.CacheRegistry.scoped {
      val b = graft.core.CacheRegistry.persistTracked(batch)
      val nNew = b.count()
      if (nNew > 0) {
        // heal a half-swapped compaction BEFORE the raw append (the
        // appendByBatch invariant — see applyBatchKmv)
        recoverSwap(spark, sampleT)
        graft.functions.QuantileSketch
          .bottomKSampleAgg(b, idCol, valCol, k, Seq(groupCol))
          .select(col(groupCol), col("hash"), col("val"))
          .coalesce(1) // ≤ k rows per group — one file per trigger
          .write.mode("append").format("parquet").saveAsTable(sampleT)
        spark.catalog.refreshTable(sampleT)
        val collapsed = graft.functions.QuantileSketch
          .resample(spark.table(sampleT), k, Seq(groupCol))
        appendByBatch(
          graft.functions.QuantileSketch.estimateQuantiles(collapsed,
              Seq("p50" -> 0.5, "p90" -> 0.9), Seq(groupCol))
            .select(lit(batchId).as("batch_id"), col(groupCol), col("m"),
              col("p50"), col("p90"), lit(nNew).as("n_new")),
          estT, bounded = false)
      }
    }
  }

  /**
   * Compact the standing sample table to its bottom-k collapse — ≤ k
   * rows per group TOTAL instead of ≤ k per trigger. Replay stays
   * correct by closure under union (the [[compactKmv]] argument with
   * (hash, val) pairs replacing hashes): a pair above the k-th per
   * group can never re-enter any future bottom-k, so dropping it
   * commutes with every future merge.
   */
  def compactQsk(spark: SparkSession, tablePrefix: String, k: Int): Unit = {
    val sampleT = tablePrefix + "_qsk_sample"
    recoverSwap(spark, sampleT)
    if (!spark.catalog.tableExists(sampleT)) return
    val t = spark.table(sampleT)
    val groupCols = t.columns.filterNot(c => c == "hash" || c == "val").toSeq
    rewrite(spark, sampleT,
      graft.functions.QuantileSketch.resample(t, k, groupCols)
        .select(t.columns.map(col): _*))
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
  /** `compactEvery` as in [[hllIngest]] — in-trigger auto-compaction of
    * the position table every N committed batches. */
  def bloomNoveltyIngest(stream: DataFrame, keyCol: String,
                         tablePrefix: String, k: Int, m: Int,
                         checkpoint: Option[String] = None,
                         compactEvery: Int = 8): StreamingQuery = {
    val writer = stream.writeStream.outputMode("append")
    checkpoint.foreach(cp => writer.option("checkpointLocation", cp))
    writer.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      applyBloomBatch(batch.toDF(), batchId, keyCol, tablePrefix, k, m)
      if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
        compactBloom(batch.sparkSession, tablePrefix)
    }.start()
  }

  /** One novelty-gate trigger, exposed for direct at-least-once testing. */
  def applyBloomBatch(batch: DataFrame, batchId: Long, keyCol: String,
                      tablePrefix: String, k: Int, m: Int): Unit = {
    val spark = batch.sparkSession
    val posT = tablePrefix + "_bloom_pos"
    val novT = tablePrefix + "_bloom_novel"
    if (!committed(spark, novT, batchId)) graft.core.CacheRegistry.scoped {
      val keys = graft.core.CacheRegistry.persistTracked(
        batch.filter(col(keyCol).isNotNull).select(keyCol).distinct())
      if (keys.count() > 0) {
        appendByBatch(
          graft.functions.BloomSketch.positions(keys, keyCol, k, m)
            .select(lit(batchId).as("batch_id"), col("pos")),
          posT, bounded = true)
        spark.catalog.refreshTable(posT)
        val priorT = spark.table(posT)
        val prior = priorT.filter(bcol(priorT) < batchId)
          .select("pos").distinct()
        appendByBatch(
          graft.functions.BloomSketch.mightContain(keys, keyCol, prior, k, m)
            .select(lit(batchId).as("batch_id"), col(keyCol),
              (!col("might_contain")).as("novel")),
          novT, bounded = false)
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
  /** `compactEvery` as in [[hllIngest]] — in-trigger auto-compaction of
    * the bucket + candidate tables every N committed batches. */
  def cmsIngest(stream: DataFrame, keyCol: String, tablePrefix: String,
                d: Int, w: Int, topN: Int,
                checkpoint: Option[String] = None,
                compactEvery: Int = 8): StreamingQuery = {
    val writer = stream.writeStream.outputMode("append")
    checkpoint.foreach(cp => writer.option("checkpointLocation", cp))
    writer.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      applyCmsBatch(batch.toDF(), batchId, keyCol, tablePrefix, d, w, topN)
      if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
        compactCms(batch.sparkSession, tablePrefix)
    }.start()
  }

  /** One frequency-monitor trigger, exposed for at-least-once testing. */
  def applyCmsBatch(batch: DataFrame, batchId: Long, keyCol: String,
                    tablePrefix: String, d: Int, w: Int, topN: Int): Unit = {
    val spark = batch.sparkSession
    val cntT = tablePrefix + "_cms_cnt"
    val candT = tablePrefix + "_cms_cand"
    val estT = tablePrefix + "_cms_est"
    if (!committed(spark, estT, batchId)) graft.core.CacheRegistry.scoped {
      val counts = graft.core.CacheRegistry.persistTracked(
        batch.filter(col(keyCol).isNotNull)
          .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt")))
      if (counts.count() > 0) {
        appendByBatch(
          counts.select(posexplode(array((0 until d).map(j =>
              graft.functions.CountMinSketch.hashIdxCol(j, col(keyCol), w)): _*))
              .as(Seq("j", "pos")), col("cnt"))
            .groupBy(col("j"), col("pos")).agg(sum(col("cnt")).as("cnt"))
            .select(lit(batchId).as("batch_id"), col("j"), col("pos"),
              col("cnt")),
          cntT, bounded = true)
        appendByBatch(
          counts.orderBy(desc("cnt"), col(keyCol)).limit(topN)
            .select(lit(batchId).as("batch_id"), col(keyCol).as("key")),
          candT, bounded = true)
        spark.catalog.refreshTable(cntT)
        spark.catalog.refreshTable(candT)
        val cntTbl = spark.table(cntT)
        val buckets = cntTbl.filter(bcol(cntTbl) <= batchId)
          .dropDuplicates("batch_id", "j", "pos")
          .groupBy(col("j"), col("pos")).agg(sum(col("cnt")).as("cnt"))
        val candTbl = spark.table(candT)
        val cand = candTbl.filter(bcol(candTbl) <= batchId)
          .select(col("key")).distinct()
        appendByBatch(
          cand.select(col("key"), posexplode(array((0 until d).map(j =>
              graft.functions.CountMinSketch.hashIdxCol(j, col("key"), w)): _*))
              .as(Seq("j", "pos")))
            .join(broadcast(buckets), Seq("j", "pos"), "left")
            .groupBy(col("key"))
            .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
            .select(lit(batchId).as("batch_id"), col("key"), col("est")),
          estT, bounded = false)
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
    if (!committed(spark, estT, batchId)) graft.core.CacheRegistry.scoped {
      val b = graft.core.CacheRegistry.persistTracked(batch)
      val nNew = b.count()
      if (nNew > 0) {
        // heal a half-swapped compactHll BEFORE the raw append (the
        // applyBatchKmv guard): an unguarded append after a crashed
        // swap would recreate the regs table holding only this batch's
        // registers and the next recoverSwap would drop the survivor
        recoverSwap(spark, regsT)
        graft.functions.HyperLogLog
          .registers(b, keyCol, Seq(groupCol))
          .coalesce(1) // ≤ 64 rows per group — one file per trigger
          .write.mode("append").format("parquet").saveAsTable(regsT)
        spark.catalog.refreshTable(regsT)
        val merged = spark.table(regsT)
          .groupBy(col(groupCol), col("reg"))
          .agg(max(col("rho")).as("rho"))
        appendByBatch(
          graft.functions.HyperLogLog.estimate(merged, Seq(groupCol))
            .select(lit(batchId).as("batch_id"), col(groupCol), col("est"),
              lit(nNew).as("n_new")),
          estT, bounded = false)
      }
    }
  }

  /**
   * Compact the HLL standing register table to its 64-rows-per-group
   * collapse — the maintenance pass a week-long monitor needs (the
   * append-only table grows 64×groups rows per trigger; the collapsed
   * form is 64×groups TOTAL). Replay stays correct because register
   * state is a pure max: max(compacted, replayed-dupes) = max(all
   * appends) — compaction commutes with every future merge, so no
   * batch provenance is needed or kept. Run between triggers (like any
   * OPTIMIZE); the estimate trajectory table is untouched.
   */
  def compactHll(spark: SparkSession, tablePrefix: String): Unit = {
    val regsT = tablePrefix + "_hll_regs"
    recoverSwap(spark, regsT)
    if (!spark.catalog.tableExists(regsT)) return
    val t = spark.table(regsT)
    val keys = t.columns.filterNot(_ == "rho") // (groupCols…, reg)
    rewrite(spark, regsT,
      t.groupBy(keys.map(col): _*).agg(max(col("rho")).as("rho"))
        .select(t.columns.map(col): _*))
  }

  /**
   * Compact the Bloom position table: batches whose novelty rows have
   * COMMITTED (batch_id ≤ max batch in `_bloom_novel`) collapse to
   * their distinct positions under a single provenance tag = that max
   * committed id; later (possibly in-flight) batches pass through
   * untouched. The probe's `batch_id < b` argument survives: any
   * future or crash-replayed batch b is > maxCommitted, so it sees the
   * compacted rows exactly as it would have seen their constituents,
   * and an in-flight batch's own orphan positions keep their original
   * id and stay excluded from its replayed probe. Output: ≤ m rows for
   * the compacted span + untouched recents.
   */
  def compactBloom(spark: SparkSession, tablePrefix: String): Unit = {
    val posT = tablePrefix + "_bloom_pos"
    val novT = tablePrefix + "_bloom_novel"
    recoverSwap(spark, posT)
    if (!spark.catalog.tableExists(posT) ||
        !spark.catalog.tableExists(novT)) return
    val maxRow = spark.table(novT).agg(max(col("batch_id"))).head()
    if (maxRow.isNullAt(0)) return
    val maxC = maxRow.getLong(0)
    val pos = spark.table(posT)
    val compacted = pos.filter(bcol(pos) <= maxC)
      .select("pos").distinct()
      .select(lit(maxC).as("batch_id"), col("pos"))
      .unionByName(pos.filter(bcol(pos) > maxC).select("batch_id", "pos"))
      .withColumn(PB, col("batch_id"))
    rewrite(spark, posT, compacted)
  }

  /**
   * Compact the CMS bucket + candidate tables: batches with a
   * COMMITTED estimate row (batch_id ≤ max batch in `_cms_est`)
   * collapse — buckets to one summed row per (j, pos) (after the
   * reader's own dropDuplicates, so crash-replay dupes inside the span
   * fold exactly once), candidates to their distinct keys — both under
   * the max committed id; later batches pass through. The reader
   * algebra survives: dedupe-then-sum over {compacted span} ∪
   * {untouched recents} equals dedupe-then-sum over the raw history
   * (sum is associative over the disjoint batch ranges), and a
   * replayed in-flight batch's `batch_id ≤ b` filter sees the
   * compacted rows iff it saw their constituents.
   */
  def compactCms(spark: SparkSession, tablePrefix: String): Unit = {
    val cntT = tablePrefix + "_cms_cnt"
    val candT = tablePrefix + "_cms_cand"
    val estT = tablePrefix + "_cms_est"
    recoverSwap(spark, cntT)
    recoverSwap(spark, candT)
    if (!spark.catalog.tableExists(cntT) ||
        !spark.catalog.tableExists(estT)) return
    val maxRow = spark.table(estT).agg(max(col("batch_id"))).head()
    if (maxRow.isNullAt(0)) return
    val maxC = maxRow.getLong(0)
    val cnt = spark.table(cntT)
    rewrite(spark, cntT,
      cnt.filter(bcol(cnt) <= maxC)
        .dropDuplicates("batch_id", "j", "pos")
        .groupBy(col("j"), col("pos")).agg(sum(col("cnt")).as("cnt"))
        .select(lit(maxC).as("batch_id"), col("j"), col("pos"), col("cnt"))
        .unionByName(cnt.filter(bcol(cnt) > maxC)
          .select("batch_id", "j", "pos", "cnt"))
        .withColumn(PB, col("batch_id")))
    if (spark.catalog.tableExists(candT)) {
      val cand = spark.table(candT)
      rewrite(spark, candT,
        cand.filter(bcol(cand) <= maxC).select("key").distinct()
          .select(lit(maxC).as("batch_id"), col("key"))
          .unionByName(cand.filter(bcol(cand) > maxC)
            .select("batch_id", "key"))
          .withColumn(PB, col("batch_id")))
    }
  }

  /**
   * Streaming QUANTILE monitor: every micro-batch folds its values into
   * a standing fixed-grid histogram (bucket = ⌊value/width⌋ per group)
   * and appends one quantile-trajectory row per group — "what are p50 /
   * p90 / p99 of X per source, continuously" without ever retaining the
   * values. The histogram is the production mergeable-quantile sketch
   * whose error model is the simplest possible: estimates are exact
   * bucket LOWER EDGES, so the error is bounded by `width` by
   * construction, and every estimate is pure integer arithmetic —
   * bit-replayable by any engine, unlike interpolating sketches
   * (t-digest/KLL) whose merge order changes the answer.
   *
   * Tables: `<prefix>_hist_cnt` (batch_id, group, bucket, cnt) carries
   * batch provenance; readers collapse with
   * dropDuplicates(batch_id, group, bucket) + sum — crash-replayed
   * appends are byte-identical and vanish in the dedup (the
   * [[cmsIngest]] count argument verbatim). `<prefix>_hist_q`
   * (batch_id, group, n, p50, p90, p99) is the replay guard, written
   * LAST (marks-write-last).
   *
   * Per-trigger cost: one batch-sized (group, bucket) aggregation —
   * ≤ groups × (domain/width) rows out of the shuffle — plus a collapse
   * of the standing table (same bound × triggers-since-compaction;
   * `compactEvery` keeps it ×2 amortized). State is O(groups ×
   * domain/width) forever — the quantile twin of the CMS frequency
   * monitor's O(d×w).
   */
  def histQuantileIngest(stream: DataFrame, valCol: String,
                         groupCol: String, tablePrefix: String,
                         width: Double,
                         checkpoint: Option[String] = None,
                         compactEvery: Int = 8): StreamingQuery = {
    val writer = stream.writeStream.outputMode("append")
    checkpoint.foreach(cp => writer.option("checkpointLocation", cp))
    writer.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      applyHistBatch(batch.toDF(), batchId, valCol, groupCol, tablePrefix,
        width)
      if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
        compactHist(batch.sparkSession, tablePrefix)
    }.start()
  }

  /** One quantile-monitor trigger, exposed for at-least-once testing.
    *
    * The estimate rule is exact-integer: with per-group total `n` and
    * running bucket count `cum`, the q-percent quantile is the lower
    * edge of the first bucket where `cum·100 ≥ q·n` — the integer form
    * of `cum ≥ ⌈q·n/100⌉`, no division, no interpolation, no floats
    * until the final `bucket × width` edge. */
  def applyHistBatch(batch: DataFrame, batchId: Long, valCol: String,
                     groupCol: String, tablePrefix: String,
                     width: Double): Unit = {
    val spark = batch.sparkSession
    val cntT = tablePrefix + "_hist_cnt"
    val qT = tablePrefix + "_hist_q"
    if (!committed(spark, qT, batchId)) graft.core.CacheRegistry.scoped {
      val counts = graft.core.CacheRegistry.persistTracked(
        batch.filter(col(valCol).isNotNull)
          .groupBy(col(groupCol),
            floor(col(valCol) / width).cast("long").as("bucket"))
          .agg(count(lit(1)).as("cnt")))
      if (counts.count() > 0) {
        appendByBatch(
          counts.select(lit(batchId).as("batch_id"), col(groupCol),
            col("bucket"), col("cnt")),
          cntT, bounded = true)
        spark.catalog.refreshTable(cntT)
        val cntTbl = spark.table(cntT)
        val collapsed = cntTbl.filter(bcol(cntTbl) <= batchId)
          .dropDuplicates("batch_id", groupCol, "bucket")
          .groupBy(col(groupCol), col("bucket"))
          .agg(sum(col("cnt")).as("cnt"))
        val wAll = org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol))
        val wCum = wAll.orderBy(col("bucket"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window
            .currentRow)
        val cum = collapsed
          .withColumn("cum", sum(col("cnt")).over(wCum))
          .withColumn("n", sum(col("cnt")).over(wAll))
        def qEdge(q: Int): org.apache.spark.sql.Column =
          min(when(col("cum") * 100 >= col("n") * q,
            col("bucket").cast("double") * width))
        appendByBatch(
          cum.groupBy(col(groupCol))
            .agg(max(col("n")).as("n"), qEdge(50).as("p50"),
              qEdge(90).as("p90"), qEdge(99).as("p99"))
            .select(lit(batchId).as("batch_id"), col(groupCol), col("n"),
              col("p50"), col("p90"), col("p99")),
          qT, bounded = false)
      }
    }
  }

  /**
   * Streaming CUSUM shift monitor — the SEQUENTIAL member of the
   * streaming drift family ([[graft.streaming.DriftMonitor]] covers the
   * distributional PSI/KS side; CUSUM catches a mean shift that never
   * reshapes the histogram). State is the per-(group, day) SUFFICIENT
   * STATISTICS (integer micro-unit sum + count), so it is bounded by
   * calendar × groups, mergeable by addition, and replay-dedupable —
   * the values themselves are never retained. Every trigger re-derives
   * the full CUSUM trajectory from the collapsed dailies via the
   * [[graft.ops.Windows.cusum]] prefix-sum unrolling (a days-sized
   * window pass, never a scan of the raw feed) and appends one
   * (batch_id, group, n_days, max_up, max_dn) row.
   *
   * Tables: `<prefix>_cusum_daily` (batch_id, group, day, s_micro, c)
   * carries batch provenance; readers collapse with
   * dropDuplicates(batch_id, group, day) + sum. The micro-unit sum is
   * an INTEGER (⌊value·10⁶⌋ summed as longs), so replayed appends are
   * byte-identical regardless of shuffle order — the [[cmsIngest]]
   * count argument holds without any float caveat.
   * `<prefix>_cusum_traj` is the replay guard, written LAST.
   */
  def cusumIngest(stream: DataFrame, valCol: String, dayCol: String,
                  groupCol: String, tablePrefix: String,
                  slack: Double = 0d,
                  checkpoint: Option[String] = None,
                  compactEvery: Int = 8): StreamingQuery = {
    val writer = stream.writeStream.outputMode("append")
    checkpoint.foreach(cp => writer.option("checkpointLocation", cp))
    writer.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      applyCusumBatch(batch.toDF(), batchId, valCol, dayCol, groupCol,
        tablePrefix, slack)
      if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
        compactCusum(batch.sparkSession, tablePrefix)
    }.start()
  }

  /** One CUSUM-monitor trigger, exposed for at-least-once testing. */
  def applyCusumBatch(batch: DataFrame, batchId: Long, valCol: String,
                      dayCol: String, groupCol: String,
                      tablePrefix: String, slack: Double): Unit = {
    val spark = batch.sparkSession
    val dailyT = tablePrefix + "_cusum_daily"
    val trajT = tablePrefix + "_cusum_traj"
    if (!committed(spark, trajT, batchId)) graft.core.CacheRegistry.scoped {
      val counts = graft.core.CacheRegistry.persistTracked(
        batch.filter(col(valCol).isNotNull)
          .groupBy(col(groupCol), col(dayCol).as("day"))
          .agg(sum(floor(col(valCol) * 1e6).cast("long")).as("s_micro"),
            count(lit(1)).as("c")))
      if (counts.count() > 0) {
        appendByBatch(
          counts.select(lit(batchId).as("batch_id"), col(groupCol),
            col("day"), col("s_micro"), col("c")),
          dailyT, bounded = true)
        spark.catalog.refreshTable(dailyT)
        val t = spark.table(dailyT)
        val daily = t.filter(bcol(t) <= batchId)
          .dropDuplicates("batch_id", groupCol, "day")
          .groupBy(col(groupCol), col("day"))
          .agg(sum(col("s_micro")).as("s"), sum(col("c")).as("c"))
          .withColumn("x", col("s").cast("double") / lit(1e6) / col("c"))
        val mu = avg(col("x")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol)))
        val scored = graft.ops.Windows.cusum(
          daily.withColumn("mu", mu), Seq(groupCol), "day", "x",
          mean = col("mu"), slack = lit(slack))
        appendByBatch(
          scored.groupBy(col(groupCol))
            .agg(count(lit(1)).as("n_days"),
              round(max(col("cusum_up")) + lit(1e-9), 6).as("max_up"),
              round(max(col("cusum_down")) + lit(1e-9), 6).as("max_dn"))
            .select(lit(batchId).as("batch_id"), col(groupCol),
              col("n_days"), col("max_up"), col("max_dn")),
          trajT, bounded = false)
      }
    }
  }

  /** Compact the CUSUM daily-statistics table — the [[compactHist]]
    * fold with (s_micro, c) sums in place of the single count. Same
    * replay proof: only batches whose guard rows exist are folded. */
  def compactCusum(spark: SparkSession, tablePrefix: String): Unit = {
    val dailyT = tablePrefix + "_cusum_daily"
    val trajT = tablePrefix + "_cusum_traj"
    recoverSwap(spark, dailyT)
    if (!spark.catalog.tableExists(dailyT) ||
        !spark.catalog.tableExists(trajT)) return
    val maxRow = spark.table(trajT).agg(max(col("batch_id"))).head()
    if (maxRow.isNullAt(0)) return
    val maxC = maxRow.getLong(0)
    val t = spark.table(dailyT)
    val groupCol = t.columns
      .filterNot(Set("batch_id", "day", "s_micro", "c", PB)).head
    rewrite(spark, dailyT,
      t.filter(bcol(t) <= maxC)
        .dropDuplicates("batch_id", groupCol, "day")
        .groupBy(col(groupCol), col("day"))
        .agg(sum(col("s_micro")).as("s_micro"), sum(col("c")).as("c"))
        .select(lit(maxC).as("batch_id"), col(groupCol), col("day"),
          col("s_micro"), col("c"))
        .unionByName(t.filter(bcol(t) > maxC)
          .select("batch_id", groupCol, "day", "s_micro", "c"))
        .withColumn(PB, col("batch_id")))
  }

  /**
   * Compact the histogram count table: rows with batch_id ≤ the max
   * COMMITTED quantile row collapse to one summed row per (group,
   * bucket) tagged with that max batch_id; uncommitted later appends
   * pass through untouched. Replay stays correct for the same reason as
   * [[compactCms]]: a trigger b ≤ maxCommitted can only replay if its
   * guard row were missing — and maxCommitted is read from the guard
   * table itself, so every folded batch's guard row exists and the
   * `committed` check skips the replay before it can append against the
   * merged row.
   */
  def compactHist(spark: SparkSession, tablePrefix: String): Unit = {
    val cntT = tablePrefix + "_hist_cnt"
    val qT = tablePrefix + "_hist_q"
    recoverSwap(spark, cntT)
    if (!spark.catalog.tableExists(cntT) ||
        !spark.catalog.tableExists(qT)) return
    val maxRow = spark.table(qT).agg(max(col("batch_id"))).head()
    if (maxRow.isNullAt(0)) return
    val maxC = maxRow.getLong(0)
    val cnt = spark.table(cntT)
    val groupCol = cnt.columns
      .filterNot(Set("batch_id", "bucket", "cnt", PB)).head
    rewrite(spark, cntT,
      cnt.filter(bcol(cnt) <= maxC)
        .dropDuplicates("batch_id", groupCol, "bucket")
        .groupBy(col(groupCol), col("bucket"))
        .agg(sum(col("cnt")).as("cnt"))
        .select(lit(maxC).as("batch_id"), col(groupCol), col("bucket"),
          col("cnt"))
        .unionByName(cnt.filter(bcol(cnt) > maxC)
          .select("batch_id", groupCol, "bucket", "cnt"))
        .withColumn(PB, col("batch_id")))
  }
}
