package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.Similarity

/**
 * Streaming EMBEDDING ingest with semantic near-dup gating — the
 * embedding-space twin of [[CorpusIngest.nearDupIngest]]: vectors
 * arrive as micro-batches, each batch drops vectors whose cosine
 * against an already-accepted vector in the same sign-LSH bucket
 * reaches `tau` (SemDeDup's criterion, restricted to bucket collisions
 * — the bucket is part of the operator's semantics, exactly as in
 * `ext_embed_neardup`), applies the within-batch lower-id-dominator
 * rule over the base-surviving vectors, and GROWS the persisted
 * bucket-keyed vector index by the survivors.
 *
 * Reference scope: the reference's pipelines are batch-scheduled
 * (`1_AWS/README.md:37` `@daily`); a continuous embedding-dedup ingest
 * is the streaming extension of the same daily cycle, in the same
 * spirit as [[CorpusIngest]].
 *
 * Scale shape: per trigger the candidate join reads the standing index
 * IN PLACE (the `_vecs` table is bucketed on the LSH bucket column, so
 * the corpus side plans with no Exchange) and scores only same-bucket
 * pairs; the within-batch pass self-joins the (tiny) batch on bucket.
 * Standing state is one row per accepted vector keyed by its bucket —
 * O(dim) per doc, append-only via
 * [[graft.core.Materialize.bucketAppend]], compactable via
 * `bucketCompact`. Per-trigger work is O(batch × colliding bucket
 * rows), never a corpus rescan — the property that lets the ingest
 * run forever.
 *
 * Exactly-once: same two-table ordering discipline as
 * [[CorpusIngest.applyNearDupBatch]] — the `_ids` write (which carries
 * the `__last_batch` replay watermark) happens LAST, so a crash
 * between the index append and the ids write replays the whole step.
 * Replay of a partially-applied batch is EXACT: accepted ids never
 * re-enter (id anti-join), the vs-accepted join excludes same-id pairs
 * (a survivor whose index row already landed is not dropped against
 * itself), and survivors are pairwise non-similar under the dominator
 * rule, so no OTHER replayed index row can drop them either;
 * re-appended index rows are duplicates the EXISTS-style drop absorbs.
 */
object VectorIngest {

  /** The per-trigger gate, exposed for testing: survivors of `batch`
    * against the standing index + within-batch dominator rule.
    * `banded` must carry (idCol, __e double-array, bucket). */
  private def survivorsOf(banded: DataFrame, index: DataFrame,
                          idCol: String, tau: Double): DataFrame = {
    val scored = banded.join(
        index.select(col("bucket"), col(idCol).as("__aid"), col("__e").as("__ae")),
        Seq("bucket"))
      .filter(col("__aid") =!= col(idCol))
      .filter(round(Similarity.cosineNative(col("__e"), col("__ae")) + lit(1e-9), 6)
        >= tau)
      .select(col(idCol)).distinct()
    val fr = graft.core.CacheRegistry.persistTracked(
      banded.join(scored, Seq(idCol), "left_anti"))
    val lower = fr.select(col("bucket"), col(idCol).as("__ia"), col("__e").as("__ea"))
    val dominated = fr.join(lower, Seq("bucket"))
      .filter(col("__ia") < col(idCol))
      .filter(round(Similarity.cosineNative(col("__e"), col("__ea")) + lit(1e-9), 6)
        >= tau)
      .select(col(idCol)).distinct()
    fr.join(dominated, Seq(idCol), "left_anti")
  }

  /**
   * Apply one micro-batch of vectors to the accepted index. Returns the
   * new replay watermark; `knownLast` short-circuits the once-per-run
   * watermark read exactly as in [[CorpusIngest.applyBatch]].
   */
  def applyEmbedBatch(batch: Dataset[Row], batchId: Long, idCol: String,
                      vecCol: String, prefix: String,
                      tau: Double = 0.99, bits: Int = 4,
                      knownLast: Option[Long] = None): Long = {
    val spark = batch.sparkSession
    val idsT = s"${prefix}_ids"
    val vecsT = s"${prefix}_vecs"
    val lastApplied = knownLast.getOrElse(CorpusIngest.lastAppliedIn(spark, idsT))
    if (batchId > lastApplied) graft.core.CacheRegistry.scoped {
      graft.functions.GraftFunctions.register(spark)
      def banded(df: DataFrame): DataFrame = df
        .select(col(idCol), Similarity.asDouble(col(vecCol)).as("__e"))
        .withColumn("bucket", Similarity.bucketId(col("__e"), bits))
        .select(col(idCol), col("__e"), col("bucket"))
      if (!spark.catalog.tableExists(vecsT))
        // seed an EMPTY index with the right schema so every batch takes
        // the same gate-then-append path
        graft.core.Materialize.bucketTable(spark, vecsT,
          banded(batch.limit(0).toDF()), buckets = 8, bucketCols = Seq("bucket"))
      val batchNew =
        if (!spark.catalog.tableExists(idsT)) batch.toDF()
        else batch.join(spark.table(idsT).select(col(idCol)), Seq(idCol), "left_anti")
      val b = graft.core.CacheRegistry.persistTracked(banded(batchNew))
      // EAGER lineage cut before the append: the survivor plan reads the
      // very table the append mutates
      val surv = survivorsOf(b, spark.table(vecsT), idCol, tau).localCheckpoint()
      graft.core.Materialize.bucketAppend(spark, vecsT,
        surv.select(col(idCol), col("__e"), col("bucket")),
        buckets = 8, bucketCols = Seq("bucket"))
      spark.catalog.refreshTable(vecsT)
      // watermark write LAST (replay-exactness argument in the scaladoc)
      surv.select(col(idCol)).withColumn("__last_batch", lit(batchId))
        .write.mode("append").saveAsTable(idsT)
      spark.catalog.refreshTable(idsT)
    }
    math.max(batchId, lastApplied)
  }

  /** Streaming wrapper: replay watermark seeded from the ids table on
    * the first trigger (covers restart-from-checkpoint), then held in
    * memory. */
  def embedIngest(vecs: DataFrame, idCol: String, vecCol: String,
                  prefix: String, tau: Double = 0.99, bits: Int = 4,
                  checkpoint: Option[String] = None): StreamingQuery = {
    val guard = new java.util.concurrent.atomic.AtomicReference[Option[Long]](None)
    val w = vecs.writeStream
    checkpoint.fold(w)(c => w.option("checkpointLocation", c))
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        guard.set(Some(applyEmbedBatch(batch, batchId, idCol, vecCol,
          prefix, tau, bits, guard.get())))
      }.start()
  }
}
