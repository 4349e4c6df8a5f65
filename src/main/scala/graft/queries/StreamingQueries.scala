package graft.queries

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/**
 * Structured Streaming entries in the correctness table: the stream is
 * driven to completion (processAllAvailable over the fixture files) and
 * its materialized result must hash-match the BATCH oracle — the
 * exactly-once file-source guarantee, checked by DuckDB.
 */
object StreamingQueries {

  /**
   * Run a streaming drain with a smaller state-store shard count: each
   * shuffle partition is a state store instance with per-batch delta-file
   * I/O, so 32 shards of overhead dominate a fixture-sized drain. 8 is
   * plenty for the harness; a production feed sizes this to key
   * cardinality × executor count like any other shuffle.
   */
  private def withStatePartitions[T](s: org.apache.spark.sql.SparkSession,
                                     n: Int)(f: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  def defs: Seq[QueryDef] = Seq(

    // Watermarked event-time windowed aggregation, streamed to a memory
    // sink until the source is drained; tumbling 1h windows align to the
    // hour so the batch oracle is a date_trunc GROUP BY.
    QueryDef("st_windowed_stats", (s, dir) => withStatePartitions(s, 8) {
      val q = EventStream.windowedStats(EventStream.readEvents(s, dir),
          "1 hour", "2 hours")
        .writeStream.format("memory")
        .queryName("graft_st_windowed").outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      s.table("graft_st_windowed").select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        round(col("avg_value") + lit(1e-9), 6).as("avg_value"),
        col("max_value"))
    }, Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
        count(*) AS n_events, round(avg(value) + 1e-9, 6) AS avg_value,
        max(value) AS max_value
      FROM events GROUP BY 1, 2""")),

    // Stream-static join: the unbounded stream enriches against a
    // broadcast dimension (per-micro-batch hash join — the streaming J1).
    QueryDef("st_stream_static_join", (s, dir) => withStatePartitions(s, 8) {
      val dim = graft.core.Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))
      val q = EventStream.readEvents(s, dir)
        .withColumn("n_nationkey", col("user_id") % 25)
        .join(broadcast(dim), Seq("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n_events"))
        .writeStream.format("memory")
        .queryName("graft_st_dim_join").outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      s.table("graft_st_dim_join")
    }, Some("""SELECT n_name, count(*) AS n_events FROM events
      JOIN nation ON user_id % 25 = n_nationkey GROUP BY n_name""")),

    // Stream-stream interval join (click -> purchase attribution within
    // 30 min, per user), drained to completion == the batch self-join.
    QueryDef("st_stream_stream_join", (s, dir) => withStatePartitions(s, 8) {
      val ev = EventStream.readEvents(s, dir)
      val q = EventStream.clickToPurchase(
          ev.filter(col("event_type") === "click"),
          EventStream.readEvents(s, dir).filter(col("event_type") === "purchase"),
          windowMinutes = 30)
        .writeStream.format("memory")
        .queryName("graft_st_attrib").outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table("graft_st_attrib")
    }, Some("""SELECT c.event_id AS click_id, p.event_id AS purchase_id,
        c.user_id AS user_id
      FROM events c JOIN events p
        ON c.user_id = p.user_id
        AND c.event_type = 'click' AND p.event_type = 'purchase'
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE""")),

    // Streaming dedup drained to completion == batch dropDuplicates.
    QueryDef("st_dedup_stream", (s, dir) => withStatePartitions(s, 8) {
      val q = EventStream.dedupStream(EventStream.readEvents(s, dir),
          Seq("user_id"))
        .writeStream.format("memory")
        .queryName("graft_st_dedup").outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table("graft_st_dedup")
        .groupBy("user_id").agg(count(lit(1)).as("n_kept"))
    }, Some("""SELECT user_id, count(*) AS n_kept FROM (
        SELECT DISTINCT user_id, ts FROM events) GROUP BY user_id""")),

    // TRUE per-key streaming dedup (dropDuplicatesWithinWatermark): the
    // survivor row is arrival-order-dependent, so the registered output is
    // the survivor-independent KEY SET, which the batch oracle recomputes
    // as a plain DISTINCT.
    QueryDef("st_dedup_bykey", (s, dir) => withStatePartitions(s, 8) {
      val q = EventStream.dedupStreamByKey(EventStream.readEvents(s, dir),
          Seq("user_id"))
        .writeStream.format("memory")
        .queryName("graft_st_dedup_bykey").outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table("graft_st_dedup_bykey").select("user_id").distinct()
    }, Some("SELECT DISTINCT user_id FROM events"))
  )
}
