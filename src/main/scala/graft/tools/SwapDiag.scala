package graft.tools

import org.apache.spark.sql.functions._

/**
 * Scratch diagnostic (not library surface): pin what a catalog RENAME
 * does to partition metadata in this metastore, because the compaction
 * swap's crash recovery depends on it (ADVICE r10,
 * [[graft.streaming.SketchIngest]] `survivorHasData`).
 *
 * Measured behavior (this fixed the design of the recovery probe):
 *  - RENAME moves a managed table's directory and updates its TABLE
 *    location, but leaves PARTITION locations pointing at the pre-move
 *    paths.
 *  - A partitioned table with exactly ONE write since creation lists
 *    through catalog partition metadata → after a rename its catalog
 *    read is EMPTY (stale paths).
 *  - A table with ≥2 appends flips to table-location listing → after a
 *    rename its catalog read still sees the moved files.
 * So a catalog read of `__cpt_old` is UNRELIABLE — empty, the real
 * data, or the new generation depending on write history — and the
 * recovery gate must probe the survivor's filesystem location instead.
 */
object SwapDiag {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(8, "graft-swapdiag")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // N appends → rename → catalog read of the renamed-away table
    def bloomScenario(tag: String, batches: Int): Unit = {
      val pp = s"swapdiag_bl_$tag"
      for (tb <- Seq("_bloom_pos", "_bloom_novel"); s <- Seq("", "__cpt_old"))
        graft.core.Materialize.dropWithLocation(spark, pp + tb + s)
      val chunks = Seq(Seq("u1", "u2", "u3"), Seq("u2", "u4"), Seq("u5"))
      (0 until batches).foreach { i =>
        graft.streaming.SketchIngest.applyBloomBatch(
          chunks(i).toDF("key"), i.toLong, "key", pp, 4, 4096)
      }
      val tpos = pp + "_bloom_pos"
      val real = spark.table(tpos).count()
      spark.sql(s"ALTER TABLE `$tpos` RENAME TO `${tpos}__cpt_old`")
      val c = try spark.table(tpos + "__cpt_old").count()
              catch { case _: Exception => -1L }
      println(s"[bloom_$tag] writes=$batches real=$real " +
        s"renamed-away catalog read=$c " +
        (if (c == real) "(location-listed: sees moved files)"
         else "(catalog-partition-listed: STALE, reads empty)"))
      for (tb <- Seq("_bloom_pos", "_bloom_novel"); s <- Seq("", "__cpt_old"))
        graft.core.Materialize.dropWithLocation(spark, pp + tb + s)
    }
    bloomScenario("b1", 1)
    bloomScenario("b2", 2)
    bloomScenario("b3", 3)
    spark.stop()
  }
}
