package graft

import org.apache.spark.sql.functions._

/** Scratch diagnostic for the incremental near-dup scaling curve:
  * prints band-bucket skew and candidate-pair counts at each
  * amplification step so superlinear time can be attributed. */
object ScaleDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "8").toInt
    val spark = graft.core.GraftSession.local(32, "graft-scalediag")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.Dedup

    val docs0 = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    for (m <- Seq(1, 2, 4, mult).distinct.sorted) {
      val docs = (0 until m).map { c =>
        if (c == 0) docs0
        else docs0.select((col("doc_id") + lit(c * 10000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"z${c}q$$1").as("text"))
      }.reduce(_ unionByName _)
        .transform(graft.core.CacheRegistry.persistTracked)
      val base = docs.filter(col("doc_id") % 3 =!= 0)
      // dup ids shift past the amplified max id (the winnow-probe rule):
      // a fixed offset collides once amplification × scale factor grows
      val maxId = docs.agg(max(col("doc_id")).cast("long")).head().getLong(0)
      val batch = docs.filter(col("doc_id") % 3 === 0)
        .unionByName(docs.filter(col("doc_id") % 5 === 1)
          .select((col("doc_id") + lit(maxId + 1L)).as("doc_id"),
            concat(col("text"), lit(" dup marker tail")).as("text")))
      val (bandBase, _) = Dedup.nearDupIndex(base, "doc_id", "text",
        numHashes = 64, bands = 32)
      val (bandBatch, _) = Dedup.nearDupIndex(batch, "doc_id", "text",
        numHashes = 64, bands = 32)
      val bb = bandBatch.groupBy("band", "band_hash").agg(count(lit(1)).as("n"))
        .transform(graft.core.CacheRegistry.persistTracked)
      val skew = bb.agg(max(col("n")), avg(col("n")),
        sum(col("n") * col("n"))).head()
      val candBase = bandBatch.join(
          bandBase.withColumnRenamed("doc_id", "base_id"),
          Seq("band", "band_hash"))
        .select("doc_id", "base_id").distinct().count()
      println(s"[scalediag] m=$m batchBandRows=${bandBatch.count()} " +
        s"maxBucket=${skew.get(0)} avgBucket=${skew.get(1)} " +
        s"sumSq=${skew.get(2)} candBase=$candBase")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
