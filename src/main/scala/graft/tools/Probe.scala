package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics main (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val dups = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" dup marker tail")).as("text"))
    val all = docs.unionByName(dups)

    var t0 = System.nanoTime
    val sig = all.select(col("doc_id"),
      graft.ext.Dedup.minhashSignature(
        graft.ext.Dedup.shingleHashes(col("text"), 3), 64).as("sig"))
    println(s"[probe] sig count=${sig.count()} in ${(System.nanoTime - t0) / 1e9}s")

    t0 = System.nanoTime
    val cp = graft.ext.Dedup.candidatePairs(all, "doc_id", "text")
    println(s"[probe] candidates=${cp.count()} in ${(System.nanoTime - t0) / 1e9}s")
    cp.explain(false)

    t0 = System.nanoTime
    val nd = graft.ext.Dedup.nearDupPairs(all, "doc_id", "text", 0.5)
    println(s"[probe] neardups=${nd.count()} in ${(System.nanoTime - t0) / 1e9}s")
    spark.stop()
  }
}
