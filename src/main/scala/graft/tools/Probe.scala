package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics main (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val dups = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" dup marker tail")).as("text"))
    val all = docs.unionByName(dups)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.2fs"); r
    }

    val sh = time("shingles") {
      val f = all.select(col("doc_id"),
        graft.ext.Dedup.shingleHashes(col("text"), 3).as("__sh")).persist()
      f.count(); f
    }
    val sig = time("signatures(64)") {
      val f = sh.select(col("doc_id"),
        graft.ext.Dedup.minhashSignature(col("__sh"), 64).as("__sig")).persist()
      f.count(); f
    }
    val banded = time("banding+explode(32)") {
      val f = sig.select(col("doc_id"),
        explode(graft.ext.Dedup.bandHashes(col("__sig"), 32, 2)).as("__b"))
        .select(col("doc_id"), col("__b.band").as("__band"), col("__b.bh").as("__bh"))
        .persist()
      f.count(); f
    }
    val cand = time("bucket self-join + distinct") {
      val a = banded.select(col("__band"), col("__bh"), col("doc_id").as("id_a"))
      val b = banded.select(col("__band"), col("__bh"), col("doc_id").as("id_b"))
      val c = a.join(b, Seq("__band", "__bh")).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().persist()
      println("[probe] n_candidates=" + c.count()); c
    }
    time("jaccard verify") {
      val v = cand
        .join(sh.select(col("doc_id").as("id_a"), col("__sh").as("__sh_a")), Seq("id_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("__sh").as("__sh_b")), Seq("id_b"))
        .withColumn("j", graft.ext.Dedup.jaccard(col("__sh_a"), col("__sh_b")))
        .filter(col("j") >= 0.5)
      println("[probe] n_pairs=" + v.count())
    }
    time("end-to-end nearDupPairs") {
      println("[probe] n=" + graft.ext.Dedup.nearDupPairs(all, "doc_id", "text",
        0.5, 3, 64, 32).count())
    }
    spark.stop()
  }
}
