package graft.tools

import org.apache.spark.sql.functions._

/**
 * A/B timing harness for the graph-family tail costs (LPA / kCore
 * lineage-cut policies): builds the registered rows' kNN edge lists
 * once, then times each operator variant several times in ONE JVM so
 * the numbers are comparable (no per-run sbt/JVM/codegen warmup skew).
 * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.GraphTiming
 */
object GraphTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32, "graft-graph-timing")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

    def time(label: String)(f: => Long): Unit =
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[graphtiming] $label%-28s rep$r ${(System.nanoTime() - t0) / 1e9}%7.3f s (rows=$n)")
        spark.catalog.clearCache()
      }

    time("edges_knn3_only") {
      graft.ext.Similarity.knnGraphFused(emb, "vec_id", "embedding", k = 3)
        .select("src_id", "dst_id").count()
    }
    time("lpa_iters2") {
      val edges = graft.ext.Similarity
        .knnGraphFused(emb, "vec_id", "embedding", k = 3)
        .select("src_id", "dst_id")
      graft.ext.Graphs.labelPropagation(edges, iters = 2).count()
    }
    time("kcore_k5_iters2") {
      val edges = graft.ext.Similarity
        .knnGraphFused(emb, "vec_id", "embedding", k = 4)
        .select("src_id", "dst_id")
      graft.ext.Graphs.kCore(edges, k = 5, iters = 2).count()
    }
    spark.stop()
  }
}
