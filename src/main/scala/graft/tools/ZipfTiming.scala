package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * A/B harness for the ext_zipf_alpha floor regression: times the
 * registered query's exact shape with the current topKPerKey (id
 * null-filter) against an inline twin without the filter, several reps
 * each in ONE JVM. Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.ZipfTiming
 */
object ZipfTiming {

  /** topKPerKey's string path minus the id null-filter — the pre-r9 shape. */
  private def topKNoFilter(df: DataFrame, keys: Seq[String], scoreCol: Column,
                           idCol: Column, k: Int): DataFrame = {
    val agg = udaf(new graft.functions.TopKAggregator.TopKS(k))
    df.groupBy(keys.map(col): _*)
      .agg(agg(scoreCol.cast("double"), idCol).as("__top"))
      .select((keys.map(col) :+ explode(col("__top")).as("__e")): _*)
      .select((keys.map(col) :+ col("__e._1").as("__cd") :+
        col("__e._2").as("__tok")): _*)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32, "graft-zipf-timing")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("text"))

    def counts() = docs
      .select(col("source"), explode(graft.ext.TextOps.tokens(lower(col("text")))).as("__tok"))
      .groupBy(col("source"), col("__tok")).agg(count(lit(1)).as("__c"))

    def tail(head: DataFrame): Long = head
      .withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(desc("__cd"), col("__tok"))))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("vocab_size"),
        round(-regr_slope(log(col("__cd")), log(col("__r"))) + lit(1e-9), 6)
          .as("alpha")).count()

    for (r <- 1 to 4) {
      var t0 = System.nanoTime()
      tail(graft.functions.TopKAggregator.topKPerKey(
        counts(), Seq("source"), col("__c"), col("__tok"), 1000, "__cd", "__tok"))
      val withF = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t0 = System.nanoTime()
      tail(topKNoFilter(counts(), Seq("source"), col("__c"), col("__tok"), 1000))
      val noF = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[zipftiming] rep$r withFilter=$withF%.2fs noFilter=$noF%.2fs")
    }
    spark.stop()
  }
}
