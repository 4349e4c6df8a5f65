package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Dump physical plans for selected registered queries (audit aid). */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "j1_left_broadcast", "p3_filter_eq", "t1_topk", "a1_group_percentiles",
      "j6_semi_join", "pl_tti_monthly_top10", "pl_mart_daily_rankings",
      "ext_sim_topk_cosine", "u2_yearly_summary")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Registry.queries
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(qs(n)(spark, dir).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
