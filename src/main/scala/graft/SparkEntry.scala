package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /**
   * Flagship query on /root/testdata/sf0.001 (driver smoke-checks rows>0):
   * the 1_AWS monthly Top-10 congestion core (reference
   * `1_AWS/README.md:95-113`) — group percentiles → TTI/PTI ratios →
   * broadcast dim join → top-k — over the lineitem fixture.
   */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = graft.core.Tables.lineitem(spark, dir)
    val pct = graft.ops.Aggregates.groupPercentiles(
      li, Seq("l_returnflag"), "l_quantity",
      Map("tt50" -> 0.5, "tt85" -> 0.85, "tt95" -> 0.95))
    pct
      .withColumn("tti", graft.expr.MetricExpr.tti(col("tt85"), col("tt50")))
      .withColumn("pti", graft.expr.MetricExpr.pti(col("tt95"), col("tt50")))
      .orderBy(desc("tti"), col("l_returnflag")).limit(10)
  }

  /** One entry per implemented operator from SURVEY.md §2 (see graft.queries). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
