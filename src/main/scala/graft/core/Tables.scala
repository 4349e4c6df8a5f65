package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Table registry over the driver's parquet fixtures (TESTDATA.md).
 *
 * Mirrors the reference's named-source indirection (dbt
 * `{{ source('traffic', 'raw_*') }}`, reference `5_dbt/READ.md:159,206,262,294`
 * — SURVEY §2.1 S3) as a thin function from (session, dir, name) to a
 * DataFrame, so pipelines never hard-code paths.
 *
 * Scale notes:
 *  - Parquet scans are Catalyst DataSource V2 scans: column pruning and
 *    predicate pushdown reach the file footer for free; callers should
 *    `select`/`filter` as early as possible so `PushedFilters`/`ReadSchema`
 *    show the pruned shape.
 *  - At 100 TB the same API points at a partitioned table root; nothing
 *    here assumes single-file inputs.
 */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables small enough to broadcast at any scale (true dimensions). */
  val dimensionNames: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every fixture table as a temp view for `spark.sql` use. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
