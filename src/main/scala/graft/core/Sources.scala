package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Ingest sources — SURVEY §2.1 S1/S2/S3.
 *
 * The reference reads CSV eagerly with inferred schemas
 * (`pd.read_csv`, reference `1_AWS/README.md:51-62`) and skips missing
 * yearly files with try/except (`2_Azure/READ.md:50-56`). Here every scan
 * takes an explicit [[StructType]] — inferred schemas are nondeterministic
 * across files and break oracle comparisons — and missing paths are
 * filtered driver-side before the scan is planned, so the DAG never
 * contains a doomed task.
 *
 * Scale notes:
 *  - `csv(paths: _*)` plans ONE scan over all files (one stage, split by
 *    `spark.sql.files.maxPartitionBytes`), unlike the reference's
 *    file-at-a-time pandas loop which serializes I/O.
 *  - The same call works against an `s3a://bucket/prefix/` glob on a real
 *    cluster; path-existence checks go through the Hadoop FS abstraction,
 *    not java.io.
 */
object Sources {

  /** S1/S2: explicit-schema CSV scan over one or more paths/globs. */
  def csv(spark: SparkSession, schema: StructType, paths: Seq[String],
          header: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(paths: _*)

  /**
   * S2: yearly-file scan that tolerates missing years
   * (reference `2_Azure/READ.md:50-56` `except FileNotFoundError: continue`).
   * Existence is checked through Hadoop FS so it works on HDFS/S3 too.
   */
  def csvExisting(spark: SparkSession, schema: StructType, candidates: Seq[String],
                  header: Boolean = true): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val existing = candidates.filter { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(conf)
      // globStatus handles wildcard paths (exists() is false for globs);
      // it returns null for non-glob paths that don't exist.
      Option(fs.globStatus(path)).exists(_.nonEmpty)
    }
    require(existing.nonEmpty, s"none of ${candidates.size} candidate paths exist")
    csv(spark, schema, existing, header)
  }

  /** S3: parquet table source (the fixture tables' native format). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSON-lines scan with explicit schema — the landing-zone format for
    * event feeds and API dumps. Schema is mandatory for the same
    * determinism reason as [[csv]] (JSON inference samples the data and
    * widens types per run). */
  def jsonLines(spark: SparkSession, schema: StructType, paths: Seq[String]): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(paths: _*)

  /** ORC scan — the other columnar warehouse format; same pushdown and
    * pruning properties as parquet under Spark's vectorized reader. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
