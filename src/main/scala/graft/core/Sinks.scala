package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}

/**
 * Sinks — SURVEY §2.1 S4/S5/S6/S8.
 *
 * The reference writes with pandas `to_sql(if_exists='append'|'replace')`
 * (reference `1_AWS/README.md:133-134`, `2_Azure/READ.md:106-107`) and
 * declares dbt materialization + partitioning (`5_dbt/READ.md:386-396`).
 * Both modes are first-class here because 2_Azure mixes them in one load
 * (SURVEY §7.4.6).
 *
 * Scale notes:
 *  - Fact sinks partition by a date column (mirrors dbt `partition_by`
 *    day, `5_dbt/READ.md:389-394`) so downstream readers get partition
 *    pruning; at 100 TB this is the difference between a full scan and a
 *    single-day scan.
 *  - `maxRecordsPerFile` guards against giant output files on skewed
 *    partitions; writers shuffle-free when upstream partitioning already
 *    matches.
 */
object Sinks {

  /** S4: append to a parquet table (JDBC in the reference; format-agnostic here). */
  def append(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit =
    write(df, path, SaveMode.Append, partitionCols)

  /** S5: replace target table. */
  def overwrite(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit =
    write(df, path, SaveMode.Overwrite, partitionCols)

  private def write(df: DataFrame, path: String, mode: SaveMode,
                    partitionCols: Seq[String]): Unit = {
    val w = df.write.mode(mode).option("maxRecordsPerFile", 5000000)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** S4, warehouse form: the reference's actual sink is pandas
    * `to_sql(if_exists='append')` over a JDBC connection (reference
    * `1_AWS/README.md:133-134`, `2_Azure/READ.md:106-107`,
    * `3_BigQuery/READ.md:106`) — this is that path, executor-parallel
    * instead of single-connection.
    *
    * Scale notes (the knobs a 1000-executor load lives or dies by):
    *  - `numPartitions` caps CONCURRENT CONNECTIONS — unthrottled, every
    *    task opens its own connection and a wide frame becomes a
    *    connection storm the database refuses. The writer coalesces to
    *    this count; default 8.
    *  - `batchSize` rows per executeBatch round-trip (default 10k) —
    *    per-row inserts are the classic 100× slowdown.
    *  - extra `options` pass through (isolation level, driver, etc.). */
  def appendJdbc(df: DataFrame, url: String, table: String,
                 numPartitions: Int = 8, batchSize: Int = 10000,
                 options: Map[String, String] = Map.empty): Unit =
    writeJdbc(df, url, table, SaveMode.Append, numPartitions, batchSize, options)

  /** S5, warehouse form: `to_sql(if_exists='replace')`. `truncate=true`
    * keeps the table's DDL (indexes, grants) and empties it instead of
    * DROP+CREATE — what a production overwrite into a managed schema
    * wants; Spark falls back to DROP+CREATE when the dialect can't
    * truncate safely. */
  def overwriteJdbc(df: DataFrame, url: String, table: String,
                    numPartitions: Int = 8, batchSize: Int = 10000,
                    options: Map[String, String] = Map.empty): Unit =
    writeJdbc(df, url, table, SaveMode.Overwrite, numPartitions, batchSize,
      options + ("truncate" -> "true"))

  private def writeJdbc(df: DataFrame, url: String, table: String,
                        mode: SaveMode, numPartitions: Int, batchSize: Int,
                        options: Map[String, String]): Unit =
    df.coalesce(numPartitions).write.mode(mode)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .options(options)
      .save()
}
