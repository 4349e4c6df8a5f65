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
}
