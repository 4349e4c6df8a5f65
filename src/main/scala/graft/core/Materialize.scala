package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Materialization policy — SURVEY §2.1 S6/S8.
 *
 * dbt declares per-layer materialization (staging → view,
 * intermediate/marts → table, reference `5_dbt/READ.md:125-133,386-396`)
 * and the DAG pipelines load into warehouse tables
 * (`to_sql`/`to_gbq`, reference `1_AWS/README.md:133-134`,
 * `3_BigQuery/READ.md:106`). Here the same policy is explicit: a view
 * stays a lazy plan in the session catalog (zero storage, re-optimized
 * per query); a table persists through the warehouse catalog
 * (`saveAsTable`), optionally partitioned for downstream pruning.
 */
object Materialize {

  sealed trait Policy
  /** Lazy named plan (dbt `materialized: view`). */
  case object AsView extends Policy
  /** Catalog-persisted table (dbt `materialized: table`; the warehouse
    * sink S6 — swap the format/catalog for BigQuery/Snowflake on a real
    * deployment). */
  final case class AsTable(partitionCols: Seq[String] = Nil,
                           mode: SaveMode = SaveMode.Overwrite) extends Policy

  /**
   * Bucketed catalog table: co-locates rows by hash(bucketCols) at WRITE
   * time so equi-joins and aggregations on those keys plan with NO
   * exchange — the shuffle is paid once at ingest instead of per query.
   * The 100 TB pattern for repeatedly-joined fact tables.
   */
  def bucketTable(spark: SparkSession, name: String, df: DataFrame,
                  buckets: Int, bucketCols: Seq[String]): DataFrame = {
    dropWithLocation(spark, name)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(name)
    spark.table(name)
  }

  private def dropWithLocation(spark: SparkSession, name: String): Unit = {
    // a managed-table location can survive from a previous session whose
    // in-memory catalog is gone; clear both halves
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, name.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Materialize `df` under `name` per the policy; returns the readable
    * relation (the view/table as a fresh DataFrame). */
  def materialize(spark: SparkSession, name: String, df: DataFrame,
                  policy: Policy): DataFrame = policy match {
    case AsView =>
      df.createOrReplaceTempView(name)
      spark.table(name)
    case AsTable(parts, mode) =>
      if (mode == SaveMode.Overwrite) dropWithLocation(spark, name)
      val w = df.write.mode(mode)
      (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).saveAsTable(name)
      spark.table(name)
  }
}
