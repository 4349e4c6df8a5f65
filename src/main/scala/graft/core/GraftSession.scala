package graft.core

import org.apache.spark.sql.SparkSession

/**
 * Session factory with the engine's recommended configuration: AQE on
 * (runtime re-plan, skew-join splitting, partition coalescing), shuffle
 * parallelism sized to the cores actually available (not the 200
 * default), UTC semantics for oracle-stable timestamps, and the graft
 * function set registered.
 *
 * On a real cluster the same settings apply — only `master` and the
 * shuffle-partition count (≈ 2-3× total executor cores) change.
 */
object GraftSession {

  def local(cores: Int, appName: String = "graft"): SparkSession =
    configure(SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      // per-APP-NAME warehouse: persisted-index operators create tables
      // under fixed names, so two concurrent local JVMs (a bench run
      // beside a test run) sharing the default ./spark-warehouse would
      // corrupt each other's staged writes. Keying by app name (not a
      // fresh random dir per session) keeps the dir count bounded AND
      // lets a later session with the same app name rediscover standing
      // tables (e.g. buildBm25Index's persisted index). Two concurrent
      // JVMs that share an app name must pass distinct names or set
      // spark.sql.warehouse.dir explicitly.
      .config("spark.sql.warehouse.dir",
        s"target/graft-wh-${appName.replaceAll("[^A-Za-z0-9._-]", "_")}"))

  def configure(builder: SparkSession.Builder): SparkSession = {
    val spark = builder
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
