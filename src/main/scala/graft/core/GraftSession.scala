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
      // tables (e.g. buildBm25Index's persisted index) — but two
      // CONCURRENT JVMs sharing an app name would reintroduce the
      // corruption, so the stable dir is guarded by a liveness-checked
      // PID lock: the second live claimant is diverted to a
      // pid-suffixed private dir instead of silently sharing.
      .config("spark.sql.warehouse.dir", warehouseDir(appName)))

  /** The stable per-app-name warehouse path iff this process holds (or
    * can claim) its PID lock; a pid-suffixed private path when another
    * LIVE process already holds it. A dead holder's lock is stale and
    * re-claimed — sequential sessions still rediscover standing tables. */
  private[graft] def warehouseDir(appName: String): String = {
    val safe = appName.replaceAll("[^A-Za-z0-9._-]", "_")
    val me = ProcessHandle.current().pid()
    val base = new java.io.File(s"target/graft-wh-$safe")
    val lock = new java.io.File("target", s"graft-wh-$safe.lock")
    def writePid(): Unit = {
      val w = new java.io.PrintWriter(lock, "UTF-8")
      try w.print(me.toString) finally w.close()
    }
    try {
      lock.getParentFile.mkdirs()
      if (lock.createNewFile()) { writePid(); base.getPath }
      else {
        val holder = try {
          val src = scala.io.Source.fromFile(lock, "UTF-8")
          try src.mkString.trim.toLong finally src.close()
        } catch { case _: Throwable => -1L }
        val otherAlive = holder > 0 && holder != me && {
          val h = ProcessHandle.of(holder)
          h.isPresent && h.get.isAlive
        }
        if (otherAlive) s"target/graft-wh-$safe-pid$me"
        else { writePid(); base.getPath } // stale or our own lock
      }
    } catch { case _: Throwable => base.getPath } // unwritable fs: best effort
  }

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
