package graft.tools

import org.apache.spark.sql.functions._

/**
 * One-JVM rep harness for the st_drift_monitor floor drift (r9's single
 * unadjudicated >1.5× ratio, 2.17 → 3.28 s): replays the registered
 * query's exact drain shape — 4 id-chunks of documents.n_chars, one per
 * trigger, scored by [[graft.streaming.DriftMonitor.psiIngest]] against
 * the pinned full-corpus reference — several reps in one JVM, printing
 * per-rep wall plus the Bench calibration fingerprint so floors can be
 * host-normalized. No code touched DriftMonitor in r9, so the expected
 * verdict is noise; a reproducible per-rep cost would localize a real
 * regression instead.
 *
 * r11 adds VARIANTS to A/B the two suspects the r10 adjudication named
 * for the honest ~0.8 s residual vs r8 (run each variant as its own
 * invocation — the warehouse config is fixed at session build):
 *   current — the shipped posture: per-app warehouse + PID lock
 *             ([[graft.core.GraftSession.local]]), checkpoint on
 *             /dev/shm when present.
 *   r8wh    — r8-era session: DEFAULT ./spark-warehouse-<pid>, no
 *             per-app lock infra; checkpoint on /dev/shm.
 *   cptmp   — shipped session, checkpoint FORCED to /tmp (disk-backed).
 *   cpshm   — shipped session, checkpoint forced to /dev/shm
 *             (the `current` default spelled explicitly — control).
 *
 * Usage:
 *   SPARK_GRAFT_SF_DIR=… runMain graft.tools.DriftTiming [reps] [variant]
 */
object DriftTiming {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.nonEmpty) args(0).toInt else 6
    val variant = if (args.length > 1) args(1) else "current"
    val spark = variant match {
      case "r8wh" =>
        // the pre-r9 session shape: default warehouse beside the cwd,
        // suffixed to stay isolated from concurrent runs, no lock path
        org.apache.spark.sql.SparkSession.builder()
          .master("local[32]").appName("graft-drift-timing-r8")
          .config("spark.sql.shuffle.partitions", "32")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.sql.warehouse.dir",
            s"target/spark-warehouse-${ProcessHandle.current().pid()}")
          .getOrCreate()
      case _ => graft.core.GraftSession.local(32, "graft-drift-timing")
    }
    spark.sparkContext.setLogLevel("ERROR")

    // the Bench host fingerprint: a fixed single-thread arithmetic loop
    val calib = {
      var x = 0L; var i = 0L
      val t0 = System.nanoTime()
      while (i < 400000000L) { x += i * 31 + (x >> 3); i += 1 }
      val s = (System.nanoTime() - t0) / 1e9
      if (x == 42) println("")
      s
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
    val step = mx / 4 + 1
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType)))

    // stage the 4 chunks (one file each, mtime-ordered a minute apart —
    // the StreamingQueries.stageIdChunks layout). The registered query
    // stages INSIDE its body, so each rep here times stage + drain
    // together to match the floor being adjudicated.
    def stageChunks(): String = {
      val stage = java.nio.file.Files.createTempDirectory("graft_drift_ab")
      val scratch = java.nio.file.Files.createTempDirectory("graft_drift_ab_p")
      (0 until 4).map(i => docs
          .filter(col("doc_id") >= i * step && col("doc_id") < (i + 1) * step)
          .withColumn("__chunk", lit(i)))
        .reduce(_ unionByName _)
        .repartition(col("__chunk"))
        .write.mode("overwrite").partitionBy("__chunk")
        .parquet(scratch.toString)
      (0 until 4).foreach { i =>
        val part = new java.io.File(s"$scratch/__chunk=$i").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = java.nio.file.Paths.get(s"$stage/${('a' + i).toChar}_chunk.parquet")
        java.nio.file.Files.copy(part.toPath, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() - (4 - i) * 60000L))
      }
      stage.toString
    }

    // the registered query's session shaping: 4 state partitions, AQE
    // off for the drain, checkpoint on /dev/shm when present
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val shm = new java.io.File("/dev/shm")
    val cpBase: Option[java.nio.file.Path] = variant match {
      case "cptmp" => Some(java.nio.file.Paths.get("/tmp"))
      case _ if shm.isDirectory && shm.canWrite => Some(shm.toPath)
      case _ => None
    }
    val walls = (1 to reps).map { r =>
      val prefix = "graft_drift_ab"
      graft.core.Materialize.dropWithLocation(spark, prefix + "_psi")
      cpBase.foreach(base =>
        spark.conf.set("spark.sql.streaming.checkpointLocation",
          java.nio.file.Files.createTempDirectory(base,
            "graft_drift_cp").toString))
      val t0 = System.nanoTime()
      val stage = stageChunks()
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1).parquet(stage)
      val q = graft.streaming.DriftMonitor.psiIngest(
        stream, docs, "n_chars", binWidth = 500.0, prefix)
      try q.processAllAvailable() finally q.stop()
      graft.core.CacheRegistry.releaseAll()
      spark.catalog.refreshTable(prefix + "_psi")
      spark.table(prefix + "_psi").count()
      val w = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[drifttiming] rep$r wall=$w%.2fs")
      w
    }
    spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    println(f"[drifttiming] variant=$variant reps=$reps min=${walls.min}%.2fs " +
      f"median=${walls.sorted.apply(reps / 2)}%.2fs calib=$calib%.3fs")
    spark.stop()
  }
}
