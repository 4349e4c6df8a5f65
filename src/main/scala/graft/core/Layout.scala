package graft.core

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Data-layout operators: multi-dimensional clustering for scan pruning.
 *
 * Parquet row-group min/max statistics prune single-column ranges only
 * when the data is sorted on that column — and sorting on (a, b) leaves
 * b's statistics useless in every file but a's boundaries. Interleaving
 * the bits of both keys into one Z-value and sorting on THAT gives every
 * file a tight bounding box in BOTH dimensions: the standard OPTIMIZE
 * ZORDER layout trick for 100 TB tables queried by more than one
 * predicate column (e.g. events by user AND hour).
 *
 * Everything is exact long bit arithmetic (shift/and/or — no overflow
 * under ANSI mode, no floats), so the same Z-value is computable in any
 * engine.
 */
object Layout {

  /**
   * Morton (Z-order) value of two codes, `bits` bits each (default 16 →
   * a 32-bit Z-value): bit i of `a` lands at position 2i, bit i of `b`
   * at 2i+1. Callers map raw columns into [0, 2^bits) first — rank,
   * hash-mod, or truncation, whatever preserves the locality they care
   * about.
   */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      (shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /**
   * Rewrite a parquet path Z-ordered on two key columns: range-partition
   * by Z-value (so files tile the Z-curve) and sort within partitions
   * (so row groups tile it too). Staged-then-swapped like
   * [[Materialize.compact]]; the Z column itself is not persisted.
   */
  def zorderCompact(spark: SparkSession, path: String,
                    aCol: String, bCol: String, bits: Int = 16,
                    nFiles: Int = 8): Unit = {
    val df = spark.read.parquet(path)
      .withColumn("__z", zValue(col(aCol).bitwiseAND(lit((1L << bits) - 1)),
        col(bCol).bitwiseAND(lit((1L << bits) - 1)), bits))
    val stage = java.nio.file.Files.createTempDirectory("graft_zorder")
    try {
      df.repartitionByRange(nFiles, col("__z")).sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(SaveMode.Overwrite).parquet(stage.toString)
      spark.read.parquet(stage.toString)
        .write.mode(SaveMode.Overwrite).parquet(path)
    } finally {
      val stream = java.nio.file.Files.walk(stage)
      try stream.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally stream.close()
    }
  }
}
