package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-management operators for training-data pipelines: deterministic
 * train/val/test splits, stratified sampling, sequence packing, and PII
 * scrubbing.
 *
 * Scale design:
 *  - Splits and samples are HASH-based, never random: the same row lands
 *    in the same split on every engine, every rerun, every cluster size —
 *    reproducibility is a correctness property for training data (and the
 *    md5 cell is engine-portable, unlike Spark-private xxhash64 seeds).
 *  - [[hashSplit]] is a pure projection — no shuffle, no sampling pass;
 *    adding data never moves an existing row between splits.
 *  - [[stratifiedSample]] shuffles once on the stratum key; per-stratum
 *    quota is computed inline by a count window, so no driver round-trip
 *    per stratum.
 *  - [[packSequences]] packs WITHIN a partition key (a global
 *    concatenation order would serialize the corpus through one task —
 *    the anti-scale shape); each partition's running token sum is one
 *    window pass.
 *  - [[scrubPii]] is codegen'd regexp_replace — streams through the scan.
 */
object Corpus {

  /** Engine-portable 256-cell hash: first hex byte of md5 of the id. */
  def hashCell(id: Column): Column = substring(md5(id.cast("string")), 1, 2)

  /**
   * Deterministic split assignment from the md5 cell: cells [0, trainCells)
   * → "train", [trainCells, trainCells + valCells) → "val", rest → "test".
   * Defaults: 230/13/13 of 256 ≈ 90/5/5 %.
   */
  def hashSplit(id: Column, trainCells: Int = 230, valCells: Int = 13): Column = {
    require(trainCells + valCells < 256, "train+val must leave test cells")
    val trainHi = f"$trainCells%02x"
    val valHi = f"${trainCells + valCells}%02x"
    val cell = hashCell(id)
    when(cell < lit(trainHi), "train")
      .when(cell < lit(valHi), "val")
      .otherwise("test")
  }

  /**
   * Deterministic stratified sample: the first ceil(frac × |stratum|)
   * rows per stratum in (md5(id), id) order. Exact per-stratum quotas
   * (unlike Bernoulli sampleBy), reproducible, one shuffle on the stratum.
   */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       frac: Double): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
    val ord = Window.partitionBy(col(stratumCol))
      .orderBy(hashCell(col(idCol)), col(idCol))
    df.withColumn("__n", count(lit(1)).over(w))
      .withColumn("__rn", row_number().over(ord))
      .filter(col("__rn") <= ceil(col("__n") * frac))
      .drop("__n", "__rn")
  }

  /**
   * Greedy sequence packing by running token count: documents are laid
   * out in (partition, order) sequence; a document starting at running
   * offset p goes to context-window bin floor(p / binSize) at offset
   * p mod binSize. One window pass per partition key; bins are stable
   * under append because the order column is explicit.
   */
  def packSequences(df: DataFrame, partCol: String, orderCol: String,
                    sizeCol: String, binSize: Int): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__prev", coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("bin", (col("__prev") / binSize).cast("long"))
      .withColumn("bin_offset", (col("__prev") % binSize).cast("long"))
      .drop("__prev")
  }

  /** RE2-safe patterns (portable across Java regex and RE2 oracles). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\d{3}-\\d{4}"

  /** Redact emails and phone-shaped tokens; counts ride along so a
    * pipeline can gate on PII density, not just rewrite. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhonePattern))
}
