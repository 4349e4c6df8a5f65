package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Join operators — SURVEY §2.3 J1-J7.
 *
 * Scale notes:
 *  - Fact→dimension joins (J1/J2, reference `1_AWS/README.md:106`,
 *    `5_dbt/READ.md:505-507`) broadcast the dimension explicitly: no
 *    shuffle of the fact side at any scale, and no reliance on the
 *    autoBroadcastJoinThreshold estimate being right.
 *  - Coalesce-key joins (J4, reference `5_dbt/READ.md:471-477`)
 *    materialize the COALESCE into a column BEFORE joining so the join
 *    stays a hash equi-join on a plain attribute.
 *  - The iterative multi-way left join (J5, reference
 *    `4_Snowflake/READ.md:87-91`) is better expressed as a single
 *    groupBy+pivot — one shuffle instead of four joins; both forms are
 *    provided.
 */
object Joins {

  /** J1: left fact→dim equi-join with explicit broadcast of the dim. */
  def leftBroadcast(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys, "left")

  /** J2: inner fact→dim equi-join, dim broadcast. */
  def innerBroadcast(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys, "inner")

  /** J3: full-outer metric merge (reference `5_dbt/READ.md:465-470`). */
  def fullOuter(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.join(b, keys, "full_outer")

  /**
   * J4: left join where the left key is COALESCE(a, b) — materialized
   * first so the planner sees a plain equi-join.
   */
  def coalesceKeyLeftJoin(left: DataFrame, right: DataFrame,
                          coalescedKeys: Seq[(String, Seq[String])]): DataFrame = {
    val withKeys = coalescedKeys.foldLeft(left) { case (df, (out, ins)) =>
      df.withColumn(out, coalesce(ins.map(col): _*))
    }
    withKeys.join(right, coalescedKeys.map(_._1), "left")
  }

  /** J5 (faithful): fold per-period frames with repeated left joins. */
  def foldLeftJoins(base: DataFrame, others: Seq[DataFrame], keys: Seq[String]): DataFrame =
    others.foldLeft(base)((acc, df) => acc.join(df, keys, "left"))

  /** J5 (scalable): one groupBy+pivot replaces N joins with one shuffle. */
  def pivotInsteadOfJoins(df: DataFrame, key: String, pivotCol: String,
                          pivotValues: Seq[String], agg: Column): DataFrame =
    df.groupBy(col(key)).pivot(pivotCol, pivotValues).agg(agg)

  /** J6: semi-join against a small key set (reference `3_BigQuery/READ.md:109-110`). */
  def semiJoin(fact: DataFrame, keySet: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(keySet), keys, "left_semi")

  /** J7: cross join against a 1-row global-stats frame (reference `5_dbt/READ.md:842-860`). */
  def crossStats(fact: DataFrame, stats: DataFrame): DataFrame =
    fact.crossJoin(broadcast(stats))

  /** J11 (extension): anti-join — rows with NO match in the key set, the
    * complement of [[semiJoin]]; broadcast keeps it a hash LeftAnti with
    * no fact-side shuffle. */
  def antiJoin(fact: DataFrame, keySet: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(keySet), keys, "left_anti")

  /**
   * J13 (extension): Bloom-prefiltered join — the explicit form of
   * Spark's runtime (row-level) filter. The dim side's join keys fold
   * into a driver-built Bloom filter that is broadcast as a scan-side
   * predicate on the fact, and the exact join runs on the survivors. For
   * a selective dim this drops the fact's shuffle volume by the dim's
   * selectivity (a 1% dim ≈ 99% less shuffled data) — the pattern that
   * matters when the fact side is 100 TB and the join key is not the
   * partition key (where dynamic partition pruning can't help). False
   * positives are culled by the exact join; false negatives are
   * impossible, so the result is identical to the plain join.
   *
   * The predicate is a broadcast-closure UDF by necessity (the sketch is
   * opaque to codegen); it gates rows BEFORE the exchange, so the
   * interpreted call is paid on the scan, not the shuffle.
   */
  def bloomPrefilteredInner(fact: DataFrame, dim: DataFrame,
                            factKey: String, dimKey: String,
                            expectedDimKeys: Long = 1000000L,
                            fpp: Double = 0.01): DataFrame = {
    val bloom = dim.stat.bloomFilter(dimKey, expectedDimKeys, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    fact.filter(mightContain(col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
