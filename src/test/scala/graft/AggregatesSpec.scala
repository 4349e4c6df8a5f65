package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Aggregates, Skew}

/** Exactness of the salted two-phase path and error bounds for the
  * sketch-based 100 TB escape hatches. */
class AggregatesSpec extends SparkSpec {

  test("salted aggregation is exactly the plain groupBy") {
    val li = Tables.lineitem(spark, sfDir)
    val salted = Skew.saltedSumCount(li, Seq("l_returnflag"), "l_quantity",
        "l_orderkey", salts = 8)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1) * 100).round, r.getLong(2)))
      .toMap
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_quantity"), count(lit(1)))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1) * 100).round, r.getLong(2)))
      .toMap
    assert(salted == plain)
  }

  test("saltedAvg equals plain avg (sum/count decomposition, not avg-of-avgs)") {
    val li = Tables.lineitem(spark, sfDir)
    val salted = Skew.saltedAvg(li, Seq("l_linestatus"), "l_extendedprice",
        "l_orderkey", salts = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val plain = li.groupBy("l_linestatus").agg(avg("l_extendedprice"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    plain.foreach { case (k, v) => assert(math.abs(salted(k) - v) < 1e-6) }
  }

  test("aggregator top-k equals the row_number window result") {
    val part = Tables.part(spark, sfDir)
    val viaAgg = graft.functions.TopKAggregator.topKPerKey(
        part, Seq("p_brand"), col("p_retailprice"), col("p_partkey"), k = 3)
      .select("p_brand", "score", "id")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("p_brand").orderBy(desc("p_retailprice"), col("p_partkey"))
    val viaWindow = part
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("p_brand"), col("p_retailprice"), col("p_partkey").cast("long"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("string-id aggregator top-k equals the window result, UTF-8 tiebreak") {
    import spark.implicits._
    // ids as strings, with a score tie whose winner depends on the
    // ordering: Spark's window orders strings by UTF-8 bytes, and the
    // string buffer must agree (including the supplementary-plane char,
    // where JVM UTF-16 comparison would flip the order vs UTF-8)
    val df = Seq(
      ("g1", "doc-b", 5.0), ("g1", "doc-a", 5.0), ("g1", "😀", 5.0),
      ("g1", "�", 5.0), ("g1", "doc-z", 9.0), ("g2", "x", 1.0))
      .toDF("grp", "doc", "score")
    val viaAgg = graft.functions.TopKAggregator.topKPerKey(
        df, Seq("grp"), col("score"), col("doc"), k = 3)
      .select("grp", "score", "id")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(desc("score"), col("doc"))
    val viaWindow = df
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("grp"), col("score"), col("doc"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    assert(viaAgg == viaWindow)
    // non-orderable id type → clear error, not a NULL cast
    intercept[IllegalArgumentException] {
      graft.functions.TopKAggregator.topKPerKey(
        df.withColumn("doc", array(col("doc"))), Seq("grp"),
        col("score"), col("doc"), k = 1)
    }
  }

  test("topKPerKey drops NULL-id rows instead of NPE (string) or id=0 (long)") {
    import spark.implicits._
    // pre-fix: a null string id NPE'd inside utf8Lt; a null long id was
    // silently encoded as 0 and could win the tiebreak as a phantom row
    val sdf = Seq(("g", "a", 1.0), ("g", null, 9.0), ("g", "b", 2.0))
      .toDF("grp", "doc", "score")
    val sGot = graft.functions.TopKAggregator.topKPerKey(
        sdf, Seq("grp"), col("score"), col("doc"), k = 2)
      .select("id").as[String].collect().toSet
    assert(sGot === Set("a", "b"))
    val ldf = Seq(("g", java.lang.Long.valueOf(7L), 1.0),
        ("g", null.asInstanceOf[java.lang.Long], 9.0),
        ("g", java.lang.Long.valueOf(8L), 2.0))
      .toDF("grp", "doc", "score")
    val lGot = graft.functions.TopKAggregator.topKPerKey(
        ldf, Seq("grp"), col("score"), col("doc"), k = 2)
      .select("id").as[Long].collect().toSet
    assert(lGot === Set(7L, 8L))
  }

  test("pooled (frequency-weighted) percentiles are bit-identical to direct") {
    val li = Tables.lineitem(spark, sfDir)
    val qs = Map("p50" -> 0.5, "p80" -> 0.8, "p95" -> 0.95)
    val direct = Aggregates.groupPercentiles(li, Seq("l_returnflag"), "l_quantity", qs)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val pooled = Aggregates.groupPercentilesPooled(li, Seq("l_returnflag"), "l_quantity", qs)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(pooled == direct, "weighted interpolation over distinct values must equal pooled")
  }

  test("approx percentile within 5% of exact at fixture scale") {
    val li = Tables.lineitem(spark, sfDir)
    val both = li.groupBy("l_returnflag").agg(
      Aggregates.pct(col("l_quantity"), 0.5).as("exact"),
      Aggregates.approxPct(col("l_quantity"), 0.5).as("approx"))
    both.collect().foreach { r =>
      val (e, a) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(e - a) <= math.max(1.0, 0.05 * e))
    }
  }

  test("approx count distinct within 5% of exact") {
    val li = Tables.lineitem(spark, sfDir)
    val both = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx"))
    both.collect().foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(e - a) <= math.max(2.0, 0.05 * e))
    }
  }
}
