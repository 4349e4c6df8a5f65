package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{HeavyHitters, Skew}

/** Exactness contracts for the two-phase heavy-hitter operator, the
  * salted join, and the HLL mergeable-sketch error bound. */
class HeavyHittersSpec extends SparkSpec {

  private def skewed = Tables.events(spark, sfDir).select(
    when(col("event_id") % 10 < 7,
      concat(lit("hot_"), (col("user_id") % 2).cast("string")))
      .otherwise(concat(lit("cold_"), col("event_id").cast("string")))
      .as("k"))

  test("heavy hitters equal the plain GROUP BY / HAVING result") {
    val df = skewed
    val total = df.count()
    val expected = df.groupBy("k").agg(count(lit(1)).as("n"))
      .filter(col("n") > total / 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = HeavyHitters.exact(df, "k", 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.keySet == Set("hot_0", "hot_1"),
      "the two hot keys are the only >10% keys in the fixture")
  }

  test("heavy hitter output is partitioning-independent (candidates are not)") {
    val df = skewed
    val a = HeavyHitters.exact(df, "k", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = HeavyHitters.exact(df.repartition(13), "k", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("Misra-Gries survivors cover every key above the pigeonhole threshold") {
    // 100 'a', 30 'b', rest near-unique: with k = 5, any key with count
    // > 200/5 = 40 must survive — that's exactly {'a'}
    val data: Seq[Any] =
      Seq.fill(100)("a") ++ Seq.fill(30)("b") ++ (0 until 70).map(i => s"u$i")
    val survivors = HeavyHitters.misraGries(data.iterator, 5).toSet
    assert(survivors.contains("a"))
    assert(survivors.size <= 5)
  }

  test("salted join equals the plain equi-join") {
    val fact = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey").as("c_custkey"))
    val dim = Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_name"))
    val salted = Skew.saltedJoin(fact, dim, "c_custkey", "o_orderkey", salts = 4)
      .select("o_orderkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = fact.join(dim, "c_custkey").select("o_orderkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
  }

  test("HLL sketch union estimate is within 5% of exact distinct") {
    val li = Tables.lineitem(spark, sfDir)
    val est = li.groupBy(col("l_returnflag"), year(col("l_shipdate")).as("yr"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .groupBy("l_returnflag")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(est(k) - ex).toDouble / ex < 0.05,
        s"flag $k: estimate ${est(k)} vs exact $ex")
    }
  }

  test("count-min sketch: never undercounts; exact when wide enough") {
    import spark.implicits._
    import graft.functions.CountMinSketch
    val keys = skewed.select(col("k")).as[String]
    val exact = skewed.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val narrow = CountMinSketch.build(keys, d = 4, w = 16)
    exact.foreach { case (k, ex) =>
      assert(CountMinSketch.estimate(narrow, 4, 16, k) >= ex,
        s"key $k undercounted at w=16")
    }
    // w far above the distinct-key count at d=4: collisions in all 4
    // rows simultaneously are vanishingly unlikely → min is exact
    val wide = CountMinSketch.build(keys, d = 4, w = 65536)
    exact.foreach { case (k, ex) =>
      assert(CountMinSketch.estimate(wide, 4, 65536, k) == ex,
        s"key $k inexact at w=65536")
    }
  }

  test("count-min sketch: partitioning-independent and merge = elementwise sum") {
    import spark.implicits._
    import graft.functions.CountMinSketch
    val keys = skewed.select(col("k")).as[String]
    val one = CountMinSketch.build(keys.repartition(1), d = 3, w = 32)
    val many = CountMinSketch.build(keys.repartition(13), d = 3, w = 32)
    assert(one.sameElements(many), "sketch must not depend on partitioning")
    // column-form estimate == driver-form estimate on every distinct key
    val sk = one
    val viaCol = skewed.distinct()
      .withColumn("est", CountMinSketch.estimateCol(sk, 3, 32, col("k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    viaCol.foreach { case (k, e) =>
      assert(e == CountMinSketch.estimate(sk, 3, 32, k),
        s"column estimate diverges from JVM estimate on $k")
    }
  }
}
