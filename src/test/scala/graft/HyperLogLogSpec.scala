package graft

import graft.functions.HyperLogLog
import org.apache.spark.sql.functions._

/**
 * HLL: the typed aggregator and the relational register table must be
 * bit-identical; merged per-source sketches must equal the global one;
 * estimates must land within the published error envelope.
 */
class HyperLogLogSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int, tag: String) =
    (0 until n).map(i => s"$tag-key-$i")

  test("typed aggregator registers == relational registers") {
    val ks = keys(500, "a")
    val fromAgg = HyperLogLog.build(ks.toDS())
    val rel = HyperLogLog.registers(ks.toDF("k"), "k")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val fromRel = Array.tabulate(HyperLogLog.M)(i => rel.getOrElse(i, 0))
    assert(fromAgg.toSeq === fromRel.toSeq)
  }

  test("element-wise max merge of per-source sketches equals the global sketch") {
    val a = HyperLogLog.build(keys(300, "a").toDS())
    val b = HyperLogLog.build(keys(400, "b").toDS())
    val merged = new HyperLogLog.Sketch().merge(a.clone(), b)
    val global = HyperLogLog.build((keys(300, "a") ++ keys(400, "b")).toDS())
    assert(merged.toSeq === global.toSeq)
    // duplicates never change registers: unioning a stream with itself
    // is a no-op (the idempotence that makes replay safe)
    val again = new HyperLogLog.Sketch().merge(global.clone(), global)
    assert(again.toSeq === global.toSeq)
  }

  test("estimates: linear counting in small range, ±3σ at 2000 distinct") {
    // small range: 5 distinct keys → V > 0, linear counting, near-exact
    val small = HyperLogLog.estimateRegisters(
      HyperLogLog.build(keys(5, "s").toDS()))
    assert(small >= 4.0 && small <= 6.5, s"small-range estimate $small")
    // 2000 distinct: standard error 1.04/√64 = 13%; allow 3σ
    val big = HyperLogLog.estimateRegisters(
      HyperLogLog.build(keys(2000, "x").toDS()))
    assert(math.abs(big - 2000) / 2000 < 0.39, s"estimate $big for 2000")
    // repeated keys must not move the estimate
    val dup = HyperLogLog.estimateRegisters(
      HyperLogLog.build((keys(2000, "x") ++ keys(2000, "x")).toDS()))
    assert(dup === big)
  }

  test("empty input estimates 0.0, not NULL (linear counting at V = m)") {
    val empty = spark.emptyDataFrame.select(lit("x").as("k")).filter(lit(false))
    val est = HyperLogLog.estimate(HyperLogLog.registers(empty, "k"))
      .collect().head
    assert(!est.isNullAt(0) && est.getDouble(0) === 0.0)
    assert(HyperLogLog.estimateRegisters(new Array[Int](HyperLogLog.M)) === 0.0)
  }

  test("null keys are skipped: relational == typed on a null-bearing stream") {
    // pre-fix, md5(NULL) produced a (reg=NULL, rho=NULL) register row
    // that inflated __hit without touching __hsum — diverging from the
    // typed Sketch (which skips nulls) and skewing linear counting
    val withNulls = (keys(40, "n").map(Option(_)) ++ Seq(None, None, None))
      .toDF("k")
    val regRows = HyperLogLog.registers(withNulls, "k").collect()
    // NULL-typed reads via getInt would mask a (NULL, NULL) register row
    // as (0, 0) — assert on isNullAt so the regression stays visible
    assert(regRows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      "null keys must not produce a NULL register row")
    val rel = regRows.map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(rel.values.forall(_ >= 1))
    val typed = HyperLogLog.build(
      withNulls.as[Option[String]].map(_.orNull)(
        org.apache.spark.sql.Encoders.STRING))
    val fromRel = Array.tabulate(HyperLogLog.M)(i => rel.getOrElse(i, 0))
    assert(typed.toSeq === fromRel.toSeq)
    // and the estimate equals the null-free stream's estimate exactly
    val clean = HyperLogLog.estimate(
      HyperLogLog.registers(keys(40, "n").toDF("k"), "k"))
      .collect().head.getDouble(0)
    val dirty = HyperLogLog.estimate(HyperLogLog.registers(withNulls, "k"))
      .collect().head.getDouble(0)
    assert(dirty === clean)
  }

  test("parameterized m: error envelope tightens with register count (64→256→1024)") {
    // standard error is 1.04/√m, so each 4× register step should halve
    // the envelope. A SINGLE draw can invert that (a lucky m=64 set
    // beat m=1024 on the first fixture tried), so the shrink claim is
    // checked on the MEAN absolute error over 8 disjoint fixed key
    // sets (deterministic — no RNG), with a generous 4σ bound on every
    // individual draw.
    val n = 20000
    val sets = (0 until 8).map(t => keys(n, s"pm$t").toDF("k"))
    val errs = Seq(64, 256, 1024).map { m =>
      val es = sets.map { ks =>
        val est = HyperLogLog.estimateM(
          HyperLogLog.registersM(ks, "k", m), m)
          .collect().head.getDouble(0)
        math.abs(est - n) / n
      }
      es.foreach(e =>
        assert(e < 4 * 1.04 / math.sqrt(m), s"m=$m err $e outside 4σ"))
      m -> es.sum / es.length
    }.toMap
    assert(errs(1024) < errs(64) / 2 && errs(256) < errs(64),
      s"mean errors must shrink with registers: $errs")
    // relational == driver-side at every m (the m=64 identity, generalized)
    for (m <- Seq(64, 256, 1024)) {
      val rel: Map[Int, Int] = HyperLogLog.registersM(sets.head, "k", m)
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      val arr = Array.tabulate(m)(i => rel.getOrElse(i, 0))
      val relEst = HyperLogLog
        .estimateM(HyperLogLog.registersM(sets.head, "k", m), m)
        .collect().head.getDouble(0)
      assert(HyperLogLog.estimateRegistersM(arr, m) === relEst)
    }
    // the generalized layout rejects register counts its 16-bit index
    // can't fill uniformly
    intercept[IllegalArgumentException] {
      HyperLogLog.registersM(sets.head, "k", 100)
    }
  }

  test("driver-side estimate == relational estimate") {
    val ks = keys(777, "m").toDF("k")
    val relEst = HyperLogLog.estimate(HyperLogLog.registers(ks, "k"))
      .collect().head.getDouble(0)
    val drvEst = HyperLogLog.estimateRegisters(
      HyperLogLog.build(ks.as[String]))
    assert(relEst === drvEst)
  }
}
