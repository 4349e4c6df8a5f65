package graft

import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.expr.{MetricExpr, QualityExpr, TimeExpr}

/**
 * Generator-based invariants (SURVEY §5.2): the expression library must
 * hold its contracts over arbitrary inputs, not just fixture values.
 * Scalacheck generators supply the inputs; each property evaluates
 * through one real Spark plan (one job per property, not per case).
 */
class ExprPropertySpec extends SparkSpec {
  import spark.implicits._

  test("sanitizeRange: output is either NULL or the unchanged in-range input") {
    val inputs = Gen.listOfN(200, Gen.chooseNum(-1e6, 1e6)).sample.get
    val out = inputs.toDF("v")
      .select(col("v"), QualityExpr.sanitizeRange(col("v"), -100, 100).as("c"))
      .collect()
    out.foreach { r =>
      val v = r.getDouble(0)
      if (v < -100 || v > 100) assert(r.isNullAt(1))
      else assert(r.getDouble(1) == v)
    }
  }

  test("congestionIndex: ∈ (-inf,1] ∪ NULL; NULL only from NULL factors") {
    val volumes = Gen.listOfN(300, Gen.chooseNum(0d, 50000d)).sample.get
    val speeds = Gen.listOfN(300, Gen.chooseNum(-10d, 200d)).sample.get
    val rows = volumes.zip(speeds)
    val out = rows.toDF("vol", "sp")
      .select(MetricExpr.congestionIndex(col("vol"), col("sp"),
        lit(60d), lit(2d)).as("ci"))
      .collect()
    out.foreach { r =>
      assert(!r.isNullAt(0), "non-NULL inputs with valid limit/lanes never yield NULL")
      assert(r.getDouble(0) <= 1.0)
    }
  }

  test("period: total over [0,24)×wday — 4 labels on 6-20h, NULL overnight") {
    val hours = (0 to 23).toList
    val days = (1 to 28).toList // Jan 2024 covers every weekday
    val rows = for { d <- days; h <- hours } yield f"2024-01-$d%02d $h%02d:30:00"
    val out = rows.toDF("s")
      .select(col("s"), TimeExpr.period(to_timestamp(col("s"))).as("p"))
      .collect()
    out.foreach { r =>
      val h = r.getString(0).substring(11, 13).toInt
      if (h < 6 || h >= 20) assert(r.isNullAt(1), s"overnight must be NULL: ${r.getString(0)}")
      else assert(Set("amp", "mid", "pmp", "we")(r.getString(1)))
    }
  }

  test("safeDiv never raises and yields NULL exactly on zero denominators") {
    val nums = Gen.listOfN(200, Gen.chooseNum(-1e9, 1e9)).sample.get
    val dens = Gen.listOfN(100, Gen.chooseNum(-1e3, 1e3)).sample.get ++
      List.fill(100)(0d)
    val out = nums.zip(dens).toDF("n", "d")
      .select(col("d"), QualityExpr.safeDiv(col("n"), col("d")).as("q"))
      .collect()
    out.foreach { r =>
      if (r.getDouble(0) == 0d) assert(r.isNullAt(1)) else assert(!r.isNullAt(1))
    }
  }
}
