package graft

import org.apache.spark.sql.functions._
import graft.quality.Checks

/** dbt-test-equivalent check library (reference `5_dbt/READ.md:296-381,826-879`). */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("notNull returns exactly the violating rows") {
    val df = Seq((1, Option("a")), (2, None), (3, Option("c"))).toDF("id", "v")
    val out = Checks.notNull(df, Seq("v")).select("id").collect().map(_.getInt(0))
    assert(out.toSeq == Seq(2))
  }

  test("unique flags keys with >1 row") {
    val df = Seq(1, 1, 2, 3, 3, 3).toDF("k")
    val out = Checks.unique(df, Seq("k"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 2L, 3 -> 3L))
  }

  test("unique ignores NULL keys (dbt semantics — notNull's job, not unique's)") {
    val df = Seq(Option(1), Option(1), None, None, None).toDF("k")
    val out = Checks.unique(df, Seq("k"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 2L), "the 3 NULL-keyed rows must not be a duplicate group")
  }

  test("relationships ignores NULL child keys (dbt semantics)") {
    val child = Seq(Option(1), Option(2), None, Option(9)).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    val orphans = Checks.relationships(child, "fk", parent, "pk")
      .collect().map(_.getInt(0))
    assert(orphans.toSeq == Seq(9), "only the non-NULL missing key is an orphan")
  }

  test("acceptedRange/acceptedValues ignore NULLs and flag out-of-band") {
    val df = Seq(Option(-1d), Option(50d), None, Option(200d)).toDF("v")
    assert(Checks.acceptedRange(df, "v", 0, 120).count() == 2)
    val ev = Seq(Option("click"), Option("weird"), None).toDF("t")
    assert(Checks.acceptedValues(ev, "t", Seq("click", "view")).count() == 1)
  }

  test("threeSigmaOutliers flags the planted outlier only") {
    val vals = Seq.fill(100)(10d) ++ Seq(10.5, 9.5, 1000d)
    val df = vals.toDF("v")
    val out = Checks.threeSigmaOutliers(df, "v").collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(1000d))
  }

  test("freshness flags only keys staler than the allowed lag") {
    val df = Seq(
      ("a", "2024-01-31 23:00:00"), ("a", "2024-01-31 10:00:00"),
      ("b", "2024-01-30 00:00:00"))
      .toDF("k", "ts").select(col("k"), to_timestamp(col("ts")).as("ts"))
    val out = Checks.freshness(df, "ts", Seq("k"),
        to_timestamp(lit("2024-02-01 00:00:00")), maxLagSec = 6 * 3600)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // a's newest row is 1h old (fresh); b is 2 days old (stale)
    assert(out.keySet == Set("b") && out("b") == 2 * 86400L)
  }

  test("endBeforeStart + thresholded runner") {
    val df = Seq(("2024-01-01", "2024-01-02"), ("2024-01-05", "2024-01-04"))
      .toDF("s", "e")
      .select(to_date(col("s")).as("s"), to_date(col("e")).as("e"))
    val r = Checks.run("interval", Checks.endBeforeStart(df, "s", "e"), threshold = 0)
    assert(r.violations == 1 && !r.passed)
  }

  test("kAnonymity: flags only classes under k, empty result when anonymous") {
    val df = (Seq.fill(10)(("US", "M")) ++ Seq.fill(10)(("US", "F")) ++
      Seq(("NZ", "M"), ("NZ", "M"), ("FR", "F")))
      .toDF("country", "seg")
    val viol = Checks.kAnonymity(df, Seq("country", "seg"), k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(viol == Set(("NZ", "M", 2L), ("FR", "F", 1L)))
    // with k=2 only the singleton violates
    val v2 = Checks.kAnonymity(df, Seq("country", "seg"), k = 2)
      .collect().map(_.getString(0)).toSeq
    assert(v2 == Seq("FR"))
    intercept[IllegalArgumentException] {
      Checks.kAnonymity(df, Seq("country"), k = 1)
    }
  }

  test("madOutliers: threshold immune to the outliers themselves") {
    // 99 values near 10 plus one enormous spike: 3-sigma lets the spike
    // inflate its own sd; MAD must still flag it (and only it)
    val rows = ((1 to 99).map(i => (i.toLong, "g", 10.0 + (i % 3))) :+
      (100L, "g", 1e6)).toDF("id", "grp", "v")
    val out = Checks.madOutliers(rows, "v", Seq("grp"), k = 3.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out == Set(100L), s"expected only the spike, got $out")
  }

  test("rollingAnomalies: flags the departure point, skips cold starts and flat histories") {
    // series 'a': alternating 1.0/1.02 (live variance), spike at row 26;
    // series 'b': constant history (sd = 0) then a spike — unjudged
    val a = (1 to 25).map(i => (i.toLong, "a", i.toLong, 1.0 + 0.02 * (i % 2))) :+
      (26L, "a", 26L, 50.0)
    val b = (1 to 25).map(i => (100L + i, "b", i.toLong, 5.0)) :+ (126L, "b", 26L, 50.0)
    val rows = (a ++ b).toDF("id", "grp", "seq", "v")
    val flagged = Checks.rollingAnomalies(rows, "v",
        keyCols = Seq("grp"), orderCols = Seq("seq"),
        window = 20, minPrior = 10, k = 3.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(flagged == Set(26L),
      s"only series-a's departure point is judgeable, got $flagged")
  }

  test("cohenKappa: hand-computed 2x2 table; unrated rows excluded") {
    // a/a: 20, b/b: 5, a/b: 10, b/a: 5 → n=40, agree=25
    // marginals: A(a)=30, A(b)=10; B(a)=25, B(b)=15
    // s = 30*25 + 10*15 = 900; kappa = (25*40-900)/(1600-900) = 100/700
    val rows = Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("b", "b")) ++
      Seq.fill(10)(("a", "b")) ++ Seq.fill(5)(("b", "a")) :+
      ((null: String, "a")) :+ (("a", null: String))
    val out = Checks.cohenKappa(rows.toDF("r1", "r2"), "r1", "r2").head()
    assert(out.getLong(0) == 40L)
    assert(out.getDouble(1) == 0.625)   // po = 25/40
    assert(out.getDouble(2) == 0.5625)  // pe = 900/1600
    assert(out.getDouble(3) == BigDecimal(100.0 / 700)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("cohenKappa: perfect agreement is 1, chance-saturated is NULL") {
    val perfect = Checks.cohenKappa(
      Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("r1", "r2"),
      "r1", "r2").head()
    assert(perfect.getDouble(3) == 1.0)
    // both raters constant: pe = 1, kappa undefined → NULL not a crash
    val degenerate = Checks.cohenKappa(
      Seq(("x", "x"), ("x", "x")).toDF("r1", "r2"), "r1", "r2").head()
    assert(degenerate.isNullAt(3))
    assert(degenerate.getDouble(1) == 1.0)
  }

  test("chiSquareUniform: zero when balanced; hand value on the 10/20 split") {
    val even = Checks.chiSquareUniform(
      Seq("a", "a", "b", "b", "c", "c").toDF("cat"), "cat").head()
    assert(even.getLong(0) == 3L && even.getDouble(2) == 0.0)
    // counts (10, 20): chi2 = 2*(100+400)/30 - 30 = 10/3
    val skewed = Checks.chiSquareUniform(
      (Seq.fill(10)("x") ++ Seq.fill(20)("y")).toDF("cat"), "cat").head()
    assert(skewed.getLong(1) == 30L)
    assert(skewed.getDouble(2) == 3.333333)
    assert(skewed.getLong(3) == 1L)
  }

  test("benfordAudit: hand shares, zero-filled digits, non-positive excluded") {
    val vals = Seq(1L, 1L, 19L, 23L, 911L, 0L, -5L)
    val out = Checks.benfordAudit(vals.toDF("v"), "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.size == 9)
    // 5 positive values: digits 1,1,1,2,9
    assert(out(1L)._1 == 3L && out(1L)._2 == 0.6)
    assert(out(2L)._1 == 1L && out(2L)._2 == 0.2)
    assert(out(9L)._1 == 1L)
    assert(out(3L)._1 == 0L && out(3L)._2 == 0.0, "unobserved digit zero-fills")
    // expected shares are the Benford values
    assert(out(1L)._3 == 0.30103)
    assert(out(9L)._3 == 0.045757)
  }

  test("fleissKappa: hand-computed 4-item / 3-rater table") {
    // per-item votes (ok, bad): (3,0) (2,1) (1,2) (0,3)
    // → P̄ = 2/3, pe = 1/2, kappa = 1/3 exactly
    val rows = Seq(
      (1L, "ok"), (1L, "ok"), (1L, "ok"),
      (2L, "ok"), (2L, "ok"), (2L, "bad"),
      (3L, "ok"), (3L, "bad"), (3L, "bad"),
      (4L, "bad"), (4L, "bad"), (4L, "bad"))
    val out = Checks.fleissKappa(rows.toDF("item", "cat"), "item", "cat", 3).head()
    assert(out.getLong(0) == 4L && out.getLong(1) == 3L)
    assert(out.getDouble(2) == 0.666667)
    assert(out.getDouble(3) == 0.5)
    assert(out.getDouble(4) == 0.333333)
    graft.core.CacheRegistry.releaseAll()
  }

  test("fleissKappa: wrong-count items dropped; perfect = 1; saturated = NULL") {
    // item 9 has only 2 ratings at r=3 — must not contaminate the stats
    val rows = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "b"), (2L, "b"), (2L, "b"),
      (9L, "a"), (9L, "b"))
    val out = Checks.fleissKappa(rows.toDF("item", "cat"), "item", "cat", 3).head()
    assert(out.getLong(0) == 2L)
    assert(out.getDouble(4) == 1.0, "perfect agreement")
    // every rating one category: pe = 1 → NULL kappa, not a crash
    val sat = Checks.fleissKappa(
      Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "x"))
        .toDF("item", "cat"), "item", "cat", 2).head()
    assert(sat.isNullAt(4))
    assert(sat.getDouble(2) == 1.0)
    graft.core.CacheRegistry.releaseAll()
  }
}
