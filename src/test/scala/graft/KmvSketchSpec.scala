package graft

import graft.functions.KmvSketch
import org.apache.spark.sql.functions._

/**
 * KMV bottom-k sketch: the typed MinK aggregator and the relational
 * bottom-k must be bit-identical; merge must be order/partitioning
 * invariant; the estimator must be exact below k and inside the
 * published ~1/√(k−2) envelope above it; set-expression estimates must
 * track the exact figures.
 */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int, tag: String) = (0 until n).map(i => s"$tag-$i")

  test("typed MinK aggregator == relational bottomK (global and grouped)") {
    val df = (keys(800, "x").map(("g1", _)) ++ keys(300, "y").map(("g2", _)))
      .toDF("g", "k")
    val rel = KmvSketch.bottomK(df, "k", 32, Seq("g"))
      .select("g", "hash", "rank").collect().map(_.toSeq).sortBy(_.toString)
    val agg = KmvSketch.bottomKAgg(df, "k", 32, Seq("g"))
      .select("g", "hash", "rank").collect().map(_.toSeq).sortBy(_.toString)
    assert(rel.toSeq === agg.toSeq)

    val relG = KmvSketch.bottomK(df, "k", 32)
      .select("hash", "rank").collect().map(_.toSeq).sortBy(_.toString)
    val minK32 = udaf(new KmvSketch.MinK(32))
    val aggG = df.select(minK32(col("k")).as("hs"))
      .select(posexplode(col("hs")))
      .select(col("col"), (col("pos") + 1).cast("int"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(relG.toSeq === aggG.toSeq)
  }

  test("MinK merge is order- and partitioning-invariant; duplicates are no-ops") {
    val mk = new KmvSketch.MinK(16)
    val a = keys(100, "a").foldLeft(mk.zero)(mk.reduce)
    val b = keys(150, "b").foldLeft(mk.zero)(mk.reduce)
    assert(mk.merge(a, b) === mk.merge(b, a))
    // merge == single-pass over the concatenation
    val all = (keys(100, "a") ++ keys(150, "b")).foldLeft(mk.zero)(mk.reduce)
    assert(mk.merge(a, b) === all)
    // idempotence: folding the same keys again changes nothing
    assert(keys(100, "a").foldLeft(all)(mk.reduce) === all)
    // null keys are skipped
    assert(mk.reduce(a, null) === a)
    // state is sorted ascending and bounded
    assert(all.length === 16 && all === all.sorted)
  }

  test("estimate: exact below k, within 4/sqrt(k-2) above it") {
    val small = (0 until 9).map(i => s"s-$i").toDF("k")
    val exact9 = KmvSketch.estimate(KmvSketch.bottomK(small, "k", 64), 64)
      .head().getDouble(0)
    assert(exact9 === 9.0)

    val n = 5000
    val big = keys(n, "e").toDF("k")
    val est = KmvSketch.estimate(KmvSketch.bottomK(big, "k", 256), 256)
      .head().getDouble(0)
    val relErr = math.abs(est - n) / n
    assert(relErr < 4.0 / math.sqrt(256 - 2),
      s"est $est vs $n: relErr $relErr")
  }

  test("setOps: union/intersection/jaccard track exact on overlapping sets") {
    val sharedN = 600; val onlyA = 900; val onlyB = 400
    val shared = keys(sharedN, "s")
    val aKeys = shared ++ keys(onlyA, "a")
    val bKeys = shared ++ keys(onlyB, "b")
    val k = 256
    val skA = KmvSketch.bottomK(aKeys.toDF("k"), "k", k)
    val skB = KmvSketch.bottomK(bKeys.toDF("k"), "k", k)
    val r = KmvSketch.setOps(skA, skB, k).head()
    val (unionEst, interEst, jacEst) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(3))
    val exactU = sharedN + onlyA + onlyB
    val exactJ = sharedN.toDouble / exactU
    assert(math.abs(unionEst - exactU) / exactU < 0.25,
      s"union $unionEst vs $exactU")
    assert(math.abs(interEst - sharedN) / sharedN < 0.4,
      s"inter $interEst vs $sharedN")
    assert(math.abs(jacEst - exactJ) / exactJ < 0.4,
      s"jaccard $jacEst vs $exactJ")
  }

  test("setOps degenerates to exact when the union fits in k") {
    val shared = keys(20, "s")
    val skA = KmvSketch.bottomK((shared ++ keys(30, "a")).toDF("k"), "k", 256)
    val skB = KmvSketch.bottomK((shared ++ keys(10, "b")).toDF("k"), "k", 256)
    val r = KmvSketch.setOps(skA, skB, 256).head()
    assert(r.getDouble(0) === 60.0) // union exact
    assert(r.getDouble(1) === 20.0) // intersection exact
    assert(r.getDouble(2) === 30.0) // A \ B exact
  }

  test("hashCol 12-hex string order equals numeric order (sanity on fixture)") {
    val hs = KmvSketch.bottomK(keys(200, "h").toDF("k"), "k", 50)
      .select("hash").as[String].collect()
    val numeric = hs.map(java.lang.Long.parseLong(_, 16))
    assert(hs.sorted.toSeq.map(java.lang.Long.parseLong(_, 16)) ===
      numeric.sorted.toSeq)
    assert(hs.forall(_.length === KmvSketch.HexDigits))
  }
}
