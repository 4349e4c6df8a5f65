package graft

import graft.functions.BloomSketch
import org.apache.spark.sql.functions._

/**
 * Bloom: relational positions == packed bits; no false negatives ever;
 * merge = union/OR; false-positive rate in the engineered band.
 */
class BloomSketchSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4
  private val M = 2048

  private def keys(n: Int, tag: String) = (0 until n).map(i => s"$tag-$i")

  test("relational positions == packed bits, bit for bit") {
    val ks = keys(100, "a")
    val rel = BloomSketch.positions(ks.toDF("k"), "k", K, M)
      .as[Int].collect().toSet
    val packed = BloomSketch.build(ks.toDS(), K, M)
    val fromPacked = (0 until M).filter(p =>
      (packed(p >> 6) & (1L << (p & 63))) != 0L).toSet
    assert(rel === fromPacked)
  }

  test("no false negatives; merge by union equals one-shot; fp rate in band") {
    val a = keys(60, "a")
    val b = keys(40, "b")
    val pos = BloomSketch.positions((a ++ b).toDF("k"), "k", K, M)
    // every inserted key is a member — relational and packed
    val flags = BloomSketch.mightContain((a ++ b).toDF("k"), "k", pos, K, M)
      .as[(String, Boolean)].collect()
    assert(flags.forall(_._2), "false negative!")
    val packed = BloomSketch.build((a ++ b).toDS(), K, M)
    assert((a ++ b).forall(BloomSketch.mightContainPacked(packed, K, M, _)))
    // union of per-source position tables == one-shot build
    val merged = BloomSketch.positions(a.toDF("k"), "k", K, M)
      .unionByName(BloomSketch.positions(b.toDF("k"), "k", K, M))
      .distinct().as[Int].collect().toSet
    assert(merged === pos.as[Int].collect().toSet)
    // OR-merge of packed twins == one-shot packed
    val pm = new BloomSketch.Pack(K, M).merge(
      BloomSketch.build(a.toDS(), K, M), BloomSketch.build(b.toDS(), K, M))
    assert(pm.toSeq === packed.toSeq)
    // 100 inserted keys at m=2048, k=4: fill ≈ 17.8%, theoretical fpr
    // ≈ 0.1% — 500 non-members must produce well under 10% positives
    val nonMembers = keys(500, "z")
    val fp = nonMembers.count(BloomSketch.mightContainPacked(packed, K, M, _))
    assert(fp < 50, s"fp=$fp of 500 — rate far above the engineered band")
  }

  test("duplicated probe keys never produce a false negative") {
    // pre-fix, a key occurring d times in the probe frame counted d*k
    // semi-join hits and failed the `hits == k` membership test — a
    // false negative. The probe must distinct its keys internally.
    val ks = keys(30, "a")
    val pos = BloomSketch.positions(ks.toDF("k"), "k", K, M)
    val dupProbe = (ks ++ ks ++ ks.take(7)).toDF("k") // d in {2, 3}
    val flags = BloomSketch.mightContain(dupProbe, "k", pos, K, M)
      .as[(String, Boolean)].collect()
    assert(flags.length === 30, "one row per DISTINCT probe key")
    assert(flags.forall(_._2), "duplicated member key reported absent!")
  }
}
