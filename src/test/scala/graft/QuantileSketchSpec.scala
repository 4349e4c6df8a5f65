package graft

import graft.functions.QuantileSketch
import org.apache.spark.sql.functions._

/**
 * Rank-error quantile sketch: the typed MinKSample aggregator and the
 * relational bottom-k sample must be bit-identical; merge must be
 * order-, partitioning- and ASSOCIATION-invariant (arbitrary merge
 * trees — the property that makes the standing-table closure argument
 * sound); the estimator must degenerate to the exact lower quantile at
 * k ≥ n and stay inside the DKW rank envelope above it.
 */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int, tag: String): Seq[(String, Double)] =
    (0 until n).map(i => (s"$tag-$i", ((i * 37) % n).toDouble))

  test("typed MinKSample aggregator == relational bottomKSample") {
    val df = (rows(800, "x").map { case (id, v) => ("g1", id, v) } ++
      rows(300, "y").map { case (id, v) => ("g2", id, v) })
      .toDF("g", "id", "v")
    val rel = QuantileSketch.bottomKSample(df, "id", "v", 32, Seq("g"))
      .select("g", "hash", "val", "rank")
      .collect().map(_.toSeq).sortBy(_.toString)
    val agg = QuantileSketch.bottomKSampleAgg(df, "id", "v", 32, Seq("g"))
      .select("g", "hash", "val", "rank")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(rel.toSeq === agg.toSeq)

    val relG = QuantileSketch.bottomKSample(df, "id", "v", 32)
      .select("hash", "val", "rank")
      .collect().map(_.toSeq).sortBy(_.toString)
    val mks = udaf(new QuantileSketch.MinKSample(32))
    val aggG = df.select(mks(col("id"), col("v")).as("ps"))
      .select(posexplode(col("ps")))
      .select(col("col._1"), col("col._2"), (col("pos") + 1).cast("int"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(relG.toSeq === aggG.toSeq)
  }

  test("MinKSample merge: commutative, ASSOCIATIVE, idempotent, bounded") {
    val mk = new QuantileSketch.MinKSample(16)
    // buffers carry mutable arrays, so every comparison goes through
    // finish() — the lossless ascending view of the live slots. merge
    // of two non-empty sides is PURE (fresh output arrays), which is
    // what licenses reusing a/b/c across the merge-tree asserts below.
    def fin(buf: (Int, Array[String], Array[Double])) = mk.finish(buf)
    val a = rows(90, "a").foldLeft(mk.zero)(mk.reduce)
    val b = rows(120, "b").foldLeft(mk.zero)(mk.reduce)
    val c = rows(70, "c").foldLeft(mk.zero)(mk.reduce)
    // commutativity and associativity — arbitrary merge trees agree
    assert(fin(mk.merge(a, b)) === fin(mk.merge(b, a)))
    assert(fin(mk.merge(mk.merge(a, b), c)) ===
      fin(mk.merge(a, mk.merge(b, c))))
    assert(fin(mk.merge(mk.merge(c, a), b)) ===
      fin(mk.merge(b, mk.merge(a, c))))
    // merge == single-pass over the concatenation
    val all = (rows(90, "a") ++ rows(120, "b") ++ rows(70, "c"))
      .foldLeft(mk.zero)(mk.reduce)
    assert(fin(mk.merge(mk.merge(a, b), c)) === fin(all))
    // idempotence: replaying the same rows changes nothing (the
    // standing-table DISTINCT argument in aggregator form) — snapshot
    // the state BEFORE the replay so in-place mutation can't hide a diff
    val before = fin(all).toList
    assert(fin(rows(90, "a").foldLeft(all)(mk.reduce)) === before)
    // null ids are skipped
    assert(fin(mk.reduce(a, (null, 1.0))) === fin(a))
    // bounded at k, sorted ascending, live size == cached size
    assert(all._1 === 16 && fin(all).size === 16 &&
      fin(all) === fin(all).sortBy(p => (p._1, p._2)))
  }

  test("MinKSample merge never aliases its second argument") {
    // Spark's merge-then-reduce sequencing may reduce IN PLACE into
    // whatever merge returns; the Aggregator contract licenses mutating
    // the FIRST argument only. The empty-first-side short-circuit must
    // therefore hand back a COPY of b, not b itself — otherwise the
    // later reduce scribbles over a partial Spark still owns.
    val mk = new QuantileSketch.MinKSample(16)
    val b = rows(40, "m").foldLeft(mk.zero)(mk.reduce)
    val bSnap = mk.finish(b).toList
    val out = mk.merge(mk.zero, b)
    // reduce into the merge result until an insert actually lands
    val extra = (0 until 64).map(i => (s"extra-$i", -1.0 - i))
    extra.foldLeft(out)(mk.reduce)
    assert(mk.finish(b).toList === bSnap,
      "reduce into merge(zero, b) mutated b's arrays")
    // and the merge result itself was correct before the reduces
    assert(mk.merge(mk.zero, b)._1 === b._1)
  }

  test("MinKSample: NaN has a total order (idempotent replay)") {
    // Primitive Double == treats NaN != NaN, which would re-insert the
    // same (id, NaN) pair on every replay. The buffer compares values
    // via java.lang.Double.compare — NaN equals itself and sorts above
    // every finite double, matching Spark SQL and DuckDB sort/DISTINCT
    // semantics, so replay stays a no-op and the two physical forms
    // stay bit-identical on NaN-valued columns.
    val mk = new QuantileSketch.MinKSample(16)
    val base = Seq(("nan-1", Double.NaN), ("nan-2", Double.NaN),
      ("fin-1", 3.0), ("fin-2", Double.PositiveInfinity))
    // NaN != NaN under primitive ==, so the ASSERTIONS compare value
    // bit patterns (the exact property the buffer must preserve)
    def bits(s: Seq[(String, Double)]): List[(String, Long)] =
      s.map { case (h, v) =>
        (h, java.lang.Double.doubleToLongBits(v)) }.toList
    val one = base.foldLeft(mk.zero)(mk.reduce)
    val snap = bits(mk.finish(one))
    assert(snap.size === 4)
    // replaying the identical rows (twice) changes nothing
    val replayed = (base ++ base).foldLeft(one)(mk.reduce)
    assert(bits(mk.finish(replayed)) === snap)
    // and the typed form still agrees with the relational form
    // (val compared as bit patterns — Scala == is IEEE even boxed)
    val df = base.toDF("id", "v").withColumn("g", lit("g1"))
    def rows16(d: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] = d
      .select("g", "hash", "val", "rank")
      .collect().map(r => r.toSeq.updated(2,
        java.lang.Double.doubleToLongBits(r.getDouble(2))))
      .sortBy(_.toString).toSeq
    val rel = rows16(QuantileSketch.bottomKSample(df, "id", "v", 16, Seq("g")))
    val agg = rows16(QuantileSketch.bottomKSampleAgg(df, "id", "v", 16, Seq("g")))
    assert(rel === agg)
    assert(rel.length === 4)
  }

  test("bottomKSample and MinKSample agree on nullable-id input") {
    // A null id must contribute NO sample point in EITHER form: the
    // relational path would otherwise hash null → NULL, which Spark
    // sorts FIRST ascending (entering the bottom-k) while DuckDB sorts
    // NULLs LAST and the typed aggregator skips it — a three-way
    // divergence this fixture pins shut.
    val df = (rows(400, "n").map { case (id, v) => ("g1", id, v) } ++
      Seq(("g1", null.asInstanceOf[String], 0.5),
          ("g1", null.asInstanceOf[String], -3.0)))
      .toDF("g", "id", "v")
    val rel = QuantileSketch.bottomKSample(df, "id", "v", 16, Seq("g"))
      .select("g", "hash", "val", "rank")
      .collect().map(_.toSeq).sortBy(_.toString)
    val agg = QuantileSketch.bottomKSampleAgg(df, "id", "v", 16, Seq("g"))
      .select("g", "hash", "val", "rank")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(rel.toSeq === agg.toSeq)
    assert(rel.length === 16)
    // and the null rows really were dropped, not sampled: every kept
    // hash is a real 12-hex-digit string
    assert(rel.forall(r => r(1) != null &&
      r(1).asInstanceOf[String].matches("[0-9a-f]{12}")))
  }

  test("resample == closure under union (split/merge invariance)") {
    val df = rows(500, "z").toDF("id", "v")
      .withColumn("g", (length(col("id")) % 2).cast("string"))
    val whole = QuantileSketch.bottomKSample(df, "id", "v", 24, Seq("g"))
      .collect().map(_.toSeq).sortBy(_.toString)
    // bottom-k of the union of per-part bottom-k's, parts split on an
    // arbitrary predicate unrelated to hash or value
    val p1 = QuantileSketch.bottomKSample(
      df.filter(col("v") < 250), "id", "v", 24, Seq("g"))
    val p2 = QuantileSketch.bottomKSample(
      df.filter(col("v") >= 250), "id", "v", 24, Seq("g"))
    val merged = QuantileSketch.resample(
        p1.select("g", "hash", "val")
          .unionByName(p2.select("g", "hash", "val")), 24, Seq("g"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(whole.toSeq === merged.toSeq)
  }

  test("estimator: exact lower quantile at k >= n, DKW-bounded below") {
    // k >= n: the sample IS the data, estimates are the exact lower
    // quantiles (rank = ceil(q*n))
    val small = (1 to 10).map(i => (s"id-$i", i.toDouble)).toDF("id", "v")
    val ex = QuantileSketch.estimateQuantiles(
      QuantileSketch.bottomKSample(small, "id", "v", 64),
      Seq("p50" -> 0.5, "p90" -> 0.9, "p100" -> 1.0)).head()
    assert(ex.getLong(0) === 10L)   // m
    assert(ex.getDouble(1) === 5.0) // ceil(0.5*10)=5 → value 5
    assert(ex.getDouble(2) === 9.0) // ceil(0.9*10)=9 → value 9
    assert(ex.getDouble(3) === 10.0)

    // k < n: estimate's true rank within the DKW envelope
    val n = 4000; val k = 256
    val big = (0 until n).map(i => (s"e-$i", ((i * 61) % n).toDouble))
      .toDF("id", "v")
    val est = QuantileSketch.estimateQuantiles(
      QuantileSketch.bottomKSample(big, "id", "v", k),
      Seq("p50" -> 0.5)).head().getDouble(1)
    val trueRank = big.filter(col("v") <= est).count()
    val eps = math.sqrt(math.log(2 / 0.01) / (2.0 * k)) // δ = 1%
    assert(math.abs(trueRank - 0.5 * n) <= eps * n,
      s"p50 est $est: rank $trueRank vs ${0.5 * n} ± ${eps * n}")
  }

  test("streaming qsk ingest: trajectory matches the cumulative replay") {
    val spark2 = spark
    import spark2.implicits._
    val prefix = "qsk_spec"
    for (t <- Seq("_qsk_sample", "_qsk_q"))
      graft.core.Materialize.dropWithLocation(spark, prefix + t)
    val chunks = (0 until 3).map { c =>
      (0 until 120).map(i =>
        (s"id-$c-$i", if (i % 2 == 0) "a" else "b",
          ((c * 120 + i) % 97).toDouble))
        .toDF("id", "g", "v")
    }
    chunks.zipWithIndex.foreach { case (ch, bid) =>
      graft.streaming.SketchIngest.applyBatchQsk(
        ch, bid, "id", "v", "g", prefix, k = 32)
    }
    // crash-replay of the middle batch: state table appends collapse in
    // DISTINCT, est table is batch-guarded — trajectory unchanged
    graft.streaming.SketchIngest.applyBatchQsk(
      chunks(1), 1, "id", "v", "g", prefix, k = 32)
    // compaction preserves the standing sample bit-for-bit at ≤ k
    val before = QuantileSketch.resample(
        spark.table(prefix + "_qsk_sample"), 32, Seq("g"))
      .collect().map(_.toSeq).sortBy(_.toString)
    graft.streaming.SketchIngest.compactQsk(spark, prefix, 32)
    val after = QuantileSketch.resample(
        spark.table(prefix + "_qsk_sample"), 32, Seq("g"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(before.toSeq === after.toSeq)
    // every trajectory row equals the from-scratch cumulative estimate
    val est = spark.table(prefix + "_qsk_q")
      .select("batch_id", "g", "m", "p50", "p90")
      .collect().map(_.toSeq).sortBy(_.toString)
    val replay = (0 until 3).flatMap { bid =>
      val cum = chunks.take(bid + 1).reduce(_ unionByName _)
      QuantileSketch.estimateQuantiles(
          QuantileSketch.bottomKSample(cum, "id", "v", 32, Seq("g")),
          Seq("p50" -> 0.5, "p90" -> 0.9), Seq("g"))
        .select(lit(bid.toLong).as("batch_id"), col("g"), col("m"),
          col("p50"), col("p90"))
        .collect().map(_.toSeq)
    }.sortBy(_.toString)
    assert(est.toSeq === replay.toSeq)
    for (t <- Seq("_qsk_sample", "_qsk_q"))
      graft.core.Materialize.dropWithLocation(spark, prefix + t)
  }
}
