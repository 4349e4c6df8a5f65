package graft

import org.apache.spark.sql.functions._
import graft.ext.Classifier

/** Batch-perceptron quality classifier: convergence, interpretability,
  * exactness, and the scan-only scoring plan shape. */
class ClassifierSpec extends SparkSpec {

  private val lex = Seq("stream", "window", "merge")

  /** The registered fixture rebuilt locally: lexicon positives + their
    * stripped twins, md5-bucket presence features at B=64. */
  private def fixture() = {
    val lexLit = typedLit(lex)
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.ext.TextOps.tokens(lower(col("text"))).as("toks"))
      .filter(arrays_overlap(col("toks"), lexLit))
    val pos = docs.select(col("doc_id"), col("toks"), lit(1L).as("y"))
    val neg = docs.select((col("doc_id") + 100000).as("doc_id"),
      filter(col("toks"), t => !array_contains(lexLit, t)).as("toks"),
      lit(-1L).as("y"))
    pos.unionByName(neg)
      .select(col("doc_id"), Classifier.bucketsOf(col("toks"), 64).as("buckets"),
        col("y"))
  }

  test("perceptron converges to zero training errors on the separable fixture") {
    val model = Classifier.perceptronTrain(fixture(), "buckets", "y",
      numBuckets = 64, maxRounds = 12)
    assert(model.errors == 0L, s"training ended with ${model.errors} errors")
    assert(model.rounds < 12, s"needed all ${model.rounds} rounds — raise maxRounds")
  }

  test("the lexicon buckets dominate the learned weights") {
    val model = Classifier.perceptronTrain(fixture(), "buckets", "y",
      numBuckets = 64, maxRounds = 12)
    val lexBuckets = lex.map { t =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      (d(0) & 0xff) % 64
    }.toSet
    val lexMin = lexBuckets.map(model.weights(_)).min
    val otherMax = model.weights.indices
      .filterNot(lexBuckets).map(b => math.abs(model.weights(b))).max
    assert(lexMin > 100 * math.max(otherMax, 1L),
      s"lexicon weight floor $lexMin vs non-lexicon ceiling $otherMax — " +
        "the signal buckets must carry the model")
  }

  test("selection gate recovers the true labels exactly, with an integer margin") {
    val feats = fixture()
    val model = Classifier.perceptronTrain(feats, "buckets", "y",
      numBuckets = 64, maxRounds = 12)
    val scored = Classifier.score(feats, "buckets", model)
      .select(col("y"), col("score"))
    val bad = scored.filter((col("score") > 0) =!= (col("y") === 1L)).count()
    assert(bad == 0L, s"$bad docs land on the wrong side of the gate")
    val minMargin = scored.agg(min(col("y") * col("score"))).head().getLong(0)
    assert(minMargin >= 1L, s"margins are integers; converged floor is >= 1, got $minMargin")
  }

  test("scoring is scan-only: no exchange, no window, no join") {
    val model = Classifier.perceptronTrain(fixture(), "buckets", "y",
      numBuckets = 64, maxRounds = 12)
    val p = Classifier.score(fixture(), "buckets", model)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Window") && !p.contains("Join"),
      "the weight vector rides the projection as a literal — the corpus never moves")
  }

  test("perceptron converges on arbitrary wide-margin separable data (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val B = 32
    // hidden model with a comfortable margin; labels derived from it,
    // so the data is separable by construction and Novikoff bounds the
    // round count
    val hidden = Array.fill(B)(rnd.nextInt(7) - 3)
    val rows = (0 until 300).map { i =>
      val buckets = (0 until B).filter(_ => rnd.nextDouble() < 0.25).toArray
      val z = buckets.map(hidden(_)).sum
      (i.toLong, buckets.toSeq, if (z >= 2) 1L else if (z <= -2) -1L else 0L)
    }.filter(_._3 != 0L) // keep only wide-margin rows
    assert(rows.size > 100, "fixture generator must keep a real corpus")
    val feats = rows.toDF("doc_id", "buckets", "y")
    val model = Classifier.perceptronTrain(feats, "buckets", "y",
      numBuckets = B, maxRounds = 500)
    assert(model.errors == 0L,
      s"separable data must converge; ${model.errors} errors after ${model.rounds} rounds")
  }

  test("null buckets score as bias-only and train; bigint buckets accepted") {
    import spark.implicits._
    // null-feature doc: scores bias (not NULL) and participates in
    // training as a bias-only row — matching what DuckDB computes for an
    // empty feature set
    val m = Classifier.PerceptronModel(Array(5L, -3L), 7L, 1, 0)
    val scored = Classifier.score(
      Seq((1L, Some(Seq(0, 1))), (2L, None)).toDF("doc_id", "buckets"),
      "buckets", m).orderBy("doc_id").select("score").as[Long].collect()
    assert(scored.toSeq == Seq(7L + 5L - 3L, 7L),
      "null feature set must score as bias-only, not NULL")
    // array<bigint> buckets (natural from SQL) must train without a
    // ClassCastException and match the array<int> trajectory
    val tracked0 = graft.core.CacheRegistry.trackedCount
    val rows = Seq((1L, Seq(0L, 1L), 1L), (2L, Seq(1L), -1L), (3L, Seq(0L), 1L))
    val big = Classifier.perceptronTrain(
      rows.toDF("doc_id", "buckets", "y"), "buckets", "y", 2, 50)
    val small = Classifier.perceptronTrain(
      rows.map { case (d, b, y) => (d, b.map(_.toInt), y) }
        .toDF("doc_id", "buckets", "y"), "buckets", "y", 2, 50)
    assert(big.weights.toSeq == small.weights.toSeq && big.bias == small.bias,
      "bigint and int bucket arrays must produce the identical trajectory")
    // training cache is scope-released: no accretion from these trains
    // (delta, not absolute — other suites share the JVM-wide registry)
    assert(graft.core.CacheRegistry.trackedCount <= tracked0,
      "perceptronTrain must release its features cache on exit")
  }

  test("md5 token bucket matches the JVM digest byte-for-byte") {
    import spark.implicits._
    val toks = Seq("stream", "window", "merge", "hash", "a", "dup")
    val got = toks.toDF("tok")
      .select(Classifier.tokenBucket(col("tok"), 64).as("b"))
      .as[Int].collect().toSeq
    val want = toks.map { t =>
      val d = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      (d(0) & 0xff) % 64
    }
    assert(got == want, s"$got vs $want")
  }

  test("hashingTf: dims-wide count vector, hand-verified buckets, empty doc emits nothing") {
    import spark.implicits._
    def bucket(t: String, dims: Int): Int = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      (d(0) & 0xff) % dims
    }
    val docs = Seq((1L, "Alpha beta ALPHA"), (2L, "   ")).toDF("doc_id", "text")
    val out = graft.ext.TextOps.hashingTf(docs, "doc_id", "text", dims = 8)
      .as[(Long, Seq[Long])].collect().toMap
    assert(!out.contains(2L), "zero-token doc must produce no row")
    val v = out(1L)
    assert(v.length == 8 && v.sum == 3L)
    assert(v(bucket("alpha", 8)) >= 2L, "case-folded dupes count twice")
    assert(v(bucket("beta", 8)) >= 1L)
  }

  test("calibrationCurve: hand-computed bins, ECE terms sum over occupied bins") {
    import spark.implicits._
    // T=4 sigmoid: score 0 → conf 0.5 (bin 5); score 4 → σ(1)≈0.731059
    // (bin 7); score -4 → ≈0.268941 (bin 2)
    val rows = Seq((0L, 1L), (0L, -1L), (4L, 1L), (4L, 1L), (-4L, -1L))
      .toDF("score", "y")
    val out = Classifier.calibrationCurve(rows, "score", "y", nBins = 10,
        temperature = 4.0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(6))).toMap
    assert(out.keySet == Set(2L, 5L, 7L))
    assert(out(5L)._1 == 2L && out(5L)._2 == 1L)
    assert(out(5L)._3 == 0.5 && out(5L)._4 == 0.5)
    assert(out(7L)._1 == 2L && out(7L)._2 == 2L)
    assert(out(7L)._3 == 0.731059 && out(7L)._4 == 1.0)
    assert(out(2L)._2 == 0L)
    // ece terms: bin5 gap 0 → 0; bin7 |0.731059-1|·2/5; bin2 |0.268941-0|·1/5
    assert(out(5L)._5 == 0.0)
    assert(out(7L)._5 == BigDecimal(0.268941 * 2 / 5)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("calibrationCurve: conf 1.0 lands in the top bin, not bin nBins") {
    import spark.implicits._
    // score 100, T=4 → σ(25) rounds to 1.0 → floor(10.0)=10 must clamp to 9
    val out = Classifier.calibrationCurve(
      Seq((100L, 1L)).toDF("score", "y"), "score", "y").collect()
    assert(out.length == 1 && out.head.getLong(0) == 9L)
  }
}
