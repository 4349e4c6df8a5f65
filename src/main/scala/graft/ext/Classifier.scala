package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Hashed bag-of-words document classifier — the "quality classifier"
 * stage of a training-data pipeline (GPT-3 / LLaMA filter corpora with
 * exactly this shape: cheap linear model over hashed token features,
 * positives = a curated reference corpus, negatives = raw crawl), run
 * as a distributed Spark iteration.
 *
 * The trainer is a synchronous batch perceptron rather than logistic
 * GD, for a reason that matters to the correctness harness: with
 * binary presence features and unit updates the entire trajectory —
 * weights, bias, margins — is EXACT INTEGER arithmetic. There is no
 * floating-point divergence to stabilize, no rounding convention to
 * mirror: any engine that can sum integers replays training
 * bit-identically (which is what lets `ext_classifier_*` carry full
 * unrolled DuckDB oracles). On linearly separable data the batch
 * perceptron provably converges to zero training errors
 * (Novikoff 1962); once converged, further rounds are no-ops, so a
 * fixed-round oracle replay and an early-stopping trainer agree.
 *
 * Scale shape (the same contract as [[Similarity.kmeansFit]]):
 *  - Feature extraction is one codegen scan — tokens → md5 bucket ids,
 *    `array_distinct` per doc, no explode, no shuffle.
 *  - Each training round scores the corpus against the weight vector as
 *    a BROADCAST LITERAL (`typedLit`) — scan-only, no join — and
 *    reduces misclassified rows to at most `numBuckets + 1` update rows
 *    via a map-side-combined aggregation. Per-round shuffle is
 *    O(partitions × numBuckets), independent of corpus size.
 *  - The driver holds only the weight vector (numBuckets longs) — the
 *    kilobyte-scale synchronization point every distributed linear
 *    trainer has.
 */
object Classifier {

  /** Engine-portable token bucket: the top byte of md5 (two hex chars,
    * parsed base-16) mod `numBuckets`. The md5 convention matches
    * [[Dedup.md5Hash60]]'s rationale — any SQL engine with an `md5`
    * function recomputes it bit-identically. */
  def tokenBucket(tok: Column, numBuckets: Int): Column =
    pmod(conv(substring(md5(tok), 1, 2), 16, 10).cast("int"), lit(numBuckets))

  /** (id, buckets) — sorted-distinct hashed presence features of the
    * lowercased whitespace tokens, one codegen scan. */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
                     numBuckets: Int): DataFrame =
    docs.select(col(idCol),
      bucketsOf(TextOps.tokens(lower(col(textCol))), numBuckets).as("buckets"))

  /** Token array → sorted-distinct bucket array (the feature vector's
    * sparse support). */
  def bucketsOf(toks: Column, numBuckets: Int): Column =
    array_sort(array_distinct(transform(toks, t => tokenBucket(t, numBuckets))))

  /** Trained model: integer weights (index = bucket), integer bias,
    * update rounds actually applied, training errors at the last check
    * (0 = converged). */
  final case class PerceptronModel(weights: Array[Long], bias: Long,
                                   rounds: Int, errors: Long) {
    def weightsFrame(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      (weights.toSeq.zipWithIndex.map { case (w, b) => (b.toLong, w) }
        :+ (-1L, bias)).toDF("bucket", "weight")
    }
  }

  /** Margin of one feature row against a literal model: bias + Σ w[b]
    * over the row's buckets — scan-only, no join. A null buckets array
    * (null/absent-token doc) scores as bias-only, matching what a SQL
    * engine computes for an empty feature set — without the coalesce
    * such rows would score NULL and silently drop out of training. */
  def marginCol(bucketsCol: Column, weights: Array[Long], bias: Long): Column = {
    val wLit = typedLit(weights.toSeq)
    lit(bias) + aggregate(coalesce(bucketsCol, typedLit(Seq.empty[Int])),
      lit(0L), (acc, b) => acc + element_at(wLit, b + 1))
  }

  /**
   * Synchronous batch perceptron over a features frame with a ±1 label
   * column: each round scores every row against the CURRENT weights,
   * then applies the summed update of all misclassified rows (margin
   * y·z ≤ 0) at once. Stops early once a round has zero errors — the
   * remaining rounds of a fixed-length replay are no-ops, so results
   * are independent of where the early-stop lands.
   */
  def perceptronTrain(feats: DataFrame, bucketsCol: String, labelCol: String,
                      numBuckets: Int, maxRounds: Int,
                      init: Option[(Array[Long], Long)] = None): PerceptronModel =
    graft.core.CacheRegistry.scoped {
      require(maxRounds >= 1, s"maxRounds=$maxRounds must be positive")
      require(init.forall(_._1.length == numBuckets),
        "init weights must have numBuckets entries")
      // Normalize the public-API buckets column up front: cast to
      // array<int> (a caller passing array<bigint> — natural from SQL —
      // would otherwise ClassCastException at getInt below) and coalesce
      // null feature sets to empty so null-text docs train as bias-only
      // rows on both engines. The returned model holds only driver
      // arrays, so nothing escaping the scope depends on the cache.
      val f = graft.core.CacheRegistry.persistTracked(
        feats.select(
          coalesce(col(bucketsCol).cast("array<int>"),
            typedLit(Seq.empty[Int])).as("__b"),
          col(labelCol).cast("long").as("__y")))
      val weights = init.map(_._1.clone()).getOrElse(Array.fill(numBuckets)(0L))
      var bias = init.map(_._2).getOrElse(0L)
      var rounds = 0
      var errors = -1L
      while (rounds < maxRounds && errors != 0L) {
        // bias rides along as pseudo-bucket -1, so one aggregation yields
        // every per-bucket delta AND the misclassified count
        val upd = f
          .withColumn("__z", marginCol(col("__b"), weights, bias))
          .filter(col("__y") * col("__z") <= 0)
          .select(explode(concat(col("__b"), array(lit(-1)))).as("bucket"),
            col("__y"))
          .groupBy("bucket")
          .agg(sum("__y").as("dw"), count(lit(1)).as("touched"))
          .collect()
        errors = upd.find(_.getInt(0) == -1).map(_.getLong(2)).getOrElse(0L)
        if (errors != 0L) {
          upd.foreach { r =>
            val b = r.getInt(0)
            if (b == -1) bias += r.getLong(1) else weights(b) += r.getLong(1)
          }
          rounds += 1
        }
      }
      PerceptronModel(weights, bias, rounds, errors)
    }

  /** Features + the model's integer margin per row (`score`), exact in
    * any engine. */
  def score(feats: DataFrame, bucketsCol: String,
            model: PerceptronModel): DataFrame =
    feats.withColumn("score", marginCol(col(bucketsCol), model.weights, model.bias))

  /**
   * Reliability diagram (binned calibration curve) of a scored holdout —
   * the audit run before a quality classifier's scores are used as
   * SAMPLING WEIGHTS rather than a hard cut (the pipeline posture where
   * "score 0.9" must actually mean ~90% positive): map the margin to a
   * confidence via a fixed temperature sigmoid, bin confidences into
   * `nBins` equal-width bins, and compare each bin's mean confidence
   * against its empirical positive rate. Emits per occupied bin
   * (bin, n, n_pos, mean_conf, pos_rate, gap, ece_term); the Expected
   * Calibration Error is Σ ece_term (Naeini et al. 2015).
   *
   * Fp posture: conf is 6-digit-rounded BEFORE binning (bin edges are
   * decided on identical doubles in any engine) and mean_conf sums
   * exact integer micro-units (conf·10⁶) so distributed summation order
   * cannot shift it — the corpusReport convention. gap and ece_term
   * derive from the already-rounded means.
   *
   * Scale shape: one scan bins and aggregates (map-side combined,
   * ≤ nBins rows out); the ece normalizer is a window over the
   * bins-sized frame (the deliberately-tiny-window posture of ksDrift),
   * never a second corpus scan.
   *
   * @param scored   frame with an integer margin column and a ±1 label
   * @param temperature sigmoid scale: conf = σ(score/temperature)
   */
  def calibrationCurve(scored: DataFrame, scoreCol: String, labelCol: String,
                       nBins: Int = 10, temperature: Double = 4.0): DataFrame = {
    require(nBins >= 2, s"nBins=$nBins must be >= 2")
    require(temperature > 0, s"temperature=$temperature must be positive")
    val conf = round(lit(1.0) /
      (lit(1.0) + exp(-col(scoreCol).cast("double") / lit(temperature)))
      + lit(1e-9), 6)
    val full = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    scored
      .select(least(floor(conf * nBins), lit(nBins - 1)).cast("long").as("bin"),
        round(conf * lit(1e6)).cast("long").as("__confu"),
        when(col(labelCol) > 0, 1L).otherwise(0L).as("__pos"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("__pos")).as("n_pos"),
        sum(col("__confu")).as("__sumu"))
      .withColumn("mean_conf", round(col("__sumu").cast("double") / lit(1e6)
        / col("n") + lit(1e-9), 6))
      .withColumn("pos_rate", round(col("n_pos").cast("double") / col("n")
        + lit(1e-9), 6))
      .withColumn("gap", round(abs(col("mean_conf") - col("pos_rate"))
        + lit(1e-9), 6))
      .withColumn("ece_term", round(col("gap") * col("n")
        / sum(col("n")).over(full) + lit(1e-9), 6))
      .select("bin", "n", "n_pos", "mean_conf", "pos_rate", "gap", "ece_term")
  }
}
