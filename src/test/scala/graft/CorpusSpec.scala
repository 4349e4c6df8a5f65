package graft

import org.apache.spark.sql.functions._
import graft.ext.Corpus

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit is deterministic and roughly 90/5/5") {
    val ids = spark.range(0, 2000).toDF("id")
    val counts = ids.select(Corpus.hashSplit(col("id")).as("split"))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") > 1700 && counts("train") < 1890)
    assert(counts("val") > 50 && counts("val") < 160)
    assert(counts("test") > 50 && counts("test") < 160)
    // stable across evaluations (pure projection, no RNG)
    val a = ids.select(col("id"), Corpus.hashSplit(col("id")).as("s")).collect().toSeq
    val b = ids.select(col("id"), Corpus.hashSplit(col("id")).as("s")).collect().toSeq
    assert(a == b)
  }

  test("shuffleOrder: dense per-shard positions, salt-keyed epochs, no RNG state") {
    val ids = spark.range(0, 500).toDF("id")
    val out = Corpus.shuffleOrder(ids, "id", shards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.length == 500 && out.map(_._1).distinct.length == 500)
    // positions are 1..n dense within every shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // deterministic: same salt reproduces the identical order
    val again = Corpus.shuffleOrder(ids, "id", shards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // an epoch re-shuffle is a salt change: order must actually move
    val epoch2 = Corpus.shuffleOrder(ids, "id", shards = 4, salt = "epoch2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq != epoch2.sortBy(_._1).toSeq)
  }

  test("percentileGate keeps each group's top slice by exact-percentile cutoff") {
    // group a: scores 1..8 -> p50 = 4.5 -> keeps 5,6,7,8
    // group b: scores 10,20,30 -> p50 = 20 -> keeps 20,30 (>= is inclusive)
    val df = ((1 to 8).map(i => (i.toLong, "a", i.toDouble)) ++
      Seq((101L, "b", 10.0), (102L, "b", 20.0), (103L, "b", 30.0)))
      .toDF("id", "grp", "score")
    val kept = Corpus.percentileGate(df, "grp", "score", q = 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(5L, 6L, 7L, 8L, 102L, 103L))
    // approx path keeps the same rows at this scale (sketch is exact here)
    val approx = Corpus.percentileGate(df, "grp", "score", q = 0.5,
      approx = true).select("id").as[Long].collect().toSet
    assert(approx.subsetOf(kept) || kept.subsetOf(approx))
  }

  test("stratifiedSample takes exactly ceil(frac*n) rows per stratum") {
    val df = (1 to 97).map(i => (i.toLong, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "stratum")
    val out = Corpus.stratifiedSample(df, "stratum", "id", 0.2)
      .groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") == math.ceil(32 * 0.2).toLong)   // 32 multiples of 3
    assert(out("b") == math.ceil(65 * 0.2).toLong)
  }

  test("packSequencesStrided bins by running size within each partition") {
    val df = Seq((1L, "x", 300L), (2L, "x", 300L), (3L, "x", 300L),
      (4L, "y", 600L), (5L, "y", 100L))
      .toDF("id", "part", "sz")
    val out = Corpus.packSequencesStrided(df, "part", "id", "sz", 512)
      .select("id", "bin", "bin_offset")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((0L, 0L)))
    assert(out(2L) == ((0L, 300L)))
    assert(out(3L) == ((1L, 88L)))    // prev=600 -> bin 1, offset 88
    assert(out(4L) == ((0L, 0L)))     // partition y restarts
    assert(out(5L) == ((1L, 88L)))    // prev=600 in y
  }

  test("packSequences (next-fit) never straddles a bin boundary") {
    val df = Seq((1L, "x", 300L), (2L, "x", 300L), (3L, "x", 300L),
      (4L, "x", 212L), (5L, "y", 600L), (6L, "y", 100L))
      .toDF("id", "part", "sz")
    val out = Corpus.packSequences(df, "part", "id", "sz", 512)
      .select("id", "sz", "bin", "bin_offset")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(1)))).toMap
    assert(out(1L) == ((0L, 0L, 300L)))
    assert(out(2L) == ((1L, 0L, 300L)))   // 300+300 > 512: new bin
    assert(out(3L) == ((2L, 0L, 300L)))
    assert(out(4L) == ((2L, 300L, 212L))) // 300+212 == 512: fits exactly
    assert(out(5L) == ((0L, 0L, 600L)))   // oversize doc: own bin
    assert(out(6L) == ((1L, 0L, 100L)))   // can't share with oversize doc
    // capacity invariant for non-oversize docs
    out.values.filter(_._3 <= 512L).foreach { case (_, off, sz) =>
      assert(off + sz <= 512L)
    }
  }

  test("scrubPii redacts emails and phone-shaped tokens, counts match") {
    val df = Seq((1L, "write to a.user+tag@mail.example.org or 555-0199 now"),
      (2L, "no pii here at all")).toDF("id", "text")
    val out = df.select(col("id"), Corpus.scrubPii(col("text")).as("s"),
        Corpus.emailCount(col("text")).as("ne"),
        Corpus.phoneCount(col("text")).as("np"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L)._1 == "write to <EMAIL> or <PHONE> now")
    assert(out(1L)._2 == 1 && out(1L)._3 == 1)
    assert(out(2L) == (("no pii here at all", 0, 0)))
  }

  test("packSequences properties over random corpora: capacity, order, stability") {
    import org.scalacheck.Gen
    val sizesGen = Gen.listOfN(120,
      Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(1L, 700L)))
    val rows = sizesGen.sample.get.zipWithIndex.map { case ((p, sz), i) =>
      (i.toLong, p, sz)
    }
    val df = rows.toDF("id", "part", "sz")
    val out = Corpus.packSequences(df, "part", "id", "sz", 512)
      .select("id", "part", "sz", "bin", "bin_offset")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length == rows.length)
    // capacity invariant for docs that fit; oversize docs sit alone at 0
    out.foreach { case (_, _, sz, _, off) =>
      if (sz <= 512L) assert(off + sz <= 512L) else assert(off == 0L)
    }
    // within a partition, bins are a non-decreasing function of the order
    // column, offsets strictly increase inside a bin, and no two docs in
    // a bin overlap
    out.groupBy(_._2).foreach { case (_, g) =>
      val sorted = g.sortBy(_._1)
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        val (_, _, sz1, b1, o1) = pair(0)
        val (_, _, _, b2, o2) = pair(1)
        assert(b2 >= b1)
        if (b2 == b1) assert(o2 >= o1 + sz1, "docs in a bin must not overlap")
        else assert(o2 == 0L, "a new bin starts at offset 0")
      }
    }
    // stability under append: packing a prefix yields identical placements
    val prefix = rows.sortBy(_._1).take(60)
    val prefixOut = Corpus.packSequences(prefix.toDF("id", "part", "sz"),
        "part", "id", "sz", 512)
      .select("id", "bin", "bin_offset").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val fullOut = out.map(t => t._1 -> ((t._4, t._5))).toMap
    prefixOut.foreach { case (id, placement) =>
      assert(fullOut(id) == placement,
        s"appending later docs must not move doc $id")
    }
  }

  test("dsirWeights ranks target-like docs above raw-like docs") {
    // target = docs about "alpha beta": a held-out doc written in target
    // vocabulary must outscore one written in raw-only vocabulary, and
    // a shared-vocabulary doc must land between them
    val docs = Seq(
      (1L, "alpha beta alpha beta gamma", true),
      (2L, "alpha beta beta alpha alpha", true),
      (3L, "delta epsilon zeta delta eta", false),
      (4L, "epsilon zeta eta delta zeta", false),
      (5L, "alpha beta alpha beta", false),     // target-voc, not labeled
      (6L, "delta epsilon zeta eta", false),    // raw-only voc
      (7L, "alpha beta delta epsilon", false)   // mixed voc
    ).toDF("doc_id", "text", "is_t")
    val w = Corpus.dsirWeights(docs, "doc_id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(5) > w(7), "pure target vocabulary must outscore mixed")
    assert(w(7) > w(6), "mixed vocabulary must outscore pure raw-only")
    // the labeled 5-token docs: target-labeled must outscore raw-labeled
    assert(math.min(w(1), w(2)) > math.max(w(3), w(4)),
      "target-labeled docs must outscore raw-labeled docs of equal length")
    // determinism: same input, same weights, bit for bit
    val w2 = Corpus.dsirWeights(docs, "doc_id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w == w2)
  }

  test("mixture keeps full-rate sources whole and downsamples by the hash gate") {
    import org.apache.spark.sql.functions._
    val a = spark.range(0, 400).toDF("doc_id").withColumn("src", lit("a"))
    val b = spark.range(400, 800).toDF("doc_id").withColumn("src", lit("b"))
    val mixed = Corpus.mixture(Seq((a, 1.0), (b, 0.25)), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val aKept = mixed.count(_._2 == "a")
    val bKept = mixed.count(_._2 == "b")
    assert(aKept == 400, "rate-1.0 source must pass through whole")
    // 64/256 gate over 400 uniform hashes: expect ~100, allow wide slack
    assert(bKept > 50 && bKept < 150, s"rate-0.25 kept $bKept of 400")
    // deterministic: same inputs, same selection
    val again = Corpus.mixture(Seq((a, 1.0), (b, 0.25)), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(mixed.toSet == again.toSet)
    // the b survivors are exactly the cell-gated ids, not a prefix
    val expectedB = b.filter(Corpus.hashCell(col("doc_id")) < lit("40"))
      .collect().map(_.getLong(0)).toSet
    assert(mixed.filter(_._2 == "b").map(_._1).toSet == expectedB)
  }

  test("tokenBudgetSample: budgets are floors crossed by exactly one doc; " +
    "unbudgeted sources pass whole") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        graft.ext.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
    // small enough that the crossing branch actually runs on the spec
    // fixture (src totals there are ~1.5k tokens)
    val budgets = Map("src0" -> 500L, "src1" -> 700L)
    val kept = Corpus.tokenBudgetSample(docs, "source", "doc_id", "n_tokens",
      budgets)
    val per = kept.groupBy("source")
      .agg(sum("n_tokens").as("toks"), count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val full = docs.groupBy("source")
      .agg(sum("n_tokens").as("toks"), count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for ((src, budget) <- budgets) {
      val (toks, _) = per(src)
      if (full(src)._1 < budget)
        // a source smaller than its budget passes whole
        assert(per(src) == full(src), s"$src under budget must pass whole")
      else {
        assert(toks >= budget, s"$src kept $toks < budget $budget (floor)")
        // every kept doc started strictly under the line, so removing
        // the largest kept doc must dip back below the budget
        val maxLast = kept.filter(col("source") === src)
          .agg(max("n_tokens")).head().getLong(0)
        assert(toks - maxLast < budget,
          s"$src over-collected: $toks tokens for budget $budget")
      }
    }
    for ((src, (toks, n)) <- full if !budgets.contains(src))
      assert(per(src) == ((toks, n)), s"unbudgeted $src must pass whole")
    // deterministic: re-running selects the identical id set
    val ids1 = kept.select("doc_id").as[Long].collect().toSet
    val ids2 = Corpus.tokenBudgetSample(docs, "source", "doc_id", "n_tokens",
      budgets).select("doc_id").as[Long].collect().toSet
    assert(ids1 == ids2)
  }

  test("temperatureMix: α<1 up-weights the small source, clipped mass renormalizes") {
    import spark.implicits._
    // big: 900 docs, small: 100, targetFrac 0.5 → budget 500.
    // α=0.5: weights 30:10 ask the small source for 125 docs — it
    // saturates at 100, and water-filling hands the surplus to big:
    // c = (500−100)/30 = 13.3̄ → big rate 0.4̄ (cell-quantized 114/256).
    val docs = ((0L until 900L).map(i => (i, "big")) ++
      (1000L until 1100L).map(i => (i, "small"))).toDF("doc_id", "source")
    def kept(alpha: Double): Map[String, Long] =
      Corpus.temperatureMix(docs, "doc_id", "source", alpha, targetFrac = 0.5)
        .groupBy("source").count().as[(String, Long)].collect().toMap
    val prop = kept(1.0)
    // α=1: both sources sampled at the same ~50% rate (±cell quantization)
    assert(math.abs(prop("big") / 900.0 - prop("small") / 100.0) < 0.1,
      s"alpha=1 must be proportional ($prop)")
    val tempered = kept(0.5)
    assert(tempered("small") == 100L,
      s"the saturated small source must be kept WHOLE ($tempered)")
    val bigRate = tempered("big") / 900.0
    assert(bigRate > 0.35 && bigRate < 0.55, s"big rate $bigRate off water-fill")
    val total = tempered.values.sum
    assert(math.abs(total - 500L) < 60,
      s"renormalization must hold the targetFrac budget (total $total vs 500)")
    // deterministic: the same call selects the same ids
    val a = Corpus.temperatureMix(docs, "doc_id", "source", 0.5, 0.5)
      .select("doc_id").as[Long].collect().toSet
    val b = Corpus.temperatureMix(docs, "doc_id", "source", 0.5, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("snapshotDiff: reports exactly added/removed/changed, silent on unchanged") {
    import spark.implicits._
    val v1 = Seq((1L, "a b c"), (2L, "x y"), (3L, "p q")).toDF("doc_id", "text")
    val v2 = Seq((1L, "a b c"), (2L, "x y z"), (4L, "new doc"))
      .toDF("doc_id", "text")
    val diff = Corpus.snapshotDiff(v1, v2, "doc_id", "text")
      .as[(Long, String)].collect().toSet
    assert(diff == Set((2L, "changed"), (3L, "removed"), (4L, "added")))
    // normalization-equivalent edits (case/whitespace) are NOT changes
    val v2b = Seq((1L, "A  b   C")).toDF("doc_id", "text")
    val d2 = Corpus.snapshotDiff(
      Seq((1L, "a b c")).toDF("doc_id", "text"), v2b, "doc_id", "text")
    assert(d2.count() == 0)
  }

  test("curriculumOrder: equal-population stages by ease, shuffled within, salt-stable") {
    import spark.implicits._
    // ease 1..8 over 8 docs, 4 bins → the two easiest (ease 8, 7) are
    // stage 0, …, the two hardest (ease 2, 1) are stage 3
    val docs = (1L to 8L).map(i => (i, i.toDouble)).toDF("doc_id", "ease")
    val out = Corpus.curriculumOrder(docs, "doc_id", "ease",
        bins = 4, shards = 2)
      .select("doc_id", "bin", "shard", "pos")
      .as[(Long, Long, Int, Long)].collect().sortBy(_._1)
    val binOf = out.map(r => r._1 -> r._2).toMap
    assert(binOf(8L) == 0L && binOf(7L) == 0L)
    assert(binOf(2L) == 3L && binOf(1L) == 3L)
    // positions are consecutive from 1 within each (bin, shard)
    out.groupBy(r => (r._2, r._3)).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // same salt = same schedule; a new salt preserves the STAGES while
    // re-permuting within them
    val again = Corpus.curriculumOrder(docs, "doc_id", "ease", 4, 2)
      .select("doc_id", "bin", "shard", "pos")
      .as[(Long, Long, Int, Long)].collect().sortBy(_._1)
    assert(out.toSeq == again.toSeq)
    val epoch2 = Corpus.curriculumOrder(docs, "doc_id", "ease", 4, 2, salt = "e2")
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(out.forall(r => epoch2(r._1) == r._2),
      "a salt change must re-shuffle within stages, never move a doc across stages")
  }

  test("temperatureMix: NULL-source rows keep their computed rate, not silently dropped") {
    import spark.implicits._
    val docs = ((0L until 200L).map(i => (i, Option("src"))) ++
      (1000L until 1200L).map(i => (i, Option.empty[String])))
      .toDF("doc_id", "source")
    val byGroup = Corpus.temperatureMix(docs, "doc_id", "source",
        alpha = 1.0, targetFrac = 0.5)
      .groupBy("source").count().as[(Option[String], Long)].collect().toMap
    val nullKept = byGroup.getOrElse(None, 0L)
    assert(nullKept > 50L && nullKept < 150L,
      s"null-source group must sample at ~50%, kept $nullKept of 200")
  }

  test("ksDrift: identical snapshots gap 0; disjoint snapshots reach gap 1") {
    import spark.implicits._
    val a = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val same = graft.ext.Corpus.ksDrift(a, a, "v", binWidth = 10.0)
      .agg(max(col("gap"))).head().getDouble(0)
    assert(same == 0.0, s"identical snapshots must have KS 0, got $same")
    // fully separated supports: below the crossover the old CDF is 1 and
    // the new is 0 — the max gap must reach 1 exactly
    val b = (1 to 100).map(i => (i.toLong, i + 1000.0)).toDF("id", "v")
    val disjoint = graft.ext.Corpus.ksDrift(a, b, "v", binWidth = 10.0)
      .agg(max(col("gap"))).head().getDouble(0)
    assert(disjoint == 1.0, s"disjoint snapshots must have KS 1, got $disjoint")
    // CDFs are monotone and end at 1 on both sides
    val rows = graft.ext.Corpus.ksDrift(a, b, "v", binWidth = 10.0)
      .orderBy("bin").collect()
    assert(rows.last.getAs[Double]("cdf_old") == 1.0 &&
      rows.last.getAs[Double]("cdf_new") == 1.0)
    val cdfs = rows.map(r => (r.getAs[Double]("cdf_old"), r.getAs[Double]("cdf_new")))
    assert(cdfs.sliding(2).forall {
      case Array((o1, n1), (o2, n2)) => o2 >= o1 && n2 >= n1
      case _ => true
    }, "binned CDFs must be monotone")
  }

  test("chiSqDrift: zero on identical snapshots, hand-computed two-bin case") {
    import spark.implicits._
    val a = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val same = graft.ext.Corpus.chiSqDrift(a, a, "v", binWidth = 10.0)
      .agg(max(col("chisq_term"))).head().getDouble(0)
    assert(same == 0.0, s"identical snapshots must have chi-square 0, got $same")
    // two bins, old (30, 10), new (10, 30): K1 = K2 = 1 (equal totals);
    // both bins' terms = (10-30)^2/40 = 10.0
    val o = Seq((0L, 30.0), (1L, 10.0)).flatMap { case (b, n) =>
      (1 to n.toInt).map(i => (i.toLong, b * 10.0 + 1)) }.toDF("id", "v")
    val nw = Seq((0L, 10.0), (1L, 30.0)).flatMap { case (b, n) =>
      (1 to n.toInt).map(i => (i.toLong, b * 10.0 + 1)) }.toDF("id", "v")
    val terms = graft.ext.Corpus.chiSqDrift(o, nw, "v", binWidth = 10.0)
      .orderBy("bin").collect().map(_.getAs[Double]("chisq_term")).toSeq
    assert(terms == Seq(10.0, 10.0), s"expected (10, 10), got $terms")
  }

  test("corpusReport: counts, exact-sum means, dup rate under normalization") {
    import spark.implicits._
    // src A: 4 docs, 2 exact dups under trim/lower/ws-collapse, 1 empty;
    // src B: 2 distinct docs
    val docs = Seq(
      (1L, "Hello  World", "A"),
      (2L, "  hello world ", "A"),   // normalized dup of 1
      (3L, "", "A"),                  // empty: 0 tokens
      (4L, "unique text", "A"),
      (5L, "b one", "B"),
      (6L, "b two", "B")).toDF("doc_id", "text", "source")
    val rep = graft.ext.Corpus.corpusReport(docs, "doc_id", "text", "source")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = rep("A")
    assert(a.getAs[Long]("n_docs") == 4 && a.getAs[Long]("n_empty") == 1)
    assert(a.getAs[Long]("n_tokens") == 6) // 2 + 2 + 0 + 2
    assert(a.getAs[Long]("n_distinct") == 3) // {hello world, "", unique text}
    assert(a.getAs[Double]("dup_rate") == 0.25)
    val b = rep("B")
    assert(b.getAs[Long]("n_docs") == 2 && b.getAs[Double]("dup_rate") == 0.0)
  }
}
