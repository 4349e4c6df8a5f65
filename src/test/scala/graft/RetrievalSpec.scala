package graft

import graft.ext.Retrieval
import org.apache.spark.sql.functions._

/**
 * BM25 retrieval: score correctness against an independent driver-side
 * computation on a toy corpus, ranking/tiebreak rules, and the plan
 * shape that makes it an inverted-index lookup (query terms broadcast,
 * never a corpus-vs-corpus sort-merge join).
 */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    ("a", "apple banana apple"),
    ("b", "banana cherry"),
    ("c", "cherry cherry cherry durian"),
    ("d", "apple durian banana cherry")).toDF("doc_id", "text")

  /** Independent BM25 (plain Scala, same smoothed idf). */
  private def refBm25(docs: Seq[(String, Seq[String])],
      query: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : Map[String, Double] = {
    val n = docs.size.toDouble
    val avgdl = docs.map(_._2.size).sum / n
    val df = docs.flatMap(_._2.distinct).groupBy(identity).view.mapValues(_.size.toDouble)
    docs.map { case (id, toks) =>
      val dl = toks.size.toDouble
      val score = query.map { t =>
        val tc = toks.count(_ == t).toDouble
        if (tc == 0) 0.0
        else math.log(1 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          tc * (k1 + 1) / (tc + k1 * (1 - b + b * dl / avgdl))
      }.sum
      id -> (math.rint((score + 1e-9) * 1e6) / 1e6)
    }.toMap.filter(_._2 > 0)
  }

  test("bm25 scores match an independent computation") {
    val queries = Seq((0L, "apple"), (0L, "cherry"), (1L, "durian")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(corpus, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val docs = corpus.collect().map(r =>
      r.getString(0) -> r.getString(1).split("\\s+").toSeq).toSeq
    val exp0 = refBm25(docs, Seq("apple", "cherry"))
    val exp1 = refBm25(docs, Seq("durian"))
    val exp = exp0.map { case (d, s) => (0L, d) -> s } ++
      exp1.map { case (d, s) => (1L, d) -> s }
    assert(got.keySet === exp.keySet)
    for ((key, s) <- exp)
      assert(math.abs(got(key) - s) < 1e-9, s"score mismatch at $key")
  }

  test("top-k truncates per query with doc_id tiebreak on equal rounded scores") {
    val queries = Seq((0L, "cherry")).toDF("query_id", "term")
    val top1 = Retrieval.bm25TopK(corpus, queries, k = 1).collect()
    assert(top1.length === 1)
    // c has tc=3 of 'cherry' — highest saturation, must win
    assert(top1.head.getString(1) === "c")
    val top3 = Retrieval.bm25TopK(corpus, queries, k = 3)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(top3.toSeq === Seq("b", "c", "d")) // 'a' has no cherry: excluded
  }

  test("docs without query terms never appear; empty docs don't count toward N") {
    val withEmpty = corpus.union(Seq(("e", "   ")).toDF("doc_id", "text"))
    val queries = Seq((0L, "apple")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(withEmpty, queries, k = 10).collect()
    assert(got.map(_.getString(1)).toSet === Set("a", "d"))
    // N must equal 4 (e has no tokens): scores identical to the 4-doc corpus
    val base = Retrieval.bm25TopK(corpus, queries, k = 10)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    for (r <- got) assert(r.getDouble(2) === base(r.getString(1)))
  }

  test("df-derived benchmark queries are deterministic and skip the df top-10") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val q1 = Retrieval.dfDerivedQueries(docs, n = 4, perQuery = 3).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(identity)
    val q2 = Retrieval.dfDerivedQueries(docs, n = 4, perQuery = 3).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(identity)
    assert(q1.toSeq === q2.toSeq)
    assert(q1.length === 12 && q1.map(_._1).distinct.toSeq === Seq(0L, 1L, 2L, 3L))
  }

  test("indexed BM25 equals the ad-hoc form row for row; postings feed df and scoring") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val queries = Retrieval.dfDerivedQueries(docs, n = 2, perQuery = 2)
    val adHoc = Retrieval.bm25TopK(docs, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    val (postings, stats) = Retrieval.buildBm25Index(spark, "graft_bm25_spec", docs)
    val indexed = Retrieval.bm25TopKIndexed(postings, stats, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    assert(indexed.toSeq === adHoc.toSeq)
    // index-only query derivation matches the corpus-scan derivation
    val qFromIndex = Retrieval.dfDerivedQueriesFrom(
      postings.groupBy("term").agg(count(lit(1)).as("df")), n = 2, perQuery = 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(identity)
    val qFromDocs = queries.collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(identity)
    assert(qFromIndex.toSeq === qFromDocs.toSeq)
    // query-side plan: broadcast joins only — the term shuffle was
    // pre-paid by the bucketed table layout at build time
    val p = Retrieval.bm25TopKIndexed(postings, stats, queries, k = 5)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    graft.core.CacheRegistry.releaseAll()
    graft.core.Materialize.dropWithLocation(spark, "graft_bm25_spec_postings")
    graft.core.Materialize.dropWithLocation(spark, "graft_bm25_spec_stats")
  }

  test("rrfFuse matches hand-computed reciprocal-rank fusion") {
    // leg1 ranks: d1=1, d2=2, d3=3; leg2 ranks: d2=1, d4=2
    val leg1 = Seq((0L, 1L, 3.0), (0L, 2L, 2.0), (0L, 3L, 1.0))
      .toDF("query_id", "doc_id", "score")
    val leg2 = Seq((0L, 2L, 0.9), (0L, 4L, 0.8))
      .toDF("query_id", "doc_id", "score")
    val got = Retrieval.rrfFuse(Seq(leg1, leg2), k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    def rr(ranks: Int*) = math.rint((ranks.map(r => 1.0 / (60 + r)).sum + 1e-9) * 1e6) / 1e6
    assert(got === Map(2L -> rr(2, 1), 1L -> rr(1), 4L -> rr(2)))
    // d3 (1/63, the smallest) is the one cut by k=3
    assert(!got.contains(3L))
  }

  test("rrfFuse derives ranks from (score desc, doc_id) — ties break low-id-first") {
    val leg = Seq((0L, 6L, 1.0), (0L, 5L, 1.0)).toDF("query_id", "doc_id", "score")
    val got = Retrieval.rrfFuse(Seq(leg), k = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    // doc 5 takes rank 1 on the tie, doc 6 rank 2
    assert(got(5L) > got(6L))
  }

  test("weightedFuse: min-max normalized weighted sum, constant leg -> full weight") {
    // leg1 (w=0.4): scores 3,2,1 -> norm 1.0, 0.5, 0.0
    val leg1 = Seq((0L, 1L, 3.0), (0L, 2L, 2.0), (0L, 3L, 1.0))
      .toDF("query_id", "doc_id", "score")
    // leg2 (w=0.6): constant scores -> every member contributes 0.6
    val leg2 = Seq((0L, 2L, 0.7), (0L, 4L, 0.7))
      .toDF("query_id", "doc_id", "score")
    val got = Retrieval.weightedFuse(Seq((leg1, 0.4), (leg2, 0.6)), k = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    def rd(x: Double) = math.rint((x + 1e-9) * 1e6) / 1e6
    assert(got === Map(
      1L -> rd(0.4 * 1.0),           // leg1 max
      2L -> rd(0.4 * 0.5 + 0.6),     // mid leg1 + constant leg2
      3L -> rd(0.0),                 // leg1 min
      4L -> rd(0.6)))                // constant leg2 only
    // unlike RRF, a monotone-but-nonlinear transform DOES move the mix:
    // squaring leg1 scores drops doc 2's normalized value (4/9 < 1/2)
    val leg1sq = Seq((0L, 1L, 9.0), (0L, 2L, 4.0), (0L, 3L, 1.0))
      .toDF("query_id", "doc_id", "score")
    val got2 = Retrieval.weightedFuse(Seq((leg1sq, 0.4), (leg2, 0.6)), k = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(got2(2L) < got(2L))
  }

  test("rrfFuse depends only on ranks — monotone score transforms change nothing") {
    val leg1 = Seq((0L, 1L, 0.31), (0L, 2L, 0.27), (0L, 3L, 0.12))
      .toDF("query_id", "doc_id", "score")
    val leg2 = Seq((0L, 2L, 11.0), (0L, 4L, 3.5)).toDF("query_id", "doc_id", "score")
    def run(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      Retrieval.rrfFuse(Seq(a, b), k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(identity)
    val base = run(leg1, leg2)
    // strictly increasing transforms: exp on one leg, affine on the other
    val warped = run(
      leg1.withColumn("score", exp(col("score"))),
      leg2.withColumn("score", col("score") * 0.001 + 7.0))
    assert(warped.toSeq === base.toSeq,
      "fusion must be a pure function of per-leg ranks")
  }

  test("rrfFuse fuses per query independently") {
    val leg1 = Seq((0L, 1L, 2.0), (1L, 9L, 2.0)).toDF("query_id", "doc_id", "score")
    val leg2 = Seq((1L, 9L, 5.0)).toDF("query_id", "doc_id", "score")
    val got = Retrieval.rrfFuse(Seq(leg1, leg2), k = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    def rr(ranks: Int*) = math.rint((ranks.map(r => 1.0 / (60 + r)).sum + 1e-9) * 1e6) / 1e6
    assert(got === Map((0L, 1L) -> rr(1), (1L, 9L) -> rr(1, 1)))
  }

  test("plan: query terms broadcast (inverted-index lookup, no corpus sort-merge)") {
    val queries = Seq((0L, "apple"), (0L, "cherry")).toDF("query_id", "term")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val p = Retrieval.bm25TopK(docs, queries, k = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    graft.core.CacheRegistry.releaseAll()
  }

  test("prfExpand: appends the top fresh tf·idf term, never an original term") {
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple banana date"),
      (3L, "apple banana elder"),
      (4L, "zebra yak xray")).toDF("doc_id", "text")
    val q = Seq((0L, "apple")).toDF("query_id", "term")
    val expanded = Retrieval.prfExpand(docs, q, feedbackK = 3, expandTerms = 1)
      .as[(Long, String)].collect().toSet
    // feedback docs are 1-3; candidates: banana (tf 3 × low idf ≈ 1.07),
    // cherry/date/elder (tf 1 × singleton idf ≈ 1.204, term-tiebroken)
    // — 'apple' itself is excluded as an original term
    assert(expanded == Set((0L, "apple"), (0L, "cherry")))
    graft.core.CacheRegistry.releaseAll()
  }

  test("evalMetrics: hand-computed recall/MRR/nDCG, zeros for a hitless query") {
    val results = Seq(
      (0L, 1L, 0.9), (0L, 2L, 0.8), (0L, 3L, 0.7), (0L, 4L, 0.6),
      (1L, 1L, 0.5)).toDF("query_id", "doc_id", "score")
    val truth = Seq((0L, 2L), (0L, 4L), (0L, 5L), (1L, 9L))
      .toDF("query_id", "doc_id")
    val m = Retrieval.evalMetrics(results, truth, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (nRel, recall, mrr, ndcg) = m(0L)
    assert(nRel == 3L)
    assert(math.abs(recall - 1.0 / 3) < 1e-5)   // only d2 in the top-3
    assert(mrr == 0.5)                          // first hit at rank 2
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2)) + 0.5
    assert(math.abs(ndcg - (1.0 / (math.log(3) / math.log(2))) / idcg) < 1e-5)
    assert(m(1L) == ((1L, 0.0, 0.0, 0.0)))      // judged, zero everywhere
  }

  test("maxSimTopK: partial token match beats a pooled wash-out; exact doc tops") {
    // query = tokens [x-axis, y-axis]; docA matches BOTH tokens exactly
    // (maxsim 2.0), docB matches only x (maxsim 1.0 + eps from
    // orthogonal), docC is diagonal in every token — a pooled
    // single-vector cosine would rank C close to A, but per-token max
    // keeps the distinction
    val dt = Seq(
      (10L, 0, Seq(1.0, 0.0)), (10L, 1, Seq(0.0, 1.0)),   // A: exact
      (20L, 0, Seq(1.0, 0.0)), (20L, 1, Seq(1.0, 0.0)),   // B: x only
      (30L, 0, Seq(0.7071067811865476, 0.7071067811865476)),
      (30L, 1, Seq(0.7071067811865476, 0.7071067811865476)) // C: diagonal
    ).toDF("doc_id", "tok_idx", "vec")
    val qt = Seq(
      (1L, 0, Seq(1.0, 0.0)), (1L, 1, Seq(0.0, 1.0))
    ).toDF("query_id", "qtok_idx", "qvec")
    val out = Retrieval.maxSimTopK(dt, qt, k = 3)
      .orderBy(desc("score"), col("doc_id"))
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._2).toSeq == Seq(10L, 30L, 20L))
    assert(math.abs(out(0)._3 - 2.0) < 1e-5)       // exact: 1 + 1
    assert(math.abs(out(1)._3 - 1.4142136) < 1e-5) // diagonal: 2 * cos45
    assert(math.abs(out(2)._3 - 1.0) < 1e-5)       // x-only: 1 + 0
  }

  test("fuzzyTermMatch: insert/delete/substitute resolve, transposition does not") {
    val vocab = Seq("spark", "sprak", "spar", "sparks", "stark", "plasma")
      .toDF("term")
    val queries = Seq((1L, "spark"), (2L, "xpark"), (3L, "sparkle"))
      .toDF("query_id", "qterm")
    val out = Retrieval.fuzzyTermMatch(vocab, "term", queries, "query_id", "qterm")
      .as[(Long, String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    // "spark": itself, deletion twin "spar", insertion twin "sparks",
    // substitution twin "stark" — but NOT the transposed "sprak"
    // (levenshtein 2) even though they share deletion variants
    assert(out(1L) == Set("spark", "spar", "sparks", "stark"))
    // "xpark": substitution of s — only "spark" (not "spar": distance 2)
    assert(out(2L) == Set("spark"))
    // "sparkle" is 2+ edits from everything
    assert(!out.contains(3L))
  }
}
