package graft

import org.apache.spark.sql.functions._
import graft.ext.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerge is simultaneous non-overlapping left-to-right") {
    // canonical BPE edge case: "aaaa" + merge(a,a) → [aa, aa], not [aa, a, a]
    // (greedy re-merge) nor [a, aa, a]
    val out = Seq("aaaa", "aaa", "abab")
      .toDF("w")
      .select(col("w"),
        Bpe.symbols(Bpe.applyMerge(Bpe.delimit(col("w")), "a", "a")).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("aaaa") == Seq("aa", "aa"))
    assert(out("aaa") == Seq("aa", "a"))
    assert(out("abab") == Seq("a", "b", "a", "b"))
  }

  test("encodeWord applies merges in rank order") {
    val merges = Seq(("a", "a"), ("aa", "b"))
    val out = Seq("aab", "aaab", "baa")
      .toDF("w")
      .select(col("w"), Bpe.encodeWord(col("w"), merges).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("aab") == Seq("aab"))
    assert(out("aaab") == Seq("aa", "a", "b")) // rank-1 pass eats "aa" first
    assert(out("baa") == Seq("b", "aa"))
  }

  test("bpeTrain learns the dominant pair first and segments the vocab") {
    // "ab" appears in every word; weight by repetition so the argmax is
    // unambiguous at every round
    val docs = Seq(
      "abab abab abab", "abc abc", "dab").toDF("text")
    // maxDriverVocab = 0 forces the DISTRIBUTED loop — this test pins
    // the cluster-path semantics; the escape is pinned against it below
    val (merges, words) = Bpe.bpeTrain(docs, "text", numMerges = 2,
      maxDriverVocab = 0)
    val m = merges.orderBy("merge_rank")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    // pair counts: (a,b) = 2*3(in abab, simultaneous pairs per word: a-b,a-b
    //  → 2 each ×3 words) + 1*2 + 1 = 9 ; (b,a) = 1*3 = 3
    assert(m(0) == (("a", "b", 9L)))
    // round 2 operates on merged syms: (ab,ab) count 3 from "abab"×3
    assert(m(1) == (("ab", "ab", 3L)))
    val segs = words.select(col("word"), Bpe.symbols(col("sym")).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(segs("abab") == Seq("abab"))
    assert(segs("abc") == Seq("ab", "c"))
    assert(segs("dab") == Seq("d", "ab"))
  }

  test("bpeTrain stops early when no pairs remain (both paths)") {
    val docs = Seq("a b c a b").toDF("text") // all words single-char
    for (mdv <- Seq(0, 100000)) {
      val (merges, words) = Bpe.bpeTrain(docs, "text", numMerges = 5,
        maxDriverVocab = mdv)
      assert(merges.count() == 0)
      assert(words.select(size(Bpe.symbols(col("sym")))).as[Int]
        .collect().forall(_ == 1))
    }
  }

  test("driver-vocab escape is byte-identical to the distributed loop") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .filter(col("lang") === "en")
    def snapshot(maxDriverVocab: Int) = {
      val (m, w) = Bpe.bpeTrain(docs, "text", numMerges = 16,
        maxDriverVocab = maxDriverVocab)
      (m.orderBy("merge_rank").collect()
         .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
         .toSeq,
       w.select("word", "cnt", "sym").collect()
         .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet)
    }
    val (mDist, wDist) = snapshot(maxDriverVocab = 0)
    val (mDrv, wDrv) = snapshot(maxDriverVocab = 100000)
    assert(mDrv == mDist, "merge trajectories diverge")
    assert(wDrv == wDist, "final segmented vocabularies diverge")
  }

  test("encoding held-out text round-trips and actually compresses") {
    // train on one slice, encode the disjoint slice — the deployment
    // contract ext_bpe_encode registers
    val train = Seq("abab abab cdcd", "abab cdcd cd").toDF("text")
    val held = Seq("ababab cdab xyz").toDF("text")
    val merges = Bpe.bpeTrain(train, "text", numMerges = 4)._1
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    val enc = held
      .select(explode(graft.ext.TextOps.tokens(lower(col("text")))).as("word"))
      .withColumn("toks", Bpe.encodeWord(col("word"), merges))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // lossless: concatenating the subwords recovers every word
    enc.foreach { case (w, toks) => assert(toks.mkString == w, s"$w -> $toks") }
    // learned units transfer: 'ababab' segments under the (a,b)+(ab,ab)
    // merges; unseen chars stay single symbols
    assert(enc("ababab").length < "ababab".length)
    assert(enc("xyz") == Seq("x", "y", "z"))
  }
}
