package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Chunking

/** Contracts of content-defined chunking: boundaries tile the document,
  * size bounds hold, output is partitioning-independent, and — the CDC
  * point — an edit near the head leaves the tail's fingerprints intact
  * where fixed-size chunking would shift every one of them. */
class ChunkingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

  test("chunks tile each document exactly: contiguous offsets, lengths sum to byte length") {
    val ch = Chunking.chunks(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val lens = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8").length.toLong).toMap
    lens.foreach { case (id, byteLen) =>
      val rows = ch(id).sortBy(_._2)
      assert(rows.head._3 == 0L, s"doc $id first chunk must start at 0")
      rows.sliding(2).foreach {
        case Array((_, _, s1, l1), (_, _, s2, _)) =>
          assert(s1 + l1 == s2, s"doc $id chunks must be contiguous")
        case _ =>
      }
      assert(rows.map(_._4).sum == byteLen, s"doc $id chunk lengths must tile the text")
    }
  }

  test("chunk sizes respect min/max bounds (final chunk may undershoot min)") {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val ch = Chunking.chunks(docs, "doc_id", "text",
        window = 16, maskBits = 6, minLen = 16, maxLen = 256)
      .withColumn("last_idx", max(col("chunk_idx")).over(w))
    assert(ch.filter(col("chunk_len") > 256).count() == 0,
      "no chunk may exceed maxLen")
    assert(ch.filter(col("chunk_idx") < col("last_idx") &&
      col("chunk_len") < 16).count() == 0,
      "non-final chunks respect minLen")
  }

  test("chunking is deterministic under repartitioning") {
    val a = Chunking.chunks(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    val b = Chunking.chunks(docs.repartition(7), "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(a == b)
  }

  test("a head edit preserves most tail fingerprints (the CDC property)") {
    val base = docs.limit(50)
    val edited = base.select(col("doc_id"),
      concat(lit("COMPLETELY NEW PREFIX INSERTED AT THE HEAD >> "), col("text"))
        .as("text"))
    val fpA = Chunking.chunks(base, "doc_id", "text")
      .groupBy("doc_id").agg(collect_set("chunk_fp").as("fps"))
    val fpB = Chunking.chunks(edited, "doc_id", "text")
      .groupBy("doc_id").agg(collect_set("chunk_fp").as("fps2"))
    val shared = fpA.join(fpB, "doc_id")
      .select(col("doc_id"),
        size(array_intersect(col("fps"), col("fps2"))).as("n_shared"),
        size(col("fps")).as("n_orig"))
      .collect()
    // across the corpus, the clear majority of original chunk fps survive
    val (sharedSum, origSum) =
      shared.foldLeft((0L, 0L)) { case ((s, o), r) =>
        (s + r.getInt(1), o + r.getInt(2)) }
    assert(sharedSum.toDouble / origSum > 0.6,
      s"expected >60% of chunk fps to survive a head edit, got $sharedSum/$origSum")
    // and fixed-size chunking would NOT: shifting every boundary by the
    // prefix length changes every aligned 256-byte block's content
  }

  test("slidingChunks: stride windows + end-anchored tail, no orphans, no dupes") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // n=10, C=5, S=2
      (2L, "a b c"),                                  // n < C -> one whole-doc chunk
      (3L, ""),                                       // no chunks
      (4L, (1 to 9).map(i => s"u$i").mkString(" ")))  // n=9, C=5, S=2: last start 5 on stride
      .toDF("doc_id", "text")
    val out = Chunking.slidingChunks(df, "doc_id", "text", chunkSize = 5, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // doc 1: full starts 1,3,5; stride misses last=6 -> end-anchored extra
    assert(byDoc(1L).map(_._3).toSeq == Seq(
      "t1 t2 t3 t4 t5", "t3 t4 t5 t6 t7", "t5 t6 t7 t8 t9", "t6 t7 t8 t9 t10"))
    assert(byDoc(1L).forall(_._4 == 5L))
    // doc 2: single short chunk, chunk_tokens = 3
    assert(byDoc(2L).map(c => (c._3, c._4)).toSeq == Seq(("a b c", 3L)))
    // doc 3: zero-token doc emits nothing
    assert(!byDoc.contains(3L))
    // doc 4: last=5 sits ON the stride (1,3,5) -> no duplicate tail chunk
    assert(byDoc(4L).map(_._3).toSeq == Seq(
      "u1 u2 u3 u4 u5", "u3 u4 u5 u6 u7", "u5 u6 u7 u8 u9"))
    // every token of doc 1 is covered by at least one chunk
    val covered = byDoc(1L).flatMap(_._3.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
  }

  test("sharedChunks surfaces cross-document duplication") {
    val dup = docs.limit(20)
    val copies = dup.select((col("doc_id") + 500000).as("doc_id"), col("text"))
    val rep = Chunking.sharedChunks(
      Chunking.chunks(dup.unionByName(copies), "doc_id", "text"), "doc_id")
    // byte-identical copies share every chunk -> every fp maps to 2 docs
    assert(rep.count() > 0)
    assert(rep.filter(col("n_docs") < 2).count() == 0)
  }

  test("adjacentChunkPairs: disjoint blocks, in order, NO pair shares a token — tail included") {
    import spark.implicits._
    // 10 tokens, chunkSize=3 → blocks 1-3, 4-6, 7-9, 10 (short tail,
    // NOT re-anchored) → pairs (0,1) (1,2) (2,3)
    val doc = Seq((7L, (1 to 10).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Chunking.adjacentChunkPairs(doc, "doc_id", "text", chunkSize = 3)
      .orderBy("pair_idx")
      .as[(Long, Long, String, String)].collect()
    assert(pairs.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(pairs(0)._3 == "tok1 tok2 tok3" && pairs(0)._4 == "tok4 tok5 tok6")
    assert(pairs(2)._3 == "tok7 tok8 tok9" && pairs(2)._4 == "tok10",
      "the tail block must be the short remainder, never an overlapping re-anchor")
    // EVERY pair — tail pair included — is token-disjoint
    pairs.foreach { case (_, _, a, b) =>
      assert(a.split(" ").toSet.intersect(b.split(" ").toSet).isEmpty) }
    // single-block docs produce no pairs
    val one = Seq((8L, "a b")).toDF("doc_id", "text")
    assert(Chunking.adjacentChunkPairs(one, "doc_id", "text", 3).count() == 0)
  }
}
