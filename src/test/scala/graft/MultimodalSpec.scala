package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Multimodal

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.toMediaFrame(
    Tables.documents(spark, sfDir).filter(col("lang") === "en")
      .withColumn("payload", encode(col("text"), "UTF-8")),
    "doc_id", "payload", lit("text"))

  test("media frame carries payload byte count in typed metadata") {
    val rows = media.select(col("meta.n_bytes"),
      length(col("payload")).cast("long")).collect()
    assert(rows.nonEmpty && rows.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("feature extraction is deterministic and partitioning-invariant") {
    val a = Multimodal.extractFeatures(media, dims = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    val b = Multimodal.extractFeatures(media.repartition(7), dims = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(a == b, "stride-fold features must not depend on partitioning")
    assert(a.values.forall(_.length == 8))
  }

  test("features equal an independently computed stride fold") {
    val doc = Tables.documents(spark, sfDir).filter(col("lang") === "en")
      .select("doc_id", "text").first()
    val bytes = doc.getString(1).getBytes("UTF-8")
    val expected = (0 until 8).map { d =>
      Iterator.from(d, 8).takeWhile(_ < bytes.length)
        .map(i => (bytes(i) & 0xff).toDouble).sum
    }
    val actual = Multimodal.extractFeatures(media, dims = 8)
      .filter(col("media_id") === doc.getLong(0))
      .collect().head.getSeq[Double](2)
    assert(actual == expected)
  }

  test("resize stub keeps every Nth byte and rewrites the byte metadata") {
    val doc = Tables.documents(spark, sfDir).filter(col("lang") === "en")
      .select("doc_id", "text").first()
    val bytes = doc.getString(1).getBytes("UTF-8")
    val expected = Iterator.from(0, 4).takeWhile(_ < bytes.length)
      .map(bytes(_)).toSeq
    val row = Multimodal.resizeStub(media, factor = 4)
      .filter(col("media_id") === doc.getLong(0))
      .select(col("payload"), col("meta.n_bytes")).collect().head
    val out = row.getAs[Array[Byte]](0).toSeq
    assert(out == expected, "payload must be the byte-stride downsample")
    assert(row.getLong(1) == expected.length, "metadata must track the new size")
  }

  test("frame sampling explodes every Nth block") {
    val frames = Multimodal.sampleFrames(media.limit(5), blockBytes = 16, everyNth = 2)
    val idx = frames.select("frame_idx").collect().map(_.getInt(0))
    assert(idx.nonEmpty && idx.forall(_ % 2 == 0))
  }

  test("payload-sized repartitioning yields ceil(bytes/target) partitions") {
    val df = Multimodal.repartitionForPayload(media, totalBytes = 1000000,
      targetPartitionBytes = 300000)
    assert(df.rdd.getNumPartitions == 3)
  }
}
