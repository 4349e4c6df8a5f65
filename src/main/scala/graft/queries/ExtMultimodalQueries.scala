package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Bpe, Chunking, Classifier, Corpus, Dedup, Multimodal, Similarity, TextOps}
import ExtQueries._

/**
 * Multimodal registry rows: opaque binary payloads with typed
 * metadata — decode/resize/frame-sample/feature plumbing.
 *
 * Split from ExtQueries by family (zero behavior change) — shared
 * fixture builders and DuckDB oracle fragments stay in [[ExtQueries]].
 */
object ExtMultimodalQueries {

  def defs: Seq[QueryDef] = Seq(


    // ---- Multimodal plumbing ------------------------------------------

    // Binary payload + typed metadata (decode stubbed; schema/plumbing real).
    QueryDef("ext_mm_media_meta", (s, dir) => {
      val media = Multimodal.toMediaFrame(
        Tables.documents(s, dir)
          .withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload",
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")))
      media.select(col("media_id"), col("media_type"),
        col("meta.n_bytes").as("n_bytes"))
    }, Some("""SELECT doc_id AS media_id,
        (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS media_type,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents""")),


    // Resize stub: every-4th-byte downsample; payload and metadata are
    // rewritten together. Oracle checks the byte accounting (content is
    // hex-round-tripped so the driver can hash it as a scalar).
    QueryDef("ext_mm_resize", (s, dir) => {
      val media = Multimodal.toMediaFrame(
        Tables.documents(s, dir)
          .withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload",
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")))
      Multimodal.resizeStub(media, factor = 4)
        .select(col("media_id"), col("media_type"),
          col("meta.n_bytes").as("n_bytes"), hex(col("payload")).as("payload_hex"))
    }, Some("""SELECT doc_id AS media_id,
        (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS media_type,
        CAST(ceil(octet_length(encode(text)) / 4.0) AS BIGINT) AS n_bytes,
        regexp_replace(hex(encode(text)), '(..)(..)?(..)?(..)?', '\1', 'g')
          AS payload_hex
      FROM documents""")),


    // Frame sampling: every-4th 64-byte block of the payload stands in
    // for every-4th video frame (decode stubbed; the explode-to-frames
    // operator shape is the point). Hex frames are recomputed by the
    // oracle byte-for-byte.
    QueryDef("ext_mm_frames", (s, dir) => {
      val media = Multimodal.toMediaFrame(
        Tables.documents(s, dir)
          .withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload",
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")))
      Multimodal.sampleFrames(media, blockBytes = 64, everyNth = 4)
        .select(col("media_id"), col("media_type"),
          col("frame_idx").cast("long").as("frame_idx"), col("frame_hex"))
    }, Some("""WITH h AS (SELECT doc_id,
          (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS media_type,
          hex(encode(text)) AS hx FROM documents),
      idx AS (SELECT doc_id, media_type, hx,
          unnest(range(CAST(ceil(len(hx) / 128.0) AS BIGINT))) AS i FROM h)
      SELECT doc_id AS media_id, media_type, i AS frame_idx,
        substr(hx, CAST(i * 128 + 1 AS INT), 128) AS frame_hex
      FROM idx WHERE i % 4 = 0
        AND len(substr(hx, CAST(i * 128 + 1 AS INT), 128)) > 0""")),


    // Batched per-partition feature extraction over ASCII payloads (the
    // mapPartitions analogue of a batched pandas UDF); stride-fold stub
    // features are recomputed by the oracle from character codes.
    // Output is exploded to one (media_id, dim_idx, value) row per feature
    // dimension: array-typed result columns are unrepresentable in the
    // harness comparator, and the stub features are integral byte sums, so
    // BIGINT rows make the compare fp-free.
    QueryDef("ext_mm_features", (s, dir) => {
      val media = Multimodal.toMediaFrame(
        Tables.documents(s, dir).filter(col("lang") === "en")
          .withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload",
        lit("text"))
      Multimodal.extractFeatures(media, dims = 8)
        .select(col("media_id"),
          posexplode(col("features")).as(Seq("dim_idx", "value")))
        .select(col("media_id"), col("dim_idx").cast("long").as("dim_idx"),
          col("value").cast("long").as("value"))
    }, Some("""SELECT doc_id AS media_id,
        CAST(generate_subscripts(features, 1) - 1 AS BIGINT) AS dim_idx,
        CAST(unnest(features) AS BIGINT) AS value
      FROM (SELECT doc_id,
        [list_sum(list_transform(range(1, len(codes) + 1, 8), i -> codes[i])),
         list_sum(list_transform(range(2, len(codes) + 1, 8), i -> codes[i])),
         list_sum(list_transform(range(3, len(codes) + 1, 8), i -> codes[i])),
         list_sum(list_transform(range(4, len(codes) + 1, 8), i -> codes[i])),
         list_sum(list_transform(range(5, len(codes) + 1, 8), i -> codes[i])),
         list_sum(list_transform(range(6, len(codes) + 1, 8), i -> codes[i])),
         list_sum(list_transform(range(7, len(codes) + 1, 8), i -> codes[i])),
         list_sum(list_transform(range(8, len(codes) + 1, 8), i -> codes[i]))]
        AS features
      FROM (SELECT doc_id,
              list_transform(regexp_extract_all(text, '.'), c -> unicode(c)) AS codes
            FROM documents WHERE lang = 'en'))""")),


    // Perceptual-hash media near-dup: 64-bit integer block-hash over
    // payload bytes, banded-LSH candidates (full recall to hamming 3 by
    // pigeonhole), exact Hamming verify. Seeds: byte-identical copies
    // (hamming 0) and same-length one-byte edits. The oracle recomputes
    // the hash from hex(payload) in exact integer arithmetic and checks
    // ALL pairs brute-force — banding must lose nothing.
    QueryDef("ext_mm_neardup", (s, dir) => {
      val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val copies = base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 300000).as("doc_id"), col("text"))
      val edited = base.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 600000).as("doc_id"),
          concat(lit("Z"), expr("substring(text, 2)")).as("text"))
      val media = Multimodal.toMediaFrame(
        base.unionByName(copies).unionByName(edited)
          .withColumn("payload", encode(col("text"), "UTF-8")),
        "doc_id", "payload", lit("image"))
      Multimodal.nearDupMedia(media, maxHamming = 3, bands = 4)
    }, Some("""WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 300000, text FROM documents WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id + 600000, 'Z' || substr(text, 2) FROM documents
        WHERE doc_id % 11 = 0),
      raw AS (SELECT doc_id, hex(encode(text)) AS h,
          octet_length(encode(text)) AS n FROM all_docs),
      byt AS (SELECT doc_id, n, list_transform(range(1, n + 1), i ->
          (strpos('0123456789ABCDEF', substr(h, 2*i - 1, 1)) - 1) * 16
          + (strpos('0123456789ABCDEF', substr(h, 2*i, 1)) - 1)) AS bytes
        FROM raw),
      hp AS (SELECT doc_id, list_transform(range(0, 64), b ->
          CASE WHEN list_sum(bytes[(b*n)//64 + 1 : ((b+1)*n)//64]) * n >
                    list_sum(bytes) * (((b+1)*n)//64 - (b*n)//64)
               THEN 1 ELSE 0 END) AS bits FROM byt)
      SELECT id_a, id_b, hamming FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_filter(range(1, 65), i -> a.bits[i] <> b.bits[i]))
            AS BIGINT) AS hamming
        FROM hp a JOIN hp b ON a.doc_id < b.doc_id)
      WHERE hamming <= 3""")),


    // Incremental media dedup against a standing phash library (the
    // daily-batch posture): identical copies and one-byte edits drop
    // against the base by Hamming; a novel-suffix pair survives the
    // base but self-dedups to its lower id. The oracle recomputes every
    // hash and both drop stages brute-force.
    QueryDef("ext_mm_dedup_incremental", (s, dir) => {
      val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      def mediaOf(df: org.apache.spark.sql.DataFrame) =
        Multimodal.toMediaFrame(
          df.withColumn("payload", encode(col("text"), "UTF-8")),
          "doc_id", "payload", lit("image"))
      val batch = base.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"))
        .unionByName(base.filter(col("doc_id") % 17 === 0)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(lit("Z"), expr("substring(text, 2)")).as("text")))
        .unionByName(base.filter(col("doc_id") % 19 === 0)
          .select((col("doc_id") + 500000).as("doc_id"),
            concat(col("text"), lit(" completely novel padding suffix block"))
              .as("text")))
        .unionByName(base.filter(col("doc_id") % 19 === 0)
          .select((col("doc_id") + 560000).as("doc_id"),
            concat(col("text"), lit(" completely novel padding suffix block"))
              .as("text")))
      Multimodal.incrementalNearDupMedia(mediaOf(batch),
        Multimodal.blockHash64(mediaOf(base)), maxHamming = 3, bands = 4)
    }, Some("""WITH batch AS (
        SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 13 = 0
        UNION ALL
        SELECT doc_id + 200000, 'Z' || substr(text, 2) FROM documents
        WHERE doc_id % 17 = 0
        UNION ALL
        SELECT doc_id + 500000, text || ' completely novel padding suffix block'
        FROM documents WHERE doc_id % 19 = 0
        UNION ALL
        SELECT doc_id + 560000, text || ' completely novel padding suffix block'
        FROM documents WHERE doc_id % 19 = 0),
      all_docs AS (SELECT 0 AS side, doc_id, text FROM documents
        UNION ALL SELECT 1, doc_id, text FROM batch),
      raw AS (SELECT side, doc_id, hex(encode(text)) AS h,
          octet_length(encode(text)) AS n FROM all_docs),
      byt AS (SELECT side, doc_id, n, list_transform(range(1, n + 1), i ->
          (strpos('0123456789ABCDEF', substr(h, 2*i - 1, 1)) - 1) * 16
          + (strpos('0123456789ABCDEF', substr(h, 2*i, 1)) - 1)) AS bytes
        FROM raw),
      hp AS (SELECT side, doc_id, list_transform(range(0, 64), b ->
          CASE WHEN list_sum(bytes[(b*n)//64 + 1 : ((b+1)*n)//64]) * n >
                    list_sum(bytes) * (((b+1)*n)//64 - (b*n)//64)
               THEN 1 ELSE 0 END) AS bits FROM byt),
      bhp AS (SELECT doc_id, bits FROM hp WHERE side = 1),
      basehp AS (SELECT doc_id, bits FROM hp WHERE side = 0),
      drop_vs_base AS (SELECT DISTINCT b.doc_id FROM bhp b JOIN basehp a
        ON len(list_filter(range(1, 65), i -> a.bits[i] <> b.bits[i])) <= 3),
      fresh AS (SELECT * FROM bhp
        WHERE doc_id NOT IN (SELECT doc_id FROM drop_vs_base)),
      self_drops AS (SELECT DISTINCT b.doc_id FROM fresh b JOIN fresh a
        ON a.doc_id < b.doc_id
        AND len(list_filter(range(1, 65), i -> a.bits[i] <> b.bits[i])) <= 3)
      SELECT doc_id AS media_id FROM fresh
      WHERE doc_id NOT IN (SELECT doc_id FROM self_drops)"""))
  )
}
