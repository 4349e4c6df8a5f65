package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing for training-data pipelines: image/audio/
 * video payloads ride as opaque `binary` columns next to a typed metadata
 * struct; decode/feature steps run per-partition in batches.
 *
 * The actual media decode is STUBBED (this environment ships no
 * image/audio codecs — see [[decodeStub]]): the Spark-side contract —
 * schema, partition sizing, per-partition batch execution, deterministic
 * output — is real and tested, and a production deployment swaps
 * [[decodeStub]] for a codec call without touching the plumbing.
 *
 * Scale notes:
 *  - Binary payloads dominate row size: repartition by target bytes, not
 *    row count ([[repartitionForPayload]]), so a partition's media fits
 *    executor memory.
 *  - Feature extraction is mapPartitions (the Scala analogue of a
 *    batched pandas UDF): per-partition setup cost (codec init) is paid
 *    once per batch, not once per row.
 *  - Metadata-only queries (`select(meta.*)`) never touch the payload
 *    column thanks to Parquet column pruning — keep payload and metadata
 *    in the SAME table but SEPARATE columns.
 */
object Multimodal {

  /** Canonical media row schema: id, type tag, payload, typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /**
   * Wrap any (id, binary) frame into the canonical media shape, deriving
   * the byte-count metadata from the payload itself.
   */
  def toMediaFrame(df: DataFrame, idCol: String, payloadCol: String,
                   mediaType: Column): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      mediaType.as("media_type"),
      col(payloadCol).as("payload"),
      struct(
        length(col(payloadCol)).cast("long").as("n_bytes"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  /** Partition count sized by payload bytes (default 128 MiB targets). */
  def repartitionForPayload(df: DataFrame, totalBytes: Long,
                            targetPartitionBytes: Long = 128L << 20): DataFrame =
    df.repartition(math.max(1, (totalBytes / targetPartitionBytes).toInt))

  /**
   * Per-partition batched feature extraction (the mapPartitions analogue
   * of a batched pandas UDF): one setup per partition, rows processed in
   * a tight loop. Output: (media_id, media_type, feature array).
   */
  def extractFeatures(media: DataFrame, dims: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("features", ArrayType(DoubleType), nullable = true)))
    val idIdx = media.schema.fieldIndex("media_id")
    val typeIdx = media.schema.fieldIndex("media_type")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.queryExecution.toRdd.mapPartitions { iter =>
      // per-partition setup happens HERE (codec init in production)
      iter.map { internal =>
        val id = internal.getLong(idIdx)
        val mtype = internal.getUTF8String(typeIdx).toString
        val payload = if (internal.isNullAt(payloadIdx)) null
                      else internal.getBinary(payloadIdx)
        val feats: Array[Double] =
          if (payload == null) null
          else (0 until dims).map { d =>
            // STUB: stride-fold of bytes stands in for decoded features
            var acc = 0L; var i = d
            while (i < payload.length) { acc += (payload(i) & 0xff); i += dims }
            acc.toDouble
          }.toArray
        Row(id, mtype, feats)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /**
   * Resize stub: an every-Nth-byte downsample stands in for an image
   * resize (no codecs in this environment — a production deployment
   * swaps the loop body for a decoder+scaler). Same batched
   * mapPartitions shape as [[extractFeatures]]: per-partition setup once,
   * tight loop, payload AND metadata rewritten together so downstream
   * byte-based partition sizing stays correct.
   */
  def resizeStub(media: DataFrame, factor: Int = 4): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val spark = media.sparkSession
    val idIdx = media.schema.fieldIndex("media_id")
    val typeIdx = media.schema.fieldIndex("media_type")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.queryExecution.toRdd.mapPartitions { iter =>
      iter.map { internal =>
        val id = internal.getLong(idIdx)
        val mtype = internal.getUTF8String(typeIdx).toString
        val payload = if (internal.isNullAt(payloadIdx)) null
                      else internal.getBinary(payloadIdx)
        val out: Array[Byte] =
          if (payload == null) null
          else {
            val n = (payload.length + factor - 1) / factor
            val b = new Array[Byte](n)
            var i = 0
            while (i < n) { b(i) = payload(i * factor); i += 1 }
            b
          }
        Row(id, mtype, out,
          Row(if (out == null) null else out.length.toLong, null, null, null))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /**
   * Frame sampling stub: every Nth byte-block of the payload stands in
   * for every Nth video frame. Real decoder replaces the slicing; the
   * operator shape (explode to one row per sampled frame) is the point.
   */
  def sampleFrames(media: DataFrame, blockBytes: Int = 64,
                   everyNth: Int = 4): DataFrame =
    media.select(col("media_id"), col("media_type"),
        posexplode(split(hex(col("payload")), s"(?<=\\G.{${blockBytes * 2}})"))
          .as(Seq("frame_idx", "frame_hex")))
      .filter(col("frame_idx") % everyNth === 0 && length(col("frame_hex")) > 0)
}
