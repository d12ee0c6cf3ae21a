package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time with
  * mapPartitions (the Scala analogue of arrow-batched UDFs).
  *
  * The actual codecs (JPEG/WAV/H264) are NOT present in this
  * environment, so `decodeStub` is a clearly-marked deterministic
  * fake; everything around it — the schema, the binary plumbing,
  * the per-partition batch shape, frame sampling, resize geometry —
  * is real and tested. Swapping `decodeStub` for a real codec is a
  * one-function change.
  *
  * Scale: per-row media work is embarrassingly parallel (no
  * shuffle); the only partitioning concern is balancing bytes, not
  * rows — `maxPartitionBytes` governs, and very large blobs should
  * be offloaded to object-store pointers with only (path, meta) in
  * the table.
  */
object Multimodal {
  case class MediaMeta(media_id: Long, kind: String, width: Int, height: Int,
                       sampleRateHz: Int, durationMs: Long)
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      meta: MediaMeta)
  case class Frame(media_id: Long, frame_id: Int, offset: Long,
                   pixels: Array[Byte])
  case class Feature(media_id: Long, byte_len: Long, checksum: Long,
                     histogram: Array[Long])

  /** STUB decoder: a real build links an image/audio codec here.
    * Deterministic fake: "decodes" a payload to an 8-byte-bucket
    * histogram + checksum so tests can assert exact values. */
  def decodeStub(payload: Array[Byte]): (Long, Array[Long]) = {
    val hist = new Array[Long](8)
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xFF) >> 5) += 1
      sum = sum * 31 + (payload(i) & 0xFF)
      i += 1
    }
    (sum, hist)
  }

  /** Synthesize a media table from documents (text bytes as payload)
    * — stands in for reading real blobs; schema is the real one. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("doc_id").as("media_id"), lit("image").as("kind"),
        lit(64).as("width"), lit(64).as("height"),
        lit(0).as("sampleRateHz"), octet_length(col("text")).cast("long")
          .as("durationMs")).as("meta"))

  /** Batch feature extraction over binary payloads: mapPartitions so
    * a real decoder could amortize per-batch setup (model load, pinned
    * buffers) exactly like mapInPandas/arrow batches. */
  def extractFeatures(spark: SparkSession, media: DataFrame)
      : Dataset[Feature] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition setup happens once (decoder init in real build)
        rows.map { case (id, payload) =>
          val (sum, hist) = decodeStub(payload)
          Feature(id, payload.length.toLong, sum, hist)
        }
      }
  }

  /** Frame sampling: one row per sampled frame (every `stride`
    * bytes stands in for every Nth video frame). */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int = 256)
      : Dataset[Frame] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val n = math.max(1, payload.length / stride)
        (0 until n).map { f =>
          val off = f.toLong * stride
          val end = math.min(payload.length, (f + 1) * stride)
          Frame(id, f, off, java.util.Arrays.copyOfRange(payload, off.toInt, end))
        }
      }
  }

  /** "Resize" geometry (real build: image scaling): recompute target
    * dims preserving aspect ratio — pure metadata math, codegen'd. */
  def resizeMeta(media: DataFrame, maxSide: Int = 32): DataFrame =
    media.select(col("media_id"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      least(lit(maxSide), col("meta.width")).as("target_w"),
      least(lit(maxSide), col("meta.height")).as("target_h"))

  /** Driver-checkable plumbing query: byte lengths + frame fan-out
    * (pure built-ins, SQL-oracle-able). */
  def mediaFrameIndex(docs: DataFrame, stride: Int = 256): DataFrame =
    mediaTable(docs)
      .select(col("media_id"),
        octet_length(col("payload")).cast("long").as("byte_len"))
      .withColumn("n_frames",
        greatest(lit(1L), (col("byte_len") / stride).cast("long")))
      .select(col("media_id"), col("byte_len"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_id"))
      .withColumn("frame_offset", col("frame_id") * stride)
}
