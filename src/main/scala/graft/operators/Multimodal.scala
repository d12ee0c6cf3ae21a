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
    * Deterministic fake: "decodes" a payload to a byte-bucket
    * histogram + checksum so tests can assert exact values. `bins`
    * must be a power of two ≤ 256 (8 = coarse features, 64 = the
    * finer signature the near-dup path needs). */
  def decodeStub(payload: Array[Byte], bins: Int = 8): (Long, Array[Long]) = {
    require(bins > 0 && bins <= 256 && (bins & (bins - 1)) == 0,
      s"bins must be a power of two <= 256, got $bins")
    val shift = 8 - Integer.numberOfTrailingZeros(bins)
    val hist = new Array[Long](bins)
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xFF) >> shift) += 1
      sum = sum * 31 + (payload(i) & 0xFF)
      i += 1
    }
    (sum, hist)
  }

  /** STUB signature for the near-dup path (real build: pHash or a CNN
    * embedding): byte-BIGRAM histogram — bin((b0,b1)) = (b0*31 + b1)
    * mod bins over adjacent byte pairs. Structure-sensitive where the
    * unigram byte histogram is not: same-language text has nearly
    * identical byte frequencies (measured §5.3 — every pair scored
    * cos >= 0.9999 on unigram bins, collapsing all vectors into one
    * LSH bucket), while bigram frequencies track actual content.
    * Deterministic and engine-neutral: integer arithmetic over
    * unsigned byte values, reproducible from the payload hex in any
    * SQL engine. */
  def bigramSigStub(payload: Array[Byte], bins: Int = 64): Array[Long] = {
    require(bins > 0, s"bins must be positive, got $bins")
    val hist = new Array[Long](bins)
    var i = 1
    while (i < payload.length) {
      hist(((payload(i - 1) & 0xFF) * 31 + (payload(i) & 0xFF)) % bins) += 1
      i += 1
    }
    hist
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
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      bins: Int = 8): Dataset[Feature] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition setup happens once (decoder init in real build)
        rows.map { case (id, payload) =>
          val (sum, hist) = decodeStub(payload, bins)
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

  /** Media near-duplicate detection — the image-dedup shape every
    * training-data pipeline runs: decode each blob to a compact
    * signature vector (here [[bigramSigStub]]; real build: pHash or
    * a CNN embedding), then reuse the embedding near-dup machinery
    * (random-hyperplane LSH buckets + in-bucket cosine, bucket-size
    * capped). The decode is the only per-byte work; everything after
    * operates on 64-float signatures, so the pair search never
    * touches payloads.
    *
    * Runs the AUDITABLE (md5) RHP family so the derived buckets are
    * reproducible outside the JVM — this is what upgrades the driver
    * gate from rows-only to hash-exact. The earlier unigram-histogram
    * signature collapsed all vectors into one bucket (measured §5.3);
    * the bigram signature restores bucket spread, and the bucket cap
    * bounds the pair scan if a degenerate corpus collapses them
    * anyway. */
  def mediaNearDup(spark: SparkSession, docs: DataFrame,
                   planes: Int = 6, minCosine: Double = 0.999,
                   maxBucket: Int = 128): DataFrame = {
    import spark.implicits._
    // materialize the signatures once: the LSH pair search references
    // them on BOTH sides of its self-join, and without the checkpoint
    // each side re-runs the full per-byte decode
    val sigs = mediaTable(docs)
      .select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition setup happens once (decoder init in real build)
        rows.map { case (id, payload) => (id, bigramSigStub(payload, 64)) }
      }
      .toDF("vec_id", "histogram")
      // native array cast, not transform(): HOFs are CodegenFallback
      .select(col("vec_id"),
        col("histogram").cast("array<float>").as("embedding"))
      .localCheckpoint()
    Dedup.embeddingNearDup(sigs, planes = planes, minCosine = minCosine,
      auditable = true, maxBucket = maxBucket)
  }

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
