package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads as opaque `BINARY`
 * columns with typed metadata, decoded / feature-extracted / frame-sampled
 * through batched per-partition kernels.
 *
 * The Spark-side machinery here is real and tested — schema, partitioning,
 * batch shape, deterministic outputs. The *codec* itself is a STUB (no
 * image/audio libraries ship in this container): `DecodeStub` derives
 * deterministic pseudo-metadata and pseudo-frames from the bytes, with the
 * exact signature a real decoder (javacv / a Pandas-UDF sidecar on pyspark)
 * would have. Swap `decodeFn` to go live.
 */
object Multimodal {

  /** Typed media row: payload + envelope metadata. */
  case class MediaRow(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      payload: Array[Byte],
      declared_mime: String)

  /** Decoded envelope a real codec would produce. */
  case class MediaMeta(
      media_id: Long,
      kind: String,
      byte_len: Long,
      width: Int,            // image/video: pixels; audio: 0
      height: Int,
      duration_ms: Long,     // audio/video; image: 0
      channels: Int,
      ok: Boolean)

  /** One sampled frame / audio window: id, index, and a feature sketch. */
  case class FrameSample(
      media_id: Long,
      frame_idx: Int,
      offset_ms: Long,
      feature: Array[Float]) // e.g. a tiny embedding / histogram

  /**
   * STUB decoder: deterministic pure function of the payload bytes.
   * Real implementation would parse the container header here.
   */
  def decodeStub(r: MediaRow): MediaMeta = {
    val h = graft.functions.HashKernels.mix64(
      if (r.payload == null || r.payload.isEmpty) 0L
      else r.payload.take(32).foldLeft(1125899906842597L)((a, b) => a * 31 + b))
    val isImage = r.kind == "image"
    MediaMeta(
      media_id = r.media_id,
      kind = r.kind,
      byte_len = if (r.payload == null) 0L else r.payload.length.toLong,
      width = if (isImage || r.kind == "video") (((h >>> 3) % 1920) + 64).toInt else 0,
      height = if (isImage || r.kind == "video") (((h >>> 23) % 1080) + 64).toInt else 0,
      duration_ms = if (r.kind != "image") ((h >>> 13) % 600000L) else 0L,
      channels = if (r.kind == "audio") 2 else if (r.kind == "video") 1 else 3,
      ok = r.payload != null && r.payload.nonEmpty)
  }

  /**
   * Batched decode over partitions — the mapInPandas analog: one kernel
   * invocation per partition iterator, no per-row closure dispatch in the
   * hot loop, payload column never shuffled (narrow).
   */
  def decode(ds: Dataset[MediaRow],
             decodeFn: MediaRow => MediaMeta = decodeStub): Dataset[MediaMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map(decodeFn))
  }

  /**
   * Frame sampling: every `everyMs` ms up to `maxFrames` per media row
   * (deterministic offsets), each frame carrying a small feature vector —
   * STUB features derived from (media_id, frame_idx). The explode shape
   * (1 row → n frames) and the downstream partitioning are the real design:
   * repartition by media_id hash spreads decode cost; frame features flow
   * into Ann/Dedup operators unchanged.
   */
  def sampleFrames(meta: Dataset[MediaMeta], everyMs: Long = 1000L,
                   maxFrames: Int = 16, featureDim: Int = 8): Dataset[FrameSample] = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.filter(_.ok).flatMap { m =>
      val n = math.min(maxFrames, math.max(1L, m.duration_ms / everyMs).toInt)
      (0 until n).iterator.map { i =>
        val feat = Array.tabulate(featureDim) { d =>
          val h = graft.functions.HashKernels.mix64(m.media_id * 131071L + i * 524287L + d)
          ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
        }
        FrameSample(m.media_id, i, i * everyMs, feat)
      }
    }
  }

  /** Synthetic media table for tests: payload bytes derived from the id. */
  def syntheticMedia(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      val len = 64 + (graft.functions.HashKernels.mix64(i) >>> 56).toInt
      val payload = Array.tabulate(len)(j =>
        (graft.functions.HashKernels.mix64(i * 8191L + j) & 0xff).toByte)
      MediaRow(i, kind, payload, s"application/x-$kind")
    }
  }
}
