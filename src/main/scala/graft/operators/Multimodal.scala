package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.security.MessageDigest

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines. Media payloads are opaque BINARY columns + typed metadata;
  * decode / feature-extraction runs batch-wise inside `mapPartitions`
  * (the JVM analog of pandas-batch UDFs: one codec instance per
  * partition, rows streamed through it).
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` derives deterministic pseudo-features from
  * the payload's SHA-256, so the Spark-side plumbing — schema, partition
  * batching, feature shape, join-back — is real and testable end-to-end,
  * and a real decoder drops into `decode` without touching the plan. */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           sha: String, width: Int, height: Int,
                           n_frames: Int, feature: Array[Float])

  /** Hex digit value (0-15) at 1-based position `i` of a hex string. */
  private def hexAt(s: String, i: Int): Int =
    "0123456789abcdef".indexOf(s.charAt(i - 1))

  /** STUB decoder: deterministic pseudo-metadata from the payload hash.
    * A real implementation would decode the codec here; everything
    * downstream (schema, batching, consumers) is unchanged. */
  def decodeStub(id: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
    val md = MessageDigest.getInstance("SHA-256")
    val sha = md.digest(payload).map("%02x".format(_)).mkString
    val width = 64 + hexAt(sha, 1) * 16 + hexAt(sha, 2)
    val height = 64 + hexAt(sha, 3) * 16 + hexAt(sha, 4)
    val frames = if (kind == "video") 1 + hexAt(sha, 5) else 1
    val feature = (0 until 8).map { j =>
      (hexAt(sha, 2 * j + 1) * 16 + hexAt(sha, 2 * j + 2)) / 255.0f
    }.toArray
    MediaFeatures(id, kind, payload.length.toLong, sha, width, height,
      frames, feature)
  }

  /** Batch feature extraction over a media table: mapPartitions keeps one
    * decoder per partition; input batches stream through it. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec handles, model…)
      rows.map(r => decodeStub(r.media_id, r.kind, r.payload))
    }
  }

  /** Deterministic frame sampling for video stand-ins: every k-th frame
    * index up to n_frames (generator — no shuffle). */
  def sampleFrames(features: Dataset[MediaFeatures], everyK: Int): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    features.toDF()
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK)))
          .as("frame_idx"))
  }

  /** Wrap a text table as a media table (payload = UTF-8 bytes) — the
    * environment has no real media files; the plumbing is identical. */
  def mediaFromText(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).as("media_id"),
        when(col(idCol) % 3 === 0, lit("image"))
          .when(col(idCol) % 3 === 1, lit("audio"))
          .otherwise(lit("video")).as("kind"),
        col(textCol).cast("binary").as("payload"))
      .as[MediaRow]
  }
}
