package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2.11): media payloads travel as
  * opaque BINARY columns (dbkit BLOB, reference src/types.rs:28) next to a
  * typed metadata struct; decode/feature steps run per-partition over the
  * binary batch.
  *
  * The decode itself is STUBBED — this container has no image/audio codecs —
  * behind [[FakeCodec]], a deterministic stand-in (dimensions derived from
  * md5 bytes) so the plumbing (schema, partitioning, batch shape, typed
  * mapPartitions signature) is real and testable end-to-end. Swapping in a
  * real codec is a one-function change.
  *
  * Scale notes: binary payloads make row sizes large — keep
  * `spark.sql.files.maxPartitionBytes` small enough that a partition of
  * blobs fits in executor memory, and never collect. The mapPartitions
  * boundary is exactly where a vectorized native decoder (or GPU batch)
  * would plug in: it sees an iterator over the partition, amortizing codec
  * init across rows — the same "batch-at-a-time extension" contract as the
  * reference's Operation/Cursor protocol (src/operation/mod.rs:35-40).
  */
object Multimodal {

  /** A media row: payload + typed metadata (the engine-visible schema). */
  case class MediaRow(media_id: Long, payload: Array[Byte], media_type: String)

  /** Decoded-media features produced by the (stubbed) codec. */
  case class MediaMeta(
      media_id: Long,
      n_bytes: Long,
      content_hash: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Deterministic fake codec: "dimensions" from the payload digest,
    * "frame count" from the payload size. Replace with a real decoder
    * (libjpeg/ffmpeg/...) without touching any Spark plumbing.
    */
  object FakeCodec {
    def decode(payload: Array[Byte]): (String, Int, Int, Int) = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
      val hex = md.map("%02x".format(_)).mkString
      val w = 64 + (java.lang.Long.parseLong(hex.substring(0, 7), 16) % 1856L).toInt
      val h = 64 + (java.lang.Long.parseLong(hex.substring(7, 14), 16) % 1856L).toInt
      val frames = (payload.length / 64) + 1
      (hex, w, h, frames)
    }
  }

  /** Per-partition decode: iterator-in/iterator-out so codec state is
    * initialized once per partition, not per row (mapPartitions is the
    * sanctioned last-resort tier of SURVEY.md §2.9 — justified here because
    * codecs are imperative native code, not expressions).
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codecs would init native contexts here, once per partition;
      // null payloads (nullable binary columns) are skipped, not decoded
      rows.filter(_.payload != null).map { r =>
        val (hex, w, h, frames) = FakeCodec.decode(r.payload)
        MediaMeta(r.media_id, r.payload.length.toLong, hex, w, h, frames)
      }
    }
  }

  /** Deterministic frame sampling: every `stride`-th frame index. Pure
    * relational (explode over a sequence) — the shape a video pipeline uses
    * to fan one row out to frame rows before a decode step.
    */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    meta
      // a real codec reports 0 frames for corrupt/empty media; emit no frame
      // rows rather than letting sequence(0, -1) abort the whole job
      .filter(col("n_frames") > 0)
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}
