package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2.11): media payloads travel as
  * opaque BINARY columns (dbkit BLOB, reference src/types.rs:28) next to a
  * typed metadata struct; decode/feature steps run per-partition over the
  * binary batch.
  *
  * Image decode is REAL for the formats the JDK ships codecs for —
  * PNG/JPEG/GIF/BMP via `javax.imageio` ([[ImageCodec]]), dispatched on the
  * payload's magic bytes. Payloads of any other type (audio/video — no
  * codec libs in this container) fall back to [[FakeCodec]], a
  * deterministic stand-in (dimensions derived from md5 bytes) that keeps
  * the plumbing (schema, partitioning, batch shape, typed mapPartitions
  * signature) testable end-to-end. Swapping in further codecs is a
  * one-function change.
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
    * "frame count" from the payload size. Covers the payload types the
    * JVM has no decoder for (audio/video) without touching any Spark
    * plumbing.
    */
  object FakeCodec {
    def decode(payload: Array[Byte]): (String, Int, Int, Int) = {
      val hex = md5Hex(payload)
      val w = 64 + (java.lang.Long.parseLong(hex.substring(0, 7), 16) % 1856L).toInt
      val h = 64 + (java.lang.Long.parseLong(hex.substring(7, 14), 16) % 1856L).toInt
      val frames = (payload.length / 64) + 1
      (hex, w, h, frames)
    }
  }

  private def md5Hex(payload: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(payload)
      .map("%02x".format(_)).mkString

  /** Real still-image codec over the JDK's built-in `javax.imageio` readers
    * (PNG/JPEG/GIF/BMP — zero extra jars). A payload whose magic matches a
    * supported format but fails to decode is CORRUPT media: reported as
    * 0×0 with 0 frames (the contract [[sampleFrames]] already documents —
    * corrupt media fans out to no frame rows) rather than failing the job
    * or silently falling back to fake dimensions.
    *
    * Deliberately HEADER-ONLY: `ImageReader.getWidth/getHeight(0)` parse
    * image metadata without allocating the raster. A full `ImageIO.read`
    * would (a) decode every pixel of every image just to emit metadata —
    * pure waste at corpus scale — and (b) allocate whatever the header
    * DECLARES: a 38-byte payload claiming 40000×40000 is a 6.4 GB
    * allocation and an executor-killing OutOfMemoryError on attacker- or
    * crawler-supplied bytes. The input stream is a MemoryCacheImageInputStream
    * — ImageIO's default path round-trips every payload through a disk
    * temp file, which is both slow and a spurious failure mode.
    */
  object ImageCodec {
    private def startsWith(p: Array[Byte], magic: Int*): Boolean =
      p.length >= magic.length &&
        magic.zipWithIndex.forall { case (m, i) => p(i) == m.toByte }

    /** Magic-byte sniff for the formats `javax.imageio` decodes. Kept
      * strict (full GIF87a/GIF89a signature; BMP requires a known DIB
      * header size at offset 14) because payloads are untyped bytes and a
      * 2-byte "BM" prefix matches ordinary text ("BM25 ...") — a false
      * positive would route a non-image through the corrupt-media path.
      * JPEG's 0xFF lead byte cannot appear in UTF-8 text.
      */
    def isSupportedImage(p: Array[Byte]): Boolean =
      startsWith(p, 0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ||  // PNG
        startsWith(p, 0xff, 0xd8, 0xff) ||                           // JPEG
        startsWith(p, 'G', 'I', 'F', '8', '7', 'a') ||               // GIF87a
        startsWith(p, 'G', 'I', 'F', '8', '9', 'a') ||               // GIF89a
        (startsWith(p, 'B', 'M') && p.length > 14 &&                 // BMP +
          Set(12, 40, 52, 56, 64, 108, 124).contains(p(14).toInt))   // DIB size

    def decode(payload: Array[Byte]): (String, Int, Int, Int) = {
      val hex = md5Hex(payload)
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) (hex, 0, 0, 0)
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            (hex, r.getWidth(0), r.getHeight(0), 1)
          } catch {
            // corrupt header: decodes to nothing, never fails the task
            case scala.util.control.NonFatal(_) => (hex, 0, 0, 0)
          } finally r.dispose()
        }
      } finally iis.close()
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
      // native codec contexts init here, once per partition; null payloads
      // (nullable binary columns) are skipped, not decoded. Dispatch:
      // media_type is the schema-level truth — declared images go through
      // the REAL ImageIO path, declared non-images (text/audio/video)
      // through the deterministic stand-in even if their bytes happen to
      // start with an image magic ("BM25 ..." is text, not a bitmap);
      // only UNTYPED payloads (empty / octet-stream, e.g. binaryFile
      // ingestion) fall back to the magic-byte sniff.
      rows.filter(_.payload != null).map { r =>
        val declaredImage = r.media_type != null && r.media_type.startsWith("image/")
        val untyped = r.media_type == null || r.media_type.isEmpty ||
          r.media_type == "application/octet-stream"
        val (hex, w, h, frames) =
          if (declaredImage || (untyped && ImageCodec.isSupportedImage(r.payload)))
            ImageCodec.decode(r.payload)
          else FakeCodec.decode(r.payload)
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
