package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.multimodal.Multimodal

/** Protobuf wire-format record walk — the binary record framing RPC and
  * event-log pipelines ship (protobuf.dev/programming-guides/encoding),
  * parsed from the public spec with no generated classes or runtime
  * library: varints (7 bits/byte, LSB-first, MSB continuation), field
  * keys (field_number << 3 | wire_type), length-delimited payloads,
  * packed repeated varints, zigzag-encoded sint64, and little-endian i64
  * doubles. Shards use the standard DELIMITED stream framing (varint
  * message length before each message — `writeDelimitedTo`).
  *
  * Contracts (the shard tier's):
  *  - unknown fields are SKIPPED by wire type (the forward-compatibility
  *    rule the format exists for);
  *  - a truncated shard yields its fully-framed prefix;
  *  - malformed input (varint overrun, length past the buffer, a
  *    deprecated group wire type) stops the walk at the last good record;
  *  - 100 TB: records fan out at the mapPartitions codec boundary,
  *    metadata-sized rows out, payload bytes never shuffle.
  */
object ProtoWire {

  /** One parsed record of the gate's message shape:
    * `{ int64 id = 1; string title = 2; repeated int64 tags = 3 [packed];
    *    double score = 4; sint64 sdelta = 5; }` (+ unknown fields 7, 8).
    */
  case class ProtoRecord(shard_id: Long, rec_idx: Int, id: Long,
      title: String, n_tags: Long, tag_sum: Long, sdelta: Long, score: Double)

  def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  private def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write((v & 0x7f).toInt)
  }

  /** Decode a varint at `pos`; returns (value, nextPos), or nextPos = -1
    * on overrun/malformed (more than 10 bytes or past the buffer).
    */
  private def readVarint(b: Array[Byte], pos: Int, end: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var p = pos
    while (p < end && shift <= 63) {
      val byte = b(p) & 0xff
      v |= (byte & 0x7fL) << shift
      p += 1
      if ((byte & 0x80) == 0) return (v, p)
      shift += 7
    }
    (0L, -1)
  }

  // ------------------------------------------------------------ builder

  /** Formula-synthesized shards (the q206/q227 discipline: every gated
    * field is a pure function of (key, i), so the oracle replays the walk
    * without seeing a byte).
    */
  object Synthetic {
    private def keyByte(out: ByteArrayOutputStream, fieldNo: Int, wt: Int): Unit =
      writeVarint(out, (fieldNo.toLong << 3) | wt.toLong)

    def message(key: Long, i: Int): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      keyByte(out, 1, 0); writeVarint(out, 1000L * key + i)
      val title = ("rec " + ((key * 7 + i) % 41)).getBytes(StandardCharsets.UTF_8)
      keyByte(out, 2, 2); writeVarint(out, title.length.toLong); out.write(title)
      val nTags = (1 + (key + i) % 3).toInt
      val packed = new ByteArrayOutputStream()
      (0 until nTags).foreach(j => writeVarint(packed, (key + (j + 1) * i + j) % 17))
      keyByte(out, 3, 2); writeVarint(out, packed.size.toLong); packed.writeTo(out)
      val score = ((key * 13 + i) % 97).toDouble / 8.0
      keyByte(out, 4, 1)
      val bits = java.lang.Double.doubleToLongBits(score)
      (0 until 8).foreach(b => out.write(((bits >>> (8 * b)) & 0xff).toInt))
      keyByte(out, 5, 0); writeVarint(out, zigzag(key - 50 + i))
      // unknown fields a reader of the 5-field schema must SKIP
      keyByte(out, 7, 0); writeVarint(out, (key + i) % 100)
      keyByte(out, 8, 5)
      (0 until 4).foreach(_ => out.write(0xab))
      out.toByteArray
    }

    /** Delimited shard of n messages for `key`. */
    def shard(key: Long, n: Int): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      (0 until n).foreach { i =>
        val msg = message(key, i)
        writeVarint(out, msg.length.toLong)
        out.write(msg, 0, msg.length)
      }
      out.toByteArray
    }
  }

  // ------------------------------------------------------------- parser

  /** Parse one message slice [from, to). None on any malformation. */
  private def parseMessage(shardId: Long, recIdx: Int,
      b: Array[Byte], from: Int, to: Int): Option[ProtoRecord] = {
    var p = from
    var id = 0L; var title = ""; var nTags = 0L; var tagSum = 0L
    var sdelta = 0L; var score = 0.0
    while (p < to) {
      val (keyv, p1) = readVarint(b, p, to)
      if (p1 < 0) return None
      val fieldNo = (keyv >>> 3).toInt
      val wt = (keyv & 7L).toInt
      p = p1
      wt match {
        case 0 =>
          val (v, p2) = readVarint(b, p, to)
          if (p2 < 0) return None
          fieldNo match {
            case 1 => id = v
            case 5 => sdelta = unzigzag(v)
            case _ => () // unknown varint: skipped
          }
          p = p2
        case 1 =>
          if (p + 8 > to) return None
          if (fieldNo == 4) {
            var bits = 0L
            (0 until 8).foreach(k => bits |= (b(p + k) & 0xffL) << (8 * k))
            score = java.lang.Double.longBitsToDouble(bits)
          }
          p += 8
        case 2 =>
          val (len, p2) = readVarint(b, p, to)
          if (p2 < 0 || len < 0 || p2 + len > to) return None
          fieldNo match {
            case 2 => title = new String(b, p2, len.toInt, StandardCharsets.UTF_8)
            case 3 =>
              var q = p2
              val qEnd = p2 + len.toInt
              while (q < qEnd) {
                val (tv, q2) = readVarint(b, q, qEnd)
                if (q2 < 0) return None
                nTags += 1; tagSum += tv; q = q2
              }
            case _ => () // unknown length-delimited: skipped
          }
          p = p2 + len.toInt
        case 5 =>
          if (p + 4 > to) return None
          p += 4 // i32: gate schema has none, always skipped
        case _ =>
          return None // groups (3/4) are deprecated wire types: corrupt
      }
    }
    Some(ProtoRecord(shardId, recIdx, id, title, nTags, tagSum, sdelta, score))
  }

  /** Walk a delimited shard: fully-framed, well-formed prefix of records. */
  def records(shardId: Long, bytes: Array[Byte]): Seq[ProtoRecord] = {
    val out = Seq.newBuilder[ProtoRecord]
    var p = 0
    var idx = 0
    var ok = true
    while (ok && p < bytes.length) {
      val (len, p1) = readVarint(bytes, p, bytes.length)
      if (p1 < 0 || len < 0 || p1 + len > bytes.length) ok = false
      else parseMessage(shardId, idx, bytes, p1, p1 + len.toInt) match {
        case Some(rec) => out += rec; idx += 1; p = p1 + len.toInt
        case None => ok = false
      }
    }
    out.result()
  }

  /** Per-partition record fan-out at the codec boundary. */
  def protoRecordRows(media: Dataset[Multimodal.MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.payload != null).flatMap(r => records(r.media_id, r.payload))
    }.toDF()
  }
}
