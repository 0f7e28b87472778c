package graft.multimodal

/** REAL FLAC audio frame codec (RFC 9639) — pure JVM, no codec library:
  * FLAC is a fully-specified lossless format, so both halves are
  * implementable from the public spec alone. This retires FLAC from the
  * "container walk only" tier: [[decodeStats]] reconstructs the actual
  * PCM samples from rice-coded fixed-predictor residuals, verifying the
  * spec's CRC-8 (frame header) and CRC-16 (whole frame) as it walks.
  *
  * Scope (documented, not silently assumed): mono, 16 bits/sample,
  * fixed blocking strategy, subframe types CONSTANT / VERBATIM / FIXED
  * (orders 0–4), rice methods 0 and 1 with the escape-to-raw path, any
  * residual partition order. LPC subframes and stereo decorrelation are
  * out of scope — the encoder never emits them and the decoder stops at
  * the corrupt-media contract if it meets one. Losslessness is the gate
  * lever: encode∘decode is the identity, so a formula oracle checks the
  * DECODED samples exactly (the q143 contract at the compressed tier).
  *
  * Scale shape: both halves run at the mapPartitions codec boundary —
  * payload-local, no state across rows, stats-sized output.
  */
object FlacCodec {

  /** CRC-8, poly x⁸+x²+x+1 (0x07), init 0 — the FLAC frame-header CRC. */
  private[graft] def crc8(p: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= p(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0 — the FLAC whole-frame CRC. */
  private[graft] def crc16(p: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (p(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** MSB-first bit writer over a growable byte buffer. */
  private[graft] final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nbits = 0

    def writeBits(value: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((value >>> i) & 1L).toInt
        nbits += 1
        if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
        i -= 1
      }
    }

    /** q zeros then a one — FLAC's unary code. */
    def writeUnary(q: Int): Unit = { writeBits(0L, q); writeBits(1L, 1) }

    def alignByte(): Unit = if (nbits != 0) writeBits(0L, 8 - nbits)

    def size: Int = { require(nbits == 0); buf.length }
    def byteAt(i: Int): Byte = buf(i)
    def writeByte(b: Int): Unit = writeBits(b.toLong & 0xff, 8)
    def toBytes: Array[Byte] = { require(nbits == 0); buf.toArray }
  }

  /** MSB-first bit reader with an explicit failure latch (never throws on
    * truncated input — the walk checks [[failed]]).
    */
  private[graft] final class BitReader(p: Array[Byte], start: Int, end: Int) {
    var byteOff: Int = start
    private var bitOff = 0
    var failed: Boolean = false

    def aligned: Boolean = bitOff == 0

    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        if (byteOff >= end) { failed = true; return 0L }
        v = (v << 1) | ((p(byteOff) >> (7 - bitOff)) & 1)
        bitOff += 1
        if (bitOff == 8) { bitOff = 0; byteOff += 1 }
        i += 1
      }
      v
    }

    def readSigned(n: Int): Int = {
      val v = readBits(n)
      // sign-extend an n-bit two's-complement value
      ((v << (64 - n)).toLong >> (64 - n)).toInt
    }

    def readUnary(): Int = {
      var q = 0
      while (true) {
        if (byteOff >= end) { failed = true; return 0 }
        val bit = (p(byteOff) >> (7 - bitOff)) & 1
        bitOff += 1
        if (bitOff == 8) { bitOff = 0; byteOff += 1 }
        if (bit == 1) return q
        q += 1
        if (q > (1 << 24)) { failed = true; return 0 } // runaway guard
      }
      0
    }

    def alignByte(): Unit = if (bitOff != 0) { bitOff = 0; byteOff += 1 }
  }

  /** FLAC's UTF-8-style coded number (frame index under fixed blocking). */
  private def writeCodedNumber(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) w.writeByte(v.toInt)
    else if (v < 0x800) {
      w.writeByte(0xc0 | (v >> 6).toInt); w.writeByte(0x80 | (v & 0x3f).toInt)
    } else if (v < 0x10000) {
      w.writeByte(0xe0 | (v >> 12).toInt)
      w.writeByte(0x80 | ((v >> 6) & 0x3f).toInt)
      w.writeByte(0x80 | (v & 0x3f).toInt)
    } else {
      w.writeByte(0xf0 | (v >> 18).toInt)
      w.writeByte(0x80 | ((v >> 12) & 0x3f).toInt)
      w.writeByte(0x80 | ((v >> 6) & 0x3f).toInt)
      w.writeByte(0x80 | (v & 0x3f).toInt)
    }
  }

  private def readCodedNumber(r: BitReader): Long = {
    val b0 = r.readBits(8).toInt
    if ((b0 & 0x80) == 0) b0.toLong
    else {
      val extra =
        if ((b0 & 0xe0) == 0xc0) 1
        else if ((b0 & 0xf0) == 0xe0) 2
        else if ((b0 & 0xf8) == 0xf0) 3
        else if ((b0 & 0xfc) == 0xf8) 4
        else if ((b0 & 0xfe) == 0xfc) 5
        else if (b0 == 0xfe) 6
        else { r.failed = true; return 0L }
      var v = (b0 & (0x3f >> extra)).toLong
      var i = 0
      while (i < extra) {
        val b = r.readBits(8).toInt
        if ((b & 0xc0) != 0x80) { r.failed = true; return 0L }
        v = (v << 6) | (b & 0x3f)
        i += 1
      }
      v
    }
  }

  /** Fixed-predictor residual at order k (the spec's difference ladder). */
  private def residual(x: Array[Int], i: Int, order: Int): Long = order match {
    case 0 => x(i)
    case 1 => x(i).toLong - x(i - 1)
    case 2 => x(i).toLong - 2L * x(i - 1) + x(i - 2)
    case 3 => x(i).toLong - 3L * x(i - 1) + 3L * x(i - 2) - x(i - 3)
    case _ => x(i).toLong - 4L * x(i - 1) + 6L * x(i - 2) - 4L * x(i - 3) + x(i - 4)
  }

  private def zigzag(v: Long): Long = if (v < 0) -2 * v - 1 else 2 * v

  /** Encode one mono 16-bit frame. Subframe selection: CONSTANT when all
    * samples agree, else rotating VERBATIM / FIXED-1 / FIXED-2 by frame
    * index (blocks shorter than order+1 fall back to VERBATIM). Rice
    * parameter = floor(log2(mean zigzag)) clamped to [0, 14], partition
    * order 0 — always a VALID stream; optimal partitioning is an encoder
    * quality knob, not a conformance requirement.
    */
  private def encodeFrame(w: BitWriter, block: Array[Int], frameIdx: Long): Unit = {
    val n = block.length
    val fw = new BitWriter
    fw.writeByte(0xff); fw.writeByte(0xf8) // sync + fixed blocking
    fw.writeByte(0x60)                     // blocksize: 8-bit at end; rate: STREAMINFO
    fw.writeByte(0x08)                     // mono; 16 bps; reserved 0
    writeCodedNumber(fw, frameIdx)
    fw.writeByte(n - 1)
    // header CRC-8 over everything so far
    val hdrBytes = fw.toBytes
    val crc = crc8(hdrBytes, 0, hdrBytes.length)
    fw.writeByte(crc)
    val allEqual = block.forall(_ == block(0))
    val order =
      if (allEqual) -1 // CONSTANT
      else if (frameIdx % 3 == 0) -2 // VERBATIM
      else if (frameIdx % 3 == 1 && n >= 2) 1
      else if (n >= 3) 2
      else -2
    order match {
      case -1 =>
        fw.writeBits(0L, 1); fw.writeBits(0L, 6); fw.writeBits(0L, 1)
        fw.writeBits(block(0).toLong & 0xffff, 16)
      case -2 =>
        fw.writeBits(0L, 1); fw.writeBits(1L, 6); fw.writeBits(0L, 1)
        var i = 0
        while (i < n) { fw.writeBits(block(i).toLong & 0xffff, 16); i += 1 }
      case k =>
        fw.writeBits(0L, 1); fw.writeBits(8L | k.toLong, 6); fw.writeBits(0L, 1)
        var i = 0
        while (i < k) { fw.writeBits(block(i).toLong & 0xffff, 16); i += 1 }
        // rice parameter from the mean zigzag magnitude
        var sumZ = 0L
        i = k
        while (i < n) { sumZ += zigzag(residual(block, i, k)); i += 1 }
        val mean = if (n > k) sumZ / (n - k) else 0L
        var param = 0
        while (param < 14 && (1L << (param + 1)) <= mean + 1) param += 1
        fw.writeBits(0L, 2)          // method 0: 4-bit rice params
        fw.writeBits(0L, 4)          // partition order 0
        fw.writeBits(param.toLong, 4)
        i = k
        while (i < n) {
          val u = zigzag(residual(block, i, k))
          fw.writeUnary((u >>> param).toInt)
          fw.writeBits(u & ((1L << param) - 1), param)
          i += 1
        }
    }
    fw.alignByte()
    val frameBytes = fw.toBytes
    val c16 = crc16(frameBytes, 0, frameBytes.length)
    var j = 0
    while (j < frameBytes.length) { w.writeByte(frameBytes(j) & 0xff); j += 1 }
    w.writeBits(c16.toLong, 16)
  }

  /** Full FLAC stream: "fLaC" magic + STREAMINFO (via the existing q203
    * metadata builder) + real encoded frames, `blocksize` samples each
    * (final frame partial). blocksize ≤ 256 (the 8-bit-at-end header
    * form this encoder emits).
    */
  def encodeStream(samples: Array[Int], rate: Int, blocksize: Int): Array[Byte] = {
    require(blocksize >= 1 && blocksize <= 256 && samples.nonEmpty)
    val meta = Multimodal.SyntheticMedia.flac(
      rate, channels = 1, bitsPerSample = 16,
      totalSamples = samples.length.toLong, fillerLen = 0)
    val w = new BitWriter
    var off = 0
    var f = 0L
    while (off < samples.length) {
      val n = math.min(blocksize, samples.length - off)
      encodeFrame(w, java.util.Arrays.copyOfRange(samples, off, off + n), f)
      off += n
      f += 1
    }
    meta ++ w.toBytes
  }

  /** Spec blocksize codes (frame-header bits 4..7 of byte 2). */
  private def blockSizeFromCode(code: Int, r: BitReader): Int = code match {
    case 0 => -1 // reserved
    case 1 => 192
    case c if c >= 2 && c <= 5 => 576 << (c - 2)
    case 6 => r.readBits(8).toInt + 1
    case 7 => r.readBits(16).toInt + 1
    case c => 256 << (c - 8)
  }

  /** Decoded-sample stats (n, sum, sum|v|, peak|v|) of a mono/16-bit FLAC
    * stream with CRC verification per frame; (0,0,0,0) when the payload
    * is not FLAC or not in scope, and a PARTIAL prefix when a later
    * frame fails CRC/structure (everything verified up to that point
    * counts — the truncated-shard contract). The STREAMINFO total-sample
    * count bounds the walk.
    */
  def decodeStats(p: Array[Byte]): (Long, Long, Long, Int) = {
    if (!Multimodal.ContainerCodec.isFlac(p)) return (0L, 0L, 0L, 0)
    val (_, ch, bps, total, _) = Multimodal.ContainerCodec.parseFlac(p)
    if (ch != 1 || bps != 16) return (0L, 0L, 0L, 0)
    // step over the metadata blocks to the first frame
    var off = 4
    var last = false
    while (!last && off + 4 <= p.length) {
      val hdr = p(off) & 0xff
      last = (hdr & 0x80) != 0
      val len = ((p(off + 1) & 0xff) << 16) | ((p(off + 2) & 0xff) << 8) |
        (p(off + 3) & 0xff)
      off += 4 + len
      if (off < 0 || off > p.length) return (0L, 0L, 0L, 0)
    }
    if (!last) return (0L, 0L, 0L, 0)
    var n = 0L; var sumV = 0L; var sumAbs = 0L; var peak = 0
    def emit(v: Int): Unit = {
      sumV += v
      val a = math.abs(v)
      sumAbs += a
      if (a > peak) peak = a
      n += 1
    }
    var ok = true
    while (ok && n < total && off + 5 <= p.length) {
      val frameStart = off
      if ((p(off) & 0xff) != 0xff || (p(off + 1) & 0xfe) != 0xf8) ok = false
      else {
        val r = new BitReader(p, off + 2, p.length)
        val bsCode = r.readBits(4).toInt
        val srCode = r.readBits(4).toInt
        val chCode = r.readBits(4).toInt
        val ssCode = r.readBits(3).toInt
        r.readBits(1) // reserved
        readCodedNumber(r)
        val bs = blockSizeFromCode(bsCode, r)
        // sample-rate codes 12/13/14 carry trailing bytes to skip
        if (srCode == 12) r.readBits(8)
        else if (srCode == 13 || srCode == 14) r.readBits(16)
        val sampleBits = ssCode match {
          case 1 => 8; case 2 => 12; case 4 => 16; case 5 => 20; case 6 => 24
          case 7 => 32; case _ => -1
        }
        val hdrEnd = r.byteOff
        if (r.failed || bs <= 0 || chCode != 0 || sampleBits != 16 ||
          !r.aligned || hdrEnd + 1 > p.length ||
          crc8(p, frameStart, hdrEnd) != (p(hdrEnd) & 0xff)) ok = false
        else {
          r.readBits(8) // the CRC-8 byte itself
          val want = math.min(bs.toLong, total - n).toInt
          val out = new Array[Int](bs)
          // subframe header
          if (r.readBits(1) != 0L) ok = false
          val typ = r.readBits(6).toInt
          var wasted = 0
          if (r.readBits(1) == 1L) wasted = r.readUnary() + 1
          val eff = 16 - wasted
          if (!r.failed && ok) {
            if (typ == 0) { // CONSTANT
              val v = r.readSigned(eff) << wasted
              java.util.Arrays.fill(out, v)
            } else if (typ == 1) { // VERBATIM
              var i = 0
              while (i < bs && !r.failed) { out(i) = r.readSigned(eff) << wasted; i += 1 }
            } else if (typ >= 8 && typ <= 12) { // FIXED order 0..4
              val order = typ - 8
              // a predictor order beyond the frame's blocksize is
              // structurally impossible — corrupt-media stop, BEFORE the
              // warmup loop writes past `out` (never-throw contract)
              if (order > bs) ok = false
              var i = 0
              while (ok && i < order && !r.failed) { out(i) = r.readSigned(eff) << wasted; i += 1 }
              val method = r.readBits(2).toInt
              if (method > 1) ok = false
              else {
                val pw = if (method == 0) 4 else 5
                val esc = (1 << pw) - 1
                val po = r.readBits(4).toInt
                val parts = 1 << po
                if (bs % parts != 0 || (bs >> po) <= order && po > 0) ok = false
                var idx = order
                var part = 0
                while (ok && !r.failed && part < parts) {
                  val cnt = (bs >> po) - (if (part == 0) order else 0)
                  val param = r.readBits(pw).toInt
                  var c = 0
                  if (param == esc) {
                    val raw = r.readBits(5).toInt
                    while (c < cnt && !r.failed) {
                      val res =
                        if (raw == 0) 0L
                        else (r.readBits(raw) << (64 - raw)) >> (64 - raw) // sign-extend
                      out(idx) = reconstruct(out, idx, order, res); idx += 1; c += 1
                    }
                  } else {
                    while (c < cnt && !r.failed) {
                      val q = r.readUnary().toLong
                      val low = r.readBits(param)
                      val u = (q << param) | low
                      val res = if ((u & 1L) != 0) -((u + 1) >> 1) else u >> 1
                      out(idx) = reconstruct(out, idx, order, res); idx += 1; c += 1
                    }
                  }
                  part += 1
                }
                if (idx != bs) ok = false
              }
            } else ok = false // LPC / reserved: out of scope
          }
          r.alignByte()
          if (ok && !r.failed && r.byteOff + 2 <= p.length &&
            crc16(p, frameStart, r.byteOff) ==
              (((p(r.byteOff) & 0xff) << 8) | (p(r.byteOff + 1) & 0xff))) {
            var i = 0
            while (i < want) { emit(out(i)); i += 1 }
            off = r.byteOff + 2
          } else ok = false
        }
      }
    }
    (n, sumV, sumAbs, peak)
  }

  /** Invert the fixed-predictor ladder: x(i) from residual + history. */
  private def reconstruct(x: Array[Int], i: Int, order: Int, res: Long): Int =
    (order match {
      case 0 => res
      case 1 => res + x(i - 1)
      case 2 => res + 2L * x(i - 1) - x(i - 2)
      case 3 => res + 3L * x(i - 1) - 3L * x(i - 2) + x(i - 3)
      case _ => res + 4L * x(i - 1) - 6L * x(i - 2) + 4L * x(i - 3) - x(i - 4)
    }).toInt
}
