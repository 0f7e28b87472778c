package graft

import graft.multimodal.{Multimodal, Shards}
import Shards.ArchiveCodec

class ShardsSpec extends SparkTestBase {

  private val ascii = java.nio.charset.StandardCharsets.US_ASCII

  /** Hand-packed ustar header, independent of SyntheticShards.tarShard. */
  private def goldenHeader(name: String, sizeOctal: String, typeflag: Byte): Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes(ascii)
    System.arraycopy(nb, 0, h, 0, nb.length)
    System.arraycopy(sizeOctal.getBytes(ascii), 0, h, 124, sizeOctal.length)
    h(156) = typeflag
    System.arraycopy("ustar".getBytes(ascii), 0, h, 257, 5)
    h
  }

  test("octal field parse: padding, terminators, rejection") {
    def oct(s: String): Long =
      ArchiveCodec.octal(s.getBytes(ascii), 0, s.length)
    assert(oct("00000000012\u0000") == 10L)
    assert(oct("   7777 ") == 4095L) // leading-space padding (old tar style)
    assert(oct("00000000000\u0000") == 0L)
    assert(oct("0000000001g\u0000") == -1L, "non-octal digit rejected")
    assert(oct("            ") == -1L, "no digits at all rejected")
    assert(oct("00000012    ") == 10L, "space run after digits terminates")
  }

  test("tar walk matches independent golden bytes (octal sizes, typeflag skip, truncation)") {
    val bodyA = "abcdefghij".getBytes(ascii) // 10 bytes, size field 012 octal
    val bodyB = Array.tabulate(513)(i => (i % 251).toByte) // spans 2 blocks
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(goldenHeader("a.txt", "00000000012", '0'))
    bos.write(bodyA); bos.write(new Array[Byte](502))
    bos.write(goldenHeader("link", "00000000000", '2')) // symlink: skipped
    bos.write(goldenHeader("b.bin", "00000001001", '0')) // 513 decimal
    bos.write(bodyB); bos.write(new Array[Byte](511))
    bos.write(new Array[Byte](1024))
    val golden = bos.toByteArray
    assert(ArchiveCodec.isTar(golden))
    val members = ArchiveCodec.tarMembers(5L, golden)
    assert(members.map(m => (m.member_idx, m.name, m.size)) ==
      Seq((0, "a.txt", 10L), (2, "b.bin", 513L)),
      "octal size decode + skipped member keeps stream position")
    assert(members(0).byte_sum == bodyA.map(_ & 0xff).map(_.toLong).sum)
    assert(members(1).byte_sum == bodyB.map(_ & 0xff).map(_.toLong).sum)
    // truncation mid-member: complete members survive, the cut one drops
    val cut = ArchiveCodec.tarMembers(5L, golden.dropRight(1600))
    assert(cut.map(_.name) == Seq("a.txt"))
    // text payloads never sniff as tar (magic sits at offset 257)
    assert(!ArchiveCodec.isTar("ustar is a format".getBytes(ascii)))
    assert(ArchiveCodec.tarMembers(1L, Array.fill[Byte](600)(7)).isEmpty)
  }

  test("tarShard builder roundtrip: directory member advances position, emits no row") {
    for (key <- Seq(0L, 1L, 55L, 100L)) {
      val n = 2 + (key % 3).toInt
      val members = ArchiveCodec.tarMembers(key, Shards.SyntheticShards.tarShard(key))
      assert(members.length == n, s"member count for key=$key")
      val expectIdx = (0 until n).map(i => if (i == 0) 0 else i + 1)
      assert(members.map(_.member_idx) == expectIdx, s"positions for key=$key")
      members.zipWithIndex.foreach { case (m, i) =>
        val body = Shards.SyntheticShards.memberBytes(key, i)
        assert(m.name == s"shard$key/doc$i.txt")
        assert(m.size == body.length.toLong)
        assert(m.byte_sum == body.map(_ & 0xff).map(_.toLong).sum)
      }
    }
  }

  test("gzip: real inflate roundtrip, corrupt/truncated/bomb -> corrupt contract") {
    val content = Array.tabulate(5000)(i => (i * 17 % 256).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(content); gz.close()
    val payload = bos.toByteArray
    assert(ArchiveCodec.gunzipStats(payload) ==
      ((5000L, content.map(_ & 0xff).map(_.toLong).sum)))
    // not gzip at all
    assert(ArchiveCodec.gunzipStats("plain text, definitely not gzip".getBytes(ascii)) ==
      ((-1L, 0L)))
    // truncated mid-stream and mid-trailer: Inflater/CRC failure, not junk
    assert(ArchiveCodec.gunzipStats(payload.dropRight(6)) == ((-1L, 0L)))
    assert(ArchiveCodec.gunzipStats(payload.take(payload.length / 2)) == ((-1L, 0L)))
    // decompression bomb: tiny payload, huge declared stream — capped
    val zeros = new java.io.ByteArrayOutputStream()
    val gz2 = new java.util.zip.GZIPOutputStream(zeros)
    gz2.write(new Array[Byte](1 << 20)); gz2.close()
    assert(ArchiveCodec.gunzipStats(zeros.toByteArray, maxOut = 1000L) == ((-1L, 0L)))
    // gzip magic but corrupt header (CM=7≠8): GZIPInputStream's
    // CONSTRUCTOR throws — must degrade to the contract, never escape
    val badHeader = Array[Byte](0x1f, 0x8b.toByte, 0x07) ++ new Array[Byte](20)
    assert(ArchiveCodec.gunzipStats(badHeader) == ((-1L, 0L)))
    // trailing garbage after a complete member: the JDK reader's
    // concatenated-member probe swallows it — valid prefix's stats win
    // (spec-pinned actual behavior, documented on gunzipStats)
    val withGarbage = payload ++ "junk that is not a second member".getBytes(ascii)
    assert(ArchiveCodec.gunzipStats(withGarbage) ==
      ((5000L, content.map(_ & 0xff).map(_.toLong).sum)))
  }

  test("zstd: real decompress roundtrip, truncated/corrupt/bomb -> corrupt contract") {
    val content = Array.tabulate(5000)(i => (i * 17 % 256).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    val zs = new com.github.luben.zstd.ZstdOutputStream(bos)
    zs.write(content); zs.close()
    val payload = bos.toByteArray
    assert(ArchiveCodec.isZstd(payload))
    assert(ArchiveCodec.unzstdStats(payload) ==
      ((5000L, content.map(_ & 0xff).map(_.toLong).sum)))
    // not zstd at all
    assert(ArchiveCodec.unzstdStats("plain text payload here".getBytes(ascii)) ==
      ((-1L, 0L)))
    // truncated mid-frame: surfaced by the real frame walk, not a sniff
    assert(ArchiveCodec.unzstdStats(payload.dropRight(6)) == ((-1L, 0L)))
    assert(ArchiveCodec.unzstdStats(payload.take(payload.length / 2)) == ((-1L, 0L)))
    // decompression bomb: tiny payload, huge declared stream — capped
    val zeros = new java.io.ByteArrayOutputStream()
    val zs2 = new com.github.luben.zstd.ZstdOutputStream(zeros)
    zs2.write(new Array[Byte](1 << 20)); zs2.close()
    assert(ArchiveCodec.unzstdStats(zeros.toByteArray, maxOut = 1000L) == ((-1L, 0L)))
  }

  test("decompressStats dispatch: codec label by magic, raw formula bytes never sniff") {
    val gz = Shards.SyntheticShards.gzipDoc(11L)
    val zst = Shards.SyntheticShards.zstdDoc(11L)
    val raw = Shards.SyntheticShards.memberBytes(11L, 0)
    val want = raw.map(_ & 0xff).map(_.toLong).sum
    assert(ArchiveCodec.decompressStats(gz) == (("gzip", raw.length.toLong, want)))
    assert(ArchiveCodec.decompressStats(zst) == (("zstd", raw.length.toLong, want)))
    // truncation keeps the sniffed label, degrades features
    assert(ArchiveCodec.decompressStats(gz.dropRight(6)) == (("gzip", -1L, 0L)))
    assert(ArchiveCodec.decompressStats(zst.dropRight(6)) == (("zstd", -1L, 0L)))
    // the raw member-byte formula provably matches neither magic for ANY key
    for (key <- 0L until 256L)
      assert(ArchiveCodec.decompressStats(
        Shards.SyntheticShards.memberBytes(key, 0))._1 == "unknown",
        s"raw bytes sniffed as a codec for key=$key")
  }

  test("zip walk: real inflate per member, directory skip, truncation, bomb abort") {
    val key = 7L
    val members = ArchiveCodec.zipMembers(9L, Shards.SyntheticShards.zipShard(key))
    val n = 2 + (key % 3).toInt
    assert(members.length == n)
    members.zipWithIndex.foreach { case (m, i) =>
      val want = Shards.SyntheticShards.memberBytes(key, i)
      // directory entry sits at stream position 1: emitted idx skips it
      assert(m.member_idx == (if (i == 0) 0 else i + 1), s"idx for i=$i")
      assert(m.name == s"doc$i.txt")
      assert(m.size == want.length.toLong, s"decompressed size for i=$i")
      assert(m.byte_sum == want.map(_ & 0xff).map(_.toLong).sum, s"sum for i=$i")
    }
    // EOCD tail clip: the STREAM walk never reads the central directory
    val full = Shards.SyntheticShards.zipShard(key)
    assert(ArchiveCodec.zipMembers(9L, full.dropRight(6)) == members)
    // mid-stream cut: members fully read before the cut stand, rest drop
    val cut = ArchiveCodec.zipMembers(9L, full.take(full.length / 3))
    assert(cut.length < n && cut == members.take(cut.length))
    // not zip at all / raw formula bytes never sniff
    assert(ArchiveCodec.zipMembers(9L, "PK but not an archive".getBytes(ascii)).isEmpty)
    for (k <- 0L until 109L)
      assert(ArchiveCodec.zipMembers(9L, Shards.SyntheticShards.memberBytes(k, 0)).isEmpty)
    // zip bomb: a member inflating past maxOut aborts the walk; members
    // before it stand, the bomb and everything after never emit
    val bos = new java.io.ByteArrayOutputStream()
    val zo = new java.util.zip.ZipOutputStream(bos)
    zo.putNextEntry(new java.util.zip.ZipEntry("ok.txt"))
    zo.write("small".getBytes(ascii)); zo.closeEntry()
    zo.putNextEntry(new java.util.zip.ZipEntry("bomb.bin"))
    zo.write(new Array[Byte](1 << 20)); zo.closeEntry()
    zo.putNextEntry(new java.util.zip.ZipEntry("after.txt"))
    zo.write("never reached".getBytes(ascii)); zo.closeEntry()
    zo.close()
    val bombed = ArchiveCodec.zipMembers(1L, bos.toByteArray, maxOut = 1000L)
    assert(bombed.map(_.name) == Seq("ok.txt"))
  }

  test("wds sample assembly: members regroup by FIRST-dot basename into per-sample rows") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, Shards.SyntheticShards.wdsShard(4L), "application/x-tar"),
      Multimodal.MediaRow(2L, Shards.SyntheticShards.wdsShard(11L), "application/x-tar"))
      .toDS()
    val samples = Shards.assembleSamples(Shards.tarMemberRows(media))
      .orderBy("shard_id", "sample_key").collect()
    val wantCounts = Map(1L -> (2 + 4 % 3), 2L -> (2 + 11 % 3))
    assert(samples.groupBy(_.getLong(0)).view.mapValues(_.length).toMap == wantCounts)
    samples.foreach { r =>
      val key = if (r.getLong(0) == 1L) 4L else 11L
      val i = r.getString(1).stripPrefix("s").toInt
      val parts = (0 until 4).map(c => Shards.SyntheticShards.memberBytes(key, 4 * i + c))
      assert(r.getLong(2) == 4L, "n_parts")
      assert(r.getLong(3) == parts.map(_.length.toLong).sum, "total_size")
      assert(r.getLong(4) == parts.map(_.map(_ & 0xff).map(_.toLong).sum).sum, "total_byte_sum")
      // the multi-dotted part type exercises the first-dot key rule:
      // s<i>.seg.cls is part "seg.cls" of sample s<i>, never sample s<i>.seg
      assert(r.getString(5) == "bin,json,seg.cls,txt", "modality signature")
    }
    // a member with no extension keeps its full name as the sample key;
    // directory prefixes stay in the key (never merge across dirs)
    val bare = Seq(
      (5L, 0, "README", 3L, 10L),
      (5L, 1, "a/0001.jpg", 4L, 20L),
      (5L, 2, "b/0001.jpg", 5L, 30L))
      .toDF("shard_id", "member_idx", "name", "size", "byte_sum")
    val rows = Shards.assembleSamples(bare).orderBy("sample_key").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("README", "a/0001", "b/0001"))
    assert(rows.head.getString(5) == "")
  }

  test("shard export: writer fails fast on names the ustar field cannot carry") {
    intercept[IllegalArgumentException] {
      ArchiveCodec.tarArchive(Iterator(("x" * 101, Array[Byte](1))))
    }
    intercept[IllegalArgumentException] {
      ArchiveCodec.tarArchive(Iterator(("naïve.txt", Array[Byte](1))))
    }
  }

  test("zip walk: malformed non-UTF-8 entry name follows the corrupt contract, no throw") {
    val full = Shards.SyntheticShards.zipShard(4L)
    // corrupt the FIRST local header's name bytes (name starts at offset
    // 30) with an invalid UTF-8 sequence: getNextEntry throws
    // IllegalArgumentException, which must degrade to no-rows-from-here
    val bad = full.clone()
    bad(30) = 0xff.toByte; bad(31) = 0xfe.toByte
    assert(ArchiveCodec.zipMembers(1L, bad).isEmpty)
  }

  test("compressed-shard ingestion: decompressBytes + compose with the tar walk") {
    import spark.implicits._
    val key = 5L
    val tar = Shards.SyntheticShards.tarShard(key)
    val want = ArchiveCodec.tarMembers(0L, tar).map(m => (m.name, m.size, m.byte_sum))
    // materialized decompress: roundtrip both codecs, null contracts
    assert(ArchiveCodec.decompressBytes(Shards.SyntheticShards.gzipBytes(tar)).toSeq == tar.toSeq)
    assert(ArchiveCodec.decompressBytes(Shards.SyntheticShards.zstdBytes(tar)).toSeq == tar.toSeq)
    assert(ArchiveCodec.decompressBytes("not compressed".getBytes(ascii)) == null)
    assert(ArchiveCodec.decompressBytes(
      Shards.SyntheticShards.gzipBytes(tar).dropRight(6)) == null)
    assert(ArchiveCodec.decompressBytes(
      Shards.SyntheticShards.gzipBytes(new Array[Byte](1 << 20)), maxOut = 1000L) == null)
    // the composed operator over a mixed corpus: gz, zst, raw,
    // truncated-gz (no rows), raw-with-clipped-zero-tail (unaffected)
    val media = Seq(
      Multimodal.MediaRow(1L, Shards.SyntheticShards.gzipBytes(tar), "application/gzip"),
      Multimodal.MediaRow(2L, Shards.SyntheticShards.zstdBytes(tar), "application/zstd"),
      Multimodal.MediaRow(3L, tar, "application/x-tar"),
      Multimodal.MediaRow(4L, Shards.SyntheticShards.gzipBytes(tar).dropRight(6), "application/gzip"),
      Multimodal.MediaRow(5L, tar.dropRight(6), "application/x-tar"),
      Multimodal.MediaRow(6L, null, "application/x-tar")).toDS()
    val rows = Shards.compressedTarMemberRows(media.repartition(2))
      .collect().map(r => (r.getLong(0), (r.getString(2), r.getLong(3), r.getLong(4))))
    val byShard = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(byShard.keySet == Set(1L, 2L, 3L, 5L))
    for (id <- Seq(1L, 2L, 3L, 5L)) assert(byShard(id) == want, s"shard $id")
  }

  test("shard export: pack -> external-shape ustar -> walk roundtrip") {
    import spark.implicits._
    val docs = (0L until 11L).map(id =>
      Shards.ShardDoc(id, s"doc$id.txt", Shards.SyntheticShards.memberBytes(id % 5, 0)))
    val packed = Shards.packTarShards(docs.toDS().repartition(3), 4).collect()
    assert(packed.map(_.media_id).sorted.toSeq == Seq(0L, 1L, 2L))
    // every exported payload is structurally valid ustar with the right
    // member set in doc_id order, independently re-walked
    packed.foreach { shard =>
      assert(ArchiveCodec.isTar(shard.payload))
      val members = ArchiveCodec.tarMembers(shard.media_id, shard.payload)
      val wantIds = (shard.media_id * 4 until math.min(shard.media_id * 4 + 4, 11L)).toSeq
      assert(members.map(_.name) == wantIds.map(id => s"doc$id.txt"))
      members.zip(wantIds).foreach { case (m, id) =>
        val body = Shards.SyntheticShards.memberBytes(id % 5, 0)
        assert(m.size == body.length.toLong)
        assert(m.byte_sum == body.map(_ & 0xff).map(_.toLong).sum)
      }
    }
    // a partial final shard (3 of 4 docs) still terminates correctly
    assert(ArchiveCodec.tarMembers(2L,
      packed.find(_.media_id == 2L).get.payload).length == 3)
  }

  test("warc walk matches independent golden bytes; headers case-insensitive") {
    import Shards.WarcCodec
    // hand-built record, NOT via writeRecord: the parser must read what
    // the spec says, not what our own writer happens to emit. Mixed-case
    // field names per ISO 28500 §4 (field names are case-insensitive).
    val body = "hello warc".getBytes("US-ASCII")
    val golden = ("WARC/1.0\r\n" +
      "warc-type: response\r\n" +
      "WARC-RECORD-ID: <urn:uuid:x>\r\n" +
      "Warc-Target-Uri: https://ex.com/a\r\n" +
      "CONTENT-LENGTH: 10\r\n" +
      "X-Unknown: ignored\r\n\r\n").getBytes("US-ASCII") ++
      body ++ "\r\n\r\n".getBytes("US-ASCII")
    val rs = WarcCodec.warcRecords(7L, golden)
    assert(rs.length == 1)
    val r = rs.head
    assert(r.warc_type == "response")
    assert(r.target_uri == "https://ex.com/a")
    assert(r.content_length == 10L)
    assert(r.body_sum == body.map(_ & 0xff).map(_.toLong).sum)
    // version 1.1 accepted; 2.0 is not ours to guess at
    assert(WarcCodec.isWarc("WARC/1.1\r\nx".getBytes("US-ASCII") ++ golden.drop(10)))
    assert(!WarcCodec.isWarc("WARC/2.0\r\n".getBytes("US-ASCII")))
  }

  test("warc walk: truncation clamps, missing Content-Length stops, non-warc sniffs out") {
    import Shards.WarcCodec
    val shard = Shards.SyntheticShards.warcShard(5L) // 2 + 5%3 = 4 records
    assert(WarcCodec.warcRecords(1L, shard).length == 4)
    // cut into the last record's frame: exactly the complete prefix stands
    val cut = WarcCodec.warcRecords(1L, shard.dropRight(10))
    assert(cut.length == 3)
    assert(cut.map(_.rec_idx) == Seq(0, 1, 2))
    // a record with no Content-Length cannot be framed: walk ends before it
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\n").getBytes("US-ASCII")
    assert(WarcCodec.warcRecords(1L, shard.take(0) ++ noLen).isEmpty)
    // non-WARC payloads: tar magic, random bytes, empty
    assert(WarcCodec.warcRecords(1L, Shards.SyntheticShards.tarShard(3L)).isEmpty)
    assert(WarcCodec.warcRecords(1L, Array.fill[Byte](64)(42)).isEmpty)
    assert(WarcCodec.warcRecords(1L, Array.emptyByteArray).isEmpty)
    val firstBodyEnd = {
      val s = new String(shard, "ISO-8859-1")
      s.indexOf("\r\n\r\n", s.indexOf("Content-Length")) + 4 +
        Shards.SyntheticShards.memberBytes(5L, 0).length
    }
    // a record's OWN two-CRLF separator is part of its framing: breaking
    // it drops that record too (its extent can't be trusted), not just
    // the ones after it
    val brokenSep = shard.clone()
    brokenSep(firstBodyEnd) = 'X'
    assert(WarcCodec.warcRecords(1L, brokenSep).isEmpty)
    // a corrupt SECOND record (bad version line) desynchronizes the walk
    // there: the fully-framed first record stands
    val brokenNext = shard.clone()
    brokenNext(firstBodyEnd + 4) = 'X'
    assert(WarcCodec.warcRecords(1L, brokenNext).map(_.rec_idx) == Seq(0))
  }

  test("warc roundtrip through the dataset walk incl. gzip members and corrupt drop") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, Shards.SyntheticShards.warcShard(4L), "application/warc"),
      Multimodal.MediaRow(2L,
        Shards.SyntheticShards.gzipBytes(Shards.SyntheticShards.warcShard(4L)),
        "application/warc"),
      Multimodal.MediaRow(3L, Array.fill[Byte](100)(7), "application/warc"),
      Multimodal.MediaRow(4L, null, "application/warc")).toDS()
    val rows = Shards.warcRecordRows(media.repartition(2)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(4), r.getLong(5)))
    // raw and gzip forms of the same shard walk identically
    val byId = rows.groupBy(_._1)
    assert(byId.keySet == Set(1L, 2L))
    assert(byId(1L).map(t => (t._2, t._3, t._4)).sortBy(_._1).toSeq ==
      byId(2L).map(t => (t._2, t._3, t._4)).sortBy(_._1).toSeq)
    assert(byId(1L).length == 2 + (4 % 3))
  }

  test("shard dataset plumbing: member fan-out and corrupt-shard drop") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, Shards.SyntheticShards.tarShard(3L), "application/x-tar"),
      Multimodal.MediaRow(2L, Array.fill[Byte](700)(42), "application/x-tar"),
      Multimodal.MediaRow(3L, null, "application/x-tar")).toDS()
    val rows = Shards.tarMemberRows(media.repartition(2))
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq(1L))
    assert(rows.length == 2 + (3 % 3))
  }

  test("tarMemberBytes: bodies match the metadata walk; truncation drops the tail member") {
    val shard = Shards.SyntheticShards.tarShard(5L)
    val withBytes = Shards.ArchiveCodec.tarMemberBytes(shard)
    val meta = Shards.ArchiveCodec.tarMembers(9L, shard)
    assert(withBytes.map(_._1) == meta.map(_.name))
    withBytes.zip(meta).foreach { case ((_, body), m) =>
      assert(body.length.toLong == m.size)
      assert(body.map(_ & 0xff).map(_.toLong).sum == m.byte_sum)
    }
    // the tail member owns header(512) + padded body(512) + terminator
    // blocks(1024); cutting 1600 bytes reaches into its body
    val cut = Shards.ArchiveCodec.tarMemberBytes(shard.dropRight(1600))
    assert(cut.length == withBytes.length - 1, "truncation must cost exactly the tail")
    assert(Shards.ArchiveCodec.tarMemberBytes("not a tar".getBytes).isEmpty)
  }

  test("wdsImageShard: real decodable PNGs; shared pk images dedup across shards") {
    import spark.implicits._
    val media = Seq(7L, 14L).map { id =>
      Multimodal.MediaRow(id,
        Shards.SyntheticShards.wdsImageShard(id % 109), "application/x-wds")
    }.toDS()
    val rows = Shards.wdsImageSampleRows(media).collect()
    // shard keys 7 and 14: n = 2 + key%3 samples each
    assert(rows.count(_.getLong(0) == 7L) == 2 + (7 % 3))
    assert(rows.count(_.getLong(0) == 14L) == 2 + (14 % 3))
    rows.foreach { r =>
      assert(r.getInt(2) >= 16 && r.getInt(3) >= 16)
      assert(r.getString(5).matches("c[0-4]"))
    }
    // identical pk formula values must produce identical hashes: shard 7
    // sample i has pk (49+13i)%97, shard 14 has (98+13i)%97 — pk 62 is
    // shared (i=1 on shard 7, i=6 impossible; verify via recompute)
    val byPk = rows.map { r =>
      val key = r.getLong(0) % 109
      val i = r.getString(1).stripPrefix("s").toInt
      ((7 * key + 13 * i) % 97, r.getLong(4))
    }
    byPk.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).distinct.length == 1, s"same pk, different phash: $g")
    }
  }
}
