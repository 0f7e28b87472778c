package graft

import org.apache.spark.sql.functions._

/** Specs for the corpus-curation family (q97–q103): invariants the SQL
  * oracle can't express (plan shapes, determinism across runs, flag
  * consistency) plus a planted-contamination check for the decontaminator.
  */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def formatted(name: String): String =
    q(name).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q97 decontamination: benchmark docs excluded, flag consistent with hits") {
    val rows = q("q97_decontaminate")
      .select("doc_id", "n_hits", "n_ngrams", "flag_contaminated").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 25 != 0, s"benchmark doc ${r.getLong(0)} in output")
      assert(r.getBoolean(3) == (r.getLong(1) > 0))
      assert(r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(2),
        s"hits outside [0, n_ngrams]: $r")
    }
    // the fixture's near-dup groups share a 200-char prefix (~30 words, so
    // provably ≥1 common word 5-gram); every training doc sharing a prefix
    // with a benchmark doc must be flagged. 2 such pairs exist at sf0.001 —
    // fail if the fixture ever stops planting them (dead check otherwise).
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), substring(col("text"), 1, 200).as("p"))
    val dupOfBench = docs.filter(col("doc_id") % 25 === 0).as("b")
      .join(docs.filter(col("doc_id") % 25 =!= 0).as("t"), $"b.p" === $"t.p")
      .select($"t.doc_id").as[Long].collect().toSet
    assert(dupOfBench.nonEmpty, "fixture lost its planted bench/train near-dups")
    val flagged = rows.filter(r => dupOfBench(r.getLong(0)))
    assert(flagged.nonEmpty && flagged.forall(_.getBoolean(3)),
      s"near-dup of benchmark doc not flagged: ${flagged.mkString(",")}")
  }

  test("q97 probes the corpus with a broadcast of the benchmark grams") {
    assert(formatted("q97_decontaminate").contains("BroadcastHashJoin"))
  }

  test("q98 domain cap: <=3 per source, longest kept, WindowGroupLimit plan") {
    val rows = q("q98_domain_cap").collect()
    val bySource = rows.groupBy(_.getString(1))
    bySource.foreach { case (src, rs) =>
      assert(rs.length <= 3, s"$src has ${rs.length} rows")
      val lens = rs.sortBy(_.getInt(3)).map(_.getLong(2))
      assert(lens.sameElements(lens.sorted(Ordering[Long].reverse)),
        s"$src not length-descending: ${lens.mkString(",")}")
    }
    // every source keeps its true max-length doc
    val trueMax = graft.sources.Tables.documents(spark, sf)
      .groupBy(col("source")).agg(max(col("n_chars")).as("m"))
      .as[(String, Long)].collect().toMap
    bySource.foreach { case (src, rs) =>
      assert(rs.map(_.getLong(2)).max == trueMax(src), s"$src lost its longest doc")
    }
    assert(formatted("q98_domain_cap").contains("WindowGroupLimit"))
  }

  test("q99 url parse: host+path+query recompose the original url") {
    q("q99_url_parse").collect().foreach { r =>
      val (url, host, path, qs) =
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4))
      assert(url == s"https://$host$path?$qs", s"decomposition drift: $r")
      assert(r.getString(5) == host.stripPrefix("www."))
    }
  }

  test("q100 pii redaction: every doc has the planted email+phone counted") {
    q("q100_pii_redact").collect().foreach { r =>
      assert(r.getLong(1) >= 1L, s"email missed: $r")
      assert(r.getLong(2) >= 1L, s"phone missed: $r")
    }
  }

  test("q101 shuffle-shard: shards in range, positions contiguous, deterministic") {
    val rows = q("q101_shuffle_shard").collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.groupBy(_.getLong(2)).foreach { case (shard, rs) =>
      assert(shard >= 0 && shard < 8)
      assert(rs.map(_.getInt(3)).sorted.sameElements(1 to rs.length),
        s"shard $shard positions not contiguous")
    }
    // reproducible training order: two independent plans agree exactly
    assert(q("q101_shuffle_shard").collect().sameElements(rows))
  }

  test("q103 outliers: n_outliers bounded by group size, m2 non-negative") {
    val rows = q("q103_zscore_outliers").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0, s"negative m2: $r")
      assert(r.getLong(4) >= 0 && r.getLong(4) < r.getLong(1),
        s"outlier count out of range: $r")
    }
  }

  test("NfcNormalize: codegen and interpreted paths agree; ASCII is identity") {
    import graft.expressions.NfcNormalize
    val cases = Seq(
      "cafe\u0301" -> "caf\u00E9", // combining acute composes
      "A\u030Angstrom" -> "\u00C5ngstrom", // combining ring composes
      "\u2126ohm" -> "\u03A9ohm", // singleton: ohm sign -> omega
      "\u00E9\u00F1" -> "\u00E9\u00F1", // already NFC: unchanged
      "plain ascii" -> "plain ascii",
      "" -> "")
    val df = cases.map(_._1).toDF("s")
      .select(col("s"), NfcNormalize(col("s")).as("n"))
    // codegen path (whole-stage): collect through the executed plan
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want,
        s"codegen: ${in.map(_.toInt)} -> ${got(in).map(_.toInt)} wanted ${want.map(_.toInt)}")
    }
    // interpreted path (eval without codegen)
    cases.foreach { case (in, want) =>
      val e = NfcNormalize(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          org.apache.spark.unsafe.types.UTF8String.fromString(in),
          org.apache.spark.sql.types.StringType))
      assert(e.eval(null).toString == want, s"interpreted: $in")
    }
    // null propagates
    val withNull = Seq[Option[String]](None).map(_.orNull).toDF("s")
      .select(NfcNormalize(col("s"))).collect()
    assert(withNull.head.isNullAt(0))
  }

  test("q179 chunk dedup: keep-one-occurrence law and lossless reassembly") {
    val rows = q("q179_chunk_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, k, _) =>
      assert(k >= 0 && k <= n, s"doc $id kept $k of $n")
    }
    // exactly one occurrence of each distinct chunk survives corpus-wide
    val docs = graft.sources.Tables.documents(spark, sf)
    val nDistinctChunks = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(explode(expr(
        "transform(sequence(0, CAST(ceil(size(ws)/10.0) AS INT) - 1)," +
          " i -> array_join(slice(ws, i*10+1, 10), ' '))")).as("chunk"))
      .select(countDistinct(col("chunk"))).as[Long].collect().head
    assert(rows.map(_._3).sum == nDistinctChunks,
      s"kept ${rows.map(_._3).sum} != distinct $nDistinctChunks")
    // a doc that lost nothing reassembles to its original text, exactly
    val texts = docs.select(col("doc_id"), md5(col("text")))
      .as[(Long, String)].collect().toMap
    val intact = rows.filter(r => r._2 == r._3)
    assert(intact.nonEmpty, "fixture has no fully-unique doc — law untestable")
    intact.foreach { case (id, _, _, h) =>
      assert(h == texts(id), s"doc $id reassembly drifted from original")
    }
    // the fixture's planted near-dup groups must actually lose chunks
    assert(rows.exists(r => r._3 < r._2), "no chunk was ever deduplicated")
  }
}
