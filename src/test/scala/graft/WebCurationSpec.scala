package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Unit coverage for the web-curation wave-3 tier (q216–q219): XML
  * parse/corrupt degradation, the hashed-linear classifier's exact
  * arithmetic, RRF fixed-point contributions, and the URL
  * canonicalization rule set on hand-built adversarial URLs (the gated
  * corpus only exercises the formula-generated shapes).
  */
class WebCurationSpec extends SparkTestBase {
  import spark.implicits._

  private def run(name: String) =
    QueryRegistry.queries(name)(spark, sf)

  test("q216: corrupt stripe is exactly doc_id % 13, parse_ok elsewhere") {
    val rows = run("q216_xml_extract").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val ok = r.getBoolean(6)
      assert(ok === (id % 13 != 0), s"doc $id parse_ok=$ok")
      if (ok) {
        assert(r.getLong(1) === id)   // attribute round-trip
        assert(!r.isNullAt(4))        // body present
      } else {
        assert(r.isNullAt(1) && r.isNullAt(4))
      }
    }
  }

  test("q216: escape∘embed∘from_xml round-trips markup-hostile body text") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("body", StringType)))
    // "]]>" is the sequence XML forbids in raw character data — xmlEscape
    // must encode '>' so the record stays well-formed (a plain HTML-style
    // &-and-< escape would silently null the row in PERMISSIVE mode)
    val nasty = "a & b < c > d &amp; e \"quoted\" 'single' cdata ]]> tail"
    val df = Seq(nasty).toDF("t")
      .select(from_xml(
        concat(lit("<doc><body>"),
          graft.functions.TextFunctions.xmlEscape(col("t")),
          lit("</body></doc>")), schema).as("p"))
      .select(col("p.body"))
    assert(df.head().getString(0) === nasty)
  }

  test("q217: classifier score is the exact md5-derived gram-weight sum") {
    // one hand-checked doc: grams = unigrams ++ bigrams, weight from md5
    val text = "alpha beta"
    def weight(g: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(("w:" + g).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2001 - 1000
    }
    val expected = Seq("alpha", "beta", "alpha beta").map(weight).sum
    val got = Seq((1L, text)).toDF("doc_id", "text")
      .select(col("doc_id"),
        concat(graft.functions.TextFunctions.tokens(col("text")),
          graft.functions.TextFunctions.wordShinglesAll(col("text"), 2)).as("grams"))
      .select(size(col("grams")).cast("long").as("n"),
        aggregate(col("grams"), lit(0L), (acc, g) =>
          acc + ((graft.functions.TextFunctions.md5Hash60(concat(lit("w:"), g)) % 2001) - 1000))
          .as("raw"))
      .head()
    assert(got.getLong(0) === 3L)
    assert(got.getLong(1) === expected)
  }

  test("q217: single-token doc has no bigrams; gate covers all docs") {
    // the size(ws) >= 2 guard: a one-token doc contributes exactly its
    // unigram, never a null or degenerate "bigram"
    val one = Seq("alpha").toDF("text")
      .select(concat(graft.functions.TextFunctions.tokens(col("text")),
        graft.functions.TextFunctions.wordShinglesAll(col("text"), 2)).as("grams"))
      .select(size(col("grams")).as("n"), col("grams"))
      .head()
    assert(one.getInt(0) === 1)
    assert(one.getSeq[String](1) === Seq("alpha"))
    val out = run("q217_quality_classifier").collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.length.toLong === docs)
    out.foreach(r => assert(r.getBoolean(3) === (r.getLong(2) > 0)))
  }

  test("q218: rrf_fp equals the sum of integer contributions of the two ranks") {
    run("q218_rrf_fusion").collect().foreach { r =>
      val fp = r.getLong(2)
      val lex = if (r.isNullAt(3)) 0L else 1000000000L / (60L + r.getLong(3))
      val sem = if (r.isNullAt(4)) 0L else 1000000000L / (60L + r.getLong(4))
      assert(fp === lex + sem)
      assert(!r.isNullAt(3) || !r.isNullAt(4)) // appears in at least one list
    }
  }

  test("q218: fused order is rrf_fp desc with doc-id tiebreak, top 20") {
    val rows = run("q218_rrf_fusion").collect()
    assert(rows.length === 20)
    rows.sliding(2).foreach { case Array(a, b) =>
      val (fa, fb) = (a.getLong(2), b.getLong(2))
      assert(fa > fb || (fa == fb && a.getLong(1) < b.getLong(1)))
    case _ => ()
    }
  }

  test("q219: canonicalization rules on hand-built adversarial URLs") {
    // exercise each rule OUTSIDE the gate's formula-generated corpus:
    // non-default port kept, http:80 dropped, host trailing dot, empty
    // path → '/', fragment-only suffix, all-utm query dropped entirely,
    // param sort, repeated '&', and a '?' INSIDE the fragment (fragment
    // text, never a query — the unanchored-regex hazard)
    val cases = Seq(
      ("HTTP://WWW.Ex.COM:80/a/?z=1&a=2#f", "http://ex.com/a?a=2&z=1"),
      ("https://ex.com:8443/p", "https://ex.com:8443/p"),
      ("https://www.ex.com.", "https://ex.com/"),
      ("https://EX.com?utm_source=x&utm_b=y", "https://ex.com/"),
      ("https://ex.com/deep/path/#frag", "https://ex.com/deep/path"),
      ("https://ex.com/p?b=2&&a=1", "https://ex.com/p?a=1&b=2"),
      ("https://ex.com/p#a?b=1", "https://ex.com/p"),
      // a literal '?' INSIDE the query is query text (RFC 3986): the
      // extraction must anchor at the FIRST '?', not the last — the
      // greedy-regex hazard silently dropped 'a=1?' here
      ("https://ex.com/p?a=1?b=2", "https://ex.com/p?a=1?b=2"),
      // userinfo never becomes part of the dedup key (same page with
      // and without credentials must collide)
      ("https://user:pw@ex.com/p", "https://ex.com/p"),
      ("https://USER@WWW.Ex.com/p", "https://ex.com/p"),
      // bracketed IPv6: the host token keeps its brackets, the colons
      // inside are not a port separator, default-port drop still applies
      ("https://[2001:DB8::1]:443/p", "https://[2001:db8::1]/p"),
      ("http://[::1]:8080/x", "http://[::1]:8080/x"))
    val got = cases.map(_._1).toDF("url")
      .select(graft.functions.TextFunctions.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    got.zip(cases.map(_._2)).foreach { case (g, e) => assert(g === e) }
  }

  test("q217: native GramScore kernel == the builtin aggregate-HOF fold, gram for gram") {
    // the r9 kernel replaced the higher-order md5 fold (NOTES_r9 #12);
    // this pins them equal on the shapes that could drift: empty text
    // (one empty token), single token (no bigrams), trailing space
    // (kept empty token — Java negative-limit split), multi-space runs,
    // unicode, and ordinary sentences
    import graft.functions.{TextFunctions => TF}
    val texts = Seq("", "one", "two words", "trailing space ", "a  b",
      "common crawl text with several tokens here", "café naïve 漢字")
    val toks = TF.tokens(col("t"))
    val grams = concat(toks, TF.wordShinglesAll(col("t"), 2))
    val builtin = aggregate(grams, lit(0L),
      (acc, g) => acc + (TF.md5Hash60(concat(lit("w:"), g)) % 2001) - 1000)
    val rows = texts.toDF("t")
      .select(col("t"), builtin.as("b"),
        graft.expressions.GramScore(col("t")).as("k"),
        size(grams).cast("long").as("ng"),
        (size(toks).cast("long") +
          greatest(size(toks).cast("long") - 1, lit(0L))).as("nk"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"score drift on '${r.getString(0)}'")
      assert(r.getLong(3) == r.getLong(4), s"gram-count drift on '${r.getString(0)}'")
    }
  }

  test("q263: RFC 5952 IPv6 canonical form — every rule on hand-built literals") {
    import graft.expressions.Ipv6Normalize
    val cases = Seq(
      // the RFC's own motivating example family
      ("0:0:0:0:0:0:0:1", "::1"),
      ("2001:0db8:0:0:1:0:0:1", "2001:db8::1:0:0:1"), // tie: FIRST run wins (§4.2.3)
      ("1:0:2:3:4:5:6:7", "1:0:2:3:4:5:6:7"),         // single zero NOT compressed (§4.2.2)
      ("0:0:0:0:0:0:0:0", "::"),
      ("1:0:0:2:0:0:0:3", "1:0:0:2::3"),              // longest run, not first
      ("2001:db8::0:1", "2001:db8::1"),               // re-compression of a sloppy ::
      ("1:2:3:4:5:6:7::", "1:2:3:4:5:6:7:0"),         // :: of ONE group expands, not kept
      ("::FFFF:0:0", "::ffff:0:0"),                   // tail run of 2 already leading-compressed
      ("[0000:0000:0000:0000:0000:0000:0000:0001]", "[::1]"),
      // honest boundary: not-understood literals pass through unchanged
      ("fe80::1%eth0", "fe80::1%eth0"),
      ("::ffff:192.168.0.1", "::ffff:192.168.0.1"),
      ("1:2:3", "1:2:3"),
      ("1:2:3:4:5:6:7:8:9", "1:2:3:4:5:6:7:8:9"),
      ("g::1", "g::1"),
      ("1::2::3", "1::2::3"))
    val got = cases.map(_._1).toDF("s")
      .select(Ipv6Normalize(col("s")).as("c")).collect().map(_.getString(0))
    got.zip(cases).foreach { case (g, (in, e)) => assert(g === e, s"input $in") }
    // composed through the URL key: expansion variants of one host collide
    val urls = Seq(
      "https://[0:0:0:0:0:0:0:1]/p",
      "https://[::0:0:1]:443/p",
      "HTTPS://[0000:0000:0000:0000:0000:0000:0000:0001]/p")
    val keys = urls.toDF("url")
      .select(graft.functions.TextFunctions.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).distinct
    assert(keys.toSeq == Seq("https://[::1]/p"))
  }

  test("q219: election groups by canonical key with min-id survivor") {
    val rows = run("q219_url_canonicalize").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
    assert(total === docs.length.toLong) // every doc in exactly one group
    // independent election ground truth: the canonical key is a pure
    // function of (source, doc_id % 50) by the gate's construction, so
    // the expected survivor/count per group is computable WITHOUT running
    // canonicalizeUrl — a max-id (or any non-min) election would fail here
    val expected = docs.map(r => (r.getString(1), r.getLong(0) % 50) -> r.getLong(0))
      .groupBy(_._1).map { case (k, vs) =>
        k -> (vs.length.toLong, vs.map(_._2).min)
      }
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val url = r.getString(0)
      val src = url.stripPrefix("https://").takeWhile(_ != '.')
      val k = url.substring(url.indexOf("/Articles/") + 10).takeWhile(_ != '?').toLong
      val (n, minId) = expected((src, k))
      assert(r.getLong(1) === n, s"group $url count")
      assert(r.getLong(2) === minId, s"group $url survivor")
    }
  }
}
