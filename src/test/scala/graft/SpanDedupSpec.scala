package graft

import org.apache.spark.sql.functions._

import graft.queries.SpanDedupQueries

/** Semantics of the exact-span dedup tier (q175/q176) that the oracle
  * equality can't spell out: exact positions/extents on planted corpora,
  * diagonal-merge maximality, the hot-gram cap's telemetry contract, and
  * sweep-line coverage under overlapping cut spans.
  */
class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def words(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i").mkString(" ")

  private def spans(docs: org.apache.spark.sql.DataFrame, maxBucket: Int = 1000) =
    SpanDedupQueries.exactSpans(docs, t = 8, maxBucket = maxBucket)
      .orderBy(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))

  test("planted mid-document span recovered with exact positions and length") {
    // doc 1: 10 filler + 12-word span; doc 2: 5 filler + same span + 5 filler.
    // 12 shared tokens = 5 consecutive 8-grams on one diagonal → ONE maximal
    // span, pos_a=11, pos_b=6, span_words=12.
    val span = words("s", 12)
    val docs = Seq(
      (1L, words("u", 10) + " " + span),
      (2L, words("v", 5) + " " + span + " " + words("w", 5))).toDF("doc_id", "text")
    assert(spans(docs).toSeq == Seq((1L, 2L, 11, 6, 12)))
  }

  test("minimum span (exactly t tokens) is one gram and survives; t-1 does not") {
    val eight = words("s", 8)
    val docsHit = Seq(
      (1L, words("u", 4) + " " + eight),
      (2L, eight + " " + words("v", 4))).toDF("doc_id", "text")
    assert(spans(docsHit).toSeq == Seq((1L, 2L, 5, 1, 8)))
    val seven = words("s", 7)
    val docsMiss = Seq(
      (1L, words("u", 5) + " " + seven),
      (2L, seven + " " + words("v", 5))).toDF("doc_id", "text")
    assert(spans(docsMiss).isEmpty)
  }

  test("two disjoint shared spans on different diagonals stay two maximal spans") {
    val s1 = words("a", 9)
    val s2 = words("b", 10)
    val docs = Seq(
      (1L, s1 + " " + words("u", 6) + " " + s2),
      (2L, s2 + " " + words("v", 3) + " " + s1)).toDF("doc_id", "text")
    // doc1: s1 @1(9w), s2 @16(10w); doc2: s2 @1, s1 @14
    assert(spans(docs).toSeq == Seq((1L, 2L, 1, 14, 9), (1L, 2L, 16, 1, 10)))
  }

  test("repeated occurrence in the later doc yields one span per alignment") {
    val s1 = words("a", 8)
    val docs = Seq(
      (1L, words("u", 2) + " " + s1),
      (2L, s1 + " " + words("v", 4) + " " + s1)).toDF("doc_id", "text")
    assert(spans(docs).toSeq == Seq((1L, 2L, 3, 1, 8), (1L, 2L, 3, 13, 8)))
  }

  test("hot-gram cap drops boilerplate, keeps planted span, reports drops") {
    val span = words("p", 8)
    val boiler = words("b", 20)
    val docs = (Seq((1L, words("u", 10) + " " + span),
      (2L, words("v", 10) + " " + span)) ++
      (10L to 21L).map(i => (i, boiler))).toDF("doc_id", "text")
    val capped = SpanDedupQueries.exactSpans(docs, t = 8, maxBucket = 8)
    val got = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)), s"capped run returned $got")
    val m = capped.queryExecution.observedMetrics("spans_cap")
    val dropped = m.getAs[Long]("dropped_gram_rows")
    // 12 boilerplate docs × 13 positional 8-grams each, all in buckets of 12
    assert(dropped == 12L * 13, s"dropped_gram_rows $dropped")
    assert(m.getAs[Long]("max_bucket_size") == 12L)
    // uncapped control: planted pair + C(12,2) boilerplate pairs
    val uncapped = SpanDedupQueries.exactSpans(docs, t = 8, maxBucket = 100)
      .select(col("id_a"), col("id_b")).distinct().count()
    assert(uncapped == 66 + 1, s"uncapped pair count $uncapped")
  }

  test("q176 merges overlapping cut intervals (no double count)") {
    // doc 3 shares overlapping spans with TWO earlier docs: tokens 1..10
    // with doc 1 and tokens 5..16 with doc 2 → union coverage 16, not 22.
    val w16 = (1 to 16).map(i => s"c$i")
    val docs = Seq(
      (1L, w16.take(10).mkString(" ") + " " + words("u", 4)),
      (2L, words("v", 4) + " " + w16.drop(4).mkString(" ")),
      (3L, w16.mkString(" ") + " " + words("z", 4))).toDF("doc_id", "text")
    val rows = SpanDedupQueries.spanCut(docs)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    // doc 3 (20 tokens): covered 1..16 → cut 16, after 4
    assert(rows(3L) == ((20, 16, 4)), s"doc 3 coverage ${rows.get(3L)}")
  }

  test("fixture run: spans land only on planted near-dup pairs, q176 is consistent") {
    val got175 = SparkEntry.queries("q175_exact_spans")(spark, sf).collect()
    assert(got175.nonEmpty)
    got175.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(4) >= 8)
      assert(r.getInt(2) >= 1 && r.getInt(3) >= 1)
    }
    val got176 = SparkEntry.queries("q176_span_cut")(spark, sf).collect()
    assert(got176.nonEmpty)
    got176.foreach { r =>
      assert(r.getInt(2) >= 8 && r.getInt(3) >= 0)
      assert(r.getInt(1) == r.getInt(2) + r.getInt(3))
    }
    // every cut doc is the LATER side of at least one span pair — within
    // q176's doc_id % 3 = 0 gate subset (q175 stays full-corpus, so its
    // b-sides are a superset; recompute spans on the same subset)
    val cutDocs = got176.map(_.getLong(0)).toSet
    val subsetSpans = SpanDedupQueries.exactSpans(
      graft.sources.Tables.documents(spark, sf)
        .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 0), t = 8).collect()
    val bSides = subsetSpans.map(_.getLong(1)).toSet
    assert(cutDocs == bSides)
    assert(bSides.subsetOf(got175.map(_.getLong(1)).toSet))
  }
}
