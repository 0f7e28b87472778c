package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin
import graft.functions.{MinHash, SimHash, Similarity, TextFunctions => TF}

class OpsSpec extends SparkTestBase {

  test("as-of join: backward match, tie-break, and no-match null") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 250L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 90L, 10.0, 1L), (1L, 100L, 20.0, 2L), (1L, 100L, 30.0, 3L),
        (1L, 240L, 40.0, 4L), (2L, 60L, 50.0, 5L))
      .toDF("k", "t", "v", "rid")
    val out = AsOfJoin.backward(left, right, "k", "k", "t", "t", Seq("v"), "rid")
      .orderBy(col("tag"))
      .select(col("tag"), col("asof_v"))
      .collect()
    // p1@100: right has 90,100,100 → inclusive, max rid at t=100 wins → 30.0
    assert(out(0).getDouble(1) == 30.0)
    // p2@250: latest ≤250 is 240 → 40.0
    assert(out(1).getDouble(1) == 40.0)
    // p3@50 on key 2: only right event is at 60 > 50 → null
    assert(out(2).isNullAt(1))
  }

  test("bucketed as-of == plain as-of across bucket widths, incl. ties and cross-bucket carry") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 250L, "p2"), (2L, 50L, "p3"),
        (1L, 9000L, "p4"), (3L, 400L, "p5"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 90L, 10.0, 1L), (1L, 100L, 20.0, 2L), (1L, 100L, 30.0, 3L),
        (1L, 240L, 40.0, 4L), (2L, 60L, 50.0, 5L))
      .toDF("k", "t", "v", "rid")
    val expected = AsOfJoin.backward(left, right, "k", "k", "t", "t", Seq("v"), "rid")
      .orderBy(col("tag")).select(col("tag"), col("asof_v"), col("asof_time"))
      .collect().toSeq
    // widths chosen to hit every regime: 7s (many empty buckets between a
    // match and its left row — p4@9000 carries from bucket of t=240 across
    // ~1250 empty buckets), 100s (equal-time ties split exactly at a
    // boundary: t=100 rows share bucket 1), and 1M s (one bucket — the
    // degenerate case must equal plain exactly)
    for (width <- Seq(7L, 100L, 1000000L)) {
      val got = AsOfJoin.backwardBucketed(
          left, right, "k", "k", "t", "t", Seq("v"), "rid", width)
        .orderBy(col("tag")).select(col("tag"), col("asof_v"), col("asof_time"))
        .collect().toSeq
      assert(got == expected, s"bucketSeconds=$width")
    }
    // the fixture events shape too: purchases×clicks at sf0.001, 1-day
    // buckets — the q174 configuration — vs the q17 plain form
    val ev = graft.sources.Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
    val plain = AsOfJoin.backward(purchases, clicks,
        "user_id", "user_id", "ts", "ts", Seq("value"), "event_id")
      .orderBy(col("event_id")).collect().toSeq
    val bucketed = AsOfJoin.backwardBucketed(purchases, clicks,
        "user_id", "user_id", "ts", "ts", Seq("value"), "event_id", 86400L)
      .orderBy(col("event_id")).collect().toSeq
    assert(bucketed == plain)
  }

  test("bucketed as-of carry: a null tiebreak beats a genuine Long.MaxValue tie") {
    import spark.implicits._
    // Two right rows at the SAME time in one bucket, tiebreaks
    // Long.MaxValue and null; the left row sits in a LATER bucket so the
    // match flows through the carry summary. backward's window order
    // (asc_nulls_last, last wins) picks the null row; the summary's
    // max_by must agree — coalesce(tie, MaxValue) alone makes the two
    // keys compare EQUAL and the pick nondeterministic (review finding).
    val left = Seq((1L, 5000L, "p1")).toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 1.0, Some(Long.MaxValue)), (1L, 100L, 2.0, None))
      .toDF("k", "t", "v", "rid")
    val plain = AsOfJoin.backward(left, right, "k", "k", "t", "t", Seq("v"), "rid")
      .select(col("asof_v")).head.getDouble(0)
    assert(plain == 2.0) // nulls-last last-wins: the null-tie row
    for (width <- Seq(7L, 1000L)) {
      val got = AsOfJoin.backwardBucketed(
          left, right, "k", "k", "t", "t", Seq("v"), "rid", width)
        .select(col("asof_v")).head.getDouble(0)
      assert(got == plain, s"bucketSeconds=$width")
    }
  }

  test("as-of forward: earliest right at-or-after left time, min-tiebreak") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 250L, "p2"), (2L, 70L, "p3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 20.0, 2L), (1L, 100L, 30.0, 3L), (1L, 240L, 40.0, 4L),
        (2L, 60L, 50.0, 5L))
      .toDF("k", "t", "v", "rid")
    val out = AsOfJoin.forward(left, right, "k", "k", "t", "t", Seq("v"), "rid")
      .orderBy(col("tag")).select(col("tag"), col("asof_v")).collect()
    // p1@100: rights at 100 (rid 2,3) qualify; min rid wins → 20.0
    assert(out(0).getDouble(1) == 20.0)
    // p2@250: no right at/after 250 → null
    assert(out(1).isNullAt(1))
    // p3@70 key 2: right at 60 is before → null
    assert(out(2).isNullAt(1))
  }

  test("as-of backward with tolerance nulls out stale matches") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 500L, "p2")).toDF("k", "t", "tag")
    val right = Seq((1L, 90L, 10.0, 1L)).toDF("k", "t", "v", "rid")
    val out = AsOfJoin.backwardWithTolerance(left, right, "k", "k", "t", "t",
        Seq("v"), "rid", toleranceSeconds = 60)
      .orderBy(col("tag")).select(col("tag"), col("asof_v")).collect()
    assert(out(0).getDouble(1) == 10.0) // 10s stale, within 60
    assert(out(1).isNullAt(1)) // 410s stale → nulled
  }

  test("as-of: null-time right rows never match (window impl == custom exec)") {
    import spark.implicits._
    val left = Seq((1L, 250L, "p1")).toDF("k", "t", "tag")
    val right = Seq((1L, Some(90L), 10.0, 1L), (1L, None, 99.0, 2L))
      .toDF("k", "t", "v", "rid")
    val viaWindow = AsOfJoin.backward(left, right, "k", "k", "t", "t", Seq("v"), "rid")
      .select(col("asof_v")).collect()
    assert(viaWindow.head.getDouble(0) == 10.0) // the null-time 99.0 row is ignored
    val viaCustom = graft.plans.AsOfJoinCustom.backward(
        left, right, "k", "k", "t", "t", Seq("v"), "rid")
      .select(col("asof_v")).collect()
    assert(viaCustom.head.getDouble(0) == 10.0)
  }

  test("as-of forward survives a right time column literally named 'time'") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1")).toDF("k", "time", "tag")
    val right = Seq((1L, 150L, 7.0, 1L)).toDF("k", "time", "v", "rid")
    val out = AsOfJoin.forward(left, right, "k", "k", "time", "time", Seq("v"), "rid")
    assert(out.columns.count(_ == "asof_time") == 1, out.columns.toSeq)
    val r = out.select(col("asof_v"), col("asof_time").cast("double")).collect().head
    assert(r.getDouble(0) == 7.0)
    assert(r.getDouble(1) == 150.0)
  }

  test("minhash LSH finds planted near-duplicates and skips distinct docs") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 59) "CHANGED" else s"w$i").mkString(" ")
    val other = (1 to 60).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = MinHash.nearDuplicatePairs(docs, "doc_id", "text", 3, 0.5).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    // 58 shingles each; the changed word hits shingles 57,58 → 56 shared,
    // union 60 → j = 56/60
    assert(math.abs(pairs.head.getDouble(2) - 56.0 / 60.0) < 1e-12)
  }

  test("simhash: identical docs agree, near-dups close, disjoint docs far") {
    import spark.implicits._
    val a = (1 to 50).map(i => s"w$i").mkString(" ")
    val b = (1 to 50).map(i => if (i % 10 == 0) s"y$i" else s"w$i").mkString(" ")
    val c = (1 to 50).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, a), (2L, a), (3L, b), (4L, c)).toDF("id", "text")
      .select(col("id"), SimHash.simhash(TF.tokens(col("text"))).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(sigs(1L), sigs(2L)) == 0)
    assert(ham(sigs(1L), sigs(3L)) < ham(sigs(1L), sigs(4L)))
  }

  test("banded hamming join == brute force at the threshold boundary") {
    import spark.implicits._
    // hand-built signatures: pairs at hamming 0, exactly 3 (kept — the
    // boundary), and 4 (dropped); the banding must find every kept pair
    // (pigeonhole over 4×15-bit bands) and the exact filter must cut at 3
    val base = 0x0FFF_FFF0_1234_5678L & ((1L << 60) - 1)
    val sigs = Seq(
      1L -> base,
      2L -> base, // ham 0 vs 1
      3L -> (base ^ 0x7L), // ham 3 vs 1/2 (bits 0-2, same band)
      4L -> (base ^ ((1L << 1) | (1L << 16) | (1L << 31) | (1L << 46))), // ham 4, one bit per band
      5L -> (base ^ ((1L << 0) | (1L << 17) | (1L << 33))) // ham 3 spread over 3 bands
    ).toDF("doc_id", "simhash")
    val got = SimHash.bandedNearDupPairs(sigs, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val rows = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val all = for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && ham(sa, sb) <= 3
    } yield (ia, ib, ham(sa, sb))
    assert(got == all.toSet, s"got $got want ${all.toSet}")
    assert(got.exists(_._3 == 3), "a boundary pair (hamming exactly 3) must survive")
    assert(!got.exists(p => p._3 > 3), "no pair beyond the threshold")
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L),
      "doc 4 (hamming 4 from every neighbor) must not pair at threshold 3")
  }

  test("simhash band cap fires on a degenerate corpus and reports the drop") {
    import spark.implicits._
    // 12 identical signatures put 12 rows in each of their 4 band buckets;
    // maxBucket=8 drops those buckets WHOLE, so the capped join loses all
    // 66 dup pairs — the loss must be REPORTED via observe(), never
    // silent. The gated q196 passes maxBucket=Int.MaxValue precisely so
    // this trade can never silently break its exact all-pairs oracle
    // (ADVICE r6); this test keeps the cap path itself covered.
    val allOnes = (1L << 60) - 1 // every band = 0x7FFF, disjoint from the small sigs
    val sigs = ((1L to 12L).map(i => (i, allOnes)) ++ Seq((20L, 0x7L), (21L, 0x4L)))
      .toDF("doc_id", "simhash")
    val capped = SimHash.bandedNearDupPairs(sigs, "doc_id", maxHamming = 3, maxBucket = 8)
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((20L, 21L)),
      "only the under-cap pair survives; hot buckets drop whole")
    val m = capped.queryExecution.observedMetrics("simhash_band_buckets")
    assert(m.getAs[Long]("dropped_band_rows") == 48L, s"12 docs x 4 bands, got $m")
    assert(m.getAs[Long]("max_bucket_size") == 12L)
    assert(m.getAs[Long]("total_band_rows") == 14L * 4)
    val unbounded = SimHash.bandedNearDupPairs(sigs, "doc_id", maxHamming = 3,
      maxBucket = Int.MaxValue)
    assert(unbounded.count() == 66L + 1L, "unbounded cap loses nothing")
  }

  test("cosine expression matches scala double computation and self-sim is 1") {
    import spark.implicits._
    val v1 = Array(1.0f, 2.0f, 3.0f)
    val v2 = Array(-1.0f, 0.5f, 2.0f)
    val df = Seq((v1, v2)).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("s"),
        Similarity.cosine(col("a"), col("a")).as("self"))
    val row = df.collect().head
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- x.indices) { d += x(i).toDouble * y(i); na += x(i).toDouble * x(i); nb += y(i).toDouble * y(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    assert(row.getDouble(0) == cos(v1, v2))
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-15)
  }

  test("cosine: zero vectors and null elements yield null, never NaN") {
    import spark.implicits._
    val zero = Array(0.0f, 0.0f)
    val unit = Array(1.0f, 0.0f)
    val withNull = Seq(Seq[java.lang.Float](1.0f, null)).toDF("a")
      .select(col("a").cast("array<float>").as("a"))
    val df = Seq((zero, unit)).toDF("z", "u")
      .select(Similarity.cosine(col("z"), col("u")).as("zu"),
        Similarity.cosine(col("z"), col("z")).as("zz"))
    val r = df.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1)) // NaN would hijack every ORDER BY sim DESC
    val rn = withNull.select(Similarity.cosine(col("a"), col("a"))).collect().head
    assert(rn.isNullAt(0))
    // and a zero vector in a corpus never becomes anyone's top neighbor
    val corpus = Seq((0L, zero), (1L, unit), (2L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(corpus, corpus.filter(col("vec_id") === 1), "vec_id", "embedding", 1)
      .collect().head
    assert(top.getLong(2) == 2L)
  }

  test("cosine expression rejects non-float-array inputs at analysis time") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(1.0f))).toDF("d", "f")
    intercept[Exception] {
      df.select(Similarity.cosine(col("d"), col("f"))).collect()
    }
  }

  test("LSH ANN recall vs exact top-k on sf0.001 embeddings") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def run(tables: Int, radius: Int) =
      Similarity.lshTopK(emb, queries, "vec_id", "embedding", 64, 5,
          planes = 4, tables = tables, probeRadius = radius)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(s: Set[(Long, Long)]) = (exact & s).size.toDouble / exact.size
    val single = recall(run(tables = 1, radius = 0))
    val amplifiedSet = run(tables = 8, radius = 1)
    val amplified = recall(amplifiedSet)
    // band-OR + multiprobe must never lose candidates vs single-bucket LSH,
    // and the q40 configuration must keep recall high on the fixture
    assert(amplified >= single, s"amplified $amplified < single $single")
    assert(amplified >= 0.9, s"amplified recall $amplified")
    // every approx neighbor's sim must equal the exact cosine (no sim drift)
    assert(amplifiedSet.subsetOf(
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", Int.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet))
  }

  test("int8-quantized cosine ranking stays close to exact top-k") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    // cosine is invariant under per-vector positive scaling, so quantized
    // cosine = cosine of the integer qvecs — the scales cancel entirely
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .select(col("vec_id"), col("qvec").cast("array<float>").as("embedding"))
    val exact = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.bruteForceTopK(q, q.filter(col("vec_id") < 5),
        "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 recall $recall")
    // the error contract that q82 gates: |x - q*scale| <= scale/2
    val bad = graft.queries.ScaleQueries.all.find(_.name == "q82_quantize_int8").get
      .fn(spark, sf).filter(!col("err_ok") || col("n_clipped") > 0).count()
    assert(bad == 0)
  }

  test("minhash LSH hot-bucket cap drops boilerplate pairs, keeps real near-dups") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 59) "CHANGED" else s"w$i").mkString(" ")
    val boiler = (1 to 60).map(i => s"b$i").mkString(" ")
    // 12 byte-identical boilerplate docs: every band bucket they hash into
    // has 12 members, i.e. C(12,2)=66 candidate pairs from one hot key
    val docs = (Seq((1L, base), (2L, nearDup)) ++ (10L to 21L).map(i => (i, boiler)))
      .toDF("doc_id", "text")
    val capped = MinHash.nearDuplicatePairs(docs, "doc_id", "text", 3, 0.5, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)), s"capped run returned $capped")
    val uncapped = MinHash.nearDuplicatePairs(docs, "doc_id", "text", 3, 0.5, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size == 66 + 1, s"uncapped run returned ${uncapped.size} pairs")
  }

  test("minhash cap reports its own precision loss via observe()") {
    import spark.implicits._
    // same planted-boilerplate shape as above: 12 identical docs make every
    // one of their 16 band buckets size-12 (> maxBucket=8), so the capped
    // side drops exactly 12 docs x 16 bands = 192 band rows — the operator
    // must REPORT that, not just silently drop (at 100 TB the metric is the
    // only way to see the cap's recall cost without a second full scan)
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 59) "CHANGED" else s"w$i").mkString(" ")
    val boiler = (1 to 60).map(i => s"b$i").mkString(" ")
    val docs = (Seq((1L, base), (2L, nearDup)) ++ (10L to 21L).map(i => (i, boiler)))
      .toDF("doc_id", "text")
    val pairs = MinHash.nearDuplicatePairs(docs, "doc_id", "text", 3, 0.5, maxBucket = 8)
    pairs.collect()
    val metrics = pairs.queryExecution.observedMetrics("minhash_cap")
    assert(metrics.getAs[Long]("dropped_band_rows") == 192L,
      s"expected 12 docs x 16 bands dropped, got $metrics")
    assert(metrics.getAs[Long]("max_bucket_size") == 12L)
    // 14 docs x 16 bands total band rows observed on the same pass
    assert(metrics.getAs[Long]("band_rows") == 14L * 16)
  }

  test("approx quantiles land within rank-error bounds of exact percentiles") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val approx = li.select(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))).collect().head.getDouble(0)
    val exactBounds = li.select(
      expr("percentile(l_extendedprice, 0.45)"),
      expr("percentile(l_extendedprice, 0.55)")).collect().head
    assert(approx >= exactBounds.getDouble(0) && approx <= exactBounds.getDouble(1),
      s"p50 approx $approx outside [${exactBounds.getDouble(0)}, ${exactBounds.getDouble(1)}]")
  }

  test("approx_count_distinct within configured error of exact") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct(col("l_orderkey"))).collect().head.getLong(0)
    val approx = li.select(approx_count_distinct(col("l_orderkey"), 0.02)).collect().head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }
}
