package graft

import org.apache.spark.sql.functions._

/** Invariants for the graph/temporal family (q118–q123) that the oracle
  * equality doesn't spell out.
  */
class GraphTemporalSpec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q118 triangles: participation mass is 3x the triangle count") {
    val rows = q("q118_triangle_count").collect()
    assert(rows.nonEmpty)
    val mass = rows.map(_.getLong(1)).sum
    assert(mass % 3 == 0, s"participation mass $mass not divisible by 3")
    rows.foreach(r => assert(r.getLong(1) >= 1))
  }

  test("q119 scd2: exactly one current version per key, closed rows precede it") {
    val rows = q("q119_scd2_merge").collect()
    val byKey = rows.groupBy(_.getLong(0))
    byKey.foreach { case (k, vs) =>
      assert(vs.count(_.getBoolean(4)) == 1, s"custkey $k: != 1 current row")
      vs.filter(!_.getBoolean(4)).foreach { r =>
        assert(!r.isNullAt(3), s"custkey $k: closed row missing valid_to")
      }
      vs.filter(_.getBoolean(4)).foreach { r =>
        assert(r.isNullAt(3), s"custkey $k: current row has valid_to")
      }
      assert(vs.length <= 2)
    }
    // the merge emits dim + one extra row per updated key
    val nCust = graft.sources.Tables.customer(spark, sf).count()
    assert(rows.length >= nCust && byKey.size == nCust)
  }

  test("q120 concurrency: matches the naive one-partition global window") {
    // the distributed prefix sum must equal the shape it exists to replace
    val points = graft.sources.Tables.events(spark, sf)
      .select((graft.queries.epochSec(col("ts")) * 2 + 1).as("k"), lit(1L).as("delta"))
      .union(graft.sources.Tables.events(spark, sf)
        .select((graft.queries.epochSec(col("ts")) * 2 + 1200).as("k"), lit(-1L).as("delta")))
      .groupBy(col("k")).agg(sum(col("delta")).as("delta"))
    val naive = points
      .withColumn("concurrency", sum(col("delta")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("k").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(expr("k div 2").as("t_sec"), col("concurrency"))
      .orderBy(col("concurrency").desc, col("t_sec").asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = q("q120_max_concurrency")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == naive, s"prefix-sum concurrency != naive window:\n$got\n$naive")
    assert(got.head._2 >= 1)
  }

  test("q121 kn counts: type counts bounded by token counts, all positive") {
    q("q121_kn_continuation").collect().foreach { r =>
      assert(r.getLong(1) >= 1, s"gate emits only words with left contexts: $r")
      assert(r.getLong(1) <= r.getLong(3),
        s"distinct left contexts exceed bigram occurrences: $r")
    }
  }

  test("q122 collocations: floor respected, scores positive and sorted") {
    val rows = q("q122_collocations").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 5, s"hapax floor violated: $r")
      assert(r.getLong(3) > 0, s"non-positive pmi rank: $r")
    }
    val scores = rows.map(_.getLong(3)).toSeq
    assert(scores == scores.sorted.reverse, "not ordered by score")
  }

  test("q124 cohort retention: day-0 row per cohort dominates, users conserved") {
    val rows = q("q124_cohort_retention").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (c, rs) =>
      val day0 = rs.find(_._2 == 0)
      assert(day0.isDefined, s"cohort $c missing its days_since=0 row")
      // day-0 contains every cohort member; later periods can only shrink
      // or equal (a user active later was active on its first day too)
      rs.foreach { r => assert(r._3 <= day0.get._3, s"cohort $c: $r exceeds day-0") }
    }
    // total day-0 mass = number of distinct users in the fixture
    val nUsers = graft.sources.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(byCohort.values.map(_.find(_._2 == 0).get._3).sum == nUsers)
  }

  test("q125 winnowing: guarantees shared >=8-word runs are detected") {
    val rows = q("q125_winnow_overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (a, b, n) => assert(a < b && n >= 1) }
    // ground truth: the fixture's planted near-dup pairs share long
    // prefixes — every doc pair sharing an identical 8-word prefix MUST
    // appear (the winnowing guarantee: any shared k+w-1 = 8-word span
    // yields at least one shared fingerprint, and the query applies NO
    // n_shared floor that could drop a single-span pair)
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val byPrefix = docs.groupBy(_._2.split(" ").take(16).mkString(" "))
      .filter { case (p, ds) => p.split(" ").length >= 16 && ds.length >= 2 }
    val got = rows.map(r => (r._1, r._2)).toSet
    byPrefix.values.foreach { ds =>
      val ids = ds.map(_._1).sorted
      for (i <- ids.indices; j <- i + 1 until ids.length)
        assert(got.contains((ids(i), ids(j))),
          s"16-word-identical-prefix pair (${ids(i)},${ids(j)}) not detected")
    }
  }

  test("q126 prefix filtering: equals naive all-pairs (completeness), all pairs >= 0.6") {
    import graft.functions.{TextFunctions => TF}
    val sh = graft.sources.Tables.documents(spark, sf)
      .filter(size(TF.tokens(col("text"))) >= 3)
      .select(col("doc_id"), TF.wordShingleHashes(col("text"), 3).as("ts"))
    val naive = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        size(array_intersect(col("a.ts"), col("b.ts"))).as("i"),
        size(array_union(col("a.ts"), col("b.ts"))).as("u"))
      .filter(col("i") * 10 >= col("u") * 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = q("q126_prefix_simjoin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got.foreach { case (_, _, j) => assert(j >= 0.6 - 1e-12) }
    assert(got.map(t => (t._1, t._2)).toSet == naive,
      "prefix filtering missed or invented pairs vs the naive all-pairs join")
  }

  test("q127 binning: equals the raw theta join; naive plans a nested loop, binned does not") {
    val ev = graft.sources.Tables.events(spark, sf)
      .filter(col("user_id") < 5)
      .select(col("user_id"), col("event_id"),
        graft.queries.epochSec(col("ts")).as("s0"),
        (graft.queries.epochSec(col("ts")) + 600).as("s1"))
    val naive = ev.as("a").join(ev.as("b"),
        col("a.user_id") < col("b.user_id") &&
          col("a.s0") < col("b.s1") && col("b.s0") < col("a.s1"))
      .groupBy(col("a.user_id").as("user_a"), col("b.user_id").as("user_b"))
      .agg(count(lit(1)).as("n"))
    // the naive spelling is exactly the O(n^2) plan the binned form avoids
    assert(naive.queryExecution.executedPlan.toString.contains("BroadcastNestedLoop"),
      "fixture naive theta join no longer plans BNLJ — update the demo")
    val want = naive.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = q("q127_interval_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"binned interval join != theta join:\n$got\n$want")
  }

  test("q128 snapshot diff: change classes partition both snapshots") {
    val rows = q("q128_snapshot_diff").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows.keySet == Set("added", "removed", "changed", "unchanged"))
    val nA = graft.sources.Tables.orders(spark, sf).count()
    // A splits into removed + changed + unchanged; added is B-only
    assert(rows("removed") + rows("changed") + rows("unchanged") == nA)
    assert(rows("added") >= 1 && rows("changed") >= 1 && rows("removed") >= 1)
  }

  test("q129 survivorship: one row per key, highest-precedence source wins") {
    val rows = q("q129_survivorship").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val keys = rows.map(_._1)
    assert(keys.distinct.length == keys.length, "duplicate keys survived")
    rows.foreach { case (k, name, src) =>
      val want = if (k % 3 == 0) "import" else if (k % 2 == 0) "web" else "crm"
      assert(src == want, s"key $k resolved to $src, want $want")
      if (src == "import") assert(name.endsWith("#imp"))
      if (src == "web") assert(name.endsWith("#web"))
    }
  }

  test("q130 transitions: outgoing mass = non-final occurrences per type") {
    val trans = q("q130_transitions").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val outMass = trans.groupBy(_._1).map { case (t, rs) => t -> rs.map(_._3).sum }
    // per-user streams each have one final event with no successor
    val ev = graft.sources.Tables.events(spark, sf)
    val occurrences = ev.groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val lastPerUser = ev.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    occurrences.foreach { case (t, n) =>
      assert(outMass.getOrElse(t, 0L) == n - lastPerUser.getOrElse(t, 0L),
        s"transition mass for $t does not conserve")
    }
  }

  test("q123 mad: outliers bounded, mad nonnegative, recomputed flags agree") {
    val rows = q("q123_mad_outliers").collect()
    assert(rows.length >= 1)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0)
      assert(r.getLong(4) <= r.getLong(3))
    }
  }

  test("q125 winnow hot-fingerprint cap drops boilerplate pairs, keeps planted span, reports drops") {
    import spark.implicits._
    // Planted pair: docs 1 and 2 share one 8-word run (k+w-1 = 8, the
    // minimum the winnowing guarantee covers) inside otherwise-disjoint
    // filler. Boilerplate: 12 byte-identical docs — every fingerprint
    // bucket they produce has 12 members, C(12,2)=66 pairs per bucket.
    val span = (1 to 8).map(i => s"p$i").mkString(" ")
    val docA = (1 to 10).map(i => s"u$i").mkString(" ") + " " + span
    val docB = (1 to 10).map(i => s"v$i").mkString(" ") + " " + span
    val boiler = (1 to 20).map(i => s"b$i").mkString(" ")
    val docs = (Seq((1L, docA), (2L, docB)) ++ (10L to 21L).map(i => (i, boiler)))
      .toDF("doc_id", "text")
    val capped = graft.queries.GraphTemporalQueries.winnowPairs(docs, maxBucket = 8)
    val cappedPairs = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedPairs == Set((1L, 2L)), s"capped run returned $cappedPairs")
    // the cap must REPORT its precision loss on the same pass (q36's
    // contract): 12 boilerplate docs × F shared fingerprints dropped
    val m = capped.queryExecution.observedMetrics("winnow_cap")
    val dropped = m.getAs[Long]("dropped_fp_rows")
    assert(dropped > 0 && dropped % 12 == 0, s"dropped_fp_rows $dropped")
    assert(m.getAs[Long]("max_bucket_size") == 12L)
    // uncapped control: the same corpus yields the planted pair PLUS all
    // 66 boilerplate pairs — proving the cap (not the corpus) removed them
    val uncapped = graft.queries.GraphTemporalQueries.winnowPairs(docs, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size == 66 + 1, s"uncapped run returned ${uncapped.size} pairs")
  }
}
