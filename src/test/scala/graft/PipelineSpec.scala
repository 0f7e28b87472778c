package graft

import org.apache.spark.sql.functions._

import graft.expressions.MisraGriesAggregate
import graft.functions.Packing

/** Specs for the r2 pipeline batch (q83–q88): the Misra–Gries sketch's lossy
  * regime (the q87 gate only sees the exact k>=vocab regime), the
  * distributed prefix sum vs the naive global window, and session
  * invariants the SQL oracle can't express directly.
  */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("misra-gries: exact when k >= distinct (matches groupBy counts)") {
    val words = Seq("a", "b", "a", "c", "a", "b", "d")
    val df = words.toDF("t")
    val m = df.agg(MisraGriesAggregate(col("t"), 10).as("m"))
      .collect()(0).getMap[String, Long](0)
    assert(m == Map("a" -> 3L, "b" -> 2L, "c" -> 1L, "d" -> 1L))
  }

  test("misra-gries: lossy regime keeps heavy items within the N/(k+1) bound") {
    // 1000 "hot" + 100 each of 20 cold items: N = 3000, k = 4 ->
    // bound N/(k+1) = 600; hot freq 1000 > 600 must survive with
    // est in [1000 - 600, 1000]
    val stream = scala.util.Random.shuffle(
      Seq.fill(1000)("hot") ++ (1 to 20).flatMap(i => Seq.fill(100)(s"c$i")))
    val df = spark.sparkContext.parallelize(stream, 8).toDF("t")
    val m = df.agg(MisraGriesAggregate(col("t"), 4).as("m"))
      .collect()(0).getMap[String, Long](0)
    assert(m.size <= 4)
    assert(m.contains("hot"), s"heavy item evicted: $m")
    assert(m("hot") <= 1000L && m("hot") >= 400L, s"estimate out of bounds: $m")
    // every surviving estimate never over-counts
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    m.foreach { case (t, est) => assert(est <= exact(t), s"overcount for $t") }
  }

  test("misra-gries: nulls ignored, empty input yields empty map") {
    val df = Seq(Some("x"), None, Some("x"), None).toDF("t")
    val m = df.agg(MisraGriesAggregate(col("t"), 4).as("m"))
      .collect()(0).getMap[String, Long](0)
    assert(m == Map("x" -> 2L))
    val empty = df.filter(col("t") === "zzz")
      .agg(MisraGriesAggregate(col("t"), 4).as("m"))
      .collect()(0).getMap[String, Long](0)
    assert(empty.isEmpty)
  }

  test("prefix sum: two-level result equals naive global window, any bucket width") {
    val df = Seq((0L, 5L), (1L, 3L), (3L, 7L), (7L, 1L), (10L, 4L), (11L, 2L))
      .toDF("id", "v")
    val expected = Seq(5L, 8L, 15L, 16L, 20L, 22L)
    for (bw <- Seq(1L, 2L, 4L, 100L)) {
      val got = Packing.prefixSum(df, "id", "v", bw)
        .orderBy(col("id")).select(col("cum")).as[Long].collect().toSeq
      assert(got == expected, s"bucketWidth=$bw")
    }
  }

  test("sessionize invariants: gaps split, totals preserved, indices dense") {
    val q = QueryRegistry.queries("q83_sessionize")(spark, sf)
      .select(col("user_id"), col("sess_idx"), col("n_events")).collect()
    val totalEvents = graft.sources.Tables.events(spark, sf).count()
    assert(q.map(_.getLong(2)).sum == totalEvents, "every event in exactly one session")
    // per user: session indices are 1..nSessions with no holes
    q.groupBy(_.getLong(0)).foreach { case (u, rows) =>
      val idx = rows.map(_.getLong(1)).sorted
      assert(idx.head == 1L && idx.last == idx.length.toLong, s"user $u indices not dense")
    }
  }

  test("funnel: stage containment and non-negative conversion times") {
    val rows = QueryRegistry.queries("q88_funnel")(spark, sf).collect()
    rows.foreach { r =>
      val (click, purchase) = (r.getBoolean(2), r.getBoolean(3))
      if (purchase) assert(click, "purchase without click stage")
      if (!r.isNullAt(4)) {
        assert(purchase, "secs_to_purchase set without purchase")
        assert(r.getLong(4) >= 0L)
      } else assert(!purchase)
    }
  }

  test("q144 count-min: never undercounts, exact on a collision-free corpus") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q144_countmin_sketch")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"CM undercounted ${r.getString(0)}")
      assert(r.getLong(2) >= r.getLong(1))
    }
    // ground truth on a hand corpus: rebuild the sketch with the same
    // hash formulas over 3 tokens — 3 tokens in 256 cells collide in no
    // row here, so every estimate must be EXACT (the deterministic
    // special case of the CM bound), pinning the min-over-rows logic
    // against hand-known counts
    import spark.implicits._
    import graft.functions.{TextFunctions => TF}
    val counts = Seq(("a", 3L), ("b", 2L), ("c", 1L)).toDF("tok", "true_cnt")
    def cell(tok: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) =
      pmod(TF.md5Hash60(concat(tok, lit("#"), r.cast("string"))), lit(256L))
    val rs = explode(array((0 until 4).map(lit(_)): _*)).as("r")
    val sketch = counts.select(rs, col("tok"), col("true_cnt"))
      .select(col("r"), cell(col("tok"), col("r")).as("cell"), col("true_cnt"))
      .groupBy(col("r"), col("cell")).agg(sum(col("true_cnt")).as("cnt"))
    val est = counts.select(rs, col("tok"), col("true_cnt"))
      .select(col("tok"), col("true_cnt"), col("r"), cell(col("tok"), col("r")).as("cell"))
      .join(sketch, Seq("r", "cell"))
      .groupBy(col("tok"), col("true_cnt")).agg(min(col("cnt")).as("cm_est"))
      .as[(String, Long, Long)].collect()
    assert(est.length == 3)
    est.foreach { case (tok, t, e) => assert(e == t, s"$tok: est $e != true $t (collision or logic bug)") }
  }
}
