package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin
import graft.plans.AsOfJoinCustom

class AsOfCustomSpec extends SparkTestBase {

  test("custom sort-merge as-of == union+window as-of on events (sf0.001)") {
    val ev = graft.sources.Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("asof_value"), col("asof_time"))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          if (r.isNullAt(2)) None else Some(r.get(2).toString))).toSet

    val viaWindow = canon(AsOfJoin.backward(purchases, clicks,
      "user_id", "user_id", "ts", "ts", Seq("value"), "event_id"))
    val viaCustom = canon(AsOfJoinCustom.backward(purchases, clicks,
      "user_id", "user_id", "ts", "ts", Seq("value"), "event_id"))
    assert(viaCustom == viaWindow)
    assert(viaCustom.nonEmpty)
  }

  test("custom as-of handles ties, no-match, and stale-key state") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 250L, "p2"), (2L, 50L, "p3"), (3L, 10L, "p4"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 90L, 10.0, 1L), (1L, 100L, 20.0, 2L), (1L, 100L, 30.0, 3L),
        (1L, 240L, 40.0, 4L), (2L, 60L, 50.0, 5L))
      .toDF("k", "t", "v", "rid")
    val out = AsOfJoinCustom.backward(left, right, "k", "k", "t", "t", Seq("v"), "rid")
      .orderBy(col("tag")).select(col("tag"), col("asof_v")).collect()
    assert(out(0).getDouble(1) == 30.0) // tie at t=100 → max rid
    assert(out(1).getDouble(1) == 40.0)
    assert(out(2).isNullAt(1)) // right event after left time
    assert(out(3).isNullAt(1)) // key never seen on right (stale-state check)
  }

  test("left-only filters push through the custom as-of into the scan") {
    val ev = graft.sources.Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
    val joined = AsOfJoinCustom.backward(purchases, clicks,
        "user_id", "user_id", "ts", "ts", Seq("value"), "event_id")
      .filter(col("event_id") < 500) // left-side-only predicate
    val optimized = joined.queryExecution.optimizedPlan.toString
    // the filter must sit BELOW the AsOfJoin node (on its left child), not above
    val asofIdx = optimized.indexOf("AsOfJoin")
    assert(asofIdx >= 0, optimized)
    assert(optimized.indexOf("event_id#", asofIdx) >= 0)
    val filterIdx = optimized.indexOf("Filter")
    assert(filterIdx > asofIdx, s"filter not pushed below as-of:\n$optimized")
    // and correctness is unchanged vs filtering the input
    val a = joined.count()
    val b = AsOfJoinCustom.backward(purchases.filter(col("event_id") < 500), clicks,
      "user_id", "user_id", "ts", "ts", Seq("value"), "event_id").count()
    assert(a == b)
  }

  test("custom as-of with STRING keys: buffer-backed key survives iterator reuse") {
    import spark.implicits._
    // many interleaved string keys in one partition exercise the
    // lastMatchKey-must-be-copied path
    val left = (0 until 200).map(i => (s"k${i % 5}", 100L + i, i)).toDF("k", "t", "lid")
    val right = (0 until 50).map(i => (s"k${i % 5}", 90L + i, i.toDouble, i.toLong))
      .toDF("k", "t", "v", "rid")
    val viaCustom = AsOfJoinCustom.backward(left, right, "k", "k", "t", "t", Seq("v"), "rid")
      .select(col("lid"), col("asof_v")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    val viaWindow = graft.ops.AsOfJoin.backward(left, right, "k", "k", "t", "t", Seq("v"), "rid")
      .select(col("lid"), col("asof_v")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    assert(viaCustom.size == 200)
    (0 until 200).foreach { i =>
      val (a, b) = (viaCustom(i), viaWindow(i))
      assert(a == b || (a.isNaN && b.isNaN), s"lid=$i custom=$a window=$b")
    }
  }

  test("custom as-of rejects mismatched key/time types at bind time") {
    import spark.implicits._
    val left = Seq((1, 100L)).toDF("k", "t") // int key
    val right = Seq((1L, 90L, 1.0, 1L)).toDF("k", "t", "v", "rid") // long key
    intercept[graft.types.AttributeTypeMismatch] {
      AsOfJoinCustom.backward(left, right, "k", "k", "t", "t", Seq("v"), "rid")
    }
  }

  test("custom as-of rejects reserved asof_*/__r_* left columns at bind time") {
    import spark.implicits._
    val right = Seq((1L, 90L, 1.0, 1L)).toDF("k", "t", "v", "rid")
    // asof_* on the left would collide with the appended output columns
    val l1 = Seq((1L, 100L, 2.0)).toDF("k", "t", "asof_v")
    intercept[graft.types.DuplicateAttribute] {
      AsOfJoinCustom.backward(l1, right, "k", "k", "t", "t", Seq("v"), "rid")
    }
    // __r_* on the left would alias into the renamed right namespace
    val l2 = Seq((1L, 100L, 2.0)).toDF("k", "t", "__r_v")
    intercept[graft.types.DuplicateAttribute] {
      AsOfJoinCustom.backward(l2, right, "k", "k", "t", "t", Seq("v"), "rid")
    }
  }

  test("null tiebreak rule agrees between window and custom implementations") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1")).toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 20.0, Some(2L)), (1L, 100L, 99.0, Option.empty[Long]))
      .toDF("k", "t", "v", "rid")
    val w = graft.ops.AsOfJoin.backward(left, right, "k", "k", "t", "t", Seq("v"), "rid")
      .select(col("asof_v")).collect().head.getDouble(0)
    val c = AsOfJoinCustom.backward(left, right, "k", "k", "t", "t", Seq("v"), "rid")
      .select(col("asof_v")).collect().head.getDouble(0)
    assert(w == c, s"window=$w custom=$c")
    assert(w == 99.0) // null tiebreak sorts last → wins, both implementations
  }

  test("custom as-of plans as AsOfJoinExec with co-partitioned sorted children") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 90L, 1.0, 1L)).toDF("k", "t", "v", "rid")
    val df = AsOfJoinCustom.backward(left, right, "k", "k", "t", "t", Seq("v"), "rid")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin"), physical)
    assert(physical.contains("Sort [k#"), physical) // sorted children injected
  }
}
