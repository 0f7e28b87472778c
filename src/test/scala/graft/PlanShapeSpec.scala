package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Locks in the plan shapes the 100 TB design depends on: predicate
  * pushdown, column pruning, broadcast joins, TakeOrderedAndProject, and
  * salted-join equivalence.
  */
class PlanShapeSpec extends SparkTestBase {

  // formatted explain includes full FileScan metadata (PushedFilters,
  // ReadSchema); plain toString truncates it and AQE hides it pre-execution
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q02 filter pushes every predicate into the parquet scan") {
    val p = plan("q02_filter")
    assert(p.contains("PushedFilters:"), p)
    Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_quantity,24.0)",
        "In(l_returnflag").foreach(f => assert(p.contains(f), s"missing $f"))
  }

  test("q02 prunes the read schema to referenced columns only") {
    val p = plan("q02_filter")
    val read = p.substring(p.indexOf("ReadSchema:"))
    assert(!read.take(400).contains("l_partkey"), read.take(400))
    assert(!read.take(400).contains("l_tax"), read.take(400))
  }

  test("q10 star join broadcasts the dimension side") {
    assert(plan("q10_join_inner").contains("BroadcastHashJoin"))
  }

  test("q21 top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q21_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q85 rank filter plans as WindowGroupLimit (top-k pushed below the shuffle)") {
    val p = plan("q85_tfidf_topterms")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q86 prefix sum never runs a corpus-sized one-partition window") {
    // the only acceptable unpartitioned window is the bucket-offsets level,
    // which consumes the per-bucket aggregate (HashAggregate), never a scan
    val p = plan("q86_token_packing")
    val windows = p.split("\n").filter(_.contains("Window"))
    assert(windows.nonEmpty)
    // corpus-sized window must be hash-partitioned on the bucket column
    assert(p.contains("_ps_bucket"), p)
    assert(p.contains("BroadcastHashJoin"), p) // offsets joined by broadcast
  }

  test("q88 funnel joins the per-user stage tables by broadcast") {
    assert(plan("q88_funnel").contains("BroadcastHashJoin"))
  }

  test("q59 partitioned re-read prunes to the filtered partition") {
    // run once so the partitioned directory exists, then inspect the plan
    val df = SparkEntry.queries("q59_partitioned_parquet")(spark, sf)
    df.collect()
    val p = plan("q59_partitioned_parquet")
    assert(p.contains("PartitionFilters: [isnotnull(l_returnflag"), p)
    assert(p.contains("(l_returnflag") && p.contains("= A)"), p)
  }

  test("salted join equals plain join and spreads the hot key") {
    import spark.implicits._
    // a pathological fact table: 90% of rows share key 1
    val fact = (1 to 1000).map(i => (if (i <= 900) 1L else (i % 50).toLong, i.toLong))
      .toDF("k", "row_id")
    val dim = (0 to 49).map(i => (i.toLong, s"name_$i")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).agg(count(lit(1)), sum(col("row_id")))
      .collect().head
    val salted = Skew.saltedEquiJoin(fact, dim, "k", "row_id", salts = 8)
      .agg(count(lit(1)), sum(col("row_id"))).collect().head
    assert(plain == salted)
  }

  test("q75 salted join shuffles on (key, salt), not the bare hot key") {
    val p = plan("q75_skew_salted_join")
    assert(p.contains("_salt"), p.take(2000))
    val exchangeWithSalt = p.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("_salt"))
    assert(exchangeWithSalt, "no exchange partitioned by the salt column")
  }

  test("q79 bucketed join has no exchange on either join side") {
    // run once so the bucketed tables exist, then inspect the plan
    SparkEntry.queries("q79_bucketed_join")(spark, sf).collect()
    val p = plan("q79_bucketed_join")
    assert(p.contains("SortMergeJoin"), p.take(1500))
    assert(!p.contains("hashpartitioning(o_custkey"), "orders side shuffled")
    assert(!p.contains("hashpartitioning(c_custkey"), "customer side shuffled")
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"), p.take(1500))
  }

  test("salted join rejects dim-preserving join types (they would duplicate dim rows)") {
    import spark.implicits._
    val fact = Seq((1L, 1L)).toDF("k", "row_id")
    val dim = Seq((1L, "x")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      Skew.saltedEquiJoin(fact, dim, "k", "row_id", salts = 4, joinType = "right")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedEquiJoin(fact, dim, "k", "row_id", salts = 4, joinType = "full")
    }
  }
}
