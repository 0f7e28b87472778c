package graft

import org.apache.spark.sql.functions._

/** Plan locks + value invariants for the TPC-H decorrelation shapes
  * (q131–q134). Each gate's DuckDB oracle proves cross-engine value
  * equality; these specs pin the *plan* properties that make the shapes
  * runnable at 100 TB — every correlated subquery must decorrelate to a
  * hash join, never a nested-loop re-execution.
  */
class TpchShapeSpec extends SparkTestBase {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def formatted(name: String): String =
    q(name).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q131 min-cost subquery decorrelates: agg+join, no nested loop") {
    val plan = formatted("q131_min_cost_supplier")
    assert(plan.contains("HashAggregate"), "per-part min aggregate missing")
    assert(!plan.contains("BroadcastNestedLoop"), "correlated min left per-row")
    assert(!plan.contains("CartesianProduct"))
    // every emitted price IS the min for its part within the region
    val rows = q("q131_min_cost_supplier").collect()
    assert(rows.nonEmpty)
    val minByPart = graft.sources.Tables.lineitem(spark, sf).as("l")
      .join(graft.sources.Tables.supplier(spark, sf).as("s"),
        col("l.l_suppkey") === col("s.s_suppkey"))
      .join(graft.sources.Tables.nation(spark, sf).as("n"),
        col("s.s_nationkey") === col("n.n_nationkey"))
      .join(graft.sources.Tables.region(spark, sf).as("r"),
        col("n.n_regionkey") === col("r.r_regionkey"))
      .filter(col("r.r_name") === "EUROPE")
      .groupBy(col("l.l_partkey")).agg(min(col("l.l_extendedprice")).as("m"))
      .as[(Long, Double)].collect().toMap
    rows.foreach { r =>
      assert(r.getDouble(4) == minByPart(r.getLong(0)),
        s"part ${r.getLong(0)}: emitted price is not the regional min")
    }
  }

  test("q164 correlated quantity predicate decorrelates; result is integer-consistent") {
    val plan = formatted("q164_small_qty_revenue")
    assert(plan.contains("HashAggregate"), "per-part aggregates missing")
    assert(!plan.contains("BroadcastNestedLoop"), "correlated scalar left per-row")
    assert(!plan.contains("CartesianProduct"))
    val row = q("q164_small_qty_revenue").head()
    // recompute blind from the decorrelated join spelling
    val stats = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey").as("pk"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity").cast("long")).as("sq"))
    val exp = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.part(spark, sf).filter(col("p_brand") === "Brand#4"),
        col("l_partkey") === col("p_partkey"))
      .join(stats, col("l_partkey") === col("pk"))
      .filter(col("l_quantity").cast("long") * 5 * col("cnt") < col("sq"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("rc"),
        count(lit(1)).as("n"))
      .head()
    assert(row.getLong(0) === exp.getLong(0))
    assert(row.getLong(1) === exp.getLong(1))
  }

  test("q165 IN-over-HAVING rewrites to aggregate + semi join") {
    val plan = formatted("q165_large_volume_customers")
    assert(plan.contains("LeftSemi"), "IN subquery did not become a semi join")
    assert(!plan.contains("BroadcastNestedLoop"))
    assert(!plan.contains("CartesianProduct"))
    val rows = q("q165_large_volume_customers").collect()
    assert(rows.nonEmpty)
    // every emitted total really exceeds the threshold, and totals agree
    // with an independent per-order aggregate
    val totals = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("t"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { r =>
      val (ok, tq) = (r.getLong(1), r.getLong(3))
      assert(tq > 300L)
      assert(totals(ok) === tq)
    }
  }

  test("q132 max-of-aggregate keeps every tied top supplier, exact cents") {
    val plan = formatted("q132_top_revenue_supplier")
    assert(!plan.contains("BroadcastNestedLoop"))
    val rows = q("q132_top_revenue_supplier").collect()
    assert(rows.nonEmpty)
    // recompute the revenue relation independently and check the winners
    // are exactly the argmax set
    val rev = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= graft.queries.ntzLit("1997-01-01 00:00:00") &&
        col("l_shipdate") < graft.queries.ntzLit("1997-04-01 00:00:00"))
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("total"))
      .as[(Long, Long)].collect()
    val best = rev.map(_._2).max
    val winners = rev.filter(_._2 == best).map(_._1).toSet
    assert(rows.map(_.getLong(0)).toSet == winners)
    rows.foreach(r => assert(r.getLong(2) == best))
  }

  test("q133 nested IN + correlated share decorrelate to semi joins") {
    val plan = formatted("q133_excess_share_suppliers")
    assert(plan.contains("LeftSemi"), "IN subquery did not become a semi join")
    assert(!plan.contains("BroadcastNestedLoop"), "correlated share left per-row")
    // every returned supplier really does carry >1/8 of some small part
    val li = graft.sources.Tables.lineitem(spark, sf)
    val smallParts = graft.sources.Tables.part(spark, sf)
      .filter(col("p_size") <= 10).select(col("p_partkey"))
    val perSupp = li.join(smallParts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("q"))
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity")).as("tot"))
    val qualifying = perSupp.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("q") * 8 > col("tot"))
      .select(col("l_suppkey")).distinct().as[Long].collect().toSet
    val asianNations = graft.sources.Tables.nation(spark, sf)
      .filter(col("n_regionkey") === 2).select(col("n_nationkey"))
      .as[Int].collect().toSet
    val expected = graft.sources.Tables.supplier(spark, sf)
      .filter(col("s_nationkey").isin(asianNations.toSeq: _*))
      .select(col("s_suppkey")).as[Long].collect().toSet
      .intersect(qualifying)
    assert(q("q133_excess_share_suppliers").select("s_suppkey")
      .as[Long].collect().toSet == expected)
    assert(expected.nonEmpty, "fixture drift: share threshold selects nobody")
  }

  test("q142 uncorrelated scalar subqueries evaluate once; anti join is hash") {
    val plan = formatted("q142_no_order_outlook")
    assert(plan.contains("LeftAnti"), "NOT EXISTS did not become an anti join")
    assert(!plan.contains("BroadcastNestedLoop"),
      "the scalar threshold re-evaluated per row or the anti went nested-loop")
    // independent recomputation in exact cents
    val cust = graft.sources.Tables.customer(spark, sf)
      .filter(pmod(col("c_custkey"), lit(10L)).isin(1L, 3L, 5L, 7L))
      .select(col("c_custkey"), round(col("c_acctbal") * 100).cast("long").as("cents"))
    val pop = cust.join(
      graft.sources.Tables.customer(spark, sf)
        .filter(col("c_acctbal") > 0).select(col("c_custkey")), Seq("c_custkey"))
    val (s0, n0) = pop.agg(sum(col("cents")), count(lit(1)))
      .as[(Long, Long)].collect().head
    val recent = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= graft.queries.ntzLit("2000-01-01 00:00:00"))
      .select(col("o_custkey")).distinct()
    val expected = cust.filter(col("cents") * n0 > s0)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(pmod(col("c_custkey"), lit(10L)).as("cc"))
      .agg(count(lit(1)).as("numcust"), sum(col("cents")).as("tot"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val got = q("q142_no_order_outlook").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "fixture drift: dormancy threshold selects nobody")
  }

  test("q134 EXISTS/NOT EXISTS plan as semi+anti hash joins with residuals") {
    val plan = formatted("q134_lone_returned_supplier")
    assert(plan.contains("LeftSemi"), "EXISTS did not become a semi join")
    assert(plan.contains("LeftAnti"), "NOT EXISTS did not become an anti join")
    assert(!plan.contains("BroadcastNestedLoop"),
      "a correlated existence test re-executes per row")
    // independent recomputation of the qualifying lineitem set via joins
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
    val finished = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val returned = li.filter(col("l_returnflag") === "R")
      .join(finished, col("l_orderkey") === col("o_orderkey")).drop("o_orderkey")
    val other = li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"),
      col("l_returnflag").as("rf2"))
    val hasOther = returned.join(other,
      col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"), "left_semi")
    val lone = hasOther.join(
      other.filter(col("rf2") === "R"),
      col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"), "left_anti")
    val expected = lone.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    val suppName = graft.sources.Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name")).as[(Long, String)].collect().toMap
    val got = q("q134_lone_returned_supplier").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expected.map { case (k, v) => (suppName(k), v) })
  }

  test("q187-q191 DataFrame-tier TPC-H shapes: one fact shuffle, dims broadcast, no nested loops") {
    for (name <- Seq("q187_region_volume", "q188_returned_customers",
        "q189_promo_share", "q190_market_share", "q191_product_profit")) {
      val plan = formatted(name)
      assert(!plan.contains("BroadcastNestedLoop"), s"$name: nested-loop join in plan")
      assert(!plan.contains("CartesianProduct"), s"$name: cartesian product in plan")
      assert(plan.contains("BroadcastHashJoin"), s"$name: dimension sides should broadcast")
      // the ONLY row-shuffling exchanges allowed are the lineitem-orders
      // join (when both exceed the broadcast threshold) and the final
      // aggregation — a dim that lands on a shuffle join would add more
      val nShuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(nShuffles <= 3, s"$name: $nShuffles hash exchanges — a dim leg is shuffling:\n$plan")
    }
    // q188's top-20 must plan as TakeOrdered (no global sort at scale)
    assert(formatted("q188_returned_customers").contains("TakeOrderedAndProject"),
      "q188: top-k should plan as TakeOrderedAndProject")
  }

  test("q194 scalar-subquery threshold evaluates the CTE as scalars, not per row") {
    // Q11's HAVING > (SELECT ...) trap is re-executing the subquery per
    // outer row; Catalyst must plan both threshold terms as uncorrelated
    // Subquery nodes (evaluated once, result broadcast into the filter)
    val plan = formatted("q194_important_parts")
    assert(!plan.contains("BroadcastNestedLoop"), s"nested loop:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("Subquery"), "threshold should plan as scalar subqueries")
    val res = SparkEntry.queries("q194_important_parts")(spark, sf)
    val n = res.count()
    assert(n > 0, "threshold filtered everything out")
  }
}
