package graft.queries

import graft.GQuery
import graft.sources.Tables

/** The four hardest remaining TPC-H decorrelation shapes (VERDICT r3 item 5),
  * adapted to the fixture schema (which has no partsupp table — lineitem
  * stands in as the part↔supplier relation; the *decorrelation shape* each
  * query exercises is the point, not the TPC-H literal text):
  *
  *  - q131 / Q2:  correlated min-cost scalar subquery over a 4-way join —
  *    Catalyst must decorrelate into a per-part min aggregate joined back,
  *    not re-execute the subquery per outer row (O(n·m) at 100 TB).
  *  - q132 / Q15: CTE/view referenced twice (revenue per supplier + its MAX)
  *    — max-of-aggregate selection; exchange reuse dedups the second scan.
  *  - q133 / Q20: nested IN (parts filter) inside IN (qualifying suppliers)
  *    with a correlated share-of-total aggregate — two semi-join rewrites
  *    plus one decorrelated aggregate in a single predicate tree.
  *  - q134 / Q21: EXISTS + NOT EXISTS with a non-equi conjunct — semi AND
  *    anti hash joins on the same key carrying an inequality residual (the
  *    null-aware-anti / nested-loop trap shape, avoided).
  *
  * All four run through spark.sql so the gate covers the SQL→Catalyst
  * decorrelation path (RewriteCorrelatedScalarSubquery /
  * RewritePredicateSubquery / DecorrelateInnerQuery); TpchShapeSpec locks
  * the plans to hash joins (no BroadcastNestedLoop, no CartesianProduct).
  * Money math follows the proven exact-cents pattern (q104): doubles →
  * round(x·100) BIGINT cents before any arithmetic, so both engines compare
  * exact integers.
  *
  * q187–q191 (round 6) add Q5, Q10, Q14, Q8, Q9-adapted through the
  * DataFrame API (declarative-plan path), dims broadcast and one fact
  * shuffle each. q192–q194 finish the sweep: Q6 (pure pushdown scan),
  * and Q16/Q11 with DISTINCT (l_partkey, l_suppkey) over lineitem as the
  * part↔supplier relation — with those, every TPC-H query shape is
  * exercised by some gated query (Q1 q04, Q3 entry/q102, Q4 q65,
  * Q7 q78, Q12 q76, Q13 q66, Q19 q77).
  */
object TpchShapeQueries {

  private def views(s: org.apache.spark.sql.SparkSession, d: String): Unit = {
    Tables.region(s, d).createOrReplaceTempView("g_tpch_region")
    Tables.nation(s, d).createOrReplaceTempView("g_tpch_nation")
    Tables.supplier(s, d).createOrReplaceTempView("g_tpch_supplier")
    Tables.customer(s, d).createOrReplaceTempView("g_tpch_customer")
    Tables.part(s, d).createOrReplaceTempView("g_tpch_part")
    Tables.orders(s, d).createOrReplaceTempView("g_tpch_orders")
    Tables.lineitem(s, d).createOrReplaceTempView("g_tpch_lineitem")
  }

  val all: Seq[GQuery] = Seq(
    // ------------------------------------------------------------------
    // q131: TPC-H Q2 shape — cheapest-supplier-per-part in a region. The
    // correlated `= (SELECT MIN ...)` filter decorrelates to a per-part
    // min aggregate over the region-restricted join, joined back on
    // p_partkey. MIN of raw doubles involves no arithmetic, so equality
    // is exact cross-engine. DISTINCT collapses multiple min-priced
    // lineitems from the same supplier (Q2 answers per supplier, not per
    // shipment); (p_partkey, s_suppkey) then keys the output totally.
    GQuery(
      "q131_min_cost_supplier",
      (s, d) => {
        views(s, d)
        s.sql("""SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
                |       l.l_extendedprice AS price
                |FROM g_tpch_part p
                |JOIN g_tpch_lineitem l ON l.l_partkey = p.p_partkey
                |JOIN g_tpch_supplier s ON s.s_suppkey = l.l_suppkey
                |JOIN g_tpch_nation n ON n.n_nationkey = s.s_nationkey
                |JOIN g_tpch_region r ON r.r_regionkey = n.n_regionkey
                |WHERE r.r_name = 'EUROPE' AND p.p_size <= 5
                |  AND l.l_extendedprice = (
                |    SELECT MIN(l2.l_extendedprice) FROM g_tpch_lineitem l2
                |    JOIN g_tpch_supplier s2 ON s2.s_suppkey = l2.l_suppkey
                |    JOIN g_tpch_nation n2 ON n2.n_nationkey = s2.s_nationkey
                |    JOIN g_tpch_region r2 ON r2.r_regionkey = n2.n_regionkey
                |    WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
                |ORDER BY p_partkey ASC, s_suppkey ASC""".stripMargin)
      },
      Some("""SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
             |       l.l_extendedprice AS price
             |FROM part p
             |JOIN lineitem l ON l.l_partkey = p.p_partkey
             |JOIN supplier s ON s.s_suppkey = l.l_suppkey
             |JOIN nation n ON n.n_nationkey = s.s_nationkey
             |JOIN region r ON r.r_regionkey = n.n_regionkey
             |WHERE r.r_name = 'EUROPE' AND p.p_size <= 5
             |  AND l.l_extendedprice = (
             |    SELECT MIN(l2.l_extendedprice) FROM lineitem l2
             |    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
             |    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
             |    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
             |    WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
             |ORDER BY p_partkey ASC, s_suppkey ASC""".stripMargin),
      "TPC-H Q2 shape: correlated min-cost subquery decorrelated to agg+join"),

    // ------------------------------------------------------------------
    // q132: TPC-H Q15 shape — top supplier(s) by quarterly revenue. The
    // revenue CTE is referenced twice (probe side + scalar MAX); identical
    // aggregate plans dedup via exchange reuse, so the lineitem window is
    // scanned once per physically-distinct aggregate, not once per
    // reference. Revenue in exact integer cent·bp units:
    // round(price·100)·(100 − round(disc·100)) summed as BIGINT.
    GQuery(
      "q132_top_revenue_supplier",
      (s, d) => {
        views(s, d)
        s.sql("""WITH revenue AS (
                |  SELECT l_suppkey,
                |         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                |             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS total
                |  FROM g_tpch_lineitem
                |  WHERE l_shipdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'
                |    AND l_shipdate <  TIMESTAMP_NTZ '1997-04-01 00:00:00'
                |  GROUP BY l_suppkey)
                |SELECT s.s_suppkey, s.s_name, r.total AS total_revenue
                |FROM g_tpch_supplier s JOIN revenue r ON r.l_suppkey = s.s_suppkey
                |WHERE r.total = (SELECT MAX(total) FROM revenue)
                |ORDER BY s_suppkey ASC""".stripMargin)
      },
      Some("""WITH revenue AS (
             |  SELECT l_suppkey,
             |         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
             |             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS total
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |    AND l_shipdate <  TIMESTAMP '1997-04-01'
             |  GROUP BY l_suppkey)
             |SELECT s.s_suppkey, s.s_name, CAST(r.total AS BIGINT) AS total_revenue
             |FROM supplier s JOIN revenue r ON r.l_suppkey = s.s_suppkey
             |WHERE r.total = (SELECT MAX(total) FROM revenue)
             |ORDER BY s_suppkey ASC""".stripMargin),
      "TPC-H Q15 shape: twice-referenced revenue view + max-of-aggregate"),

    // ------------------------------------------------------------------
    // q133: TPC-H Q20 shape — suppliers carrying an outsized share of a
    // small part's volume, in one region. Nested IN (part filter inside
    // supplier filter) + correlated share-of-total aggregate: the inner
    // part IN becomes a semi join pushed below the per-(part,supplier)
    // aggregate; the correlated total decorrelates to a per-part SUM
    // joined on l_partkey; the outer IN is a third semi join. Quantities
    // are integral doubles — sums and the 8× comparison are exact.
    GQuery(
      "q133_excess_share_suppliers",
      (s, d) => {
        views(s, d)
        s.sql("""SELECT s.s_suppkey, s.s_name FROM g_tpch_supplier s
                |WHERE s.s_suppkey IN (
                |  SELECT sup.l_suppkey FROM (
                |    SELECT l_partkey, l_suppkey, SUM(l_quantity) AS q
                |    FROM g_tpch_lineitem
                |    WHERE l_partkey IN (SELECT p_partkey FROM g_tpch_part WHERE p_size <= 10)
                |    GROUP BY l_partkey, l_suppkey) sup
                |  WHERE 8 * sup.q > (SELECT SUM(l2.l_quantity)
                |                     FROM g_tpch_lineitem l2
                |                     WHERE l2.l_partkey = sup.l_partkey))
                |AND s.s_nationkey IN (SELECT n_nationkey FROM g_tpch_nation
                |                      WHERE n_regionkey = 2)
                |ORDER BY s_suppkey ASC""".stripMargin)
      },
      Some("""SELECT s.s_suppkey, s.s_name FROM supplier s
             |WHERE s.s_suppkey IN (
             |  SELECT sup.l_suppkey FROM (
             |    SELECT l_partkey, l_suppkey, SUM(l_quantity) AS q
             |    FROM lineitem
             |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 10)
             |    GROUP BY l_partkey, l_suppkey) sup
             |  WHERE 8 * sup.q > (SELECT SUM(l2.l_quantity)
             |                     FROM lineitem l2
             |                     WHERE l2.l_partkey = sup.l_partkey))
             |AND s.s_nationkey IN (SELECT n_nationkey FROM nation
             |                      WHERE n_regionkey = 2)
             |ORDER BY s_suppkey ASC""".stripMargin),
      "TPC-H Q20 shape: nested IN + correlated share-of-total aggregate"),

    // ------------------------------------------------------------------
    // q134: TPC-H Q21 shape — the supplier whose shipment was the ONLY
    // returned one in a finished multi-supplier order (fixture has no
    // receipt/commit dates; l_returnflag='R' stands in for "late").
    // EXISTS → left semi hash join on l_orderkey with the <> conjunct as
    // residual; NOT EXISTS → left anti likewise. Neither may plan as a
    // nested loop: both keep their equi-key, which is what makes the
    // shape runnable at 100 TB (TpchShapeSpec locks this).
    GQuery(
      "q134_lone_returned_supplier",
      (s, d) => {
        views(s, d)
        s.sql("""SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
                |FROM g_tpch_supplier s
                |JOIN g_tpch_lineitem l1 ON l1.l_suppkey = s.s_suppkey
                |JOIN g_tpch_orders o ON o.o_orderkey = l1.l_orderkey
                |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
                |  AND EXISTS (SELECT 1 FROM g_tpch_lineitem l2
                |              WHERE l2.l_orderkey = l1.l_orderkey
                |                AND l2.l_suppkey <> l1.l_suppkey)
                |  AND NOT EXISTS (SELECT 1 FROM g_tpch_lineitem l3
                |                  WHERE l3.l_orderkey = l1.l_orderkey
                |                    AND l3.l_suppkey <> l1.l_suppkey
                |                    AND l3.l_returnflag = 'R')
                |GROUP BY s.s_name
                |ORDER BY numwait DESC, s_name ASC""".stripMargin)
      },
      Some("""SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
             |FROM supplier s
             |JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
             |JOIN orders o ON o.o_orderkey = l1.l_orderkey
             |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_returnflag = 'R')
             |GROUP BY s.s_name
             |ORDER BY numwait DESC, s_name ASC""".stripMargin),
      "TPC-H Q21 shape: EXISTS semi + NOT EXISTS anti with non-equi residual"),

    // ------------------------------------------------------------------
    // q142: TPC-H Q22 shape — "global customer outlook": customers in
    // selected key-bucket groups (phone-prefix stand-in: c_custkey % 10)
    // with above-average positive balance and no RECENT order (every
    // fixture customer has SOME order, so literal Q22's no-order test
    // would be vacuously empty; dormant-since-2000 keeps the anti join
    // doing real work — the date predicate is pushed below the join).
    // Combines an UNCORRELATED scalar aggregate subquery (evaluated once,
    // broadcast as a literal — never per-row) with a NOT EXISTS anti join
    // and a group-count — the last of the hard TPC-H decorrelation
    // shapes. The avg test runs in exact integers: cents·N > S with
    // (S, N) from the positive-balance population, so no double
    // averaging anywhere.
    GQuery(
      "q142_no_order_outlook",
      (s, d) => {
        views(s, d)
        s.sql("""SELECT c_custkey % 10 AS cc, CAST(COUNT(*) AS BIGINT) AS numcust,
                |       SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS totcents
                |FROM g_tpch_customer c
                |WHERE c_custkey % 10 IN (1, 3, 5, 7)
                |  AND CAST(round(c_acctbal * 100) AS BIGINT) *
                |      (SELECT COUNT(*) FROM g_tpch_customer
                |       WHERE c_custkey % 10 IN (1, 3, 5, 7) AND c_acctbal > 0)
                |    > (SELECT SUM(CAST(round(c_acctbal * 100) AS BIGINT))
                |       FROM g_tpch_customer
                |       WHERE c_custkey % 10 IN (1, 3, 5, 7) AND c_acctbal > 0)
                |  AND NOT EXISTS (SELECT 1 FROM g_tpch_orders o
                |                  WHERE o.o_custkey = c.c_custkey
                |                    AND o.o_orderdate >= TIMESTAMP_NTZ '2000-01-01 00:00:00')
                |GROUP BY c_custkey % 10
                |ORDER BY cc ASC""".stripMargin)
      },
      Some("""SELECT c_custkey % 10 AS cc, CAST(COUNT(*) AS BIGINT) AS numcust,
             |       CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             |         AS totcents
             |FROM customer c
             |WHERE c_custkey % 10 IN (1, 3, 5, 7)
             |  AND CAST(round(c_acctbal * 100) AS BIGINT) *
             |      (SELECT COUNT(*) FROM customer
             |       WHERE c_custkey % 10 IN (1, 3, 5, 7) AND c_acctbal > 0)
             |    > (SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             |       FROM customer
             |       WHERE c_custkey % 10 IN (1, 3, 5, 7) AND c_acctbal > 0)
             |  AND NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey
             |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
             |GROUP BY c_custkey % 10
             |ORDER BY cc ASC""".stripMargin),
      "TPC-H Q22 shape: uncorrelated scalar agg subquery + anti join + grouping"),

    // ------------------------------------------------------------------
    // q164: TPC-H Q17 shape — small-quantity-order revenue. TWO correlated
    // scalar aggregate subqueries over the same correlated relation
    // (per-part line count and quantity sum): Catalyst must decorrelate
    // both into per-part aggregates joined back (and may merge them into
    // one aggregate — MergeScalarSubqueries); per-outer-row re-execution
    // would be O(n·m) at 100 TB. The classic `< 0.2*avg(qty)` predicate is
    // spelled as the integer cross-multiplication qty·5·cnt < sum —
    // quantities are integral doubles, so both engines compare exact
    // BIGINTs and the float-boundary hazard of 0.2·avg never exists.
    GQuery(
      "q164_small_qty_revenue",
      (s, d) => {
        views(s, d)
        s.sql("""SELECT CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                |         AS rev_cents,
                |       CAST(COUNT(*) AS BIGINT) AS n_lines
                |FROM g_tpch_lineitem l
                |JOIN g_tpch_part p ON p.p_partkey = l.l_partkey
                |WHERE p.p_brand = 'Brand#4'
                |  AND CAST(l.l_quantity AS BIGINT) * 5 *
                |      (SELECT COUNT(*) FROM g_tpch_lineitem l2
                |       WHERE l2.l_partkey = l.l_partkey)
                |    < (SELECT SUM(CAST(l2.l_quantity AS BIGINT)) FROM g_tpch_lineitem l2
                |       WHERE l2.l_partkey = l.l_partkey)""".stripMargin)
      },
      Some("""SELECT CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             |         AS rev_cents,
             |       CAST(COUNT(*) AS BIGINT) AS n_lines
             |FROM lineitem l
             |JOIN part p ON p.p_partkey = l.l_partkey
             |WHERE p.p_brand = 'Brand#4'
             |  AND CAST(l.l_quantity AS BIGINT) * 5 *
             |      (SELECT COUNT(*) FROM lineitem l2
             |       WHERE l2.l_partkey = l.l_partkey)
             |    < (SELECT SUM(CAST(l2.l_quantity AS BIGINT)) FROM lineitem l2
             |       WHERE l2.l_partkey = l.l_partkey)""".stripMargin),
      "TPC-H Q17 shape: correlated avg-quantity predicate decorrelated, integer-exact"),

    // ------------------------------------------------------------------
    // q165: TPC-H Q18 shape — large-volume customers. IN over a grouped
    // HAVING subquery: the qualifying-order set is an aggregate, so the
    // rewrite is aggregate → LeftSemi on o_orderkey, then the 3-way
    // customer⋈orders⋈lineitem join re-aggregates per (customer, order).
    // The semi join's build side is the filtered aggregate (tiny), and
    // every join is an equi hash join on its natural key — the plan a
    // 100 TB run needs. Quantities integral → exact BIGINT totals.
    GQuery(
      "q165_large_volume_customers",
      (s, d) => {
        views(s, d)
        s.sql("""SELECT c.c_custkey, o.o_orderkey,
                |       CAST(floor(CAST(CAST(o.o_orderdate AS TIMESTAMP) AS BIGINT) / 86400)
                |         AS BIGINT) AS order_day,
                |       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
                |FROM g_tpch_customer c
                |JOIN g_tpch_orders o ON o.o_custkey = c.c_custkey
                |JOIN g_tpch_lineitem l ON l.l_orderkey = o.o_orderkey
                |WHERE o.o_orderkey IN (
                |  SELECT l2.l_orderkey FROM g_tpch_lineitem l2
                |  GROUP BY l2.l_orderkey
                |  HAVING SUM(CAST(l2.l_quantity AS BIGINT)) > 300)
                |GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate
                |ORDER BY total_qty DESC, o_orderkey ASC""".stripMargin)
      },
      Some("""SELECT c.c_custkey, o.o_orderkey,
             |       CAST(floor(epoch(o.o_orderdate) / 86400) AS BIGINT) AS order_day,
             |       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
             |FROM customer c
             |JOIN orders o ON o.o_custkey = c.c_custkey
             |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             |WHERE o.o_orderkey IN (
             |  SELECT l2.l_orderkey FROM lineitem l2
             |  GROUP BY l2.l_orderkey
             |  HAVING SUM(CAST(l2.l_quantity AS BIGINT)) > 300)
             |GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate
             |ORDER BY total_qty DESC, o_orderkey ASC""".stripMargin),
      "TPC-H Q18 shape: IN over grouped HAVING rewritten to aggregate + semi join"),

    // ------------------------------------------------------------------
    // q187–q191 extend the TPC-H shape sweep (Q5, Q10, Q14, Q8, Q9-
    // adapted; q192–q194 below finish it with Q6/Q16/Q11 — with
    // q104/q102/q65/q66/q76-78/q131-134/q142/q164/q165 the suite now
    // exercises every TPC-H query shape).
    // These five run through the DataFrame API (the q131–q134 wave covers
    // the SQL→decorrelation path; this wave pins the declarative-plan
    // path): dimension sides broadcast explicitly, fact-side filters
    // applied before every join, money in exact integer cents.
    //
    // q187 / Q5 shape: local-supplier volume — the 6-way join where
    // customer and supplier must share a nation (an extra equi conjunct
    // BETWEEN the two dimension legs, not a star join), region-filtered
    // through nation→region, year-filtered on orders. 100 TB: lineitem is
    // the only big side; all dims broadcast; the c↔s nation conjunct
    // rides the existing hash keys — no extra shuffle.
    GQuery(
      "q187_region_volume",
      (s, d) => {
        import org.apache.spark.sql.functions._
        val cents = expr("CAST(round(l_extendedprice*100) AS BIGINT)" +
          " * (100 - CAST(round(l_discount*100) AS BIGINT))")
        val asia = Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"), cents.as("c"))
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= ntzLit("1996-01-01") && col("o_orderdate") < ntzLit("1997-01-01"))
          .select(col("o_orderkey"), col("o_custkey"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("c")).as("revenue_c"), count(lit(1)).as("n_items"))
          .orderBy(col("revenue_c").desc, col("n_name").asc)
      },
      Some("""SELECT n.n_name,
             |       CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)
             |            * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS BIGINT)
             |         AS revenue_c,
             |       COUNT(*) AS n_items
             |FROM lineitem l
             |JOIN orders o    ON l.l_orderkey = o.o_orderkey
             |JOIN customer c  ON o.o_custkey = c.c_custkey
             |JOIN supplier s  ON l.l_suppkey = s.s_suppkey
             |                AND c.c_nationkey = s.s_nationkey
             |JOIN nation n    ON s.s_nationkey = n.n_nationkey
             |JOIN region r    ON n.n_regionkey = r.r_regionkey
             |WHERE r.r_name = 'ASIA'
             |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
             |GROUP BY n.n_name
             |ORDER BY revenue_c DESC, n_name ASC""".stripMargin),
      "TPC-H Q5 shape: 6-way join with cross-dimension nation conjunct, dims broadcast"),

    // ------------------------------------------------------------------
    // q188 / Q10 shape: returned-item customer ranking — who returned the
    // most revenue in a quarter. Fact filtered on BOTH legs (order date,
    // return flag) before the join; top-20 via TakeOrdered (no global
    // sort at 100 TB), tie-broken on custkey for determinism.
    GQuery(
      "q188_returned_customers",
      (s, d) => {
        import org.apache.spark.sql.functions._
        import graft.ops.Relational._
        val cents = expr("CAST(round(l_extendedprice*100) AS BIGINT)" +
          " * (100 - CAST(round(l_discount*100) AS BIGINT))")
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= ntzLit("1997-01-01") && col("o_orderdate") < ntzLit("1997-04-01"))
          .select(col("o_orderkey"), col("o_custkey"))
        Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), cents.as("c"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum(col("c")).as("returned_c"))
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("returned_c"))
          .topK(20, col("returned_c").desc, col("c_custkey").asc)
      },
      Some("""SELECT c.c_custkey, c.c_name, c.c_mktsegment,
             |       CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)
             |            * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS BIGINT)
             |         AS returned_c
             |FROM lineitem l
             |JOIN orders o   ON l.l_orderkey = o.o_orderkey
             |JOIN customer c ON o.o_custkey = c.c_custkey
             |WHERE l.l_returnflag = 'R'
             |  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o.o_orderdate <  TIMESTAMP '1997-04-01'
             |GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
             |ORDER BY returned_c DESC, c_custkey ASC LIMIT 20""".stripMargin),
      "TPC-H Q10 shape: filtered fact join + top-20 revenue ranking via TakeOrdered"),

    // ------------------------------------------------------------------
    // q189 / Q14 shape: promo revenue share in one month — conditional
    // aggregation in a single pass (no second scan for the denominator).
    // Numerator and denominator emitted as exact cent integers alongside
    // the derived share so the gate pins the division inputs, not just
    // the rounded quotient.
    GQuery(
      "q189_promo_share",
      (s, d) => {
        import org.apache.spark.sql.functions._
        val cents = expr("CAST(round(l_extendedprice*100) AS BIGINT)" +
          " * (100 - CAST(round(l_discount*100) AS BIGINT))")
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= ntzLit("1997-06-01") && col("l_shipdate") < ntzLit("1997-07-01"))
          .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_type"))),
            col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO", cents).otherwise(lit(0L))).as("promo_c"),
            sum(cents).as("total_c"))
          .select(col("promo_c"), col("total_c"),
            (col("promo_c").cast("double") * 100.0 / col("total_c")).as("promo_share_pct"))
      },
      Some("""SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
             |                THEN CAST(round(l.l_extendedprice*100) AS BIGINT)
             |                     * (100 - CAST(round(l.l_discount*100) AS BIGINT))
             |                ELSE 0 END) AS BIGINT) AS promo_c,
             |       CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)
             |            * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS BIGINT)
             |         AS total_c,
             |       CAST(SUM(CASE WHEN p.p_type = 'PROMO'
             |                THEN CAST(round(l.l_extendedprice*100) AS BIGINT)
             |                     * (100 - CAST(round(l.l_discount*100) AS BIGINT))
             |                ELSE 0 END) AS DOUBLE) * 100.0 /
             |       SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)
             |            * (100 - CAST(round(l.l_discount*100) AS BIGINT)))
             |         AS promo_share_pct
             |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |WHERE l.l_shipdate >= TIMESTAMP '1997-06-01'
             |  AND l.l_shipdate <  TIMESTAMP '1997-07-01'""".stripMargin),
      "TPC-H Q14 shape: conditional-aggregate share in one pass, exact integer num/den"),

    // ------------------------------------------------------------------
    // q190 / Q8 shape: a nation's market share within a region per year —
    // conditional numerator over a grouped denominator, computed in the
    // SAME aggregation (share = sum(case)/sum — never a self-join on the
    // year). The 7-relation join tree reduces to one lineitem-orders
    // shuffle; every other leg broadcasts.
    GQuery(
      "q190_market_share",
      (s, d) => {
        import org.apache.spark.sql.functions._
        val cents = expr("CAST(round(l_extendedprice*100) AS BIGINT)" +
          " * (100 - CAST(round(l_discount*100) AS BIGINT))")
        val amNations = Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("c_nk"))
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"), cents.as("c"))
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= ntzLit("1996-01-01") && col("o_orderdate") < ntzLit("1998-01-01"))
          .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).cast("long").as("o_year"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          // customers restricted to the region (the market being measured)
          .join(broadcast(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(amNations), col("c_nationkey") === col("c_nk"))
          // supplier nation = whose share of that market
          .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("o_year"))
          .agg(
            sum(when(col("supp_nation") === "BRAZIL", col("c")).otherwise(lit(0L))).as("brazil_c"),
            sum(col("c")).as("market_c"))
          .select(col("o_year"), col("brazil_c"), col("market_c"),
            (col("brazil_c").cast("double") / col("market_c")).as("mkt_share"))
          .orderBy(col("o_year").asc)
      },
      Some("""SELECT year(o.o_orderdate) AS o_year,
             |       CAST(SUM(CASE WHEN sn.n_name = 'BRAZIL'
             |                THEN CAST(round(l.l_extendedprice*100) AS BIGINT)
             |                     * (100 - CAST(round(l.l_discount*100) AS BIGINT))
             |                ELSE 0 END) AS BIGINT) AS brazil_c,
             |       CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)
             |            * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS BIGINT)
             |         AS market_c,
             |       CAST(SUM(CASE WHEN sn.n_name = 'BRAZIL'
             |                THEN CAST(round(l.l_extendedprice*100) AS BIGINT)
             |                     * (100 - CAST(round(l.l_discount*100) AS BIGINT))
             |                ELSE 0 END) AS DOUBLE) /
             |       SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)
             |            * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS mkt_share
             |FROM lineitem l
             |JOIN orders o    ON l.l_orderkey = o.o_orderkey
             |JOIN customer c  ON o.o_custkey = c.c_custkey
             |JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
             |JOIN region r    ON cn.n_regionkey = r.r_regionkey
             |JOIN supplier s  ON l.l_suppkey = s.s_suppkey
             |JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
             |WHERE r.r_name = 'AMERICA'
             |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
             |GROUP BY 1 ORDER BY o_year ASC""".stripMargin),
      "TPC-H Q8 shape: market share = conditional numerator inside the same aggregation"),

    // ------------------------------------------------------------------
    // q191 / Q9 shape (adapted): product profit by supplier nation × year.
    // The fixture has no partsupp, so p_retailprice/10 stands in for
    // ps_supplycost — the SHAPE (profit = revenue − qty·cost across a
    // part+supplier+nation join, grouped by nation and order year) is
    // what's exercised. All money integer cents; quantity is an integral
    // double so qty·cost_cents is exact.
    GQuery(
      "q191_product_profit",
      (s, d) => {
        import org.apache.spark.sql.functions._
        val revC = expr("CAST(round(l_extendedprice*100) AS BIGINT)" +
          " * (100 - CAST(round(l_discount*100) AS BIGINT))")
        val costC = expr("CAST(l_quantity AS BIGINT)" +
          " * CAST(round(p_retailprice*10) AS BIGINT) * 100")
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_partkey"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        li.join(broadcast(Tables.part(s, d)
            .filter(col("p_name").contains("gear")) // Q9's p_name LIKE '%green%' analog on this fixture's vocabulary
            .select(col("p_partkey"), col("p_retailprice"))),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.orders(s, d).select(col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("o_year")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("o_year"))
          .agg(sum(revC - costC).as("profit_c"), count(lit(1)).as("n_items"))
          .orderBy(col("n_name").asc, col("o_year").desc)
      },
      Some("""SELECT n.n_name, year(o.o_orderdate) AS o_year,
             |       CAST(SUM(CAST(round(l.l_extendedprice*100) AS BIGINT)
             |              * (100 - CAST(round(l.l_discount*100) AS BIGINT))
             |            - CAST(l.l_quantity AS BIGINT)
             |              * CAST(round(p.p_retailprice*10) AS BIGINT) * 100)
             |         AS BIGINT) AS profit_c,
             |       COUNT(*) AS n_items
             |FROM lineitem l
             |JOIN part p     ON l.l_partkey = p.p_partkey
             |JOIN orders o   ON l.l_orderkey = o.o_orderkey
             |JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |JOIN nation n   ON s.s_nationkey = n.n_nationkey
             |WHERE p.p_name LIKE '%gear%'
             |GROUP BY 1, 2
             |ORDER BY n_name ASC, o_year DESC""".stripMargin),
      "TPC-H Q9 shape (partsupp-free): profit = revenue - qty*cost across 5-way join"),

    // ------------------------------------------------------------------
    // q192 / Q6 shape: the pure-scan forecast query — three range
    // predicates and a single global aggregate, NO join, NO group-by key.
    // The whole point at 100 TB is that every predicate reaches the
    // parquet reader (PushedFilters: shipdate range, discount range,
    // quantity bound) so row groups outside the ranges are never
    // decompressed, and the aggregate is map-side partial + one single-row
    // exchange. PlanShapeSpec locks the pushdown. Double comparisons
    // (0.05 ≤ l_discount ≤ 0.07, l_quantity < 24) are exact cross-engine:
    // both engines compare the same stored doubles against the same
    // literal doubles; money is summed in exact integer cents×cents.
    GQuery(
      "q192_forecast_revenue",
      (s, d) => {
        import org.apache.spark.sql.functions._
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= ntzLit("1996-01-01") &&
            col("l_shipdate") < ntzLit("1997-01-01") &&
            col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 24)
          .agg(
            sum(expr("CAST(round(l_extendedprice*100) AS BIGINT)" +
              " * CAST(round(l_discount*100) AS BIGINT)")).as("revenue_c"),
            count(lit(1)).as("n_items"))
          .orderBy(col("revenue_c").asc)
      },
      Some("""SELECT CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
             |            * CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_c,
             |       COUNT(*) AS n_items
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate <  TIMESTAMP '1997-01-01'
             |  AND l_discount >= 0.05 AND l_discount <= 0.07
             |  AND l_quantity < 24
             |ORDER BY revenue_c ASC""".stripMargin),
      "TPC-H Q6 shape: join-free range-predicate scan, all filters pushed to parquet"),

    // ------------------------------------------------------------------
    // q193 / Q16 shape: supplier-count per part attribute with an
    // excluded-supplier NOT IN. The fixture has no partsupp, but — as for
    // q131 — DISTINCT (l_partkey, l_suppkey) over lineitem IS the
    // part↔supplier relation, so the full Q16 shape is expressible:
    // NOT IN (subquery) → null-aware anti join (RewritePredicateSubquery;
    // s_suppkey is non-null so it degenerates to a plain anti hash join,
    // never BNLJ), then COUNT(DISTINCT supplier) per (brand, type, size)
    // — a two-phase distinct aggregate keyed by part attributes. Runs
    // through spark.sql: this wave's SQL→Catalyst subquery-rewrite gate.
    // 100 TB: the pair-distinct is one lineitem-sized shuffle on
    // (partkey, suppkey); part broadcasts; the exclusion list is tiny.
    GQuery(
      "q193_supplier_counts",
      (s, d) => {
        views(s, d)
        s.sql("""
          |SELECT p.p_brand, p.p_type, p.p_size,
          |       COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
          |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM g_tpch_lineitem) ps
          |JOIN g_tpch_part p ON p.p_partkey = ps.l_partkey
          |WHERE p.p_brand <> 'Brand#45'
          |  AND p.p_size IN (1, 4, 7, 14, 23, 36, 45, 49)
          |  AND ps.l_suppkey NOT IN
          |      (SELECT s_suppkey FROM g_tpch_supplier WHERE s_acctbal < 0)
          |GROUP BY p.p_brand, p.p_type, p.p_size
          |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
          |""".stripMargin)
      },
      Some("""SELECT p.p_brand, p.p_type, p.p_size,
             |       COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
             |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
             |JOIN part p ON p.p_partkey = ps.l_partkey
             |WHERE p.p_brand <> 'Brand#45'
             |  AND p.p_size IN (1, 4, 7, 14, 23, 36, 45, 49)
             |  AND ps.l_suppkey NOT IN
             |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY p.p_brand, p.p_type, p.p_size
             |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""".stripMargin),
      "TPC-H Q16 shape: NOT IN anti join + COUNT DISTINCT per part attribute"),

    // ------------------------------------------------------------------
    // q194 / Q11 shape: important-stock selection — per-part value from a
    // nation group's suppliers, kept only when it beats a threshold
    // derived from a SCALAR SUBQUERY over the same aggregation (Q11's
    // HAVING > SUM(...)·fraction). TPC-H scales the fraction with SF; to
    // stay SF-stable the threshold here is 1.2× the MEAN part value,
    // compared in exact integers (10·count·val > 12·total — never a
    // float division at the boundary). Both sides widen to DECIMAL(38,0)
    // (HUGEINT in DuckDB — the q160 pattern), INCLUDING the corpus-wide
    // sum itself — SUM(CAST(val_c AS DECIMAL(38,0))), not
    // CAST(SUM(val_c)): a BIGINT SUM wraps (ANSI: throws) once the
    // corpus-wide value sum passes ~9.2e18 cents·units while DuckDB's
    // SUM promotes to HUGEINT — the engines would diverge exactly at
    // the documented 100 TB intent. Catalyst
    // evaluates the CTE once, broadcasts both scalars, and filters — not
    // one subquery per row.
    // 100 TB: one lineitem-sized shuffle on partkey, dims broadcast.
    GQuery(
      "q194_important_parts",
      (s, d) => {
        views(s, d)
        s.sql("""
          |WITH v AS (
          |  SELECT l_partkey,
          |         SUM(CAST(round(l_extendedprice*100) AS BIGINT)
          |             * CAST(round(l_quantity) AS BIGINT)) AS val_c
          |  FROM g_tpch_lineitem
          |  JOIN g_tpch_supplier ON l_suppkey = s_suppkey
          |  JOIN g_tpch_nation   ON s_nationkey = n_nationkey
          |  WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
          |  GROUP BY l_partkey)
          |SELECT l_partkey, val_c
          |FROM v
          |WHERE CAST(10 AS DECIMAL(38,0)) * (SELECT COUNT(*) FROM v) * val_c
          |      > CAST(12 AS DECIMAL(38,0))
          |        * (SELECT SUM(CAST(val_c AS DECIMAL(38,0))) FROM v)
          |ORDER BY val_c DESC, l_partkey ASC
          |""".stripMargin)
      },
      Some("""WITH v AS (
             |  SELECT l_partkey,
             |         SUM(CAST(round(l_extendedprice*100) AS BIGINT)
             |             * CAST(round(l_quantity) AS BIGINT)) AS val_c
             |  FROM lineitem
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation   ON s_nationkey = n_nationkey
             |  WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
             |  GROUP BY l_partkey)
             |SELECT l_partkey, CAST(val_c AS BIGINT) AS val_c
             |FROM v
             |WHERE CAST(10 AS HUGEINT) * (SELECT COUNT(*) FROM v) * val_c
             |      > CAST(12 AS HUGEINT) * (SELECT SUM(val_c) FROM v)
             |ORDER BY val_c DESC, l_partkey ASC""".stripMargin),
      "TPC-H Q11 shape: HAVING vs scalar-subquery threshold over the same aggregate"),
  )
}
