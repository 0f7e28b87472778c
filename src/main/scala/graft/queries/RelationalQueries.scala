package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.GQuery
import graft.sources.Tables
import graft.ops._
import graft.ops.Relational._

/** Relational core (SURVEY.md §2.1–2.7): scan/project, filters, casts, joins
  * (equi/broadcast/left/semi/anti/theta/cross/full/as-of), aggregations
  * (group-by, distinct, approx, rollup/cube/grouping sets), windows
  * (ranking/analytic/frames), sort/limit/top-k, set operations.
  *
  * Float-determinism policy: money sums go through DECIMAL(18,2) casts on
  * BOTH engines (exact, order-independent); `l_quantity` holds integral
  * doubles, whose sums are exact in IEEE double regardless of order.
  */
object RelationalQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  val all: Seq[GQuery] = Seq(
    // ------------------------------------------------------------------
    // q01: ScanView + Project semantics (reference src/operation/project.rs,
    // src/projector.rs): select, reorder, rename, duplicate columns.
    GQuery(
      "q01_project",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val p = Projector.of(
          Projector.byNameAs("l_orderkey", "okey"),
          Projector.byPositionAs(3, "line_no"), // 0-based position, dbkit style
          Projector.byNameAs("l_quantity", "qty"),
          Projector.byNameAs("l_returnflag", "flag1"),
          Projector.byNameAs("l_returnflag", "flag2"))
        // (okey, line_no) is NOT unique in the fixture (duplicate line rows
        // with differing attributes) — extend the ORDER BY until total, or
        // cross-engine sort stability decides row order. Same fix in
        // q02/q03/q19/q20/q60.
        li.proj(p).orderBy(col("okey").asc, col("line_no").asc,
          col("qty").asc, col("flag1").asc)
      },
      Some("""SELECT l_orderkey AS okey, l_linenumber AS line_no, l_quantity AS qty,
             |       l_returnflag AS flag1, l_returnflag AS flag2
             |FROM lineitem ORDER BY okey ASC, line_no ASC, qty ASC, flag1 ASC""".stripMargin),
      "projection: reorder/rename/duplicate columns, by name and by position"),

    // ------------------------------------------------------------------
    // q02: selection with a full predicate set (range, between, IN).
    GQuery(
      "q02_filter",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.sel(
            col("l_shipdate") >= ntzLit("1996-01-01") &&
              col("l_shipdate") < ntzLit("1997-01-01") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24 &&
              col("l_returnflag").isin("A", "N"))
          .select(col("l_orderkey").as("okey"), col("l_linenumber").as("line_no"),
            col("l_extendedprice").as("price"), col("l_returnflag").as("flag"))
          .orderBy(col("okey").asc, col("line_no").asc,
            col("price").asc, col("flag").asc)
      },
      Some("""SELECT l_orderkey AS okey, l_linenumber AS line_no,
             |       l_extendedprice AS price, l_returnflag AS flag
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07
             |  AND l_quantity < 24
             |  AND l_returnflag IN ('A','N')
             |ORDER BY okey ASC, line_no ASC, price ASC, flag ASC""".stripMargin),
      "filter: timestamp range + between + comparison + IN, pushed to the scan"),

    // ------------------------------------------------------------------
    // q03: cast family — ToStr parity (reference src/expression/convert.rs,
    // minus its bugs: SURVEY.md §2.8) plus general CastExpr semantics.
    GQuery(
      "q03_cast",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.select(
            col("l_orderkey").as("okey"),
            col("l_linenumber").as("line_no"),
            col("l_orderkey").cast("string").as("okey_str"),
            col("l_linenumber").cast("string").as("lineno_str"),
            col("l_quantity").cast("long").as("qty_int"),
            (col("l_discount") > 0.05).cast("string").as("bigdisc_str"))
          .orderBy(col("okey").asc, col("line_no").asc,
            col("qty_int").asc, col("bigdisc_str").asc)
      },
      Some("""SELECT l_orderkey AS okey, l_linenumber AS line_no,
             |       CAST(l_orderkey AS VARCHAR) AS okey_str,
             |       CAST(l_linenumber AS VARCHAR) AS lineno_str,
             |       CAST(trunc(l_quantity) AS BIGINT) AS qty_int,
             |       CAST(l_discount > 0.05 AS VARCHAR) AS bigdisc_str
             |FROM lineitem ORDER BY okey ASC, line_no ASC, qty_int ASC, bigdisc_str ASC""".stripMargin),
      "casts: int→string, double→long (truncating), bool→string"),

    // ------------------------------------------------------------------
    // q04: hash group-by aggregation (TPC-H Q1 shape). Partial aggregation
    // (map-side combine) happens automatically in HashAggregateExec, so at
    // 100 TB the shuffle carries one row per (group × partition), not per
    // input row.
    GQuery(
      "q04_agg_groupby",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.groupBy(col("l_returnflag").as("flag"), col("l_linestatus").as("status"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            // exact decimal sum internally; DOUBLE at the output boundary
            // (OutputPolicy: the driver stringifies Decimal vs float)
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
            count(lit(1)).as("n"),
            (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            min(col("l_shipdate")).as("min_ship"),
            max(col("l_shipdate")).as("max_ship"))
          .orderBy(col("flag").asc, col("status").asc)
      },
      Some("""SELECT l_returnflag AS flag, l_linestatus AS status,
             |       SUM(l_quantity) AS sum_qty,
             |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |       COUNT(*) AS n,
             |       SUM(l_quantity) / COUNT(*) AS avg_qty,
             |       MIN(l_shipdate) AS min_ship,
             |       MAX(l_shipdate) AS max_ship
             |FROM lineitem GROUP BY 1, 2 ORDER BY flag ASC, status ASC""".stripMargin),
      "group-by agg: sum/count/avg/min/max with decimal-exact money sums"),

    // ------------------------------------------------------------------
    // q05: distinct aggregates. countDistinct plans as a two-phase expand +
    // aggregate; at scale the pre-aggregation on (group, value) bounds the
    // shuffle by distinct values, not rows.
    GQuery(
      "q05_agg_distinct",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.groupBy(col("l_returnflag").as("flag"))
          .agg(
            countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(col("l_partkey")).as("n_part"),
            sum_distinct(col("l_quantity")).as("sum_dist_qty"))
          .orderBy(col("flag").asc)
      },
      Some("""SELECT l_returnflag AS flag,
             |       COUNT(DISTINCT l_suppkey) AS n_supp,
             |       COUNT(DISTINCT l_partkey) AS n_part,
             |       SUM(DISTINCT l_quantity) AS sum_dist_qty
             |FROM lineitem GROUP BY 1 ORDER BY flag ASC""".stripMargin),
      "distinct aggregates: count(distinct), sum(distinct)"),

    // ------------------------------------------------------------------
    // q06: approximate distinct (HLL++). Sketches merge associatively, so
    // this is single-shuffle at any scale. The raw estimate is
    // engine-specific (DuckDB's HLL ≠ Spark's HLL++), so the gated OUTPUT
    // is the deterministic projection (VERDICT r4): the exact distinct
    // counts plus booleans asserting the estimate landed within 3·rsd
    // (rsd=0.05 → ±15%) — the sketch still runs in this plan and decides
    // the booleans; DuckDB recomputes the exact side and expects all-true.
    // Companion q70 gates the tighter rsd=0.02 config on a different
    // grouping; raw-estimate inspection lives in ScalaTest.
    GQuery(
      "q06_agg_approx",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val approx = li.groupBy(col("l_linestatus").as("status"))
          .agg(approx_count_distinct(col("l_orderkey"), 0.05).as("a_orders"),
            approx_count_distinct(col("l_suppkey"), 0.05).as("a_supps"))
        val exact = li.groupBy(col("l_linestatus").as("status"))
          .agg(countDistinct(col("l_orderkey")).as("exact_orders"),
            countDistinct(col("l_suppkey")).as("exact_supps"))
        approx.join(exact, "status")
          .select(col("status"), col("exact_orders"), col("exact_supps"),
            (abs(col("a_orders") - col("exact_orders")) <= col("exact_orders") * 0.15)
              .as("orders_ok"),
            (abs(col("a_supps") - col("exact_supps")) <= col("exact_supps") * 0.15)
              .as("supps_ok"))
          .orderBy(col("status").asc)
      },
      Some("""SELECT l_linestatus AS status,
             |       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
             |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
             |       true AS orders_ok, true AS supps_ok
             |FROM lineitem GROUP BY 1 ORDER BY status ASC""".stripMargin),
      "approx_count_distinct (HLL++), mergeable sketch, error-bound gated"),

    // ------------------------------------------------------------------
    // q07/q08: rollup & cube (SURVEY.md §2.4): Expand node multiplies rows by
    // grouping-set count before the single aggregation shuffle.
    GQuery(
      "q07_rollup",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"),
            grouping(col("l_returnflag")).cast("int").as("g_flag"),
            grouping(col("l_linestatus")).cast("int").as("g_status"))
          .select(col("l_returnflag").as("flag"), col("l_linestatus").as("status"),
            col("n"), col("sum_qty"), col("g_flag"), col("g_status"))
          .orderBy(col("flag").asc_nulls_first, col("status").asc_nulls_first)
      },
      Some("""SELECT l_returnflag AS flag, l_linestatus AS status,
             |       COUNT(*) AS n, SUM(l_quantity) AS sum_qty,
             |       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
             |       CAST(GROUPING(l_linestatus) AS INT) AS g_status
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY flag ASC NULLS FIRST, status ASC NULLS FIRST""".stripMargin),
      "rollup with grouping() indicators"),

    GQuery(
      "q08_cube",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.cube(col("l_returnflag").as("flag"), col("l_linestatus").as("status"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("flag").asc_nulls_first, col("status").asc_nulls_first)
      },
      Some("""SELECT l_returnflag AS flag, l_linestatus AS status,
             |       COUNT(*) AS n, SUM(l_quantity) AS sum_qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY flag ASC NULLS FIRST, status ASC NULLS FIRST""".stripMargin),
      "cube over two keys"),

    // ------------------------------------------------------------------
    // q09: explicit grouping sets.
    GQuery(
      "q09_grouping_sets",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("g_lineitem")
        s.sql("""SELECT l_returnflag AS flag, l_linestatus AS status,
                |       COUNT(*) AS n, SUM(l_quantity) AS sum_qty
                |FROM g_lineitem
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                |ORDER BY flag ASC NULLS FIRST, status ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT l_returnflag AS flag, l_linestatus AS status,
             |       COUNT(*) AS n, SUM(l_quantity) AS sum_qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY flag ASC NULLS FIRST, status ASC NULLS FIRST""".stripMargin),
      "explicit GROUPING SETS"),

    // ------------------------------------------------------------------
    // q10: star join — fact-to-fact shuffle join (orders⋈lineitem) plus
    // broadcast dimensions (customer is small relative to facts here we
    // broadcast nation only; customer⋈orders shuffles on the key).
    GQuery(
      "q10_join_inner",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        // revenue in exact decimal: price(18,2) × (1 − disc(4,2)) is an exact
        // decimal product on both engines, so group sums are order-free.
        val revenue = (dec(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(4, 2)) - col("l_discount").cast(DecimalType(4, 2))))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .thetaJoin(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"))
          // decimal sum internally (order-free); DOUBLE at the output
          // boundary (OutputPolicy)
          .agg(sum(revenue).cast("double").as("revenue"), count(lit(1)).as("n_items"))
          .orderBy(col("nation").asc)
      },
      Some("""SELECT n_name AS nation,
             |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
             |       COUNT(*) AS n_items
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |GROUP BY 1 ORDER BY nation ASC""".stripMargin),
      "star join: two shuffle joins + broadcast dim, decimal-exact revenue"),

    // ------------------------------------------------------------------
    // q11: left outer join, preserving customers without orders.
    GQuery(
      "q11_join_left",
      (s, d) => {
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        c.thetaJoin(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey").as("custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"),
            coalesce(sum(dec(col("o_totalprice"))), lit(0).cast(DecimalType(18, 2)))
              .cast("double").as("total"))
          .orderBy(col("custkey").asc)
      },
      Some("""SELECT c_custkey AS custkey, COUNT(o_orderkey) AS n_orders,
             |       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY 1 ORDER BY custkey ASC""".stripMargin),
      "left outer join + null-aware aggregation"),

    // ------------------------------------------------------------------
    // q12/q13: semi / anti joins (EXISTS / NOT EXISTS). Plan as
    // Shuffled/BroadcastHashJoin with LeftSemi/LeftAnti — the right side
    // deduplicates during the build, no row multiplication.
    GQuery(
      "q12_join_semi",
      (s, d) => {
        val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("c_custkey"))
        Tables.customer(s, d)
          .semiJoin(o, Seq("c_custkey"))
          .select(col("c_custkey").as("custkey"), col("c_name").as("name"))
          .orderBy(col("custkey").asc)
      },
      Some("""SELECT c_custkey AS custkey, c_name AS name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
             |ORDER BY custkey ASC""".stripMargin),
      "left semi join (EXISTS)"),

    GQuery(
      "q13_join_anti",
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
        Tables.customer(s, d)
          .antiJoin(o, Seq("c_custkey"))
          .select(col("c_custkey").as("custkey"), col("c_name").as("name"))
          .orderBy(col("custkey").asc)
      },
      Some("""SELECT c_custkey AS custkey, c_name AS name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY custkey ASC""".stripMargin),
      "left anti join (NOT EXISTS)"),

    // ------------------------------------------------------------------
    // q14: theta join — equi conjunct on the nation key keeps it a hash join
    // (the inequality is a post-join filter in the hash join), so it scales;
    // a pure-inequality join would be nested-loop.
    GQuery(
      "q14_join_theta",
      (s, d) => {
        val sup = Tables.supplier(s, d)
        val c = Tables.customer(s, d)
        sup.thetaJoin(c,
            col("s_nationkey") === col("c_nationkey") && col("c_acctbal") > col("s_acctbal"))
          .groupBy(col("s_suppkey").as("suppkey"))
          .agg(count(lit(1)).as("n_richer_customers"))
          .orderBy(col("suppkey").asc)
      },
      Some("""SELECT s_suppkey AS suppkey, COUNT(*) AS n_richer_customers
             |FROM supplier JOIN customer
             |  ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
             |GROUP BY 1 ORDER BY suppkey ASC""".stripMargin),
      "theta join: equi conjunct + inequality residual"),

    // ------------------------------------------------------------------
    // q15: cross join (tiny × tiny only — at scale a cross join is always a
    // design smell unless one side is a handful of rows; plans as
    // BroadcastNestedLoopJoin here).
    GQuery(
      "q15_join_cross",
      (s, d) => {
        val r = Tables.region(s, d)
        val n = Tables.nation(s, d)
        r.crossJoin(broadcast(n))
          .select(col("r_name").as("region"), col("n_name").as("nation"))
          .orderBy(col("region").asc, col("nation").asc)
      },
      Some("""SELECT r_name AS region, n_name AS nation FROM region CROSS JOIN nation
             |ORDER BY region ASC, nation ASC""".stripMargin),
      "cross join of dimensions"),

    // ------------------------------------------------------------------
    // q16: full outer join of two aggregates.
    GQuery(
      "q16_join_full",
      (s, d) => {
        val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("nk"))
          .agg(count(lit(1)).as("n_cust"))
        val sup = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk"))
          .agg(count(lit(1)).as("n_supp"))
        c.equiJoin(sup, Seq("nk"), "full")
          .select(col("nk").as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy(col("nationkey").asc_nulls_first)
      },
      Some("""SELECT COALESCE(c.nk, s.nk) AS nationkey,
             |       COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
             |FROM (SELECT c_nationkey nk, COUNT(*) n_cust FROM customer GROUP BY 1) c
             |FULL JOIN (SELECT s_nationkey nk, COUNT(*) n_supp FROM supplier GROUP BY 1) s
             |  ON c.nk = s.nk
             |ORDER BY nationkey ASC NULLS FIRST""".stripMargin),
      "full outer join"),

    // ------------------------------------------------------------------
    // q17: as-of join (§7.4 hard part): each purchase event enriched with the
    // latest prior click of the same user. Union+window implementation —
    // one shuffle, no row explosion (see graft.ops.AsOfJoin).
    GQuery(
      "q17_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value"), col("event_id"))
        AsOfJoin.backward(purchases, clicks,
            leftKey = "user_id", rightKey = "user_id",
            leftTime = "ts", rightTime = "ts",
            rightValues = Seq("value"), rightTiebreak = "event_id")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("asof_value"), col("asof_time"))
          .orderBy(col("event_id").asc)
      },
      Some(asofEventsOracleSql),
      "as-of join via union+window (single shuffle, no explosion)"),

    // ------------------------------------------------------------------
    // q174: the SKEW-RESISTANT as-of tier (VERDICT r4 #8). Same semantics
    // and the same oracle as q17/q47, but windowed by (key, 1-day time
    // bucket) with a per-bucket summary carry — a hot key splits across
    // ~30 bounded partitions instead of one giant one. Three as-of tiers
    // now share one oracle: union+window (q17), custom
    // Strategy/Exec (q47), bucketed two-level scan (q174).
    GQuery(
      "q174_asof_bucketed",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value"), col("event_id"))
        AsOfJoin.backwardBucketed(purchases, clicks,
            leftKey = "user_id", rightKey = "user_id",
            leftTime = "ts", rightTime = "ts",
            rightValues = Seq("value"), rightTiebreak = "event_id",
            bucketSeconds = 86400L)
          .select(col("event_id"), col("user_id"), col("ts"),
            col("asof_value"), col("asof_time"))
          .orderBy(col("event_id").asc)
      },
      Some(asofEventsOracleSql),
      "skew-resistant as-of: (key, time-bucket) windows + per-bucket carry summary"),

    // ------------------------------------------------------------------
    // q18: ranking window functions. Two windows: a unique total order for
    // row_number/ntile (determinism), a tied order for rank/dense_rank.
    GQuery(
      "q18_window_rank",
      (s, d) => {
        val li = Tables.lineitem(s, d).filter(col("l_quantity") >= 45)
        val wUnique = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_quantity").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        val wTied = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_quantity").desc)
        li.select(
            col("l_returnflag").as("flag"),
            col("l_orderkey").as("okey"), col("l_linenumber").as("line_no"),
            col("l_quantity").as("qty"),
            row_number().over(wUnique).as("rn"),
            rank().over(wTied).as("rk"),
            dense_rank().over(wTied).as("drk"),
            ntile(4).over(wUnique).as("quartile"))
          .orderBy(col("flag").asc, col("rn").asc)
      },
      // Spark ranking windows return int32; DuckDB returns int64 — cast.
      Some("""SELECT l_returnflag AS flag, l_orderkey AS okey, l_linenumber AS line_no,
             |       l_quantity AS qty,
             |       CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
             |         ORDER BY l_quantity DESC, l_orderkey ASC, l_linenumber ASC) AS INTEGER) AS rn,
             |       CAST(RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS INTEGER) AS rk,
             |       CAST(DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS INTEGER) AS drk,
             |       CAST(NTILE(4) OVER (PARTITION BY l_returnflag
             |         ORDER BY l_quantity DESC, l_orderkey ASC, l_linenumber ASC) AS INTEGER) AS quartile
             |FROM lineitem WHERE l_quantity >= 45
             |ORDER BY flag ASC, rn ASC""".stripMargin),
      "ranking windows: row_number/rank/dense_rank/ntile"),

    // ------------------------------------------------------------------
    // q19: analytic window functions + running row frame.
    GQuery(
      "q19_window_analytic",
      (s, d) => {
        val li = Tables.lineitem(s, d).filter(col("l_suppkey") <= 10)
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        li.select(
            col("l_suppkey").as("suppkey"),
            col("l_orderkey").as("okey"), col("l_linenumber").as("line_no"),
            col("l_quantity").as("qty"),
            lag(col("l_quantity"), 1).over(w).as("prev_qty"),
            lead(col("l_quantity"), 1).over(w).as("next_qty"),
            first(col("l_quantity")).over(wRun).as("first_qty"),
            sum(col("l_quantity")).over(wRun).as("running_qty"))
          .orderBy(col("suppkey").asc, col("okey").asc, col("line_no").asc,
            col("running_qty").asc)
      },
      Some("""SELECT l_suppkey AS suppkey, l_orderkey AS okey, l_linenumber AS line_no,
             |       l_quantity AS qty,
             |       LAG(l_quantity, 1) OVER w AS prev_qty,
             |       LEAD(l_quantity, 1) OVER w AS next_qty,
             |       FIRST_VALUE(l_quantity) OVER
             |         (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_qty,
             |       SUM(l_quantity) OVER
             |         (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
             |FROM lineitem WHERE l_suppkey <= 10
             |WINDOW w AS (PARTITION BY l_suppkey
             |             ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC)
             |ORDER BY suppkey ASC, okey ASC, line_no ASC, running_qty ASC""".stripMargin),
      "analytic windows: lag/lead/first + running sum over row frame"),

    // ------------------------------------------------------------------
    // q20: RANGE frame over a numeric ordering (value-based window).
    GQuery(
      "q20_window_range",
      (s, d) => {
        val li = Tables.lineitem(s, d).filter(col("l_suppkey") <= 5)
        val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_quantity").asc)
          .rangeBetween(-5, 0)
        li.select(
            col("l_suppkey").as("suppkey"),
            col("l_orderkey").as("okey"), col("l_linenumber").as("line_no"),
            col("l_quantity").as("qty"),
            sum(col("l_quantity")).over(w).as("range_sum"),
            count(lit(1)).over(w).as("range_n"))
          .orderBy(col("suppkey").asc, col("okey").asc, col("line_no").asc,
            col("qty").asc)
      },
      Some("""SELECT l_suppkey AS suppkey, l_orderkey AS okey, l_linenumber AS line_no,
             |       l_quantity AS qty,
             |       SUM(l_quantity) OVER w AS range_sum,
             |       COUNT(*) OVER w AS range_n
             |FROM lineitem WHERE l_suppkey <= 5
             |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_quantity ASC
             |             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
             |ORDER BY suppkey ASC, okey ASC, line_no ASC, qty ASC""".stripMargin),
      "value-range window frame"),

    // ------------------------------------------------------------------
    // q21: global sort + limit + offset (top-k). Plans as
    // TakeOrderedAndProject: per-partition top-k heap, driver merges k rows.
    GQuery(
      "q21_sort_limit",
      (s, d) => {
        Tables.orders(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .offset(5).limit(10)
          .select(col("o_orderkey").as("okey"), col("o_totalprice").as("total"))
      },
      Some("""SELECT o_orderkey AS okey, o_totalprice AS total FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10 OFFSET 5""".stripMargin),
      "top-k with offset (TakeOrderedAndProject)"),

    // ------------------------------------------------------------------
    // q22–q25: set operations (SURVEY.md §2.7).
    GQuery(
      "q22_union",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nk"))
        val sup = Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nk"))
        c.unionByName(sup).groupBy(col("nk")).agg(count(lit(1)).as("n"))
          .orderBy(col("nk").asc)
      },
      Some("""SELECT nk, COUNT(*) AS n FROM (
             |  SELECT c_nationkey AS nk FROM customer
             |  UNION ALL SELECT s_nationkey AS nk FROM supplier)
             |GROUP BY nk ORDER BY nk ASC""".stripMargin),
      "union all + aggregation"),

    GQuery(
      "q23_intersect",
      (s, d) => {
        val c = Tables.customer(s, d)
          .filter(col("c_acctbal") > 9000).select(col("c_nationkey").as("nk"))
        val sup = Tables.supplier(s, d)
          .filter(col("s_acctbal") > 5000).select(col("s_nationkey").as("nk"))
        c.intersect(sup).orderBy(col("nk").asc)
      },
      Some("""SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
             |INTERSECT
             |SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 5000
             |ORDER BY nk ASC""".stripMargin),
      "intersect (distinct)"),

    GQuery(
      "q24_except",
      (s, d) => {
        val n = Tables.nation(s, d).select(col("n_nationkey").as("nk"))
        val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
        n.exceptAll(sup.distinct()).orderBy(col("nk").asc)
      },
      Some("""SELECT n_nationkey AS nk FROM nation
             |EXCEPT ALL
             |SELECT DISTINCT s_nationkey AS nk FROM supplier
             |ORDER BY nk ASC""".stripMargin),
      "except all vs distinct right side"),

    GQuery(
      "q25_distinct",
      (s, d) => {
        Tables.lineitem(s, d)
          .select(col("l_returnflag").as("flag"), col("l_linestatus").as("status"))
          .distinct()
          .orderBy(col("flag").asc, col("status").asc)
      },
      Some("""SELECT DISTINCT l_returnflag AS flag, l_linestatus AS status
             |FROM lineitem ORDER BY flag ASC, status ASC""".stripMargin),
      "distinct projection"),
  )
}
