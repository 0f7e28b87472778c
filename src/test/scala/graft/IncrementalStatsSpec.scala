package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Specs for q166–q169: the IVM refresh must not rescan the base, sliding
  * distinct equals the naive per-window recompute, and the regression /
  * Spearman statistics match exact BigInt recomputations and their
  * theoretical bounds.
  */
class IncrementalStatsSpec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q166 refresh plan reads ONLY the delta from parquet (base is the stored artifact)") {
    val out = q("q166_mv_merge")
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the base side was cut at the localCheckpoint (the persisted-MV
    // stand-in), so the refresh plan must contain exactly ONE parquet scan
    // of orders — the delta. Two scans = the refresh re-read the base.
    // count numbered node headers — the formatted explain prints each
    // node once in the tree and once in the detail section
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(plan).length
    assert(scans === 1, s"expected 1 parquet scan (delta only), got $scans:\n$plan")
    // and the merged view equals the full recompute (the IVM law)
    val full = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("spend_cents"))
    assert(out.select("o_custkey", "n_orders", "spend_cents")
      .exceptAll(full.select("o_custkey", "n_orders", "spend_cents")).isEmpty)
    assert(full.count() === out.count())
  }

  test("q167 sliding distinct equals the naive per-window recompute on an INDEPENDENT day set") {
    val out = q("q167_sliding_distinct").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val du = Tables.events(spark, sf)
      .select(floor(epochSecT(col("ts")) / 86400).cast("long").as("day"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    // expected day set derived from the DATA, not from the query output:
    // every day in [minDay, maxDay+?] whose trailing window is nonempty —
    // and nothing past the horizon (the phantom-day regression trap)
    val (minDay, maxDay) = (du.map(_._1).min, du.map(_._1).max)
    val naive = (minDay to maxDay).flatMap { wd =>
      val users = du.filter { case (day, _) => day >= wd - 6 && day <= wd }.map(_._2).distinct
      if (users.nonEmpty) Some(wd -> users.length.toLong) else None
    }.toMap
    assert(out === naive)
    assert(out.nonEmpty)
    assert(out.keys.max === maxDay, "output must stop at the data horizon")
  }

  private def epochSecT(c: org.apache.spark.sql.Column) =
    c.cast("timestamp").cast("long")

  test("q168 slope matches an exact BigInt recompute and the fixed-point contract") {
    val rows = q("q168_grouped_regression").collect()
    assert(rows.length === 25)
    val pts = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        (floor(epochSecT(col("o_orderdate")) / 86400).cast("long") - 9862L).as("x"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("y"))
      .collect().map(r => (r.getString(0), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    rows.foreach { r =>
      val (name, n, slope) = (r.getString(0), r.getLong(1), r.getLong(2))
      val g = pts.filter(_._1 == name)
      assert(g.size === n.toInt)
      val (sx, sy) = (g.map(_._2).sum, g.map(_._3).sum)
      val sxy = g.map(p => p._2 * p._3).sum
      val sxx = g.map(p => p._2 * p._2).sum
      val num = (BigInt(n) * sxy - sx * sy) * 1000000
      val den = BigInt(n) * sxx - sx * sx
      // BigInt / truncates toward zero — the same semantics as Spark's
      // `div` and DuckDB's integer `//`
      assert(BigInt(slope) === num / den, s"$name slope mismatch")
    }
  }

  test("q169 Spearman: exact recompute per nation and the rank-statistic bounds") {
    val rows = q("q169_spearman").collect()
    assert(rows.length === 25)
    rows.foreach { r =>
      val (n, d2) = (r.getLong(1), r.getLong(2))
      // Σd² for reversed ranks is (n³−n)/3 — the maximum possible
      assert(d2 >= 0 && d2 <= (n * n * n - n) / 3, s"${r.getString(0)}: Σd² out of range")
      val rho = 1.0 - 6.0 * d2 / (n * (n.toDouble * n - 1))
      assert(rho >= -1.0 && rho <= 1.0)
    }
    // exact recompute for one nation
    val name = rows.head.getString(0)
    val spend = Tables.orders(spark, sf).groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("sp"))
    val g = Tables.customer(spark, sf)
      .join(spend, col("c_custkey") === col("o_custkey"))
      .join(Tables.nation(spark, sf).filter(col("n_name") === name),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal"), col("sp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rb = g.sortBy(t => (t._2, t._1)).zipWithIndex.map { case (t, i) => t._1 -> (i + 1) }.toMap
    val rs = g.sortBy(t => (t._3, t._1)).zipWithIndex.map { case (t, i) => t._1 -> (i + 1) }.toMap
    val d2 = g.map(t => { val d = rb(t._1) - rs(t._1); d.toLong * d }).sum
    val row = rows.find(_.getString(0) == name).get
    assert(row.getLong(2) === d2, s"$name Σd² mismatch")
  }

  test("q180 EWMA equals a driver-side fold for every user (integer recurrence parity)") {
    val got = q("q180_ewma").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val events = Tables.events(spark, sf)
      .select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tsu"), // NTZ → µs, UTC session
        col("event_id"),
        expr("CAST(floor(value * 1000) AS BIGINT)").as("x"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    events.groupBy(_._1).foreach { case (uid, rows) =>
      val xs = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val want = xs.tail.foldLeft(xs.head)((acc, x) => (acc * 9) / 10 + x)
      val (n, ewma, last) = got(uid)
      assert(n == xs.length && ewma == want && last == xs.last,
        s"user $uid: got ($n,$ewma,$last) want (${xs.length},$want,${xs.last})")
    }
  }

  test("q181 CUSUM walk parity and changepoint index bounds") {
    val got = q("q181_cusum_shift").collect()
    assert(got.nonEmpty)
    val events = Tables.events(spark, sf)
      .select(col("user_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tsu"),
        col("event_id"),
        expr("CAST(floor(value * 1000) AS BIGINT)").as("x")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val mu = events.map(_._4).sum / events.length
    val byUser = events.groupBy(_._1)
    got.foreach { r =>
      val (uid, n, mx, mn, cp) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))
      val xs = byUser(uid).sortBy(e => (e._2, e._3)).map(_._4)
      val walk = xs.scanLeft(0L)(_ + _ - mu).tail
      assert(n == xs.length)
      assert(mx == walk.max && mn == walk.min, s"user $uid walk extremes")
      assert(cp == walk.indexOf(walk.max) + 1, s"user $uid cp_idx: first argmax")
    }
  }
}
