package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.queries.MiningQueries
import graft.sources.Tables

/** Specs for q157–q159: map-side basket pair generation equals the naive
  * pair self-join recompute, the distributed skyline satisfies the
  * dominance laws against a naive recompute, and the DQ audit reports
  * exact planted violation counts.
  */
class MiningSpec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q157 map-side pair generation == naive pair self-join recompute") {
    val out = q("q157_frequent_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // naive recompute via the corpus-sized pair self-join (the pre-r10 shape)
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val naive = items.as("a")
      .join(items.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 3)
      .orderBy(col("support").desc, col("p1").asc, col("p2").asc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === naive.toSeq)
    assert(out.nonEmpty)
    // downward closure holds on the output itself: every member of a
    // frequent pair is individually frequent
    val itemSup = items.groupBy(col("pk")).agg(count(lit(1)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (p1, p2, s) =>
      assert(itemSup(p1) >= s && itemSup(p2) >= s, s"closure violated for ($p1,$p2)")
    }
  }

  test("q158 skyline dominance laws vs naive recompute") {
    val sky = q("q158_skyline").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pts = Tables.orders(spark, sf)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("spend_cents"),
        max(floor(col("o_orderdate").cast("timestamp").cast("long") / 86400)
          .cast("long")).as("last_day"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominates(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
      a._2 >= b._2 && a._3 >= b._3 && (a._2 > b._2 || a._3 > b._3)
    val naive = pts.filter(p => !pts.exists(qq => dominates(qq, p)))
    assert(sky.toSet === naive.toSet)
    assert(sky.nonEmpty && sky.length < pts.length)
    // skyline shape: sorted by spend desc, last_day strictly increases
    // across DISTINCT spend values
    val distinctX = sky.groupBy(_._2).map { case (x, g) => (x, g.map(_._3).max) }
      .toSeq.sortBy(-_._1)
    distinctX.sliding(2).foreach {
      case Seq((_, d1), (_, d2)) => assert(d2 > d1, "frontier not strictly improving")
      case _ =>
    }
  }

  test("q159 audit is all-green on the fixture and counts planted violations exactly") {
    import spark.implicits._
    val fixture = q("q159_dq_audit").collect()
    assert(fixture.length === 6)
    fixture.foreach(r => assert(r.getAs[Int]("pass") === 1,
      s"fixture check ${r.getString(0)} red: $r"))

    // planted corpus: 2 bad-quantity rows (one null, one 99), 1 bad flag,
    // 1 orphan lineitem, duplicated order key, 1 orphan order
    val ts = Timestamp.valueOf("1995-01-01 00:00:00")
    val li = Seq[(Long, java.lang.Double, String)](
      (1L, 5.0, "A"), (1L, null, "N"), (2L, 99.0, "R"), (99L, 3.0, "X"))
      .toDF("l_orderkey", "l_quantity", "l_returnflag")
    val ord = Seq((1L, 10L, ts), (1L, 10L, ts), (2L, 77L, ts))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val cust = Seq(Tuple1(10L)).toDF("c_custkey")
    val audit = MiningQueries.dqAudit(li, ord, cust).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(audit("completeness_l_quantity") === ((1L, 4L, 0)))
    assert(audit("range_l_quantity") === ((1L, 4L, 0))) // null row is not a range violation
    assert(audit("domain_l_returnflag") === ((1L, 4L, 0)))
    assert(audit("uniqueness_o_orderkey") === ((1L, 3L, 0)))
    assert(audit("ref_lineitem_orders") === ((1L, 4L, 0)))
    assert(audit("ref_orders_customer") === ((1L, 3L, 0)))
  }

  test("q162 12-round peel reaches the 3-core fixpoint on the fixture") {
    val rows = q("q162_kcore").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    // min degree >= k IS the fixpoint condition: the next peel round would
    // keep every node, so the 12-round state is the true 3-core here
    assert(rows.map(_._2).min >= 3L, "peel did not converge within 12 rounds")
  }

  test("q163 weighted sample: valid members, heavy-weight bias, quantizer margin") {
    val sample = q("q163_weighted_sample").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sample.length === 20)
    assert(sample.map(_._1).distinct.length === 20, "sample must be without replacement")
    val weights = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sample.foreach { case (ck, w, _) =>
      assert(weights(ck) === w, s"sampled customer $ck carries a wrong weight")
    }
    // Efraimidis-Spirakis favors heavy keys: P[i in sample] ∝ monotone in w,
    // so the sample's mean weight must exceed the population's
    val sampleMean = sample.map(_._2).sum.toDouble / sample.length
    val popMean = weights.values.sum.toDouble / weights.size
    assert(sampleMean > popMean,
      s"weighted sample lighter than the population ($sampleMean <= $popMean)")
    // quantizer margin: the double chain ln(u)/w·1e9 must not sit on a
    // floor boundary anywhere in the population, or a 1-ulp libm skew
    // could flip a bucket cross-engine (q148/q154 discipline)
    val margins = weights.map { case (ck, w) =>
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ws#$ck".getBytes("UTF-8"))
      val hex = dig.map("%02x".format(_)).mkString.take(15)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / 1152921504606846976.0
      val s0 = math.log(u) / w.toDouble * 1e9
      math.abs(s0 - math.floor(s0) - 0.5) // distance from the cell center, max 0.5
    }
    val minEdge = margins.map(m => 0.5 - m).min // distance from nearest boundary
    assert(minEdge > 1e-6, s"a quantized key sits $minEdge from a floor boundary")
  }
}
