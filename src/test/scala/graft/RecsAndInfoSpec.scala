package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Specs for q170/q171: recommendation laws (freshness, score recompute,
  * rank contiguity) and information-theoretic laws (Gibbs nonnegativity of
  * the full divergence, quantizer boundary margin).
  */
class RecsAndInfoSpec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q170 recommends only unowned parts with exact co-occurrence scores") {
    val recs = q("q170_copurchase_recs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(recs.nonEmpty)
    assert(recs.map(_._1).distinct.length === 5, "must target exactly 5 customers")
    // rank contiguity per customer: 1..k with no gaps
    recs.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._4).sorted.toSeq === (1 to g.length).toSeq)
    }
    val purch = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    recs.foreach { case (c, p, _, _) =>
      assert(!purch.contains((c, p)), s"customer $c recommended already-owned part $p")
    }
    // exact score recompute for one customer: sum of pair supports from
    // owned parts to the recommended part
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byBasket = items.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def support(a: Long, b: Long): Long =
      byBasket.values.count(s => s.contains(a) && s.contains(b)).toLong
    val c0 = recs.head._1
    val owned0 = purch.filter(_._1 == c0).map(_._2)
    recs.filter(_._1 == c0).foreach { case (_, p, score, _) =>
      val exp = owned0.toSeq.map { o =>
        val s0 = support(o, p)
        if (s0 >= 2) s0 else 0L // the graph floors support at 2
      }.sum
      assert(score === exp, s"customer $c0 part $p: score $score, recomputed $exp")
    }
  }

  test("q171 full divergence is nonnegative and every term clears the quantizer boundary") {
    val toks = Tables.documents(spark, sf)
      .select(col("lang"), explode(TF.tokens(col("text"))).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val cp = toks.filter(_._1 == "en").groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cq = toks.filter(_._1 != "en").groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val vocab = (cp.keySet ++ cq.keySet)
    val (np, nq, v) = (cp.values.sum, cq.values.sum, vocab.size.toLong)
    val terms = cp.map { case (t, c) =>
      val qc = cq.getOrElse(t, 0L)
      (c.toDouble / np) * (math.log((c * (nq + v)).toDouble / ((qc + 1) * np)) / math.log(2.0)) * 1e9
    }
    // Gibbs: D(P || smoothed Q) can only go negative through the add-1
    // mass inflation, and only slightly; the fixture sits clearly positive
    assert(terms.sum > 0, s"total KL_fp = ${terms.sum}")
    // margin: no term may sit on a floor boundary (libm 1-ulp safety)
    val minEdge = terms.map { x =>
      val f = x - math.floor(x)
      math.min(f, 1.0 - f)
    }.min
    assert(minEdge > 1e-4, s"a KL term sits $minEdge from its floor boundary")
    // the gated top-20 really are the 20 largest quantized terms
    val out = q("q171_kl_divergence").collect().map(r => (r.getString(0), r.getLong(3)))
    val expTop = terms.map(x => math.floor(x).toLong).toSeq.sorted.reverse.take(20)
    assert(out.map(_._2).toSeq === expTop.toSeq)
  }
}
