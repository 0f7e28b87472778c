package graft

import org.apache.spark.sql.functions._

import graft.queries.IndexStatsQueries
import graft.sources.Tables

/** Specs for q151–q154: the JL distortion bound and shuffle-free plan, the
  * equi-depth ±1 law, bitmap==scan agreement, and the entropy quantizer
  * margin + information-theoretic bounds.
  */
class IndexStatsSpec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q151 projection preserves norms within JL distortion and never shuffles the data pass") {
    val out = q("q151_jl_projection")
    val yNorm = (0 until 16).map(j => col(f"y$j%02d") * col(f"y$j%02d")).reduce(_ + _)
    val xNorm = (0 until 64).map(i =>
      element_at(col("embedding"), i + 1).cast("double") *
        element_at(col("embedding"), i + 1).cast("double")).reduce(_ + _)
    val joined = out.withColumn("y2", yNorm).select("vec_id", "y2")
      .join(Tables.embeddings(spark, sf).withColumn("x2", xNorm)
        .select("vec_id", "x2"), Seq("vec_id"))
    // E[||y||^2] = ||x||^2; k=16 gives sd ~ sqrt(2/16) ~ 0.35 per vector —
    // the MEAN ratio over the dataset must sit tight around 1
    val mean = joined.agg(avg(col("y2") / col("x2"))).head().getDouble(0)
    assert(mean > 0.8 && mean < 1.2, s"mean norm ratio $mean")
    // row-local map: the only exchange in the plan is the final sort's
    // range partitioning — a hash exchange would mean the projection
    // itself shuffled
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("hashpartitioning"), s"projection shuffled:\n$plan")
  }

  test("q151 sign matrix is deterministic and balanced-ish") {
    val signs = for (i <- 0 until 64; j <- 0 until 16) yield IndexStatsQueries.jlSign(i, j)
    assert(signs.forall(s => s == 1 || s == -1))
    val pos = signs.count(_ == 1)
    // 1024 fair coin flips: 3-sigma band ~ 512 +- 48
    assert(pos > 440 && pos < 584, s"suspiciously unbalanced sign matrix: $pos")
    assert(IndexStatsQueries.jlSign(3, 7) === IndexStatsQueries.jlSign(3, 7))
  }

  test("q152 equi-depth law: bucket sizes within 1, cover all rows, ordered ranges") {
    val rows = q("q152_equidepth_histogram").collect()
    assert(rows.length === 16)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"not equi-depth: ${sizes.toSeq}")
    val n = Tables.orders(spark, sf).count()
    assert(sizes.sum === n)
    // bucket value ranges must be non-overlapping and sorted (lo<=hi, and
    // the next bucket starts at or after this bucket's hi)
    rows.sortBy(_.getLong(0)).sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) <= a.getLong(3))
        assert(a.getLong(3) <= b.getLong(2))
      case _ =>
    }
  }

  test("q153 bitmap popcount agrees with the direct scan count") {
    val r = q("q153_bitmap_index").select("bitmap_count", "direct_count").head()
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(0) > 0, "fixture should have F+1-URGENT orders")
  }

  test("q153 bitmap words cover exactly the predicate keys") {
    val words = q("q153_bitmap_index").select("word_id", "w_status").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keys = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    keys.foreach { k =>
      val w = words.getOrElse(k / 32, 0L)
      assert(((w >> (k % 32).toInt) & 1L) === 1L, s"key $k missing from bitmap")
    }
    val popTotal = words.values.map(java.lang.Long.bitCount(_).toLong).sum
    assert(popTotal === keys.size, "bitmap has phantom bits")
  }

  test("q154 entropy bounds: 0 <= H <= log2(n_distinct), and the quantizer margin is safe") {
    q("q154_entropy_quality").collect().foreach { r =>
      val (nd, h) = (r.getLong(2), r.getLong(3))
      assert(h >= 0L)
      val bound = math.ceil(1e9 * math.log(nd.toDouble) / math.log(2.0)).toLong
      assert(h <= bound, s"entropy above log2(distinct): $r")
    }
    // margin of every per-term value to its floor boundary (q148 pattern)
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val counts = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    val perDoc = counts.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
    val raw = lit(1000000000.0) *
      (col("c").cast("double") / col("n")) *
      log2(col("n").cast("double") / col("c"))
    // exactly-integral terms (n/c a power of two: both engines' log2 is
    // bit-exact there, verified) are boundary-SAFE; the fragile case is a
    // non-integral term CLOSE to a boundary — require margin on those
    val margin = counts.join(perDoc, Seq("doc_id"))
      .filter(col("c") =!= col("n")) // single-token docs: term is exactly 0
      .select(least(raw - floor(raw), floor(raw) + 1 - raw).as("m"))
      .filter(col("m") > 0.0)
      .agg(min(col("m"))).head().getDouble(0)
    assert(margin > 1e-6, s"entropy quantizer margin $margin too tight")
  }
}
