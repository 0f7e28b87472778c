package graft

import org.apache.spark.sql.functions._

/** Invariants for the graph/temporal family (q118–q123) that the oracle
  * equality doesn't spell out.
  */
class GraphTemporalSpec extends SparkTestBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q118 triangles: participation mass is 3x the triangle count") {
    val rows = q("q118_triangle_count").collect()
    assert(rows.nonEmpty)
    val mass = rows.map(_.getLong(1)).sum
    assert(mass % 3 == 0, s"participation mass $mass not divisible by 3")
    rows.foreach(r => assert(r.getLong(1) >= 1))
  }

  test("q119 scd2: exactly one current version per key, closed rows precede it") {
    val rows = q("q119_scd2_merge").collect()
    val byKey = rows.groupBy(_.getLong(0))
    byKey.foreach { case (k, vs) =>
      assert(vs.count(_.getBoolean(4)) == 1, s"custkey $k: != 1 current row")
      vs.filter(!_.getBoolean(4)).foreach { r =>
        assert(!r.isNullAt(3), s"custkey $k: closed row missing valid_to")
      }
      vs.filter(_.getBoolean(4)).foreach { r =>
        assert(r.isNullAt(3), s"custkey $k: current row has valid_to")
      }
      assert(vs.length <= 2)
    }
    // the merge emits dim + one extra row per updated key
    val nCust = graft.sources.Tables.customer(spark, sf).count()
    assert(rows.length >= nCust && byKey.size == nCust)
  }

  test("q120 concurrency: matches the naive one-partition global window") {
    // the distributed prefix sum must equal the shape it exists to replace
    val points = graft.sources.Tables.events(spark, sf)
      .select((graft.queries.epochSec(col("ts")) * 2 + 1).as("k"), lit(1L).as("delta"))
      .union(graft.sources.Tables.events(spark, sf)
        .select((graft.queries.epochSec(col("ts")) * 2 + 1200).as("k"), lit(-1L).as("delta")))
      .groupBy(col("k")).agg(sum(col("delta")).as("delta"))
    val naive = points
      .withColumn("concurrency", sum(col("delta")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("k").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(expr("k div 2").as("t_sec"), col("concurrency"))
      .orderBy(col("concurrency").desc, col("t_sec").asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = q("q120_max_concurrency")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == naive, s"prefix-sum concurrency != naive window:\n$got\n$naive")
    assert(got.head._2 >= 1)
  }

  test("q121 kn counts: type counts bounded by token counts, all positive") {
    q("q121_kn_continuation").collect().foreach { r =>
      assert(r.getLong(1) >= 1, s"gate emits only words with left contexts: $r")
      assert(r.getLong(1) <= r.getLong(3),
        s"distinct left contexts exceed bigram occurrences: $r")
    }
  }

  test("q122 collocations: floor respected, scores positive and sorted") {
    val rows = q("q122_collocations").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 5, s"hapax floor violated: $r")
      assert(r.getLong(3) > 0, s"non-positive pmi rank: $r")
    }
    val scores = rows.map(_.getLong(3)).toSeq
    assert(scores == scores.sorted.reverse, "not ordered by score")
  }

  test("q123 mad: outliers bounded, mad nonnegative, recomputed flags agree") {
    val rows = q("q123_mad_outliers").collect()
    assert(rows.length >= 1)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0)
      assert(r.getLong(4) <= r.getLong(3))
    }
  }
}
