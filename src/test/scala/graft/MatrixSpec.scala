package graft

import org.apache.spark.sql.functions._

import graft.expressions.GramAggregate
import graft.sources.Tables

/** Specs for q160/q161: GramAggregate exactness (incl. the merge path),
  * the one-buffer-per-partition plan shape, and the power-iteration
  * normalization + eigen-alignment laws.
  */
class MatrixSpec extends SparkTestBase {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("GramAggregate computes the exact upper triangle across merges") {
    val vecs = Seq(
      Array(1L, 2L, 3L),
      Array(-4L, 5L, 0L),
      Array(7L, -1L, 2L))
    // force multiple partitions so partial buffers must merge
    val df = spark.createDataset(vecs).repartition(3).toDF("qv")
    val out = df.agg(GramAggregate(col("qv"), 3).as("g"))
      .select(posexplode(col("g")).as(Seq("t", "gram")))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expected = for (i <- 0 until 3; j <- i until 3)
      yield GramAggregate.triIndex(3, i, j) -> vecs.map(v => v(i) * v(j)).sum
    expected.foreach { case (t, g) =>
      assert(out(t) === g, s"cell $t: got ${out(t)}, want $g")
    }
    assert(out.size === 6)
  }

  test("GramAggregate fails fast on null vector components") {
    val df = spark.createDataset(Seq(1))(org.apache.spark.sql.Encoders.scalaInt)
      .toDF("one")
      .select(array(lit(1L), lit(null).cast("long"), lit(3L)).as("qv"))
    val ex = intercept[Exception] {
      df.agg(GramAggregate(col("qv"), 3).as("g")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("q160 matches a naive per-cell recompute and aggregates with object-hash buffers") {
    val out = q("q160_gram_matrix")
    val rows = out.collect()
    assert(rows.length === 64 * 65 / 2)
    val n = rows.head.getLong(3)
    assert(n === Tables.embeddings(spark, sf).count())
    // diagonal cells are sums of squares — nonnegative
    rows.filter(r => r.getInt(0) == r.getInt(1))
      .foreach(r => assert(r.getLong(2) >= 0L))
    // naive recompute of two cells straight off the embedding column
    val naive = Tables.embeddings(spark, sf)
      .select(
        sum(pow(floor(element_at(col("embedding"), 1).cast("double") * 1000), 2)
          .cast("long")).as("g00"),
        sum((floor(element_at(col("embedding"), 1).cast("double") * 1000) *
          floor(element_at(col("embedding"), 2).cast("double") * 1000))
          .cast("long")).as("g01"))
      .head()
    val byIj = rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(byIj((0, 0)) === naive.getLong(0))
    assert(byIj((0, 1)) === naive.getLong(1))
    // plan: the matrix is ONE TypedImperativeAggregate (ObjectHashAggregate
    // partial+final), not an exploded pair join
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("q161 power iteration: L-inf normalized, deterministic, eigen-aligned") {
    val v = q("q161_pca_power").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(v.size === 64)
    assert(v.values.map(math.abs).max === 1000L,
      "normalization must pin max|v| to the fixed-point scale")
    // deterministic across runs
    val v2 = q("q161_pca_power").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(v === v2)
    // eigen-alignment: cos(v, Gv) near 1 after the fixed rounds (exact
    // BigInt arithmetic on the gated gram cells — no doubles until the
    // final cosine)
    val tri = q("q160_gram_matrix").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> BigInt(r.getLong(2))).toMap
    def gcell(i: Int, j: Int): BigInt = if (i <= j) tri((i, j)) else tri((j, i))
    val vv = (0 until 64).map(i => BigInt(v(i)))
    val gv = (0 until 64).map(i => (0 until 64).map(j => gcell(i, j) * vv(j)).sum)
    val dot = (0 until 64).map(i => vv(i) * gv(i)).sum
    val cos = dot.toDouble /
      (math.sqrt(vv.map(x => x * x).sum.toDouble) * math.sqrt(gv.map(x => x * x).sum.toDouble))
    assert(cos > 0.98, s"after ${6} rounds cos(v, Gv) = $cos — not aligned")
  }
}
