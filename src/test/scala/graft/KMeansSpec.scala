package graft

import org.apache.spark.sql.functions._
import graft.functions.{KMeans, Similarity}

class KMeansSpec extends SparkTestBase {

  private def blob(center: Array[Float], jitterSeed: Int): Array[Float] = {
    val rnd = new scala.util.Random(jitterSeed)
    center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f)
  }

  test("k-means recovers well-separated synthetic clusters") {
    import spark.implicits._
    val c1 = Array.tabulate(8)(i => if (i < 4) 1.0f else 0.0f)
    val c2 = Array.tabulate(8)(i => if (i >= 4) 1.0f else 0.0f)
    val rows = (0 until 30).map { i =>
      val center = if (i % 2 == 0) c1 else c2
      (i.toLong, blob(center, i))
    }
    val df = rows.toDF("vec_id", "embedding")
    val (assigned, centroids) = KMeans.fit(df, "vec_id", "embedding", k = 2, dims = 8, iterations = 5)
    val byCluster = assigned.collect()
      .groupBy(_.getInt(1)).map { case (c, rs) => c -> rs.map(_.getLong(0) % 2).toSet }
    // each cluster must be pure: all-even ids or all-odd ids
    assert(byCluster.size == 2)
    assert(byCluster.values.forall(_.size == 1))
    assert(centroids.count() == 2)
  }

  test("k-means is deterministic across runs") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    def run() = KMeans.fit(emb, "vec_id", "embedding", k = 4, dims = 64, iterations = 3)
      ._1.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(run() == run())
  }

  test("k-means plan depth is constant in iteration count (lineage truncated)") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    def depth(df: org.apache.spark.sql.DataFrame): Int = {
      def d(p: org.apache.spark.sql.catalyst.trees.TreeNode[_]): Int =
        if (p.children.isEmpty) 1
        else 1 + p.children.map(c => d(c.asInstanceOf[org.apache.spark.sql.catalyst.trees.TreeNode[_]])).max
      d(df.queryExecution.analyzed)
    }
    val d2 = depth(KMeans.fit(emb, "vec_id", "embedding", k = 4, dims = 64, iterations = 2)._2)
    val d8 = depth(KMeans.fit(emb, "vec_id", "embedding", k = 4, dims = 64, iterations = 8)._2)
    assert(d2 == d8, s"centroid plan depth grew with iterations: $d2 -> $d8")
    assert(d8 <= 3, s"centroid plan not truncated (depth $d8)")
  }

  test("IVF over learned k-means cells returns true cosines") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val (assigned, _) = KMeans.fit(emb, "vec_id", "embedding", k = 4, dims = 64, iterations = 2)
    val cells = emb.join(assigned, "vec_id")
    val queries = cells.filter(col("vec_id") < 3)
    val out = Similarity.ivfTopK(cells, queries, "vec_id", "embedding", "cluster",
      dims = 64, k = 3, nprobe = 2).collect()
    assert(out.nonEmpty)
    val truth = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3),
        "vec_id", "embedding", Int.MaxValue)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    out.foreach(r => assert(truth((r.getLong(0), r.getLong(2))) == r.getDouble(3)))
  }
}
