package graft

import org.apache.spark.sql.functions._
import graft.functions.Components

class ComponentsSpec extends SparkTestBase {

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(edges.toDF("s", "t"), "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("components: chain, triangle, isolated pair, direction-independence") {
    // chain 1-2-3-4 (long diameter), triangle 10-11-12, pair 20-21
    val got = run(Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (12L, 10L),
      (11L, 12L), (21L, 20L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("components: deterministic across runs and edge orderings") {
    val e1 = Seq((1L, 2L), (2L, 3L), (7L, 8L))
    assert(run(e1) == run(e1.reverse.map { case (a, b) => (b, a) }))
  }

  test("components: label plan depth constant across rounds") {
    import spark.implicits._
    // a path graph forces maxIters-bound propagation rounds
    val path = (1L to 12L).sliding(2).map(w => (w.head, w.last)).toSeq
    val labels = Components.connectedComponents(path.toDF("s", "t"), "s", "t")
    def depth(p: org.apache.spark.sql.catalyst.trees.TreeNode[_]): Int =
      if (p.children.isEmpty) 1
      else 1 + p.children.map(c => depth(c.asInstanceOf[org.apache.spark.sql.catalyst.trees.TreeNode[_]])).max
    assert(depth(labels.queryExecution.analyzed) <= 3)
    assert(labels.collect().forall(_.getLong(1) == 1L))
  }
}
