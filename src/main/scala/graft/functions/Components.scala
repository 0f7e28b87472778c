package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering step
  * of a dedup pipeline: near-dup PAIRS (MinHash/SimHash/embedding) become
  * duplicate GROUPS, from which one representative per group is kept.
  *
  * Algorithm: iterative min-label propagation. Every vertex starts labeled
  * with its own id; each round it takes the min of its label and its
  * neighbors' labels; fix-point = components labeled by their min vertex
  * id. Each round is one join + one aggregation, both shuffled on vertex
  * id — O(E) work per round, O(diameter) rounds. Near-dup graphs have tiny
  * diameter (duplicate groups are cliques or near-cliques), so this
  * converges in 2-3 rounds; for general graphs with long chains at 100 TB
  * scale, switch to the large-star/small-star algorithm (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014), which
  * contracts paths in O(log² n) rounds with the same per-round shape.
  *
  * Each generation of labels is localCheckpoint'ed (same pattern as
  * KMeans.fit): plan depth stays constant per round instead of nesting one
  * join level per iteration. Convergence is detected with a one-scalar
  * count per round (never collecting data rows to the driver).
  */
object Components {

  /** @param edges undirected edge list (each pair listed once is enough)
    * @return (id, component) for every vertex appearing in an edge, where
    *         component = min vertex id in the connected component.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIters: Int = 20): DataFrame = {
    // materialize the edge list FIRST: both union branches below reference
    // it, and an un-checkpointed expensive upstream (e.g. the MinHash
    // pipeline in q81) would execute once per branch inside a single job
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).localCheckpoint()
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    var labels = und.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp")).localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val nbr = und.join(labels, und("dst") === labels("id"))
        .groupBy(und("src").as("id2"))
        .agg(min(col("comp")).as("nbr_comp"))
      // lazy checkpoint: the convergence count below materializes it, so
      // each round costs ONE job instead of checkpoint-job + count-job
      val next = labels.join(nbr, labels("id") === nbr("id2"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
        .localCheckpoint(false)
      changed = next.as("n")
        .join(labels.select(col("id"), col("comp").as("old")).as("o"), "id")
        .filter(col("comp") =!= col("old")).count()
      labels = next
      it += 1
    }
    labels
  }
}
