package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe: edge count + per-round timings of q138's component input. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.embeddings(spark, d)
    val t0 = System.nanoTime()
    val pairs = graft.functions.Similarity.blockedNearDupPairs(
      emb, "vec_id", "embedding", "label", 0.3).select(col("id_a"), col("id_b"))
      .localCheckpoint()
    println(f"[ccprobe] pairs=${pairs.count()} t=${(System.nanoTime()-t0)/1e9}%.2f")
    val t1 = System.nanoTime()
    val cc = graft.functions.Components.connectedComponents(pairs, "id_a", "id_b")
    println(f"[ccprobe] cc rows=${cc.count()} t=${(System.nanoTime()-t1)/1e9}%.2f")
    val t2 = System.nanoTime()
    val st = graft.functions.Components.connectedComponentsStar(pairs, "id_a", "id_b")
    println(f"[ccprobe] star rows=${st.count()} t=${(System.nanoTime()-t2)/1e9}%.2f")
    // equivalence of labelings
    val j = cc.withColumnRenamed("comp","c1").join(st.withColumnRenamed("comp","c2"), "id")
    println("[ccprobe] diff=" + j.filter(col("c1") =!= col("c2")).count())
    spark.stop()
  }
}
