package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev tool: repeated timing of selected gated queries. */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.sameElements(Array("ALL"))) graft.SparkEntry.queries.keys.toSeq
      else if (args.nonEmpty) args.toSeq
      else Seq("q36_dedup_minhash", "q68_ivf_kmeans")
    val reps = sys.env.getOrElse("REPS", "3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PROF_PARTS", "32"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_PROF_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // mirror Bench's session exactly — its NOTES_r2 harness artifacts
      // (idle-heap ContextCleaner, codegen cache eviction) otherwise
      // contaminate profiles with costs the bench never pays
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, d).count()
        println(f"[profq] $n run$i ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
    }
    spark.stop()
  }
}
