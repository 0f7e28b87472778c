package graft.tools
import org.apache.spark.sql.SparkSession

/** Prints q229's stage/bucket rows at args(0) — the BASELINE.md scaling
  * evidence helper (run with SPARK_GRAFT_Q229_FULL=1 for the full DAG).
  */
object DagStages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries("q229_curation_dag")(spark, args(0))
      .collect().foreach(r => println(s"STAGE ${r.mkString(" | ")}"))
    spark.stop()
  }
}
