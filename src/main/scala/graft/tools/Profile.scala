package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.{MinHash, TextFunctions => TF}

/** Dev tool: stage-by-stage timing of the MinHash pipeline + plan dumps. */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }

    val docs = Tables.documents(spark, d)
    time("warmup count")(docs.count())
    val sh = docs.select(col("doc_id"), TF.wordShingles(col("text"), 3).as("sset"))
    time("shingles only")(sh.count())
    time("shingles materialize")(
      sh.select(col("doc_id"), explode(col("sset"))).count())
    val sig = MinHash.signatures(sh, "doc_id", "sset")
    time("signatures")(sig.count())
    val bd = MinHash.bands(sig, "doc_id", "sig")
    time("bands")(bd.count())
    val cand = bd.as("x").join(bd.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b")).distinct()
    time("candidates")(println("  n_cand=" + cand.count()))
    val full = MinHash.nearDuplicatePairs(docs, "doc_id", "text", 3, 0.5)
    time("full pipeline")(full.count())
    spark.stop()
  }
}
