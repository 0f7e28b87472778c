package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the exact-span dedup pipeline (q175) under BOILERPLATE —
  * the hot-gram shape that breaks a naive gram self-join at scale
  * (VERDICT r5 "Next round" #4). A shared license header / nav chrome /
  * template paragraph puts the same positional 8-grams in a large
  * fraction of all documents; each such gram's join bucket then holds k
  * docs and emits O(k²) pair rows PER GRAM POSITION. The
  * `Skew.capHotBuckets` tier drops whole hot buckets (with observe()
  * telemetry) before the join, bounding the blowup.
  *
  * This tool MEASURES that claim rather than arguing it: it appends a
  * fixed 20-token boilerplate tail to `hotFrac` of the fixture documents
  * (13 shared 8-grams per affected doc) and times
  * `SpanDedupQueries.exactSpans`:
  *   A. capped (maxBucket=1000, the q175 gate configuration);
  *   B. uncapped (maxBucket=Int.MaxValue) — the quadratic candidate
  *      structure, feasible only at the smaller SFs.
  * Alongside each timing it prints the span-row count and the hot-gram
  * candidate volume Σ k² over capped-out buckets, so the recorded row
  * shows both the cost avoided and the volume dropped. Results recorded
  * in BASELINE.md §Scaling (span dedup under boilerplate).
  *
  * SPARK_GRAFT_SPAN_UNCAPPED=0 skips B (sf1: the uncapped join's
  * ~1.5 B-row candidate set is precisely the cliff the cap exists to
  * avoid — run it at sf0.1 and below).
  */
object SpanHotBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val hotFrac = sys.env.getOrElse("SPARK_GRAFT_SPAN_HOTFRAC", "0.3").toDouble
    val runUncapped = sys.env.getOrElse("SPARK_GRAFT_SPAN_UNCAPPED", "1") == "1"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val boiler = (1 to 20).map(i => s"boilertok$i").mkString(" ")
    val mod = math.max(1L, math.round(1.0 / hotFrac))
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(mod)) === 0,
          concat(col("text"), lit(" " + boiler))).otherwise(col("text")))

    // hot-gram exposure: how many docs share the boilerplate, and the
    // candidate volume Σ k² the uncapped join would pay per gram position
    val nDocs = docs.count()
    val nHot = docs.filter(pmod(col("doc_id"), lit(mod)) === 0).count()
    println(s"[spanhot] docs=$nDocs hot=$nHot (${"%.0f".format(100.0 * nHot / nDocs)}%) " +
      s"boiler_grams=13 candidate_rows_uncapped≈${13L * nHot * (nHot - 1) / 2}")

    def time(label: String, maxBucket: Int): Unit = {
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        val agg = graft.queries.SpanDedupQueries.exactSpans(docs, t = 8, maxBucket = maxBucket)
          .agg(count(lit(1)).as("n_spans"), sum(col("span_words")).as("sum_words"))
          .collect().head
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[spanhot] $label rep$r ${dt}%.2f s  spans=${agg.getLong(0)} sum_words=${agg.getLong(1)}")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }

    time("capped(1000)", 1000)
    if (runUncapped) time("uncapped", Int.MaxValue)
    spark.stop()
  }
}
