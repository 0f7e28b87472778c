package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every gated query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Protocol notes:
  *   - Every query is executed once UNTIMED first: whole-stage-codegen
  *     compilation is cached per plan shape, so a cold first execution
  *     charges one-time JIT/codegen cost (~50 s for the MinHash pipeline)
  *     to whichever query runs first. The recorded baseline in BASELINE.md
  *     was measured warm; warming all queries keeps the protocol symmetric.
  *   - A query that throws is reported with time -1.0 and listed under
  *     "failed" (never a wall-clock value a consumer could mistake for a
  *     fast pass); its time is excluded from the total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ContextCleaner frees shuffle files, broadcasts, and checkpoint RDD
      // blocks only when a GC runs; with a large mostly-idle heap the JVM
      // may not GC for the whole bench, so ~160 query executions accumulate
      // state and progressively slow the later ones (measured: 2nd half of
      // the run 3.5× the 1st). Default periodicGC is 30min — far longer
      // than the bench.
      .config("spark.cleaner.periodicGC.interval", "30s")
      // the whole-stage-codegen class cache holds only 100 entries by
      // default; ~80 queries × several codegen stages each overflow it
      // between a query's warmup execution and its timed one, so the timed
      // pass silently recompiles everything (measured: timed pass 119 s vs
      // 53 s when executions are adjacent). Size it for the full suite.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.foreach { case (_, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        // steady-state warmup: one pass compiles the codegen classes but
        // leaves C2 JIT half-tiered on the heavy pipelines — their timed
        // run then lands anywhere between warm cost and ~5× it (measured
        // on q36/q81: 12 s → 7 s → 2 s over identical replans). Re-run
        // only queries whose first pass was slow until they stop
        // improving materially (≤3 extra passes bounds added wall-clock
        // to the few multi-second queries).
        var prev = (System.nanoTime() - t0) / 1e9
        var extra = 0
        while (prev > 1.0 && extra < 3) {
          val t1 = System.nanoTime()
          fn(spark, sfDir).count()
          val cur = (System.nanoTime() - t1) / 1e9
          extra += 1
          if (cur > prev * 0.7) extra = 3 // converged — stop early
          prev = cur
        }
      } catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) v else -1.0)
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
