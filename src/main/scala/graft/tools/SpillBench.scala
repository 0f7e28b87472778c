package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: spill evidence under REAL memory pressure (VERDICT r5 #8,
  * closing the reference's `Allocator`/`MemoryLimit` row —
  * `src/allocator.rs:23-33` bounds memory and fails allocations; Spark's
  * answer is graceful degradation: hash aggregation falls back to
  * sort-based spilling when the map cannot acquire execution memory, and
  * sorts go external. SpillSpec pins CORRECTNESS of those paths with
  * tiny forced thresholds; this tool shows the fallback actually ENGAGES
  * at sf1 data volumes under a constrained heap, and that the answer is
  * unchanged.)
  *
  * Protocol: run the same two queries — (A) a ~6 M-group hash aggregate
  * over sf1 lineitem (group key l_orderkey×l_partkey×l_suppkey, wider
  * than any fixture query's), (B) a full-table global sort — under
  * whatever -Xmx the caller sets, and print per-query wall time, a
  * content checksum (xor of row hashes — run-order independent), and the
  * task-level memory/disk spill totals from a SparkListener. Evidence =
  * same checksum with -Xmx12g (no spill) and -Xmx1g (spill engaged,
  * bytes > 0). Recorded in BASELINE.md §Spill.
  */
object SpillBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val memSpilled = new LongAdder
    val diskSpilled = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { memSpilled.add(m.memoryBytesSpilled); diskSpilled.add(m.diskBytesSpilled) }
      }
    })

    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)

    def run(label: String)(q: => org.apache.spark.sql.DataFrame): Unit = {
      memSpilled.reset(); diskSpilled.reset()
      val t0 = System.nanoTime()
      // xor of per-row hashes: content checksum independent of row order
      // and of how partial aggregation splits work across the fallback.
      // first/last are ORDER-SENSITIVE aggregates: without them Catalyst's
      // EliminateSorts strips an upstream orderBy right through the
      // projection (count/bit_xor are in its order-irrelevant whitelist)
      // and a "sort" benchmark silently measures a plain scan.
      val r = q.select(xxhash64(struct(col("*"))).as("h"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"),
          first(col("h")).as("f"), last(col("h")).as("l"))
      val row = r.collect().head
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are posted async; give the bus a beat to drain
      Thread.sleep(500)
      println(f"[spill] $label heap=${heapMb}m ${dt}%.2f s rows=${row.getLong(0)} " +
        f"checksum=${row.getLong(1)} first=${row.getLong(2)} last=${row.getLong(3)} " +
        f"memSpilled=${memSpilled.sum() / 1048576}%d MiB " +
        f"diskSpilled=${diskSpilled.sum() / 1048576}%d MiB")
    }

    run("hash-agg 6M groups") {
      li.groupBy(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("q"), sum(col("l_extendedprice")).as("p"),
          count(lit(1)).as("n"))
    }
    run("global sort") {
      li.orderBy(col("l_extendedprice").asc, col("l_orderkey").asc, col("l_linenumber").asc)
    }
    spark.stop()
  }
}
