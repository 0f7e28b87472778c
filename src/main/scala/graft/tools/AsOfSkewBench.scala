package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the as-of join under a hot key (VERDICT r4 #8). Synthesizes
  * the classic time-series skew shape — one instrument carrying most of
  * the ticks — and measures the three as-of tiers on it:
  *   A. union+window keyed by user (graft.ops.AsOfJoin.backward) — the
  *      hot key's whole timeline lands in ONE window partition / task;
  *   B. bucketed two-level scan (AsOfJoin.backwardBucketed) — the hot key
  *      splits across time buckets, carry stitched via the per-bucket
  *      summary;
  *   C. custom sort-merge AsOfJoinExec (graft.plans.AsOfJoinCustom) —
  *      same key-partitioned limitation as A, measured for the record.
  *
  * Input: events at SPARK_GRAFT_SF_DIR (fixtures sf0.1 = 100k rows / 1500
  * users, GenScale sf1 = 1M rows / 15k users), with `hotFrac` of rows
  * remapped onto user 0. The aggregate printed with each timing is the
  * same across variants — the run doubles as an equality check at scale.
  * Results recorded in BASELINE.md §Scaling (as-of under skew).
  */
object AsOfSkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 60% of all events on ONE user: deterministic remap, applied to both
    // sides so the join relationship stays consistent.
    //
    // SPARK_GRAFT_ASOF_SYNTH=<n> replaces the fixture with an n-row
    // synthesized stream of the same shape (30-day span, 60% hot key,
    // 20% purchases / 80% clicks): the fixture hot key tops out at ~0.6M
    // rows at sf1, which one task still sorts in well under a second — the
    // single-partition cliff this tool exists to measure only emerges when
    // the hot timeline outgrows a task, so the stretch mode is how the
    // 100 TB shape is actually demonstrated on one box.
    val ev = sys.env.get("SPARK_GRAFT_ASOF_SYNTH") match {
      case Some(n) =>
        spark.range(0, n.toLong).select(
          col("id").as("event_id"),
          when(pmod(col("id"), lit(5)) < 3, lit(0L))
            .otherwise(pmod(col("id"), lit(10000L))).as("user_id"),
          timestamp_seconds(lit(1700000000L) + pmod(col("id") * 37L, lit(2592000L))).as("ts"),
          when(pmod(col("id"), lit(10)) < 2, lit("purchase")).otherwise(lit("click")).as("event_type"),
          (pmod(col("id"), lit(997L)) * 1.5).as("value"))
      case None =>
        graft.sources.Tables.events(spark, sfDir)
          .withColumn("user_id",
            when(pmod(col("event_id"), lit(5)) < 3, lit(0L)).otherwise(col("user_id")))
    }
    def purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    def clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))

    // checksum over the matched values: bit_xor of hashed match columns is
    // order-free and overflow-free (ANSI), equal across variants iff the
    // matches are identical row-for-row
    def check(df: org.apache.spark.sql.DataFrame): Long =
      df.select(col("event_id"), col("asof_value"), col("asof_time"))
        .agg(bit_xor(hash(col("event_id"), col("asof_value"), col("asof_time")).cast("long")))
        .head().getLong(0)

    def time(tag: String)(thunk: => Long): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = thunk
        println(f"[asof-skew] $tag run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s (xor=$n)")
      }

    time("A window/key      ") {
      check(graft.ops.AsOfJoin.backward(purchases, clicks,
        "user_id", "user_id", "ts", "ts", Seq("value"), "event_id"))
    }
    time("B bucketed(1day)  ") {
      check(graft.ops.AsOfJoin.backwardBucketed(purchases, clicks,
        "user_id", "user_id", "ts", "ts", Seq("value"), "event_id", 86400L))
    }
    time("B bucketed(6h)    ") {
      check(graft.ops.AsOfJoin.backwardBucketed(purchases, clicks,
        "user_id", "user_id", "ts", "ts", Seq("value"), "event_id", 21600L))
    }
    time("C custom exec     ") {
      check(graft.plans.AsOfJoinCustom.backward(purchases, clicks,
        "user_id", "user_id", "ts", "ts", Seq("value"), "event_id"))
    }
    spark.stop()
  }
}
