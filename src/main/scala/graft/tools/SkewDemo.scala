package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measured before/after for the salted skew join (VERDICT r2
  * item 8 — q75 proves equality; this pins the speedup claim with numbers).
  *
  * Synthetic hot key: 75% of a 32M-row fact lands on ONE key; the dim side
  * (1k keys) is forced off the broadcast path (at real scale the dim that
  * needs salting is too big to broadcast). Three variants, 3 reps each:
  *   A. plain shuffle join, AQE skew split OFF  — the naive baseline: the
  *      hot key's partition serializes ~75% of the join on one task;
  *   B. plain shuffle join, AQE skew split ON   — the runtime fix, works
  *      when nothing downstream needs the join's hash partitioning;
  *   C. Skew.saltedEquiJoin (32 salts), AQE OFF — the explicit fix that
  *      also composes with downstream distribution requirements.
  * Results are recorded in BASELINE.md §skew.
  */
object SkewDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val hot = 7L
    def fact = spark.range(0, 32000000)
      .select(col("id").as("rid"),
        when(pmod(col("id"), lit(4)) < 3, lit(hot))
          .otherwise(pmod(col("id"), lit(1000))).as("key"),
        (col("id") % 97).as("payload"))
    def dim = spark.range(0, 1000)
      .select(col("id").as("key"), (col("id") * 2 + 1).as("dval"))

    // thunks return the aggregated value itself so the printout doubles as
    // an A==B==C equality check across variants, not just a timing
    def time(tag: String)(thunk: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = thunk
        println(f"[skew] $tag run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s (sum=$n)")
      }

    def skewConf(on: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on.toString)
      // force the split even when it would add a shuffle (SHJ case)
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", on.toString)
    }

    skewConf(false)
    time("A plain, AQE-skew OFF") {
      fact.hint("shuffle_hash").join(dim, Seq("key"))
        .agg(sum(col("payload") * col("dval"))).head().getLong(0)
    }
    skewConf(true)
    time("B plain, AQE-skew ON ") {
      fact.hint("shuffle_hash").join(dim, Seq("key"))
        .agg(sum(col("payload") * col("dval"))).head().getLong(0)
    }
    skewConf(false)
    time("C salted(32), AQE OFF") {
      graft.ops.Skew.saltedEquiJoin(
          fact.hint("shuffle_hash"), dim, "key", "rid", 32)
        .agg(sum(col("payload") * col("dval"))).head().getLong(0)
    }
    spark.stop()
  }
}
