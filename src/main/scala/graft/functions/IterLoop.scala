package graft.functions

import org.apache.spark.sql.SparkSession

/** Shuffle-partition right-sizing for ITERATIVE loops over a small or
  * shrinking frontier (r10, guide §2.2 / the r9-verdict inverse-scaling
  * item): a fixed-point loop pays its reduce-side fixed cost — one task +
  * one state/checkpoint block per shuffle partition — EVERY round, so at
  * `spark.sql.shuffle.partitions = 32` a 12-round peel over a few thousand
  * rows schedules hundreds of near-empty tasks and runs SLOWER at 32 cores
  * than at 8 (BENCH_r09: q162 6.9 s @32c vs ≤4.3 s @8c, q170 8.8 s @32c).
  * This is the batch twin of the r9 streaming-gate state-shard fix
  * (EventStreams.withGateShufflePartitions).
  *
  * The count is derived from the MEASURED live row count, never a constant:
  * `partitionsFor(rows)` targets [[TargetRowsPerPartition]] rows per
  * reduce task and clamps to [1, defaultParallelism] — at corpus scale the
  * clamp returns full parallelism (no behavior change where the data is
  * big), and on a small frontier the loop degenerates to the handful of
  * tasks the data actually needs. Results are partitioning-independent
  * (hash partitioning only moves keys between reducers).
  *
  * AQE cannot do this for the callers: every loop here pins its static
  * relation's partitioning with `repartition(col)` + localCheckpoint so the
  * per-round join reuses ONE exchange (guide §2.4), and a user-specified
  * repartition is exactly what AQE's coalescing leaves alone.
  */
object IterLoop {

  /** ~rows per reduce task inside an iterative loop. Small enough that a
    * gate-scale frontier collapses to a couple of tasks, large enough that
    * a task amortizes its scheduling cost; env-overridable for production
    * tuning (SPARK_GRAFT_LOOP_TARGET_ROWS).
    */
  val TargetRowsPerPartition: Long =
    sys.env.get("SPARK_GRAFT_LOOP_TARGET_ROWS").map(_.toLong).getOrElse(65536L)

  /** Partition count for a loop whose live relation holds ~`rows` rows. */
  def partitionsFor(spark: SparkSession, rows: Long): Int = {
    val par = spark.sparkContext.defaultParallelism
    val want = math.ceil(rows.toDouble / TargetRowsPerPartition).toLong
    math.max(1L, math.min(par.toLong, want)).toInt
  }

  /** Scope `spark.sql.shuffle.partitions` to `n` for the loop body and
    * restore it after (the EventStreams set/restore precedent — the conf
    * is read per-shuffle at planning time, so the scope must cover every
    * action the loop triggers, including lazy-checkpoint materializers).
    */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, math.max(1, n).toString)
    try f finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }
}
