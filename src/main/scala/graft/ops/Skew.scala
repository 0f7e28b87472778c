package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (build-prompt scale requirement).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) splits oversized partitions at runtime and is the first line of
  * defense. Salting is the explicit fallback for the case AQE can't fix: a
  * single hot KEY (not partition) on the probe side:
  *
  *  - fact side: append a uniform salt in [0, salts) to the key,
  *  - dim side: replicate each row once per salt value,
  *  - join on (key, salt) → the hot key spreads over `salts` reducers.
  *
  * The salt must be a deterministic function of a unique row id (never
  * rand(): retried tasks would re-roll and duplicate/lose matches).
  */
object Skew {

  def saltedEquiJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      factUniqueCol: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    // dim rows are replicated once per salt: join types that preserve
    // unmatched DIM rows would emit `salts` copies of each — reject them
    val safe = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")
    require(safe.contains(joinType.toLowerCase),
      s"saltedEquiJoin supports fact-preserving join types only, got $joinType")
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(col(factUniqueCol)), lit(salts)).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Hot-bucket cap for bucketed-meeting self-joins (MinHash bands,
    * winnowing fingerprints, positional grams): drop every row of a
    * bucket larger than `maxBucket` — a pair only forms when BOTH sides
    * carry the bucket key, so filtering ONE self-join side suppresses
    * every pair from a hot bucket — with observe() telemetry riding the
    * same pass BEFORE the filter, so dropped volume is visible, never
    * silent (read post-run via queryExecution.observedMetrics(metric)).
    * The window count runs over exactly the partitioning the self-join
    * shuffles on anyway: one extra in-partition sort, no second
    * aggregation pass. Field names are per-site (specs pin them), the
    * contract is shared here so the cap semantics cannot drift between
    * the dedup tiers.
    */
  def capHotBuckets(
      df: DataFrame,
      bucketKeys: Seq[Column],
      maxBucket: Int,
      metric: String,
      droppedField: String,
      totalField: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(bucketKeys: _*)
    df.withColumn("_bsz", count(lit(1)).over(w))
      .observe(metric,
        sum(when(col("_bsz") > maxBucket, 1L).otherwise(0L)).as(droppedField),
        max(col("_bsz")).as("max_bucket_size"),
        count(lit(1)).as(totalField))
      .filter(col("_bsz") <= maxBucket).drop("_bsz")
  }
}
