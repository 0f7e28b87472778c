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
}
