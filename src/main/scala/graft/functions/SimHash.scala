package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash document sketching (SURVEY.md §2.11): a 60-bit signature whose
  * Hamming distance approximates weighted token-set difference.
  *
  * Construction (Charikar, "Similarity estimation techniques from
  * rounding algorithms", STOC 2002): each token hashes to 60 bits; bit j of
  * the signature is the sign of Σ_tokens (±1 by bit j of the token hash).
  * Entirely map-side (one pass over each doc's token array inside codegen);
  * pair extraction at scale uses band-blocking on signature chunks (same LSH
  * shape as MinHash.bands) rather than O(n²) comparisons.
  *
  * Uses the md5-derived 60-bit hash so the DuckDB oracle can recompute
  * signatures exactly (60 bits also keeps `1L << j` far from the sign bit).
  */
object SimHash {

  val Bits = 60

  /** 60-bit SimHash over a (multiset) token array column. Tie rule: a zero
    * bit-sum counts as a set bit (>= 0), matching the oracle SQL.
    */
  def simhash(tokensCol: Column): Column = {
    // bit positions are compile-time constants: unroll the ±1 bit vector and
    // the final bit-assembly in Scala so shifts stay literal (codegen'd).
    val perToken = transform(tokensCol, w => {
      val h = TextFunctions.md5Hash60(w)
      array((0 until Bits).map { j =>
        when((shiftright(h, j).bitwiseAND(lit(1L))) === 1L, lit(1L)).otherwise(lit(-1L))
      }: _*)
    })
    val sums = aggregate(perToken,
      array_repeat(lit(0L), Bits),
      (acc, bits) => zip_with(acc, bits, (a, b) => a + b))
    (0 until Bits).map { j =>
      when(element_at(sums, j + 1) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("int")

  /** Scalable signature computation (same shape as MinHash.signatures):
    * explode tokens through a generator computing the md5 hash once, then
    * 60 conditional-sum aggregates with map-side combine — per-partition
    * work reduces to one 60-counter row per doc before the doc shuffle.
    */
  def signatures(docs: DataFrame, idCol: String, tokensCol: Column): DataFrame = {
    val hashed = docs.select(col(idCol),
      explode(transform(tokensCol, w => TextFunctions.md5Hash60(w))).as("h"))
    val bitSums = (0 until Bits).map { j =>
      sum(when((shiftright(col("h"), j).bitwiseAND(lit(1L))) === 1L, 1L).otherwise(-1L)).as(s"s$j")
    }
    hashed.groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        (0 until Bits).map { j =>
          when(col(s"s$j") >= 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _).as("simhash"))
  }
}
