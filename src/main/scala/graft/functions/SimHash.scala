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

  /** Banded Hamming near-dup JOIN — the operational tier over
    * [[signatures]]: all pairs within `maxHamming` bits, found without an
    * all-pairs comparison. Pigeonhole guarantee: split the 60-bit
    * signature into `nBands` equal chunks; a pair differing in at most
    * maxHamming < nBands bits leaves at least one chunk IDENTICAL, so
    * bucketing on (band, chunk value) and equi-joining buckets — the
    * BANDING — has no false negatives, and the exact
    * `hamming <= maxHamming` filter after the join removes the false
    * positives. One signature-sized shuffle on the band key.
    *
    * The hot-bucket cap is the ONE pair-loss mechanism: a (band, chunk)
    * bucket larger than `maxBucket` is dropped WHOLE via the shared
    * [[graft.ops.Skew.capHotBuckets]] contract, so a pair whose only
    * identical band lands in a hot bucket is lost — the same deliberate,
    * observe()-telemetered trade every dedup tier makes against the
    * Σ bucket² blowup of degenerate corpora (near-constant docs all
    * hashing to one chunk). Size `maxBucket` above the corpus's real
    * dup-group sizes, and read the `simhash_band_buckets` metric after a
    * run: dropped_band_rows > 0 means the threshold guarantee was traded
    * away for those buckets, visibly.
    */
  def bandedNearDupPairs(
      sigs: DataFrame,
      idCol: String,
      maxHamming: Int,
      nBands: Int = 4,
      maxBucket: Int = 10000): DataFrame = {
    require(maxHamming < nBands, s"pigeonhole needs maxHamming < nBands")
    require(Bits % nBands == 0, s"$nBands bands must divide $Bits bits")
    val bandBits = Bits / nBands
    val mask = (1L << bandBits) - 1
    val bands = sigs.select(col(idCol).as("id"), col("simhash"),
      explode(array((0 until nBands).map(b => struct(lit(b).as("band"),
        shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask)).as("bv"))): _*))
        .as("bb"))
      .select(col("id"), col("simhash"), col("bb.band").as("band"), col("bb.bv").as("bv"))
    // unbounded cap (the gated-vs-exact-oracle configuration): the cap
    // window could never drop a row, so skip its exchange + per-bucket
    // count entirely — the candidate join below stays the ONE
    // signature-sized shuffle the scale story advertises
    val capped =
      if (maxBucket == Int.MaxValue) bands
      else graft.ops.Skew.capHotBuckets(bands,
        Seq(col("band"), col("bv")), maxBucket,
        "simhash_band_buckets", "dropped_band_rows", "total_band_rows")
    capped.as("a")
      .join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.simhash"), col("b.simhash")).as("hamming"))
      // exact filter FIRST (map-side, free), THEN dedupe the survivors: a
      // true pair can meet in up to nBands buckets, but false positives
      // dominate the candidate set and must never reach the dedup exchange
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
