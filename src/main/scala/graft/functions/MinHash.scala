package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection (SURVEY.md §2.11).
  * Scheme: min-wise independent permutations (Broder, "On the resemblance
  * and containment of documents", 1997) with the standard banding analysis
  * (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets, ch. 3).
  *
  * Pipeline (all relational, no driver-side loops):
  *   1. shingle: distinct word n-grams per doc               (map-side)
  *   2. signature: k min-hashes via affine perms of a 60-bit
  *      base hash                                            (map-side)
  *   3. band: split the signature into b bands of r rows,
  *      hash each band, explode to (band_id, band_key, doc)  (map ×b rows)
  *   4. bucket join: self-join on (band_id, band_key) with
  *      id< id — ONE shuffle keyed by band key; candidate
  *      count is data-dependent, not O(n²)                   (shuffle)
  *   5. verify: exact Jaccard on the candidates' shingle
  *      sets, threshold filter                               (shuffle join ×2)
  *
  * At 100 TB this is the standard scalable shape: everything before the
  * bucket join is linear scan work; the bucket join's shuffle volume is
  * b rows per doc; only genuinely-colliding docs ever meet. Skewed buckets
  * (boilerplate shingles) can be capped by filtering bucket sizes upstream.
  *
  * Parameters b=16, r=4 (k=64): P[candidate] = 1-(1-j⁴)¹⁶ — at j=0.9 it is
  * 1-3.5e-6; the verify step then removes false positives exactly, so with
  * the fixtures' similarity gap (near-dups j≥0.9, background j<0.1) the
  * output equals the exact all-pairs result, which is what the DuckDB
  * oracle computes.
  */
object MinHash {

  val NumHashes = 64
  val Bands = 16
  val Rows = 4
  val Prime = 2147483647L // 2^31-1, Mersenne

  /** Deterministic affine permutation constants from a fixed LCG (seeds are
    * engine-internal: the oracle validates end results, not signatures).
    */
  private val (seedsA, seedsB) = {
    var x = 0x5DEECE66DL
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; (x >>> 33) % (Prime - 1) + 1 }
    val a = Seq.fill(NumHashes)(next())
    val b = Seq.fill(NumHashes)(next())
    (a, b)
  }

  /** MinHash signature (array<long> of length k) over a shingle-set column.
    * Column form for small/in-line use; the pipeline uses [[signatures]],
    * whose explode→aggregate shape guarantees each shingle is hashed once.
    */
  def signature(shingles: Column): Column = {
    val base = transform(shingles, s => pmod(TextFunctions.md5Hash60(s), lit(Prime)))
    array((0 until NumHashes).map { j =>
      array_min(transform(base, h =>
        pmod(lit(seedsA(j)) * h + lit(seedsB(j)), lit(Prime))))
    }: _*)
  }

  /** Scalable signature computation: explode the shingles, hash each one
    * ONCE in the post-generate projection (plain codegen'd builtins — the
    * pre-r9 form hashed inside a `transform` lambda, i.e. on the
    * interpreted CodegenFallback path, and the hash is still computed
    * exactly once per shingle either way), then fold all k per-seed
    * minima in ONE TypedImperativeAggregate — map-side combine reduces each
    * partition to one k-long buffer per doc before the single doc_id
    * shuffle, and the generated aggregate code stays O(1) in k (64 separate
    * `min(...)` expressions compile a pathologically large codegen stage).
    */
  def signatures(docsWithShingles: DataFrame, idCol: String, shingleCol: String): DataFrame = {
    val hashed = docsWithShingles
      .select(col(idCol), explode(col(shingleCol)).as("s"))
      .select(col(idCol), pmod(TextFunctions.md5Hash60(col("s")), lit(Prime)).as("h"))
    hashed.groupBy(col(idCol))
      .agg(graft.expressions.MinHashAggregate(col("h"), seedsA, seedsB, Prime).as("sig"))
  }

  /** (doc_id, band_id, band_key) rows for LSH bucketing. */
  def bands(df: DataFrame, idCol: String, sigCol: String): DataFrame = {
    df.select(col(idCol), posexplode(
        array((0 until Bands).map { b =>
          xxhash64(concat_ws(",", slice(col(sigCol), b * Rows + 1, Rows)), lit(b))
        }: _*))
        .as(Seq("band_id", "band_key")))
  }

  /** Default cap on docs per band bucket (see [[nearDuplicatePairs]]). */
  val DefaultMaxBucket = 1000

  /** Full pipeline: docs(id, text) → verified near-dup pairs
    * (id_a < id_b, jaccard ≥ threshold).
    *
    * `maxBucket` bounds the quadratic hot-bucket risk: a band key shared by
    * m docs produces m(m-1)/2 candidate pairs, so one boilerplate-heavy key
    * (identical headers/footers dominating every shingle) can turn the
    * bucket self-join quadratic. Enforcement is a window count over the
    * SAME (band_id, band_key) partitioning the self-join shuffles on,
    * filtering one join side (see the inline comment) — one extra
    * in-partition sort and nothing else. (An earlier broadcast-anti-join
    * variant consumed the bands pipeline a third time and regressed q36
    * from ~3 s to ~58 s warm at sf0.1 — do not reintroduce it.) Docs
    * dropped this way are overwhelmingly exact-boilerplate duplicates,
    * which the exact/fingerprint dedup passes already catch.
    */
  def nearDuplicatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      threshold: Double,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val spread = graft.sources.Tables.spread(docs, col(idCol))
    val sh = spread.select(col(idCol).as("doc_id"),
      TextFunctions.wordShingles(col(textCol), shingleSize).as("sset"))
    val sig = signatures(sh, "doc_id", "sset")
    val bdAll = bands(sig, "doc_id", "sig")

    // Cap enforcement via the shared contract (ops.Skew.capHotBuckets):
    // filtering ONE self-join side suppresses every pair from a hot
    // bucket, and the bands pipeline still runs just twice (x, y) as in
    // the uncapped shape.
    val x = graft.ops.Skew.capHotBuckets(bdAll,
      Seq(col("band_id"), col("band_key")), maxBucket,
      "minhash_cap", "dropped_band_rows", "band_rows")

    val candidates = x.as("x")
      .join(bdAll.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()

    // Verify only the candidates: join the (few) candidate ids back to the
    // raw docs and compute shingle sets post-join — O(candidates) shingle
    // work instead of re-shingling the whole corpus on both join sides.
    val texts = spread.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    candidates
      .join(texts.select(col("doc_id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(texts.select(col("doc_id").as("id_b"), col("text").as("text_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        TextFunctions.jaccard(
          TextFunctions.wordShingles(col("text_a"), shingleSize),
          TextFunctions.wordShingles(col("text_b"), shingleSize)).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
