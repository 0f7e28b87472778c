package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (time-series enrichment): for each left row, attach the most
  * recent right row with the same key and right.time <= left.time.
  *
  * No Spark built-in exists (SURVEY.md §2.3 / §7.4). A naive implementation
  * (range join + groupBy max + re-join) explodes to |left| × |matching right|
  * intermediate rows. This implementation is the scalable union+window form:
  *
  *   1. tag both inputs and union them (schema-aligned),
  *   2. single shuffle: window partitioned by key, ordered by (time, side,
  *      tiebreak) — right rows sort BEFORE left rows at equal timestamps, so
  *      the join is inclusive (right.time <= left.time),
  *   3. `last(value, ignoreNulls=true)` over rows unboundedPreceding..current
  *      carries the latest right values forward,
  *   4. keep left rows only.
  *
  * Cost at scale: exactly ONE shuffle of |left|+|right| rows, no row
  * explosion, no driver involvement. Skewed keys behave like any skewed
  * window partition (salt upstream if one key dominates).
  *
  * Ties on right.time are broken by `rightTiebreak` (ascending; the LAST one
  * wins), making the result deterministic.
  */
object AsOfJoin {

  /** Forward as-of: for each left row, the EARLIEST right row with the same
    * key and right.time >= left.time. Implemented by time reversal over the
    * backward machinery (negate epoch times), so both directions share one
    * audited core. Tie-break flips accordingly: among equal right times the
    * SMALLEST tiebreak wins (mirror of backward's largest-wins). The matched
    * right time is returned as `asof_time`; listing the time column itself
    * in `rightValues` is unnecessary (and is de-duplicated).
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      rightTiebreak: String): DataFrame = {
    // Reserved internal names keep the rename/drop chain collision-free even
    // when user columns are called "time"/"asof_time" etc.
    val l2 = left.withColumn("__negt", -col(leftTime).cast("timestamp").cast("double"))
    val r2 = right
      .withColumn("__negt", -col(rightTime).cast("timestamp").cast("double"))
      .withColumn("__negtie", -col(rightTiebreak).cast("long"))
      .withColumn("__rt_orig", col(rightTime))
    val rv = rightValues.filterNot(_ == rightTime)
    val out = backward(l2, r2, leftKey, rightKey, "__negt", "__negt",
        rv :+ "__rt_orig", "__negtie")
      .drop("__negt")        // internal left-side column
      .drop("asof_time")     // backward's matched time = negated double, internal
      .withColumnRenamed("asof___rt_orig", "asof_time")
    if (rightValues.contains(rightTime))
      out.withColumn(s"asof_$rightTime", col("asof_time"))
    else out
  }

  /** Backward as-of with a maximum staleness bound: matches older than
    * `toleranceSeconds` before the left time are nulled out (state still
    * O(1); the bound is a post-filter on the matched time).
    */
  def backwardWithTolerance(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      rightTiebreak: String,
      toleranceSeconds: Long): DataFrame = {
    val joined = backward(left, right, leftKey, rightKey, leftTime, rightTime,
      rightValues, rightTiebreak)
    // one projection; every branch evaluates freshness against the ORIGINAL
    // asof_time (a withColumn chain would overwrite it before later columns
    // read it and only work by accidental null propagation)
    val fresh = col("asof_time").cast("timestamp").cast("double") >=
      (col(leftTime).cast("timestamp").cast("double") - toleranceSeconds)
    val masked = Seq("asof_time") ++ rightValues.map(v => s"asof_$v")
    joined.select(joined.columns.toSeq.map {
      case c if masked.contains(c) => when(fresh, col(c)).as(c)
      case c => col(c)
    }: _*)
  }

  /** Tag + schema-align both sides for the union+window core. Left rows
    * travel packed in one struct so the union schema is fixed regardless of
    * the left relation's width; right rows carry their (time, tiebreak,
    * values). Null right keys/times never match (SQL 3VL), mirroring the
    * custom AsOfJoinExec: such right rows are dropped up front — a null
    * right time would otherwise sort NULLS FIRST and leak into every left
    * row's window.
    */
  private def tagSides(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      rightTiebreak: String): (DataFrame, DataFrame, Seq[String]) = {
    val right0 = right.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
    val leftCols = left.columns.toSeq
    val taggedLeft = left.select(
      col(leftKey).as("_k"),
      col(leftTime).as("_t"),
      lit(1).as("_side"),
      lit(null).cast("long").as("_tie"),
      struct(leftCols.map(col): _*).as("_lrow"),
      lit(null)
        .cast(org.apache.spark.sql.types.StructType(
          rightValues.map(c => right.schema(c).copy(nullable = true))))
        .as("_rvals"))
    val taggedRight = right0.select(
      col(rightKey).as("_k"),
      col(rightTime).as("_t"),
      lit(0).as("_side"),
      col(rightTiebreak).cast("long").as("_tie"),
      lit(null).cast(taggedLeft.schema("_lrow").dataType).as("_lrow"),
      struct(rightValues.map(col): _*).as("_rvals"))
    (taggedLeft, taggedRight, leftCols)
  }

  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      rightTiebreak: String): DataFrame = {
    val (taggedLeft, taggedRight, leftCols) = tagSides(
      left, right, leftKey, rightKey, leftTime, rightTime, rightValues, rightTiebreak)

    val w = Window
      .partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc, col("_tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = taggedRight
      .unionByName(taggedLeft)
      .withColumn("_rmatch", last(when(col("_side") === 0, col("_rvals")), ignoreNulls = true).over(w))
      .withColumn("_rtime", last(when(col("_side") === 0, col("_t")), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val leftOut = leftCols.map(c => col("_lrow").getField(c).as(c))
    val rightOut = rightValues.map { c =>
      col("_rmatch").getField(c).as(s"asof_$c")
    }
    joined.select(leftOut ++ rightOut :+ col("_rtime").as("asof_time"): _*)
  }

  /** Skew-resistant backward as-of: identical semantics to [[backward]],
    * but parallelism no longer degrades to one task per key.
    *
    * [[backward]]'s single window partitions by key alone — a hot key (one
    * instrument carrying 30% of the ticks, the classic as-of skew shape)
    * becomes ONE window partition sorted and scanned by ONE task, the same
    * single-partition cliff the q152 prefix-sum machinery exists to avoid.
    * Salting cannot fix it: the running carry-forward needs the key's full
    * timeline in order, and a salt would cut it mid-stream.
    *
    * This variant is the two-level scan (distributed prefix sum over time):
    *
    *   1. bucket both sides by fixed time windows `bucketSeconds` wide;
    *      rows with equal times always share a bucket, so the inclusive
    *      (right.time <= left.time) tie order is preserved;
    *   2. window partitioned by (key, bucket) — hot keys split across
    *      time buckets, every partition bounded by bucket width — carries
    *      matches WITHIN each bucket;
    *   3. one row per (key, bucket) summarizes the bucket's LAST right row
    *      (max_by over (time, tiebreak) — the same largest-wins tie rule
    *      as the window order); a per-key window over this TINY summary
    *      relation (≤ keys × buckets rows) computes each bucket's
    *      carry-in = last right row of any earlier bucket;
    *   4. left rows with no within-bucket match take the carry-in.
    *
    * Cost: two shuffles of the data (bucketed window + carry join, both
    * keyed (key, bucket)) plus one shuffle of the summary — vs one data
    * shuffle for [[backward]]. Use this form when a key can dominate a
    * partition; the plain form when keys are well-distributed.
    */
  def backwardBucketed(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      rightTiebreak: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val (taggedLeft, taggedRight, leftCols) = tagSides(
      left, right, leftKey, rightKey, leftTime, rightTime, rightValues, rightTiebreak)
    // same numeric view of _t as backwardWithTolerance: timestamps → epoch
    // seconds; already-numeric times round-trip through the cast
    def bucketOf(t: Column): Column =
      floor(t.cast("timestamp").cast("double") / bucketSeconds).cast("long")

    val union = taggedRight.unionByName(taggedLeft)
      .withColumn("_b", bucketOf(col("_t")))

    // (2) within-bucket carry: bounded partitions, full parallelism
    val wb = Window
      .partitionBy(col("_k"), col("_b"))
      .orderBy(col("_t").asc, col("_side").asc, col("_tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = union
      .withColumn("_rin", last(when(col("_side") === 0, col("_rvals")), ignoreNulls = true).over(wb))
      .withColumn("_tin", last(when(col("_side") === 0, col("_t")), ignoreNulls = true).over(wb))

    // (3) per-(key, bucket) last right row; null tiebreaks take
    // Long.MaxValue to reproduce the window's asc_nulls_last/last-wins
    // rule, plus an explicit null rank so a GENUINE Long.MaxValue
    // tiebreak still loses to a null one (asc_nulls_last puts nulls
    // after every value, including MaxValue — coalesce alone would make
    // the two compare equal and max_by pick arbitrarily)
    val summary = taggedRight
      .withColumn("_b", bucketOf(col("_t")))
      .groupBy(col("_k"), col("_b"))
      .agg(max_by(
        struct(col("_t").as("t"), col("_rvals").as("rv")),
        struct(col("_t"), coalesce(col("_tie"), lit(Long.MaxValue)),
          when(col("_tie").isNull, 1).otherwise(0))).as("_lastr"))

    // every (key, bucket) present on EITHER side needs a carry-in (a left
    // bucket with no right rows still inherits from earlier buckets)
    val carry = union.select(col("_k"), col("_b")).distinct()
      .join(summary, Seq("_k", "_b"), "left")
      .withColumn("_carry",
        last(col("_lastr"), ignoreNulls = true).over(
          Window.partitionBy(col("_k")).orderBy(col("_b").asc)
            .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("_k"), col("_b"), col("_carry"))

    // (4) stitch: within-bucket match wins, else the carry-in
    val joined = within.join(carry, Seq("_k", "_b"), "left")
      .filter(col("_side") === 1)
      .withColumn("_rmatch", coalesce(col("_rin"), col("_carry").getField("rv")))
      .withColumn("_rtime", coalesce(col("_tin"), col("_carry").getField("t")))

    val leftOut = leftCols.map(c => col("_lrow").getField(c).as(c))
    val rightOut = rightValues.map { c =>
      col("_rmatch").getField(c).as(s"asof_$c")
    }
    joined.select(leftOut ++ rightOut :+ col("_rtime").as("asof_time"): _*)
  }
}
