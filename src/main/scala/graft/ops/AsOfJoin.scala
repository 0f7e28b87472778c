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

  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      rightTiebreak: String): DataFrame = {

    // Null keys/times never match (SQL 3VL), mirroring the custom
    // AsOfJoinExec: drop such right rows up front — a null right time would
    // otherwise sort NULLS FIRST and leak into every left row's window.
    val right0 = right.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)

    val leftCols = left.columns.toSeq
    // Pack every left column into one struct so the union schema stays fixed
    // regardless of the left relation's width.
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
}
