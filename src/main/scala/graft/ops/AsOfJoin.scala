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
    * SMALLEST tiebreak wins (mirror of backward's largest-wins).
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
    def negTime(df: DataFrame, t: String): DataFrame =
      df.withColumn("__negt", -col(t).cast("timestamp").cast("double"))
        .withColumn("__negtie", lit(0L))
    val l2 = negTime(left, leftTime)
    val r2 = negTime(right, rightTime)
      .withColumn("__negtie", -col(rightTiebreak).cast("long"))
    backward(l2, r2, leftKey, rightKey, "__negt", "__negt",
        rightValues :+ rightTime, "__negtie")
      .withColumnRenamed(s"asof_$rightTime", "asof_time_fwd")
      .drop("__negt", "__negtie", "asof_time")
      .withColumnRenamed("asof_time_fwd", "asof_time")
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
    val fresh = col("asof_time").cast("timestamp").cast("double") >=
      (col(leftTime).cast("timestamp").cast("double") - toleranceSeconds)
    val nulled = (Seq("asof_time") ++ rightValues.map(v => s"asof_$v")).foldLeft(joined) {
      (df, c) => df.withColumn(c, when(fresh, col(c)))
    }
    nulled
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

    val taggedRight = right.select(
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
