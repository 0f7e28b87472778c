package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing primitives for training-data preparation: a distributed
  * prefix sum (the building block for concat-and-chunk token packing) that
  * never moves the corpus through a single task.
  *
  * A naive `sum(x) over (order by id)` is a one-partition window — the whole
  * corpus serialises through one task (Spark even warns "No Partition
  * Defined"). The two-level shape here keeps the data-sized pass partitioned:
  *   1. within-bucket running sums, partitioned by `id div bucketWidth`;
  *   2. a global running sum over the per-bucket TOTALS only (rows =
  *      n/bucketWidth — thousands, not billions, so the single-partition
  *      window is on metadata-sized input);
  *   3. broadcast the bucket offsets back and add.
  * At 100 TB pick bucketWidth so level-2 stays ~1e6 rows; the corpus-sized
  * stages stay fully parallel.
  */
object Packing {

  /** Exact running total of `valueCol` (long) in `orderCol` order, as a new
    * column `out`. `orderCol` must be unique and non-negative (doc ids).
    */
  def prefixSum(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      bucketWidth: Long,
      out: String = "cum"): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1 (got $bucketWidth)")
    require(!df.columns.contains(out), s"output column '$out' already exists")
    require(df.columns.forall(!_.startsWith("_ps_")),
      "column names starting with '_ps_' are reserved by prefixSum")
    val withB = df.withColumn("_ps_bucket",
      floor(col(orderCol) / lit(bucketWidth.toDouble)).cast("long"))
    val inner = Window.partitionBy(col("_ps_bucket"))
      .orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = withB.groupBy(col("_ps_bucket"))
      .agg(sum(col(valueCol)).as("_ps_tot"))
      .withColumn("_ps_offset",
        coalesce(
          sum(col("_ps_tot")).over(
            Window.orderBy(col("_ps_bucket").asc)
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_ps_bucket").as("_ps_bucket_o"), col("_ps_offset"))
    withB
      .withColumn("_ps_within", sum(col(valueCol)).over(inner))
      .join(broadcast(offsets), col("_ps_bucket") === col("_ps_bucket_o"))
      .withColumn(out, col("_ps_within") + col("_ps_offset"))
      .drop("_ps_bucket", "_ps_bucket_o", "_ps_within", "_ps_offset")
  }
}
