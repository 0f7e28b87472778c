package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

package object queries {

  /** A timestamp literal in the fixtures' naive (NTZ) domain, so comparisons
    * against parquet NTZ columns need no timezone coercion.
    */
  def ntzLit(s: String): Column = lit(s).cast(TimestampNTZType)

  /** Epoch seconds of an NTZ timestamp under the UTC session clock.
    * NTZ has no direct numeric cast; route through TIMESTAMP (identity under
    * the UTC session timezone) then LONG (truncates sub-second, matching
    * DuckDB's floor(epoch(ts))).
    */
  def epochSec(c: Column): Column = c.cast("timestamp").cast("long")
}
