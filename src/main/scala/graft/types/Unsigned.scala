package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Full-range UINT64 support (SURVEY.md §1.3; reference src/types.rs:19-29).
  *
  * Spark has no unsigned types, so `GraftType.UInt64` maps to LongType —
  * exact for values < 2⁶³, and the standard storage convention for real u64
  * data is bit-reinterpretation into i64 (parquet UINT_64 surfaces the same
  * way). When the top bit matters, these helpers convert losslessly between
  * the i64 carrier and the true unsigned value as DECIMAL(20,0) (the §1.3
  * prescription): u = i < 0 ? i + 2⁶⁴ : i, and back. Both directions are
  * exact decimal arithmetic — no doubles anywhere.
  */
object Unsigned {

  /** 2⁶⁴ as an exact decimal literal. */
  private val TwoPow64 = lit(BigDecimal("18446744073709551616")).cast(DecimalType(21, 0))

  /** The unsigned value carried by a bit-reinterpreted i64 column, as
    * DECIMAL(20,0) ∈ [0, 2⁶⁴).
    */
  def toUnsigned(i64: Column): Column = {
    val d = i64.cast(DecimalType(20, 0))
    when(i64 < 0, (d.cast(DecimalType(21, 0)) + TwoPow64).cast(DecimalType(20, 0)))
      .otherwise(d)
  }

  /** Inverse of [[toUnsigned]]: DECIMAL(20,0) ∈ [0, 2⁶⁴) back to the i64
    * bit carrier. Values ≥ 2⁶³ wrap to negative longs, exactly.
    */
  def toCarrier(u: Column): Column = {
    val max = lit(BigDecimal("9223372036854775807")).cast(DecimalType(20, 0))
    when(u > max,
      (u.cast(DecimalType(21, 0)) - TwoPow64).cast(DecimalType(20, 0)).cast("long"))
      .otherwise(u.cast("long"))
  }
}
