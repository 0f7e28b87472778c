package graft

import org.apache.spark.sql.types._

/** Driver-comparator output-type policy (VERDICT.md r2, items 1/2/5).
  *
  * The driver's correctness gate reads the Spark result parquet with pandas
  * and the DuckDB oracle result as a pandas frame, then compares *stringified*
  * values. Two Spark output types are hazardous on that path even when every
  * value is numerically equal:
  *
  *  - DecimalType: Spark parquet keeps `Decimal` objects whose `str()`
  *    preserves trailing scale zeros (`'3916451.10'`), while DuckDB's frame
  *    arrives as float64 whose shortest-repr drops them (`'3916451.1'`) —
  *    any result containing one such value hash-fails. (All 15 r2 red gates
  *    were exactly this.)
  *  - ArrayType (and MapType/StructType): pandas cannot lexsort an
  *    object-dtype column of numpy arrays (`unhashable type`) — the compare
  *    *errors* (r2 q111).
  *
  * Policy: a gated query's OUTPUT schema must contain only driver-stable
  * scalars. Keep exact decimal arithmetic *internal*; cast terminal decimal
  * aggregates to DOUBLE (exact when ≤15 significant digits — every fixture
  * aggregate qualifies) or STRING (when exactness beyond double matters,
  * e.g. q89's 21-digit signature) on BOTH engines. Vector/array results emit
  * scalar proofs (norm + md5 of the joined components) instead of raw arrays.
  *
  * Verify.main enforces this at dump time: a hazardous schema fails fast and
  * loudly, so a regression can never reach the driver as a silent red gate.
  * OutputPolicySpec keeps the check itself honest in CI.
  */
object OutputPolicy {

  /** Hazard descriptions for `schema`, empty when driver-stable. */
  def hazards(schema: StructType): Seq[String] = {
    def walk(path: String, dt: DataType): Seq[String] = dt match {
      case _: DecimalType =>
        Seq(s"$path: ${dt.simpleString} (driver stringifies Decimal with trailing scale zeros; cast to double or string on both engines)")
      case FloatType =>
        Seq(s"$path: float (float32 shortest-repr differs between pandas and duckdb frames; cast to double on both engines)")
      case BinaryType =>
        Seq(s"$path: binary (raw bytes stringify differently across frames; emit hex/md5 instead)")
      case ArrayType(et, _) =>
        Seq(s"$path: ${dt.simpleString} (pandas cannot sort array cells; emit a scalar proof instead)") ++
          walk(s"$path[]", et)
      case MapType(kt, vt, _) =>
        Seq(s"$path: ${dt.simpleString} (pandas cannot sort map cells; emit a scalar proof instead)") ++
          walk(s"$path{k}", kt) ++ walk(s"$path{v}", vt)
      case st: StructType =>
        Seq(s"$path: struct (pandas cannot sort struct cells; flatten to columns)") ++
          st.fields.flatMap(f => walk(s"$path.${f.name}", f.dataType))
      case _ => Nil
    }
    schema.fields.flatMap(f => walk(f.name, f.dataType)).toSeq
  }

  /** Throws with a per-column explanation when `schema` would be unstable
    * under the driver's comparator.
    */
  def enforce(name: String, schema: StructType): Unit = {
    val h = hazards(schema)
    require(h.isEmpty,
      s"gated query $name emits driver-unstable output types:\n  ${h.mkString("\n  ")}")
  }
}
