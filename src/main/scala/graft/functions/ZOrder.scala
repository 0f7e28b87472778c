package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for multi-dimensional data layout.
  *
  * Sorting (then range-partitioning) a table by the interleaved bits of
  * several clustering keys gives every written file a tight min/max range
  * in EVERY dimension, so scans filtered on any of the dimensions can skip
  * files — single-key sorting gives that for one dimension and leaves the
  * others spanning the full domain per file. This is the standard layout
  * optimization for multi-predicate scan-heavy tables (Delta/Iceberg
  * OPTIMIZE ZORDER BY); here it is a pure Column expression — integer
  * shifts/masks only, codegen-friendly, and reproducible in any engine
  * (the DuckDB oracle runs the identical arithmetic).
  */
object ZOrder {

  /** Spread the low 16 bits of x so bit i lands at position 2i
    * (the classic mask-shift doubling chain, each step exact int math).
    */
  private def spread16(x: Column): Column = {
    val a = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val c = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (c.bitwiseOR(shiftleft(c, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** The 32-bit Morton code of two 16-bit dimensions: x in even bit
    * positions, y in odd. Inputs are masked to 16 bits (callers quantize
    * wider domains first — rank or hash them into [0, 65536)).
    */
  def interleave16(x: Column, y: Column): Column =
    spread16(x.bitwiseAND(lit(0xFFFFL)))
      .bitwiseOR(shiftleft(spread16(y.bitwiseAND(lit(0xFFFFL))), 1))

  /** The same arithmetic as ANSI SQL (for oracles / cross-engine checks).
    * The spread chain splices each operand 16 times into the output text —
    * pass simple column references (alias any real quantization expression
    * in a subselect first), or the oracle SQL grows multi-KB and the
    * engine re-evaluates the operand per occurrence.
    */
  def interleave16Sql(x: String, y: String): String = {
    def spread(v: String): String = {
      val a = s"((($v | ($v << 8)) & 16711935))"
      val b = s"((($a | ($a << 4)) & 252645135))"
      val c = s"((($b | ($b << 2)) & 858993459))"
      s"((($c | ($c << 1)) & 1431655765))"
    }
    s"(${spread(s"($x & 65535)")} | (${spread(s"($y & 65535)")} << 1))"
  }
}
