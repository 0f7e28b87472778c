package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.types._

/** Programmatic row-major ingestion — the reference's `Table`/`TableAppender`
  * E3 path (reference src/table.rs:124-191): a fluent builder with a sticky
  * error, schema-width enforcement (writing past the last column errors
  * `AttributeMissing`, test src/table.rs:234-247), and nullability checking.
  * `done()` finalizes a row; `build()` yields the DataFrame (the reference's
  * `Table::take()`).
  *
  * This is a driver-side construction tool for small/dimension data and
  * fixtures — bulk data enters through the file sources.
  */
final class TableBuilder(spark: SparkSession, schema: GSchema) {

  private val rows = scala.collection.mutable.ArrayBuffer[Row]()
  private var current: Array[Any] = _
  private var pos: Int = 0
  private var stickyError: Option[GraftError] = None

  def error: Option[GraftError] = stickyError

  private def fail(e: GraftError): this.type = {
    if (stickyError.isEmpty) stickyError = Some(e)
    this
  }

  def addRow(): this.type = {
    if (stickyError.nonEmpty) return this
    if (current != null) fail(ExpressionInputCount(schema.width, pos)) else {
      current = Array.fill[Any](schema.width)(null)
      pos = 0
    }
    this
  }

  def set(v: Any): this.type = {
    if (stickyError.nonEmpty) return this
    if (current == null || pos >= schema.width)
      return fail(AttributeMissing(s"column position $pos"))
    val attr = schema.byPosition(pos)
    if (v == null && !attr.nullable)
      return fail(AttributeTypeMismatch(attr.name, attr.gtype.spark,
        org.apache.spark.sql.types.NullType))
    current(pos) = v
    pos += 1
    this
  }

  def setNull(): this.type = set(null)

  def done(): this.type = {
    if (stickyError.nonEmpty) return this
    if (current == null) return fail(AttributeMissing("no open row"))
    rows += Row.fromSeq(current.toSeq)
    current = null
    pos = 0
    this
  }

  /** Finalize. Throws the sticky error if any write failed (the reference
    * returns it from done(); we keep the fluent chain and surface it here).
    */
  def build(): DataFrame = {
    stickyError.foreach(throw _)
    if (current != null) throw AttributeMissing("unfinished row (call done())")
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows.toSeq).asJava),
      schema.struct)
  }
}

object TableBuilder {
  def apply(spark: SparkSession, schema: GSchema): TableBuilder =
    new TableBuilder(spark, schema)
}
