package graft.types

import org.apache.spark.sql.types._

/** Typed engine errors, mirroring the reference's `DBError` taxonomy
  * (reference: src/error.rs:9-33) — attribute missing/duplicate/type,
  * expression arity — raised eagerly at bind time (SURVEY.md §1.4).
  */
sealed abstract class GraftError(msg: String) extends RuntimeException(msg)
final case class AttributeMissing(name: String)
    extends GraftError(s"Attribute missing: $name")
final case class AttributeOutOfBounds(pos: Int, width: Int)
    extends GraftError(s"Attribute position $pos out of bounds (schema width $width)")
final case class DuplicateAttribute(name: String)
    extends GraftError(s"Duplicate attribute name: $name")
final case class AttributeTypeMismatch(name: String, expected: DataType, got: DataType)
    extends GraftError(s"Attribute $name: expected $expected, got $got")
final case class ExpressionInputCount(expected: Int, got: Int)
    extends GraftError(s"Expression arity: expected $expected inputs, got $got")

/** Symbolic scalar type system of the engine.
  *
  * Mirrors the reference's `Type` enum (reference: src/types.rs:19-29) with the
  * normative Spark mapping from SURVEY.md §1.3: unsigned ints widen (Spark has
  * no unsigned types), TEXT→StringType (UTF-8 validated at source boundaries,
  * stricter than the reference's unchecked str::from_utf8_unchecked,
  * src/types.rs:182), BLOB→BinaryType. TIMESTAMP and VECTOR are engine-target
  * extensions with no reference counterpart (SURVEY.md §1.3 note).
  */
sealed abstract class GraftType(val name: String, val spark: DataType) {
  override def toString: String = name
}

object GraftType {
  case object UInt32 extends GraftType("UINT32", LongType) // widened: no unsigned in Spark
  case object UInt64 extends GraftType("UINT64", LongType) // i64 bit carrier; full range via types.Unsigned (DECIMAL(20,0))
  case object Int32 extends GraftType("INT32", IntegerType)
  case object Int64 extends GraftType("INT64", LongType)
  case object Float32 extends GraftType("FLOAT32", FloatType)
  case object Float64 extends GraftType("FLOAT64", DoubleType)
  case object Boolean extends GraftType("BOOLEAN", BooleanType)
  case object Text extends GraftType("TEXT", StringType)
  case object Blob extends GraftType("BLOB", BinaryType)
  // Engine-target extensions (SURVEY.md §1.3): not in the reference type system.
  // NTZ: the fixture parquet carries isAdjustedToUTC=false timestamps, which
  // Spark 4 surfaces as TIMESTAMP_NTZ — matching DuckDB's naive TIMESTAMP, so
  // oracle comparisons need no timezone reasoning at all.
  case object Timestamp extends GraftType("TIMESTAMP", TimestampNTZType)
  case object Vector extends GraftType("VECTOR", ArrayType(FloatType, containsNull = false))

  val all: Seq[GraftType] =
    Seq(UInt32, UInt64, Int32, Int64, Float32, Float64, Boolean, Text, Blob, Timestamp, Vector)

  /** String round-trip, mirroring `FromStr for Type` (reference: src/types.rs:154-170). */
  def fromString(s: String): GraftType =
    all.find(_.name == s.toUpperCase).getOrElse(throw AttributeMissing(s"type $s"))
}

/** Column metadata — reference `Attribute` (src/schema.rs:14-18) with its
  * `rename`/`cast` helpers (src/schema.rs:32-40).
  */
final case class Attr(name: String, gtype: GraftType, nullable: Boolean = true) {
  def rename(to: String): Attr = copy(name = to)
  def cast(to: GraftType): Attr = copy(gtype = to)
  def field: StructField = StructField(name, gtype.spark, nullable)
}

/** Ordered schema with duplicate-name rejection at construction and
  * name/position lookup with typed errors — reference `Schema`
  * (src/schema.rs:22-24; dup check :43-53; lookup :73-104; index :112-118).
  * Stricter than Spark's StructType, which tolerates duplicate names until
  * analysis; we enforce at construction like the reference.
  */
final case class GSchema(attrs: Seq[Attr]) {
  locally {
    val seen = scala.collection.mutable.HashSet[String]()
    attrs.foreach { a => if (!seen.add(a.name)) throw DuplicateAttribute(a.name) }
  }

  def width: Int = attrs.size

  def byName(name: String): Attr =
    attrs.find(_.name == name).getOrElse(throw AttributeMissing(name))

  def positionOf(name: String): Int = {
    val i = attrs.indexWhere(_.name == name)
    if (i < 0) throw AttributeMissing(name)
    i
  }

  def byPosition(pos: Int): Attr = {
    if (pos < 0 || pos >= attrs.size) throw AttributeOutOfBounds(pos, attrs.size)
    attrs(pos)
  }

  def struct: StructType = StructType(attrs.map(_.field))
}

object GSchema {
  def of(attrs: Attr*): GSchema = GSchema(attrs)

  /** Best-effort reverse mapping from a Spark StructType (for views produced
    * by Spark ops whose types we re-admit into the engine surface).
    */
  def fromStruct(st: StructType): GSchema = GSchema(st.fields.toSeq.map { f =>
    val g = f.dataType match {
      case IntegerType => GraftType.Int32
      case LongType => GraftType.Int64
      case FloatType => GraftType.Float32
      case DoubleType => GraftType.Float64
      case BooleanType => GraftType.Boolean
      case StringType => GraftType.Text
      case BinaryType => GraftType.Blob
      case TimestampType | TimestampNTZType => GraftType.Timestamp
      case ArrayType(FloatType, _) => GraftType.Vector
      case other => throw AttributeTypeMismatch(f.name, StringType, other)
    }
    Attr(f.name, g, f.nullable)
  })
}
