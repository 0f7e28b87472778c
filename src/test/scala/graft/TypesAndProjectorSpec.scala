package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.types._
import graft.ops._

/** Ports of the reference's own unit-test semantics (FIXTURES.md §A):
  * null-vector behavior (reference src/table.rs:203-231), schema-width
  * errors (:234-247), varlen round-trip (:250-292), and projection
  * reorder/rename (src/operation/project.rs:78-120) — plus the schema
  * system's duplicate/missing/bounds contract (src/schema.rs).
  */
class TypesAndProjectorSpec extends SparkTestBase {

  test("type mapping round-trips through names (types.rs FromStr semantics)") {
    GraftType.all.foreach { t =>
      assert(GraftType.fromString(t.name) == t)
    }
    assert(GraftType.UInt32.spark == LongType) // widened, §1.3
    assert(GraftType.Text.spark == StringType)
    assert(GraftType.Blob.spark == BinaryType)
  }

  test("GSchema rejects duplicate attribute names at construction (schema.rs:43-53)") {
    intercept[DuplicateAttribute] {
      GSchema.of(Attr("a", GraftType.Int64), Attr("a", GraftType.Text))
    }
  }

  test("GSchema lookup errors are typed (schema.rs:73-118)") {
    val s = GSchema.of(Attr("one", GraftType.Int64), Attr("two", GraftType.Text))
    assert(s.positionOf("two") == 1)
    assert(s.byPosition(0).name == "one")
    intercept[AttributeMissing] { s.byName("three") }
    intercept[AttributeOutOfBounds] { s.byPosition(5) }
  }

  test("null vector semantics: NULL row then value row (table.rs:203-231)") {
    val schema = StructType(Seq(StructField("test_column", LongType, nullable = true)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(null), Row(15L)), schema)
    val got = df.collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getLong(0) == 15L)
  }

  test("over-wide row rejected (table.rs:234-247 AttributeMissing semantics)") {
    val schema = StructType(Seq(StructField("only", LongType, nullable = false)))
    intercept[Exception] {
      spark.createDataFrame(java.util.List.of(Row(1L, 2L)), schema).collect()
    }
  }

  test("varlen BLOB/TEXT round-trip (table.rs:250-292)") {
    val schema = StructType(Seq(
      StructField("one", BinaryType, nullable = false),
      StructField("two", StringType, nullable = false)))
    val bytes = Array[Byte](0, 1, 2, 3, 4)
    val df = spark.createDataFrame(java.util.List.of(Row(bytes, "one"), Row(bytes, "two")), schema)
    val got = df.collect()
    assert(got(0).getAs[Array[Byte]]("one").toSeq == bytes.toSeq)
    assert(got.map(_.getString(1)).toSeq == Seq("one", "two"))
  }

  test("projection reorder/rename by position and name (project.rs:78-120)") {
    import spark.implicits._
    val df = Seq((0L, 1L, 13L)).toDF("one", "two", "three")
    val out = Projector.of(
      Projector.byPositionAs(2, "new_one"),
      Projector.byName("two"))(df)
    assert(out.columns.toSeq == Seq("new_one", "two"))
    assert(out.collect().head == Row(13L, 1L))
  }

  test("projector rejects duplicate output names (projector.rs:90 via Schema::from_vec)") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[DuplicateAttribute] {
      Projector.of(Projector.byName("a"), Projector.byNameAs("b", "a"))(df)
    }
  }

  test("projector bind fails on missing name / out-of-bounds position") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[AttributeMissing] { Projector.of(Projector.byName("zzz"))(df) }
    intercept[AttributeOutOfBounds] { Projector.of(Projector.byPosition(9))(df) }
  }

  test("prefix projection disambiguates (projector.rs As::PREFIX)") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    val out = Projector.of(Projector.allPrefixed("l_"))(df)
    assert(out.columns.toSeq == Seq("l_a", "l_b"))
  }

  test("UINT64 full range: carrier <-> DECIMAL(20,0) round-trips exactly at the edges") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // the interesting u64 values: 0, 1, 2^63-1 (max positive carrier),
    // 2^63 (carrier Long.MinValue), 2^64-1 (carrier -1)
    val carriers = Seq(0L, 1L, Long.MaxValue, Long.MinValue, -1L)
    val df = carriers.toDF("i")
      .withColumn("u", Unsigned.toUnsigned(col("i")))
      .withColumn("back", Unsigned.toCarrier(col("u")))
    val rows = df.collect().map(r =>
      (r.getLong(0), BigDecimal(r.getDecimal(1)), r.getLong(2)))
    val expectU = Map(
      0L -> BigDecimal(0), 1L -> BigDecimal(1),
      Long.MaxValue -> BigDecimal("9223372036854775807"),
      Long.MinValue -> BigDecimal("9223372036854775808"),
      -1L -> BigDecimal("18446744073709551615"))
    rows.foreach { case (i, u, back) =>
      assert(u == expectU(i), s"carrier $i mapped to $u")
      assert(back == i, s"round-trip lost $i -> $u -> $back")
    }
    // unsigned ORDER differs from signed order: -1L is the LARGEST u64
    val ordered = df.orderBy(col("u").asc).collect().map(_.getLong(0)).toSeq
    assert(ordered == Seq(0L, 1L, Long.MaxValue, Long.MinValue, -1L))
  }
}
