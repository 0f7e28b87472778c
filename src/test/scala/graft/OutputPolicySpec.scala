package graft

import org.apache.spark.sql.types._

/** CI enforcement of the driver-comparator output-type policy (OutputPolicy):
  * every gated query's output schema must stay driver-stable, and the lint
  * itself must keep rejecting the hazardous types it exists for.
  */
class OutputPolicySpec extends SparkTestBase {

  test("every gated query output schema is driver-stable (no decimal/array/map/struct)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val schema = fn(spark, sf).schema
      val h = OutputPolicy.hazards(schema)
      assert(h.isEmpty, s"$name would hash-fail or crash the driver comparator:\n  ${h.mkString("\n  ")}")
    }
  }

  test("lint rejects the hazard types and accepts scalars") {
    assert(OutputPolicy.hazards(StructType(Seq(
      StructField("a", LongType), StructField("b", DoubleType),
      StructField("c", StringType), StructField("d", BooleanType),
      StructField("e", TimestampNTZType), StructField("f", DateType)))).isEmpty)
    assert(OutputPolicy.hazards(StructType(Seq(
      StructField("x", DecimalType(28, 2))))).nonEmpty)
    assert(OutputPolicy.hazards(StructType(Seq(
      StructField("x", ArrayType(DoubleType))))).nonEmpty)
    assert(OutputPolicy.hazards(StructType(Seq(
      StructField("x", MapType(StringType, LongType))))).nonEmpty)
    assert(OutputPolicy.hazards(StructType(Seq(
      StructField("x", StructType(Seq(StructField("y", LongType))))))).nonEmpty)
    // float32 / raw binary drift under the stringified compare (ADVICE r3)
    assert(OutputPolicy.hazards(StructType(Seq(
      StructField("x", FloatType)))).nonEmpty)
    assert(OutputPolicy.hazards(StructType(Seq(
      StructField("x", BinaryType)))).nonEmpty)
    // nested hazards are found, not just top-level ones
    intercept[IllegalArgumentException] {
      OutputPolicy.enforce("t", StructType(Seq(
        StructField("ok", LongType), StructField("bad", DecimalType(18, 2)))))
    }
  }
}
