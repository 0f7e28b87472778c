package graft.sources

import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The streaming third of the connector surface (batch read:
  * [[GraftRangeSource]]; batch write: [[GraftCollectSink]]): a
  * deterministic micro-batch source implementing Spark's offset protocol —
  * the contract that makes streaming reads exactly-once and restartable:
  *
  *   - the driver asks `latestOffset(start, limit)` (admission control)
  *     what to read next FROM ITS OWN resume position; the source offers
  *     `rowsPerBatch` more, up to `maxRows` — never instance state, which
  *     a restart would reset (see the note inside [[CounterStream]]);
  *   - `planInputPartitions(start, end)` makes the batch a pure function
  *     of its offset range — a retried batch re-reads the same rows;
  *   - offsets round-trip through the checkpoint log as JSON
  *     (`deserializeOffset`), so a restarted query resumes after the last
  *     committed batch instead of re-emitting from zero.
  *
  * A real source (Kafka-shaped) maps this 1:1 — offsets per partition
  * instead of one counter. Rows are (id, v = id·7).
  *
  * Usage: `spark.readStream.format("graft.sources.GraftStreamSource")
  *   .option("maxRows", 100).option("rowsPerBatch", 30).load()`
  */
class GraftStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftStreamSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new StreamTable(
      properties.getOrDefault("maxRows", "100").toLong,
      properties.getOrDefault("rowsPerBatch", "10").toLong)
}

object GraftStreamSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))
}

private[sources] class StreamTable(maxRows: Long, rowsPerBatch: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_stream($maxRows,$rowsPerBatch)"
  override def schema(): StructType = GraftStreamSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = GraftStreamSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CounterStream(maxRows, rowsPerBatch)
      }
    }
}

private[sources] case class CounterOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] class CounterStream(maxRows: Long, rowsPerBatch: Long)
    extends MicroBatchStream with SupportsAdmissionControl {
  // STATELESS availability: batch pacing comes from the admission-control
  // latestOffset(start, limit), where the ENGINE supplies the true resume
  // position. An earlier design kept an in-memory "offered" cursor bumped
  // by the no-arg latestOffset(); it broke on restart because the engine
  // may call latestOffset() on a fresh instance BEFORE feeding it the
  // checkpointed offsets — the fabricated cursor sat behind the real
  // position and the engine planned a backwards then overlapping batch.
  // Offsets must be a function of engine-provided state, never of
  // instance history.

  override def initialOffset(): Offset = CounterOffset(0L)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[CounterOffset].n
    CounterOffset(math.min(maxRows, s + rowsPerBatch))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is the entry point")

  override def reportLatestOffset(): Offset = CounterOffset(maxRows)

  override def deserializeOffset(json: String): Offset =
    CounterOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (lo, hi) = (start.asInstanceOf[CounterOffset].n, end.asInstanceOf[CounterOffset].n)
    if (hi <= lo) Array.empty
    else Array(GraftRangeSlice(lo, hi)) // batch = pure function of the range
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val s = p.asInstanceOf[GraftRangeSlice]
        new PartitionReader[InternalRow] {
          private var cur = s.lo - 1
          override def next(): Boolean = { cur += 1; cur < s.hi }
          override def get(): InternalRow =
            new GenericInternalRow(Array[Any](cur, cur * 7))
          override def close(): Unit = ()
        }
      }
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
