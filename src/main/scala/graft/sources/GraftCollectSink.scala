package graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The write half of the connector surface ([[GraftRangeSource]] is the
  * read half): an in-memory batch sink implementing Spark's two-phase
  * commit protocol, which is what makes distributed writes exactly-once:
  *
  *   - each task's [[DataWriter]] buffers rows and ships them to the
  *     driver inside its [[WriterCommitMessage]] on task commit;
  *   - nothing becomes visible until the DRIVER's `BatchWrite.commit`
  *     publishes all task messages atomically — a failed/retried/
  *     speculative task attempt only ever contributes via the one message
  *     the scheduler accepts;
  *   - on job failure `abort` runs instead and the table is untouched.
  *
  * A real 100 TB sink buffers to durable temp locations (files/uploads)
  * and publishes paths in the commit message rather than rows — the
  * protocol shape is identical; only the payload differs.
  * Mirrors the reference's TableAppender append contract
  * (`src/table.rs:124-191` — sticky-error, all-or-nothing appends)
  * at distributed-commit granularity.
  *
  * Usage: `df.write.format("graft.sources.GraftCollectSink")
  *   .option("name", "t").mode("append").save()` then
  * `GraftCollectSink.rows("t")`.
  */
class GraftCollectSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: schema comes from the DataFrame

  // the written DataFrame supplies the schema (passed into getTable)
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new CollectTable(properties.getOrDefault("name", "default"), schema)
}

object GraftCollectSink {
  /** name → committed rows (each row a Seq of external Catalyst values). */
  private[sources] val tables =
    new ConcurrentHashMap[String, Seq[Seq[Any]]]()

  def rows(name: String): Seq[Seq[Any]] = Option(tables.get(name)).getOrElse(Nil)
  def names: Seq[String] = tables.keys.asScala.toSeq
  def clear(name: String): Unit = tables.remove(name)
}

private[sources] class CollectTable(name: String, tableSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_collect($name)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var truncate0 = false
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new CollectBatchWrite(name, info.schema(), truncate0)
      }
      // TRUNCATE capability: overwrite mode replaces, append merges
      override def truncate(): WriteBuilder = { truncate0 = true; this }
    }
}

private[sources] case class CollectCommit(rows: Seq[Seq[Any]]) extends WriterCommitMessage

private[sources] class CollectBatchWrite(name: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new CollectWriterFactory(schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // the atomic publish: all task outputs become visible in one step
    val all = messages.toSeq.flatMap(_.asInstanceOf[CollectCommit].rows)
    // merge puts `all` when absent; when present, truncate replaces and
    // append concatenates
    GraftCollectSink.tables.merge(name, all,
      (old, add) => if (truncate) add else old ++ add)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class CollectWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // full internal→external conversion, eagerly, for EVERY type: the
      // incoming InternalRow buffer is reused per row, so any
      // buffer-backed value (UTF8String, UnsafeArrayData, nested rows)
      // kept as-is would be overwritten by the next write() — the classic
      // reused-row bug. The converter materializes external copies
      // (String, Seq, BigDecimal, …) so nothing aliases the buffer.
      private val toExternal =
        org.apache.spark.sql.catalyst.CatalystTypeConverters.createToScalaConverter(schema)
      private val buf = Seq.newBuilder[Seq[Any]]
      override def write(row: InternalRow): Unit =
        buf += toExternal(row).asInstanceOf[org.apache.spark.sql.Row].toSeq
      override def commit(): WriterCommitMessage = CollectCommit(buf.result())
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
