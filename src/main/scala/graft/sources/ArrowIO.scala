package graft.sources

import java.nio.channels.Channels
import java.nio.charset.StandardCharsets

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Arrow IPC file (Feather V2) sink + source, on the `arrow-vector`
  * library Spark itself ships — the columnar interchange sibling of the
  * Avro OCF tier ([[AvroIO]]): the format feature stores, DataFrame
  * exchanges (pandas/polars `read_feather`), and Arrow Flight services
  * speak natively. Completes the source tier's interchange matrix with a
  * COLUMNAR zero-parse format next to the row-oriented OCF.
  *
  * Execution shape (100 TB design point) mirrors AvroIO:
  *  - WRITE: one `.arrow` file per non-empty task through the Hadoop
  *    FileSystem stream, rows buffered only per RECORD BATCH (4096 rows)
  *    — the batch is Arrow's own memory unit, so peak memory is bounded
  *    by batch width, never shard size.
  *  - READ: shard-per-task via `binaryFile`; batches stream through
  *    `ArrowFileReader` one at a time (one batch of rows resident, never
  *    the whole shard). Columns resolve BY NAME against the expected
  *    schema (an evolved producer that appended columns still reads).
  *    Corrupt input follows the tier's contract: non-Arrow payload or a
  *    torn footer → zero rows; a batch that fails to load mid-file →
  *    valid prefix; never a task failure.
  *
  * Type mapping: LONG↔Int(64), INT↔Int(32), DOUBLE↔FloatingPoint(DOUBLE),
  * FLOAT↔FloatingPoint(SINGLE), STRING↔Utf8, BOOLEAN↔Bool, BINARY↔Binary;
  * anything else rejected eagerly. Arrow vectors carry per-value validity
  * bits, so nullability needs no union encoding.
  */
object ArrowIO {

  val BatchRows = 4096

  /** Spark StructType → Arrow schema (flat columns only). */
  def arrowSchema(st: StructType): ASchema = {
    val fields = new java.util.ArrayList[Field]()
    st.fields.foreach { f =>
      val at: ArrowType = f.dataType match {
        case LongType => new ArrowType.Int(64, true)
        case IntegerType => new ArrowType.Int(32, true)
        case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
        case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
        case StringType => ArrowType.Utf8.INSTANCE
        case BooleanType => ArrowType.Bool.INSTANCE
        case BinaryType => ArrowType.Binary.INSTANCE
        case other =>
          throw new IllegalArgumentException(
            s"arrow mapping for ${f.name}: unsupported type $other")
      }
      fields.add(new Field(f.name, new FieldType(f.nullable, at, null), null))
    }
    new ASchema(fields)
  }

  private def setValue(vec: FieldVector, ri: Int, v: Any): Unit = (vec, v) match {
    case (x: BigIntVector, l: java.lang.Long) => x.setSafe(ri, l.longValue())
    case (x: IntVector, i: java.lang.Integer) => x.setSafe(ri, i.intValue())
    case (x: Float8Vector, d: java.lang.Double) => x.setSafe(ri, d.doubleValue())
    case (x: Float4Vector, f: java.lang.Float) => x.setSafe(ri, f.floatValue())
    case (x: VarCharVector, s: String) => x.setSafe(ri, s.getBytes(StandardCharsets.UTF_8))
    case (x: BitVector, b: java.lang.Boolean) => x.setSafe(ri, if (b) 1 else 0)
    case (x: VarBinaryVector, b: Array[Byte]) => x.setSafe(ri, b)
    case (x, other) => throw new IllegalArgumentException(
      s"arrow write: ${x.getClass.getSimpleName} cannot hold $other")
  }

  private def getValue(vec: FieldVector, ri: Int): Any = vec match {
    case x: BigIntVector => x.get(ri)
    case x: IntVector => x.get(ri)
    case x: Float8Vector => x.get(ri)
    case x: Float4Vector => x.get(ri)
    case x: VarCharVector => new String(x.get(ri), StandardCharsets.UTF_8)
    case x: BitVector => x.get(ri) != 0
    case x: VarBinaryVector => x.get(ri)
    case x => throw new IllegalArgumentException(
      s"arrow read: unsupported vector ${x.getClass.getSimpleName}")
  }

  /** Distributed Arrow IPC write: one `part-NNNNN.arrow` file per
    * non-empty partition via the Hadoop FileSystem API (overwrite
    * semantics, the fixture-roundtrip contract). Rows stream through a
    * bounded VectorSchemaRoot of [[BatchRows]] rows per record batch.
    */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val hconf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val outDir = new org.apache.hadoop.fs.Path(path)
    val fs = outDir.getFileSystem(hconf)
    if (fs.exists(outDir)) fs.delete(outDir, true)
    fs.mkdirs(outDir)
    val confSer = new org.apache.spark.util.SerializableConfiguration(hconf)
    val sparkSchema = df.schema
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val pid = TaskContext.getPartitionId()
        val file = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.arrow")
        writeFile(file, confSer.value, sparkSchema, rows)
      }
    }
    // an all-empty input wrote no part files; land a schema-only file so
    // the sink/source pairing round-trips the empty dataset instead of
    // failing the reader's glob (the fs.create/foreachPartition split
    // cannot see global emptiness from inside a task)
    if (fs.globStatus(new org.apache.hadoop.fs.Path(path, "*.arrow")).isEmpty)
      writeFile(new org.apache.hadoop.fs.Path(path, "part-empty.arrow"),
        hconf, sparkSchema, Iterator.empty)
  }

  /** One Arrow IPC file from a row iterator. Resources are released on
    * EVERY path: a construction failure after fs.create still closes the
    * stream, and the writer/root/allocator close in order regardless of
    * body failure (ArrowFileWriter.close closes the channel and thus the
    * Hadoop stream).
    */
  private def writeFile(file: org.apache.hadoop.fs.Path,
      hconf: org.apache.hadoop.conf.Configuration,
      sparkSchema: StructType, rows: Iterator[Row]): Unit = {
    val out = file.getFileSystem(hconf).create(file, true)
    var allocator: RootAllocator = null
    var root: VectorSchemaRoot = null
    var writer: ArrowFileWriter = null
    try {
      allocator = new RootAllocator(Long.MaxValue)
      root = VectorSchemaRoot.create(arrowSchema(sparkSchema), allocator)
      writer = new ArrowFileWriter(root, null, Channels.newChannel(out))
      writer.start()
      rows.grouped(BatchRows).foreach { batch =>
        root.allocateNew()
        var ri = 0
        batch.foreach { r =>
          var ci = 0
          while (ci < sparkSchema.length) {
            val vec = root.getVector(ci)
            val v = r.get(ci)
            if (v == null) vec.setNull(ri) else setValue(vec, ri, v)
            ci += 1
          }
          ri += 1
        }
        root.setRowCount(ri)
        writer.writeBatch()
      }
      writer.end()
    } finally {
      import scala.util.control.NonFatal
      if (writer != null) { try writer.close() catch { case NonFatal(_) => () } }
      else { try out.close() catch { case NonFatal(_) => () } }
      if (root != null) root.close()
      if (allocator != null) allocator.close()
    }
  }

  /** Arrow IPC read back to a DataFrame with the caller's EXPLICIT schema
    * (the source tier's no-inference rule): shard-per-task via
    * `binaryFile`, record batches streamed one at a time, expected
    * columns resolved by NAME in the file's schema. A payload without
    * Arrow magic/footer or missing an expected column yields zero rows; a
    * batch-load failure mid-file yields the batches before it.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val n = schema.length
    val names: Array[String] = schema.fields.map(_.name)
    val payloads = spark.read.format("binaryFile")
      .load(path + "/*.arrow")
      .select(col("content"))
    payloads.mapPartitions { rows =>
      import scala.util.control.NonFatal
      val expectedTypes = arrowSchema(schema).getFields
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](0)
        new Iterator[Row] { self =>
          private var allocator: RootAllocator = null
          private var reader: ArrowFileReader = null
          private var vecs: Array[FieldVector] = null
          private var batchRows = 0
          private var ri = 0

          // an abandoned iterator (limit/take/ task failure) would leak
          // the allocator's DIRECT buffers — GC never reclaims them; the
          // task-completion hook closes whatever is still open
          private val _hook = Option(TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => closeAll()))

          try {
            allocator = new RootAllocator(Long.MaxValue)
            reader = new ArrowFileReader(
              new ByteArrayReadableSeekableByteChannel(bytes), allocator)
            val root = reader.getVectorSchemaRoot
            // resolve by name AND type; a missing column or a type drift
            // (evolved producer) = corrupt shard, zero rows — never a
            // mid-task ClassCastException
            vecs = names.map(root.getVector)
            val typeOk = vecs.forall(_ != null) &&
              vecs.indices.forall(i =>
                vecs(i).getField.getType == expectedTypes.get(i).getType)
            if (!typeOk) closeAll()
          } catch { case NonFatal(_) => closeAll() }

          private def closeAll(): Unit = {
            if (reader != null) { try reader.close() catch { case NonFatal(_) => () } }
            if (allocator != null) { try allocator.close() catch { case NonFatal(_) => () } }
            reader = null; allocator = null; vecs = null; batchRows = 0; ri = 0
          }

          private def advance(): Unit =
            while (reader != null && ri >= batchRows) {
              val loaded =
                try reader.loadNextBatch()
                catch { case NonFatal(_) => false } // torn batch → stop at prefix
              if (!loaded) closeAll()
              else {
                // loadNextBatch repopulates the SAME root; re-resolve views
                val root = reader.getVectorSchemaRoot
                vecs = names.map(root.getVector)
                batchRows = root.getRowCount
                ri = 0
              }
            }

          override def hasNext: Boolean = { advance(); reader != null }

          override def next(): Row = {
            advance()
            if (reader == null) throw new NoSuchElementException("arrow iterator")
            val vals = new Array[Any](n)
            var ci = 0
            while (ci < n) {
              val vec = vecs(ci)
              vals(ci) = if (vec.isNull(ri)) null else getValue(vec, ri)
              ci += 1
            }
            ri += 1
            if (ri >= batchRows) advance() // eager close at shard end
            Row.fromSeq(vals.toIndexedSeq)
          }
        }
      }
    }(Encoders.row(schema))
  }
}
