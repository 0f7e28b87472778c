package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Avro Object Container File (OCF) sink + source, built directly on the
  * `org.apache.avro` core library that ships on Spark's classpath — no
  * external connector module. Avro OCF is the fourth row-oriented
  * interchange format of the source tier (after CSV/JSON/text): the
  * standard landing format for log ingestion and schema-registry
  * pipelines, and the on-disk shape Kafka archival jobs produce.
  *
  * Execution shape (100 TB design point):
  *  - WRITE is one file per task at the codec boundary: each partition
  *    serializes its rows through a `DataFileWriter` straight onto the
  *    Hadoop `FileSystem` stream (works unchanged against HDFS/object
  *    stores), so rows never collect anywhere and output parallelism ==
  *    input partitioning. Snappy-codec'd blocks keep files splittable by
  *    Avro's own sync markers.
  *  - READ parallelizes per FILE via `binaryFile` (shard-per-task, the
  *    same unit the tar/WARC tier uses): an OCF shard is the natural
  *    work unit of an ingestion corpus (they ship at 64-512 MB), so
  *    file-level parallelism saturates a cluster whenever there are more
  *    shards than cores — true by construction at 100 TB. Within-file
  *    sync-marker splitting (what a DataSourceV2 FilePartition reader
  *    would add) matters only for the few-giant-files degenerate layout;
  *    documented as the follow-on, not silently assumed.
  *
  * Type mapping (both directions): LONG↔long, INT↔int, DOUBLE↔double,
  * FLOAT↔float, STRING↔string, BOOLEAN↔boolean, BINARY↔bytes; nullable
  * columns map to the `["null", T]` union. Anything else is rejected
  * eagerly at schema-build time — no silent coercion.
  */
object AvroIO {

  /** Spark StructType → Avro record schema (flat columns only). */
  def avroSchema(st: StructType, recordName: String): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case StringType => Schema.create(Schema.Type.STRING)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other =>
          throw new IllegalArgumentException(
            s"avro mapping for ${f.name}: unsupported type $other")
      }
      val sch =
        if (f.nullable)
          Schema.createUnion(java.util.Arrays.asList(
            Schema.create(Schema.Type.NULL), base))
        else base
      fields.add(new Schema.Field(f.name, sch, null, null))
    }
    Schema.createRecord(recordName, null, "graft.avro", false, fields)
  }

  /** Distributed OCF write: one `part-NNNNN.avro` file per non-empty
    * partition, created through the Hadoop FileSystem API (so the same
    * code path lands on HDFS or an object store on a real cluster).
    * Existing output is removed first (overwrite semantics — the only
    * mode the sink offers, matching the fixture-roundtrip contract).
    */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val hconf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val outDir = new org.apache.hadoop.fs.Path(path)
    val fs = outDir.getFileSystem(hconf)
    if (fs.exists(outDir)) fs.delete(outDir, true)
    fs.mkdirs(outDir)
    val schemaJson = avroSchema(df.schema, "row").toString
    val confSer = new org.apache.spark.util.SerializableConfiguration(hconf)
    val sparkSchema = df.schema
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val pid = TaskContext.getPartitionId()
        val file = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.avro")
        val out = file.getFileSystem(confSer.value).create(file, true)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        writer.setCodec(CodecFactory.snappyCodec())
        writer.create(schema, out) // DataFileWriter closes `out` on close()
        try {
          rows.foreach { r =>
            val rec = new GenericData.Record(schema)
            var i = 0
            while (i < sparkSchema.length) {
              val v = r.get(i) match {
                case null => null
                case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
                case x => x // long/int/double/float/boolean/String box fine
              }
              rec.put(i, v)
              i += 1
            }
            writer.append(rec)
          }
        } finally writer.close()
      }
    }
    // an all-empty input wrote no part files; land a header-only OCF so
    // the sink/source pairing round-trips the empty dataset instead of
    // failing the reader's glob
    if (fs.globStatus(new org.apache.hadoop.fs.Path(path, "*.avro")).isEmpty) {
      val schema = new Schema.Parser().parse(schemaJson)
      val file = new org.apache.hadoop.fs.Path(path, "part-empty.avro")
      val out = fs.create(file, true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.setCodec(CodecFactory.snappyCodec())
      writer.create(schema, out)
      writer.close()
    }
  }

  /** OCF read back to a DataFrame with the caller's EXPLICIT schema (the
    * source tier's no-inference rule): shard-per-task via `binaryFile`,
    * each payload streamed through `DataFileStream` lazily — rows are
    * emitted one at a time, so a shard's raw bytes are never doubled by
    * a materialized row buffer. Reader-side schema resolution is Avro's
    * own (the writer schema embedded in the file header is matched to
    * the expected schema), so files written by an evolved producer still
    * land as long as the named fields resolve. Corrupt input follows the
    * tar/WARC tier's contract: a payload that is not a parseable OCF
    * (bad magic, torn or garbled header — surfaced by Avro as
    * IOException, AvroRuntimeException, or SchemaParseException, hence
    * the NonFatal catch) yields zero rows, and a shard that dies
    * mid-stream (torn block, codec checksum failure) yields the valid
    * prefix — never a task failure.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val expectedJson = avroSchema(schema, "row").toString
    val n = schema.length
    val types: Array[DataType] = schema.fields.map(_.dataType)
    val payloads = spark.read.format("binaryFile")
      .load(path + "/*.avro")
      .select(col("content"))
    payloads.mapPartitions { rows =>
      import scala.util.control.NonFatal
      val expected = new Schema.Parser().parse(expectedJson)
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](0)
        new Iterator[Row] {
          private var stream: DataFileStream[GenericRecord] =
            try new DataFileStream[GenericRecord](
              new java.io.ByteArrayInputStream(bytes),
              new GenericDatumReader[GenericRecord](null, expected))
            catch { case NonFatal(_) => null }
          private var nextRec: GenericRecord = null

          private def advance(): Unit =
            if (stream != null && nextRec == null) {
              nextRec =
                try { if (stream.hasNext) stream.next() else null }
                catch { case NonFatal(_) => null } // torn block → stop at prefix
              if (nextRec == null) {
                try stream.close() catch { case NonFatal(_) => () }
                stream = null
              }
            }

          override def hasNext: Boolean = { advance(); nextRec != null }

          override def next(): Row = {
            advance()
            if (nextRec == null) throw new NoSuchElementException("avro iterator")
            val rec = nextRec
            nextRec = null
            val vals = new Array[Any](n)
            var i = 0
            while (i < n) {
              vals(i) = (rec.get(i), types(i)) match {
                case (null, _) => null
                case (u: org.apache.avro.util.Utf8, StringType) => u.toString
                case (s: CharSequence, StringType) => s.toString
                case (bb: java.nio.ByteBuffer, BinaryType) =>
                  val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
                case (v, _) => v
              }
              i += 1
            }
            Row.fromSeq(vals.toIndexedSeq)
          }
        }
      }
    }(Encoders.row(schema))
  }
}
