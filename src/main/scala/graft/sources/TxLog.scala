package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Minimal Delta-style TRANSACTIONAL table format over parquet — the
  * table-format-transactionality gap the r8 verdict ranked top-3 among
  * remaining engine deltas. Spark-first: data IO is ordinary distributed
  * parquet; only the COMMIT LOG — kilobytes of JSON per commit — touches
  * the driver, so the design carries to 100 TB unchanged (the log is
  * O(commits), never O(data); checkpoints bound replay to O(files)).
  *
  * Layout: `<table>/_txlog/<v%020d>.json` log entries + a full-state
  * `<v%020d>.checkpoint.json` every [[CheckpointInterval]] commits; data
  * files live under `<table>/data/<uuid>/` — one fresh directory per
  * commit, so data writes NEVER overwrite and need no rename dance.
  *
  * Concurrency (optimistic, writer-writer): a commit is the atomic
  * creation of the next version file with create(overwrite = false) —
  * atomic on HDFS (namenode create) and on local file systems (O_EXCL).
  * On collision the writer re-reads the snapshot, re-resolves (appends
  * never conflict semantically; an overwrite recomputes its remove set
  * against the fresh state), and retries the next version. Object
  * stores without atomic put-if-absent need an external commit
  * coordinator — documented out of scope, exactly as the public Delta
  * protocol documents it.
  *
  * Reader semantics: snapshot isolation — a read resolves the live file
  * set at one version and never sees a half-commit (data directories are
  * immutable once their entry is visible). A torn FINAL entry (crashed
  * writer) is ignored; a torn NON-final entry is a corrupt table and
  * reads fail loudly rather than silently dropping committed data.
  *
  * Schema: enforced on append (exact StructType match against the
  * current snapshot — silent drift is how lakes rot); `overwrite` may
  * change it (the full-replace semantics).
  */
object TxLog {

  val CheckpointInterval = 10
  private val MaxRetries = 50

  final case class Entry(
      version: Long,
      operation: String, // "append" | "overwrite" | "checkpoint"
      schemaJson: String,
      add: Seq[String],    // table-relative paths
      remove: Seq[String],
      rowCounts: Seq[Long]) // per added file, parquet-footer truth

  final case class Snapshot(version: Long, schema: StructType, files: Seq[String], rows: Long)

  private def mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m
  }

  private def logDir(table: Path) = new Path(table, "_txlog")
  private def entryPath(table: Path, v: Long) = new Path(logDir(table), f"$v%020d.json")
  private def ckptPath(table: Path, v: Long) = new Path(logDir(table), f"$v%020d.checkpoint.json")

  private def writeJson(e: Entry): Array[Byte] = {
    val root = mapper.createObjectNode()
    root.put("version", e.version)
    root.put("operation", e.operation)
    root.put("schema", e.schemaJson)
    val add = root.putArray("add"); e.add.foreach(add.add)
    val rem = root.putArray("remove"); e.remove.foreach(rem.add)
    val rc = root.putArray("rowCounts"); e.rowCounts.foreach(rc.add)
    (root.toString + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** null on any parse failure — the torn-entry signal, never an exception. */
  private def parseJson(bytes: Array[Byte]): Entry =
    try {
      val n = mapper.readTree(bytes)
      if (n == null || !n.has("version") || !n.has("operation") || !n.has("schema") ||
        !n.has("add") || !n.has("remove")) null
      else Entry(
        n.get("version").asLong(),
        n.get("operation").asText(),
        n.get("schema").asText(),
        n.get("add").elements().asScala.map(_.asText()).toSeq,
        n.get("remove").elements().asScala.map(_.asText()).toSeq,
        if (n.has("rowCounts")) n.get("rowCounts").elements().asScala.map(_.asLong()).toSeq
        else Seq.empty)
    } catch { case _: Exception => null }

  private def fsOf(spark: SparkSession, table: Path): FileSystem =
    table.getFileSystem(spark.sessionState.newHadoopConf())

  /** readEntry with bounded patience: create(no-overwrite) atomically
    * CLAIMS a version, but the entry's bytes land between create and
    * close, so another process can observe the file before its content —
    * an in-flight commit, not a torn one. Poll briefly before deciding;
    * a crashed writer's file never becomes parseable, an in-flight write
    * completes in milliseconds.
    */
  private def readEntryPatient(fs: FileSystem, p: Path, patienceMs: Long): Entry = {
    val deadline = System.nanoTime() + patienceMs * 1000000L
    var e = readEntry(fs, p)
    while (e == null && System.nanoTime() < deadline) {
      Thread.sleep(20)
      e = readEntry(fs, p)
    }
    e
  }

  private def readEntry(fs: FileSystem, p: Path): Entry =
    try {
      val in = fs.open(p)
      try {
        val len = fs.getFileStatus(p).getLen.toInt
        val buf = new Array[Byte](len)
        in.readFully(0, buf)
        parseJson(buf)
      } finally in.close()
    } catch { case _: Exception => null }

  /** (versions present, checkpoint versions present), both sorted. */
  private def listLog(fs: FileSystem, table: Path): (Seq[Long], Seq[Long]) = {
    val dir = logDir(table)
    if (!fs.exists(dir)) return (Seq.empty, Seq.empty)
    val names = fs.listStatus(dir).toSeq.map(_.getPath.getName)
    val vs = names.collect { case n if n.matches("\\d{20}\\.json") => n.take(20).toLong }.sorted
    val cs = names.collect { case n if n.matches("\\d{20}\\.checkpoint\\.json") => n.take(20).toLong }.sorted
    (vs, cs)
  }

  /** The snapshot at `asOf` (latest when None). Version 0 = the empty
    * table (exists as soon as the directory does, or not at all — both
    * read as zero files with an empty schema).
    */
  def snapshot(spark: SparkSession, dir: String, asOf: Option[Long] = None): Snapshot = {
    val table = new Path(dir)
    val fs = fsOf(spark, table)
    val (vsAll, csAll) = listLog(fs, table)
    val vs = asOf.fold(vsAll)(v => vsAll.filter(_ <= v))
    if (vs.isEmpty) return Snapshot(0L, new StructType(), Seq.empty, 0L)
    // start from the newest parseable checkpoint <= asOf, replay forward
    val usable = asOf.fold(csAll)(v => csAll.filter(_ <= v))
    var base: Entry = null
    var baseV = 0L
    usable.reverse.find { cv =>
      val e = readEntry(fs, ckptPath(table, cv))
      if (e != null) { base = e; baseV = cv; true } else false
    }
    val files = scala.collection.mutable.LinkedHashMap[String, Long]()
    var schemaJson = ""
    def finish(ver: Long): Snapshot = {
      val schema =
        if (schemaJson.isEmpty) new StructType()
        else DataType.fromJson(schemaJson).asInstanceOf[StructType]
      Snapshot(ver, schema, files.keys.toSeq, files.values.sum)
    }
    if (base != null) {
      schemaJson = base.schemaJson
      base.add.zipAll(base.rowCounts, "", 0L).foreach { case (f, rc) => files(f) = rc }
    }
    val present = vs.toSet
    var v = baseV + 1
    val last = vs.last
    while (v <= last) {
      if (!present.contains(v))
        throw new IllegalStateException(s"txlog gap at version $v in $dir")
      // FINAL entry unparseable = uncommitted (in-flight or crashed
      // writer) — the snapshot correctly ends one version earlier, no
      // patience needed; a NON-final unparseable entry gets patience
      // (later versions exist, so a writer was mid-close when we listed)
      // and only then is the table declared corrupt — committed data
      // must never be silently dropped
      val e =
        if (v == last) readEntry(fs, entryPath(table, v))
        else readEntryPatient(fs, entryPath(table, v), patienceMs = 2000)
      if (e == null) {
        if (v == last) return finish(v - 1)
        throw new IllegalStateException(s"txlog torn non-final entry $v in $dir — repair required")
      }
      e.remove.foreach(files.remove)
      e.add.zipAll(e.rowCounts, "", 0L).foreach { case (f, rc) => files(f) = rc }
      schemaJson = e.schemaJson
      v += 1
    }
    finish(last)
  }

  /** Snapshot read as a DataFrame (time travel via `asOf`). */
  def read(spark: SparkSession, dir: String, asOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, dir, asOf)
    if (snap.files.isEmpty)
      spark.createDataFrame(java.util.Collections.emptyList[Row](), snap.schema)
    else
      spark.read.schema(snap.schema).parquet(snap.files.map(f => s"$dir/$f"): _*)
  }

  /** Metadata-only row count at a version — the log carries per-file
    * footer counts, so COUNT(*) never scans data (the 100 TB posture).
    */
  def rowCount(spark: SparkSession, dir: String, asOf: Option[Long] = None): Long =
    snapshot(spark, dir, asOf).rows

  def append(spark: SparkSession, dir: String, df: DataFrame): Long =
    commit(spark, dir, df, overwriteAll = false)

  def overwrite(spark: SparkSession, dir: String, df: DataFrame): Long =
    commit(spark, dir, df, overwriteAll = true)

  private def commit(spark: SparkSession, dir: String, df: DataFrame, overwriteAll: Boolean): Long = {
    val table = new Path(dir)
    val fs = fsOf(spark, table)
    // 1. write the data files FIRST, into a commit-unique directory —
    //    unreferenced until the log entry lands, so a crash here leaks
    //    only unreachable files (vacuum's job), never a broken table
    val uuid = java.util.UUID.randomUUID().toString
    val dataRel = s"data/$uuid"
    df.write.parquet(s"$dir/$dataRel")
    val written = fs.listStatus(new Path(table, dataRel)).toSeq
      .map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .sortBy(_.getName)
    val conf = spark.sessionState.newHadoopConf()
    val counts = written.map { p =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try r.getRecordCount finally r.close()
    }
    val addRel = written.map(p => s"$dataRel/${p.getName}")
    val schemaJson = df.schema.json
    // 2. optimistic commit loop
    var attempt = 0
    while (attempt < MaxRetries) {
      val snap = snapshot(spark, dir, None)
      if (!overwriteAll && snap.files.nonEmpty && snap.schema.json != schemaJson)
        throw new IllegalArgumentException(
          s"txlog append schema mismatch in $dir: table ${snap.schema.simpleString} vs data ${df.schema.simpleString}")
      val v = snap.version + 1
      val entry = Entry(v, if (overwriteAll) "overwrite" else "append", schemaJson,
        addRel, if (overwriteAll) snap.files else Seq.empty, counts)
      if (fs.mkdirs(logDir(table)) || fs.exists(logDir(table))) {
        val tryCreate =
          try {
            val out = fs.create(entryPath(table, v), false) // the atomicity primitive
            try out.write(writeJson(entry)) finally out.close()
            true
          } catch { case _: java.io.IOException => false } // version taken: retry
        if (tryCreate) {
          maybeCheckpoint(spark, fs, table, dir, v)
          return v
        }
        // collision: wait out an in-flight winner; if the occupant
        // NEVER parses, a writer crashed mid-create and the slot is
        // poisoned — fail loudly (repair), never overwrite a file
        // another writer may still be writing
        if (readEntryPatient(fs, entryPath(table, v), patienceMs = 2000) == null)
          throw new IllegalStateException(s"txlog torn entry at version $v in $dir — repair required")
      }
      attempt += 1
    }
    throw new IllegalStateException(s"txlog commit contention in $dir: $MaxRetries retries exhausted")
  }

  private def maybeCheckpoint(spark: SparkSession, fs: FileSystem, table: Path, dir: String, v: Long): Unit =
    if (v % CheckpointInterval == 0) try {
      val snap = snapshot(spark, dir, Some(v))
      val entry = Entry(v, "checkpoint", snap.schema.json, snap.files,
        Seq.empty, perFileCounts(spark, dir, snap.files))
      val out = fs.create(ckptPath(table, v), true) // checkpoints are idempotent
      try out.write(writeJson(entry)) finally out.close()
    } catch { case _: Exception => () } // best-effort: replay still works

  private def perFileCounts(spark: SparkSession, dir: String, files: Seq[String]): Seq[Long] = {
    val conf = spark.sessionState.newHadoopConf()
    files.map { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(s"$dir/$f"), conf))
      try r.getRecordCount finally r.close()
    }
  }

  /** Delete data files no longer live in the LATEST snapshot and log
    * entries older than the newest checkpoint (time travel keeps working
    * back to that checkpoint; earlier versions are gone — the documented
    * retention trade, same as any lake's VACUUM).
    */
  def vacuum(spark: SparkSession, dir: String): Long = {
    val table = new Path(dir)
    val fs = fsOf(spark, table)
    val snap = snapshot(spark, dir, None)
    val live = snap.files.toSet
    val dataRoot = new Path(table, "data")
    var removed = 0L
    if (fs.exists(dataRoot)) {
      fs.listStatus(dataRoot).foreach { d =>
        fs.listStatus(d.getPath).foreach { f =>
          val rel = s"data/${d.getPath.getName}/${f.getPath.getName}"
          if (!live.contains(rel)) { fs.delete(f.getPath, false); removed += 1 }
        }
        if (fs.listStatus(d.getPath).isEmpty) fs.delete(d.getPath, false)
      }
    }
    val (vs, cs) = listLog(fs, table)
    cs.sorted.lastOption.foreach { ck =>
      vs.filter(_ < ck).foreach(v => fs.delete(entryPath(table, v), false))
      cs.filter(_ < ck).foreach(v => fs.delete(ckptPath(table, v), false))
    }
    removed
  }
}
