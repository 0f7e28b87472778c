package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.GQuery
import graft.sources.Tables

/** Data-layout lifecycle operators (SURVEY.md §2.1 extension): the table-
  * maintenance jobs every long-lived 100 TB lake needs around the query
  * engine proper — small-file compaction, schema-evolution reads, and
  * ANALYZE-style column statistics. The reference's `Table`/`Schema` layer
  * (`src/table.rs`, `src/schema.rs`) fixes ONE width-checked schema per
  * table and keeps all blocks in memory, so none of these lifecycle
  * concerns exist there; at lake scale they are daily jobs.
  *
  * Correctness model: each query's OUTPUT is derived only from the
  * round-tripped/derived data, while the DuckDB oracle recomputes the same
  * answer from the ORIGINAL fixture table — so the gate proves the layout
  * operation preserved content exactly (compaction), merged schemas with
  * the documented null-fill rule (evolution), or measured the stats the
  * optimizer would consume (ANALYZE). Physical-layout assertions that SQL
  * cannot see (file counts, rows-per-file caps) are pinned by LayoutSpec.
  */
object LayoutQueries {

  private def tmpDir(name: String, d: String): String =
    s"/tmp/graft_${name}_${d.replaceAll("[^0-9.]", "")}_${ProcessHandle.current.pid}"

  def all: Seq[GQuery] = Seq(

    // ------------------------------------------------------------------
    // q182: small-file compaction — the OPTIMIZE job. A fragmented write
    // (64 shuffled files here; in production: thousands of per-micro-batch
    // or per-ingest-task files) is rewritten as a range-clustered layout:
    // repartitionByRange on the natural sort key (range exchange =
    // sampled bounds, so output files tile the key space — scans with key
    // predicates prune whole files via parquet min/max footers) +
    // sortWithinPartitions (rowgroup-level clustering) + maxRecordsPerFile
    // (bounds the straggler file; at 100 TB the partition count would be
    // ceil(bytes / targetFileSize) instead of a constant, and AQE
    // coalesces the small tail). The gate reads ONLY the compacted output
    // and must reproduce the source-table answer bit-for-bit — compaction
    // that drops/dups/mangles a row fails the hash. LayoutSpec pins the
    // physical claims: fewer files out than in, every file under the
    // record cap, one contiguous doc_id range per file.
    GQuery(
      "q182_compaction",
      (s, d) => {
        val tmp = tmpDir("compact", d)
        Tables.documents(s, d)
          .select(col("doc_id"), col("text"), col("n_chars"))
          .repartition(64)
          .write.mode("overwrite").parquet(s"$tmp/frag")
        val frag = s.read.parquet(s"$tmp/frag")
        frag.repartitionByRange(4, col("doc_id"))
          .sortWithinPartitions(col("doc_id"))
          .write.mode("overwrite")
          .option("maxRecordsPerFile", "400")
          .parquet(s"$tmp/compact")
        s.read.parquet(s"$tmp/compact")
          .groupBy(expr("doc_id div 100").as("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            md5(concat_ws("", sort_array(collect_list(md5(col("text")))))).as("content_md5"))
          .orderBy(col("bucket").asc)
      },
      Some("""SELECT doc_id // 100 AS bucket,
             |       COUNT(*) AS n_docs,
             |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             |       md5(string_agg(md5(text), '' ORDER BY md5(text))) AS content_md5
             |FROM documents GROUP BY 1 ORDER BY bucket ASC""".stripMargin),
      "small-file compaction: fragmented write -> range-clustered capped files, content-exact"),

    // ------------------------------------------------------------------
    // q183: schema-evolution read — batches written before a column
    // existed union with batches written after. mergeSchema=true widens
    // the footer union across files; the missing column null-fills (the
    // lake contract Delta/Iceberg formalize; plain parquet dirs get it
    // from the reader). The oracle replays the same split rule against
    // the source table, so the null-fill semantics — not just row counts —
    // are hash-gated. Scale: schema merge reads ONE footer per file
    // (driver-side listing, no data scan) and the union is planned as a
    // single scan over both directories — no per-batch job.
    GQuery(
      "q183_schema_evolution",
      (s, d) => {
        val tmp = tmpDir("evolve", d)
        val o = Tables.orders(s, d)
        o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_totalprice"))
          .write.mode("overwrite").parquet(s"$tmp/v1")
        o.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
          .write.mode("overwrite").parquet(s"$tmp/v2")
        s.read.option("mergeSchema", "true").parquet(s"$tmp/v1", s"$tmp/v2")
          .groupBy(coalesce(col("o_orderpriority"), lit("<pre-schema>")).as("priority"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("sum_price"),
            sum(col("o_orderkey")).as("sum_keys"))
          .orderBy(col("priority").asc)
      },
      Some("""SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority
             |            ELSE '<pre-schema>' END AS priority,
             |       COUNT(*) AS n,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |       CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
             |FROM orders GROUP BY 1 ORDER BY priority ASC""".stripMargin),
      "schema evolution: mergeSchema union read, null-fill for pre-schema batches"),

    // ------------------------------------------------------------------
    // q184: ANALYZE-style column statistics in ONE scan — the CBO input
    // (row count, per-column null count, exact NDV, min/max) that drives
    // broadcast-vs-shuffle and join-order decisions. All four columns'
    // distinct counts run in a single aggregate: Catalyst plans multi-
    // distinct via Expand (input ×4 here), the standard exact-ANALYZE
    // shape; a 100 TB nightly stats job swaps exact NDV for HLL++ (the
    // q06-gated path) to stay single-pass without the Expand multiplier.
    // Numeric min/max surface as cent-scaled BIGINTs — exact cross-engine,
    // no double-formatting drift. The stats unpivot to one row per column
    // via stack() (single-scan Expand, same as q107).
    GQuery(
      "q184_col_stats",
      (s, d) => {
        def nulls(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L))
        def cents(aggSql: String) = expr(s"CAST(round(($aggSql) * 100) AS BIGINT)")
        Tables.lineitem(s, d)
          .agg(
            count(lit(1)).as("n_rows"),
            nulls("l_quantity").as("qty_nulls"),
            countDistinct(col("l_quantity")).as("qty_ndv"),
            cents("min(l_quantity)").as("qty_min"),
            cents("max(l_quantity)").as("qty_max"),
            nulls("l_discount").as("disc_nulls"),
            countDistinct(col("l_discount")).as("disc_ndv"),
            cents("min(l_discount)").as("disc_min"),
            cents("max(l_discount)").as("disc_max"),
            nulls("l_orderkey").as("ok_nulls"),
            countDistinct(col("l_orderkey")).as("ok_ndv"),
            cents("min(l_orderkey)").as("ok_min"),
            cents("max(l_orderkey)").as("ok_max"),
            nulls("l_returnflag").as("rf_nulls"),
            countDistinct(col("l_returnflag")).as("rf_ndv"),
            cents("min(ascii(l_returnflag))").as("rf_min"),
            cents("max(ascii(l_returnflag))").as("rf_max"))
          .select(col("n_rows"), expr(
            """stack(4,
              |  'l_discount',   disc_nulls, disc_ndv, disc_min, disc_max,
              |  'l_orderkey',   ok_nulls,   ok_ndv,   ok_min,   ok_max,
              |  'l_quantity',   qty_nulls,  qty_ndv,  qty_min,  qty_max,
              |  'l_returnflag', rf_nulls,   rf_ndv,   rf_min,   rf_max)
              |  AS (col_name, n_nulls, ndv, min_cents, max_cents)""".stripMargin))
          .select(col("col_name"), col("n_rows"), col("n_nulls"), col("ndv"),
            col("min_cents"), col("max_cents"))
          .orderBy(col("col_name").asc)
      },
      Some("""WITH s AS (
             |  SELECT COUNT(*) AS n_rows,
             |         SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS qty_nulls,
             |         COUNT(DISTINCT l_quantity) AS qty_ndv,
             |         CAST(round(MIN(l_quantity)*100) AS BIGINT) AS qty_min,
             |         CAST(round(MAX(l_quantity)*100) AS BIGINT) AS qty_max,
             |         SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS disc_nulls,
             |         COUNT(DISTINCT l_discount) AS disc_ndv,
             |         CAST(round(MIN(l_discount)*100) AS BIGINT) AS disc_min,
             |         CAST(round(MAX(l_discount)*100) AS BIGINT) AS disc_max,
             |         SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS ok_nulls,
             |         COUNT(DISTINCT l_orderkey) AS ok_ndv,
             |         CAST(round(MIN(l_orderkey)*100) AS BIGINT) AS ok_min,
             |         CAST(round(MAX(l_orderkey)*100) AS BIGINT) AS ok_max,
             |         SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS rf_nulls,
             |         COUNT(DISTINCT l_returnflag) AS rf_ndv,
             |         CAST(round(MIN(ascii(l_returnflag))*100) AS BIGINT) AS rf_min,
             |         CAST(round(MAX(ascii(l_returnflag))*100) AS BIGINT) AS rf_max
             |  FROM lineitem)
             |SELECT u.col_name, s.n_rows,
             |       CAST(u.n_nulls AS BIGINT) AS n_nulls,
             |       CAST(u.ndv AS BIGINT) AS ndv,
             |       u.min_cents, u.max_cents
             |FROM s, (
             |  SELECT 'l_discount' AS col_name, disc_nulls AS n_nulls, disc_ndv AS ndv,
             |         disc_min AS min_cents, disc_max AS max_cents FROM s
             |  UNION ALL
             |  SELECT 'l_orderkey', ok_nulls, ok_ndv, ok_min, ok_max FROM s
             |  UNION ALL
             |  SELECT 'l_quantity', qty_nulls, qty_ndv, qty_min, qty_max FROM s
             |  UNION ALL
             |  SELECT 'l_returnflag', rf_nulls, rf_ndv, rf_min, rf_max FROM s) u
             |ORDER BY col_name ASC""".stripMargin),
      "ANALYZE in one scan: per-column null/NDV/min/max stats via multi-distinct agg + stack"),

    // ------------------------------------------------------------------
    // q264 (r9): TRANSACTIONAL table format — the commit-log semantics
    // the r8 verdict listed as the top remaining engine delta (Delta/
    // Iceberg-style). graft.sources.TxLog: version-file log with
    // create-no-overwrite as the atomic claim, snapshot-isolated reads,
    // optimistic append/overwrite, checkpoint-bounded replay, vacuum.
    // The gate builds a table through the FULL lifecycle each run —
    // append, append, OVERWRITE (all prior files become remove actions),
    // append — and reads the final snapshot: exactly the overwrite's
    // rows plus the post-overwrite append must survive. The oracle
    // computes that end state directly from the fixture, so a log-replay
    // bug (a remove not applied, an add dropped, an overwrite that
    // merged instead of replaced) is a hash mismatch. 100 TB: data IO is
    // ordinary distributed parquet; the log is O(commits) driver-side
    // JSON; TxLogSpec pins concurrency/torn-log/schema contracts SQL
    // cannot see.
    GQuery(
      "q264_txlog_snapshot",
      (s, d) => {
        val dir = tmpDir("txlog", d)
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
        // one parquet scan feeds all four lifecycle writes (r10, guide §6 /
        // r9-verdict item 7): the narrow projection is materialized once and
        // each commit's filter reads the checkpoint blocks instead of
        // re-scanning + re-decoding the fixture per version
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
          .localCheckpoint(false)
        graft.sources.TxLog.append(s, dir, li.filter(col("l_orderkey") % 5 === 0))
        graft.sources.TxLog.append(s, dir, li.filter(col("l_orderkey") % 5 === 1))
        graft.sources.TxLog.overwrite(s, dir, li.filter(col("l_orderkey") % 5 === 2))
        graft.sources.TxLog.append(s, dir, li.filter(col("l_orderkey") % 5 === 3))
        graft.sources.TxLog.read(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_returnflag").asc)
      },
      Some("""SELECT l_returnflag,
             |       CAST(COUNT(*) AS BIGINT) AS n,
             |       SUM(l_quantity) AS sum_qty
             |FROM lineitem WHERE l_orderkey % 5 IN (2, 3)
             |GROUP BY 1 ORDER BY l_returnflag ASC""".stripMargin),
      "transactional commit log: append/append/overwrite/append lifecycle, final snapshot == oracle's fixture-computed end state"),

    // ------------------------------------------------------------------
    // q265 (r9): TIME TRAVEL + metadata-only counts over the same
    // lifecycle — every historical version is read back as-of and must
    // equal the state the oracle computes for that point in history; the
    // metadata row count (per-file parquet-footer truth carried in the
    // log, never a scan) must agree with the scan count at EVERY
    // version, gating the log's bookkeeping as data, not as a spec
    // assertion.
    GQuery(
      "q265_txlog_timetravel",
      (s, d) => {
        val dir = tmpDir("txlogtt", d)
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
        // one scan feeds the four versioned writes (r10, guide §6)
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity"))
          .localCheckpoint(false)
        graft.sources.TxLog.append(s, dir, li.filter(col("l_orderkey") % 7 === 0))
        graft.sources.TxLog.append(s, dir, li.filter(col("l_orderkey") % 7 === 1))
        graft.sources.TxLog.overwrite(s, dir, li.filter(col("l_orderkey") % 7 === 2))
        graft.sources.TxLog.append(s, dir, li.filter(col("l_orderkey") % 7 === 3))
        (1 to 4).map { v =>
          graft.sources.TxLog.read(s, dir, Some(v.toLong))
            .agg(count(lit(1)).as("n_scan"),
              coalesce(sum(col("l_quantity")), lit(0.0)).as("sum_qty"))
            .select(lit(v.toLong).as("version"),
              lit(graft.sources.TxLog.rowCount(s, dir, Some(v.toLong))).as("n_meta"),
              col("n_scan"), col("sum_qty"))
        }.reduce(_ unionAll _).orderBy(col("version").asc)
      },
      Some("""WITH src AS (SELECT l_orderkey % 7 AS m, l_quantity FROM lineitem)
             |SELECT CAST(1 AS BIGINT) AS version,
             |       CAST(COUNT(*) AS BIGINT) AS n_meta,
             |       CAST(COUNT(*) AS BIGINT) AS n_scan, SUM(l_quantity) AS sum_qty
             |FROM src WHERE m = 0
             |UNION ALL
             |SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
             |       CAST(COUNT(*) AS BIGINT), SUM(l_quantity)
             |FROM src WHERE m IN (0, 1)
             |UNION ALL
             |SELECT CAST(3 AS BIGINT), CAST(COUNT(*) AS BIGINT),
             |       CAST(COUNT(*) AS BIGINT), SUM(l_quantity)
             |FROM src WHERE m = 2
             |UNION ALL
             |SELECT CAST(4 AS BIGINT), CAST(COUNT(*) AS BIGINT),
             |       CAST(COUNT(*) AS BIGINT), SUM(l_quantity)
             |FROM src WHERE m IN (2, 3)
             |ORDER BY version ASC""".stripMargin),
      "time travel: every historical version == oracle state at that point; metadata row counts == scan counts as gated data"),

    // ------------------------------------------------------------------
    // q266 (r9): copy-on-write MERGE (upsert) through the commit log —
    // the table starts as the o_orderkey % 3 = 0 slice of orders, then a
    // source of UPDATES (% 6 = 0 rows with o_custkey shifted +1000000)
    // and INSERTS (% 3 = 1 rows) merges on the key. The oracle computes
    // the post-merge state directly from the fixture, so matched-row
    // replacement, unmatched-row insertion, and untouched-row survival
    // each land in the hash. File pruning (only key-range-intersecting
    // files rewrite) is pinned by TxLogSpec — SQL can't see file
    // identity. 100 TB: the rewrite is file-granular copy-on-write; a
    // merge touching one partition's keys rewrites one partition.
    GQuery(
      "q266_txlog_merge",
      (s, d) => {
        val dir = tmpDir("txlogmg", d)
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
        // one scan feeds the seed append and both merge-source slices (r10)
        val ords = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
          .localCheckpoint(false)
        graft.sources.TxLog.append(s, dir, ords.filter(col("o_orderkey") % 3 === 0))
        val src = ords.filter(col("o_orderkey") % 6 === 0)
          .withColumn("o_custkey", col("o_custkey") + 1000000L)
          .unionByName(ords.filter(col("o_orderkey") % 3 === 1))
        graft.sources.TxLog.merge(s, dir, src, "o_orderkey")
        graft.sources.TxLog.read(s, dir)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sum_cust"))
          .orderBy(col("o_orderstatus").asc)
      },
      Some("""WITH final AS (
             |  SELECT o_orderkey,
             |         CASE WHEN o_orderkey % 6 = 0 THEN o_custkey + 1000000
             |              ELSE o_custkey END AS o_custkey,
             |         o_orderstatus
             |  FROM orders WHERE o_orderkey % 3 = 0
             |  UNION ALL
             |  SELECT o_orderkey, o_custkey, o_orderstatus
             |  FROM orders WHERE o_orderkey % 3 = 1)
             |SELECT o_orderstatus,
             |       CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
             |FROM final GROUP BY 1 ORDER BY o_orderstatus ASC""".stripMargin),
      "copy-on-write MERGE: matched rows replaced, unmatched inserted, untouched intact == oracle's fixture-computed post-merge state"),

    // ------------------------------------------------------------------
    // q267 (r9): STREAMING ingest into the transactional table — the
    // real micro-batch engine drives foreachBatch into
    // TxLog.idempotentAppend (the Delta txn-action shape: each entry
    // records its (appId, batchId), the snapshot tracks the high-water
    // batch per app), then batch 0 is DELIBERATELY re-delivered — the
    // at-least-once restart case every checkpointed sink must survive —
    // and must change nothing. Exactly-once table state out of
    // at-least-once delivery + idempotent commit, gated end-to-end:
    // stream source → micro-batches → commit log → snapshot aggregate ==
    // the oracle's closed-form over the emitted id range (any duplicate
    // or lost batch breaks n AND sum_id). 100 TB: per batch one
    // distributed parquet write + one O(1) driver log entry; replay
    // suppression is a snapshot map lookup, never a table scan.
    GQuery(
      "q267_txlog_stream_sink",
      (s, d) => graft.streaming.EventStreams.streamTxLogGate(
        s, tmpDir("txlogsink", d), totalRows = 300, rowsPerBatch = 100),
      Some("""SELECT i % 7 AS k,
             |       CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(i) AS BIGINT) AS sum_id
             |FROM range(0, 300) t(i)
             |GROUP BY 1 ORDER BY k ASC""".stripMargin),
      "streaming foreachBatch into the commit log with txn idempotency: replayed batch is a no-op, final state == closed-form oracle"),

    // ------------------------------------------------------------------
    // q268 (r9): clustered COMPACTION (OPTIMIZE) + pruned read — two
    // interleaved appends leave every file spanning the whole key range;
    // optimize rewrites the live set range-partitioned on l_orderkey, so
    // the logged per-file min/max become disjoint and readPruned's file
    // skipping turns sharp. The gate reads a key range through the
    // PRUNED path after the optimize: content identity (optimize is
    // layout-only) AND pruned-read correctness land in the hash — the
    // oracle is a plain WHERE BETWEEN over the fixture. File-count
    // sharpness (not SQL-visible) is pinned by TxLogSpec. 100 TB:
    // clustering is the write-side property that makes file-stats
    // pruning work at all — a merge or range read over a clustered
    // table touches O(range) files, not O(table).
    GQuery(
      "q268_txlog_optimize",
      (s, d) => {
        val dir = tmpDir("txlogopt", d)
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
        // one scan feeds both interleaved appends (r10, guide §6)
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
          .localCheckpoint(false)
        graft.sources.TxLog.append(s, dir, li.filter(col("l_orderkey") % 2 === 0))
        graft.sources.TxLog.append(s, dir, li.filter(col("l_orderkey") % 2 === 1))
        graft.sources.TxLog.optimize(s, dir, Seq("l_orderkey"), targetFiles = 8)
        graft.sources.TxLog.readPruned(s, dir, "l_orderkey", 1000L, 3000L)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_returnflag").asc)
      },
      Some("""SELECT l_returnflag,
             |       CAST(COUNT(*) AS BIGINT) AS n,
             |       SUM(l_quantity) AS sum_qty
             |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 3000
             |GROUP BY 1 ORDER BY l_returnflag ASC""".stripMargin),
      "clustered compaction then file-stats-pruned range read: layout-only rewrite + sharp skipping == plain WHERE oracle"),

    // ------------------------------------------------------------------
    // q269 (r9): CHANGE FEED (file-granular CDC) over the full lifecycle
    // — append/append/overwrite/append, then every row the commits added
    // or removed, tagged (version, change_type). The oracle computes the
    // same feed closed-form from the fixture: an append's inserts are
    // its slice, the overwrite's deletes are the union of everything
    // before it plus its own inserts. Incremental downstream processing
    // (the training-pipeline "what changed since I last ran" question)
    // reads this instead of diffing snapshots. 100 TB: the feed scans
    // only the delta's files — never the table.
    GQuery(
      "q269_txlog_changes",
      (s, d) => {
        val dir = tmpDir("txlogcdc", d)
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
        // one scan feeds the four lifecycle writes (r10, guide §6)
        val ords = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
          .localCheckpoint(false)
        graft.sources.TxLog.append(s, dir, ords.filter(col("o_orderkey") % 4 === 0))
        graft.sources.TxLog.append(s, dir, ords.filter(col("o_orderkey") % 4 === 1))
        graft.sources.TxLog.overwrite(s, dir, ords.filter(col("o_orderkey") % 4 === 2))
        graft.sources.TxLog.append(s, dir, ords.filter(col("o_orderkey") % 4 === 3))
        graft.sources.TxLog.changes(s, dir, 0L, 4L)
          .groupBy(col("_version").as("version"), col("_change_type").as("change"))
          .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sum_cust"))
          .orderBy(col("version").asc, col("change").asc)
      },
      Some("""WITH src AS (SELECT o_orderkey % 4 AS m, o_custkey FROM orders)
             |SELECT CAST(1 AS BIGINT) AS version, 'insert' AS change,
             |       CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
             |FROM src WHERE m = 0
             |UNION ALL
             |SELECT CAST(2 AS BIGINT), 'insert', CAST(COUNT(*) AS BIGINT),
             |       CAST(SUM(o_custkey) AS BIGINT) FROM src WHERE m = 1
             |UNION ALL
             |SELECT CAST(3 AS BIGINT), 'delete', CAST(COUNT(*) AS BIGINT),
             |       CAST(SUM(o_custkey) AS BIGINT) FROM src WHERE m IN (0, 1)
             |UNION ALL
             |SELECT CAST(3 AS BIGINT), 'insert', CAST(COUNT(*) AS BIGINT),
             |       CAST(SUM(o_custkey) AS BIGINT) FROM src WHERE m = 2
             |UNION ALL
             |SELECT CAST(4 AS BIGINT), 'insert', CAST(COUNT(*) AS BIGINT),
             |       CAST(SUM(o_custkey) AS BIGINT) FROM src WHERE m = 3
             |ORDER BY version ASC, change ASC""".stripMargin),
      "file-granular change feed over the lifecycle: per-version insert/delete rows == closed-form fixture oracle"),
  )
}
