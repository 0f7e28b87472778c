package graft

import org.apache.spark.sql.functions._

import graft.sources.GraftCollectSink

/** The DSv2 write path: two-phase commit through GraftCollectSink. */
class ConnectorSpec extends SparkTestBase {

  private def write(dfName: String, mode: String)(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("graft.sources.GraftCollectSink")
      .option("name", dfName).mode(mode).save()

  test("multi-partition write commits every row exactly once") {
    GraftCollectSink.clear("t_basic")
    write("t_basic", "append") {
      spark.range(0, 10000, 1, 8)
        .select(col("id"), (col("id") * 3).as("v"),
          concat(lit("r"), col("id")).as("tag"))
    }
    val rows = GraftCollectSink.rows("t_basic")
    assert(rows.length == 10000)
    assert(rows.map(_.head.asInstanceOf[Long]).toSet == (0L until 10000L).toSet)
    rows.foreach { r =>
      assert(r(1) == r.head.asInstanceOf[Long] * 3)
      assert(r(2) == s"r${r.head}") // UTF8String externalized, not buffer-backed
    }
  }

  test("nested types survive the reused-row boundary (arrays, timestamps, decimals)") {
    GraftCollectSink.clear("t_nested")
    write("t_nested", "append") {
      spark.range(0, 500, 1, 4).select(
        col("id"),
        array(concat(lit("r"), col("id")), lit("x")).as("a"),
        col("id").cast("decimal(18,2)").as("d"),
        timestamp_seconds(col("id") * 60).as("ts"))
    }
    val rows = GraftCollectSink.rows("t_nested")
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.head.asInstanceOf[Long]
      // a buffer-backed (un-copied) array would show the LAST row's values
      assert(r(1) == Seq(s"r$id", "x"), s"array corrupted for id=$id: ${r(1)}")
      assert(r(2).asInstanceOf[java.math.BigDecimal].longValueExact() == id)
      assert(r(3).isInstanceOf[java.sql.Timestamp] || r(3).isInstanceOf[java.time.Instant],
        s"timestamp not externalized: ${r(3).getClass}")
    }
  }

  test("append merges with prior commits; overwrite truncates") {
    GraftCollectSink.clear("t_modes")
    write("t_modes", "append")(spark.range(0, 100).select(col("id")))
    write("t_modes", "append")(spark.range(100, 150).select(col("id")))
    assert(GraftCollectSink.rows("t_modes").length == 150)
    write("t_modes", "overwrite")(spark.range(0, 7).select(col("id")))
    assert(GraftCollectSink.rows("t_modes").length == 7)
  }

  test("micro-batch stream source: offset-bounded batches, exactly-once into the sink") {
    GraftCollectSink.clear("t_stream")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_s1").toString
    val q = spark.readStream.format("graft.sources.GraftStreamSource")
      .option("maxRows", 100).option("rowsPerBatch", 30).load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.format("graft.sources.GraftCollectSink")
          .option("name", "t_stream").mode("append").save()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val rows = GraftCollectSink.rows("t_stream")
    assert(rows.length == 100, s"got ${rows.length} rows")
    assert(rows.map(_.head.asInstanceOf[Long]).toSet == (0L until 100L).toSet)
    rows.foreach(r => assert(r(1) == r.head.asInstanceOf[Long] * 7))
  }

  test("stream restart resumes from the checkpoint; idempotent-by-batchId writes make it exactly-once") {
    // foreachBatch is AT-LEAST-ONCE: the engine may replay the last batch
    // whose commit-log entry didn't land before shutdown (observed here —
    // a naive append sink got rows [25,50) twice across a restart). The
    // production pattern is idempotent writes keyed by batchId (overwrite
    // the batch's own partition/table): replays then converge instead of
    // duplicating. This test demonstrates exactly that upgrade.
    GraftCollectSink.names.filter(_.startsWith("t_restart#")).foreach(GraftCollectSink.clear)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_s2").toString
    def run(maxRows: Int): Unit = {
      val q = spark.readStream.format("graft.sources.GraftStreamSource")
        .option("maxRows", maxRows).option("rowsPerBatch", 25).load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
          df.write.format("graft.sources.GraftCollectSink")
            .option("name", s"t_restart#$batchId").mode("overwrite").save()
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    run(50) // first incarnation reads [0,50) in two batches
    val afterFirst = GraftCollectSink.names.filter(_.startsWith("t_restart#"))
      .flatMap(GraftCollectSink.rows).map(_.head.asInstanceOf[Long])
    assert(afterFirst.toSet == (0L until 50L).toSet, s"first run wrong: ${afterFirst.sorted}")
    run(100) // restart: may replay its last batch, must then continue from 50
    val detail = GraftCollectSink.names.filter(_.startsWith("t_restart#")).sorted
      .map(n => s"$n -> ${GraftCollectSink.rows(n).map(_.head).mkString(",")}")
    val ids = GraftCollectSink.names.filter(_.startsWith("t_restart#"))
      .flatMap(GraftCollectSink.rows).map(_.head.asInstanceOf[Long])
    assert(ids.length == 100,
      s"replay not idempotent or rows lost: ${ids.length}\n${detail.mkString("\n")}")
    assert(ids.toSet == (0L until 100L).toSet)
  }

  test("aggregate pushdown: the scan answers COUNT/MIN/MAX/SUM in closed form, plan has no row scan") {
    import org.apache.spark.sql.functions._
    val df = spark.read.format("graft.sources.GraftRangeSource")
      .option("start", 0).option("end", 1000000).option("slices", 8)
      .load()
      .filter(col("id") >= 100 && col("id") < 5000)
      .agg(expr("count(*)").as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"), sum(col("id")).as("sm"))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("complete pushdown"),
      s"scan must advertise the pushed aggregates:\n$p")
    val r = df.collect().head
    assert(r.getLong(0) === 4900L && r.getLong(1) === 100L && r.getLong(2) === 4999L)
    assert(r.getLong(3) === (100L to 4999L).sum)
  }

  test("aggregate pushdown refuses what it cannot answer; results stay correct") {
    import org.apache.spark.sql.functions._
    def src = spark.read.format("graft.sources.GraftRangeSource")
      .option("start", 0).option("end", 10000).option("slices", 4).load()
    // grouped aggregation is not supported — must fall back to Spark
    val grouped = src.groupBy((col("id") % 3).as("g")).agg(count(lit(1)).as("n"))
    val pg = grouped.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!pg.contains("complete pushdown"), pg)
    assert(grouped.collect().map(_.getLong(1)).sum === 10000L)
    // AVG is not in the supported set — full aggregation falls back too
    // (pushAggregation is all-or-nothing for a complete pushdown)
    val avg0 = src.agg(avg(col("id")).as("a"), expr("count(*)").as("n"))
    val pa = avg0.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!pa.contains("complete pushdown"), pa)
    val ra = avg0.collect().head
    assert(ra.getDouble(0) === 4999.5 && ra.getLong(1) === 10000L)
    // an empty filtered range answers SQL-correctly through the pushdown
    val empty = src.filter(col("id") >= 9000 && col("id") < 9000)
      .agg(expr("count(*)").as("n"), min(col("id")).as("mn"))
      .collect().head
    assert(empty.getLong(0) === 0L && empty.isNullAt(1))
  }

  test("a failed write job publishes nothing (driver commit never runs)") {
    GraftCollectSink.clear("t_abort")
    write("t_abort", "append")(spark.range(0, 10).select(col("id")))
    val before = GraftCollectSink.rows("t_abort")
    assert(before.length == 10)
    // a task-side failure mid-job: raise_error on one row of many
    intercept[Exception] {
      write("t_abort", "append") {
        spark.range(0, 10000, 1, 8)
          .select(when(col("id") === 9999,
            expr("raise_error('poison row')")).otherwise(col("id").cast("string")).as("s"))
      }
    }
    assert(GraftCollectSink.rows("t_abort") == before,
      "aborted job leaked rows into the committed table")
  }
}
