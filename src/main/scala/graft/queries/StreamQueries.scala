package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.GQuery
import graft.sources.Tables

/** Event-time windowing semantics (SURVEY.md §2.10) exercised in BATCH mode —
  * `window()` / `session_window()` produce identical results under batch and
  * Structured Streaming (batch/stream parity), so the DuckDB oracle validates
  * the streaming semantics; graft.streaming.EventStreams runs the same
  * aggregations as actual streams (covered by ScalaTest).
  *
  * value sums go through DECIMAL(18,6): double→decimal rounding is a
  * deterministic function of the binary double on both engines (no exact-tie
  * doubles exist at scale 6), and decimal addition is order-free. The sum
  * leaves the query as DOUBLE (exact here: ≤13 significant digits) per
  * OutputPolicy — the driver stringifies Decimal vs float asymmetrically.
  */
object StreamQueries {

  private val decValue = col("value").cast(DecimalType(18, 6))

  val all: Seq[GQuery] = Seq(
    // ------------------------------------------------------------------
    GQuery(
      "q31_tumbling_window",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(decValue).cast("double").as("sum_value"))
          .select(epochSec(col("w.start")).as("bucket_start"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy(col("bucket_start").asc, col("event_type").asc)
      },
      Some("""SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS bucket_start,
             |       event_type, COUNT(*) AS n,
             |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2
             |ORDER BY bucket_start ASC, event_type ASC""".stripMargin),
      "tumbling event-time window (10 min), batch/stream parity"),

    // ------------------------------------------------------------------
    GQuery(
      "q32_sliding_window",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
          .agg(count(lit(1)).as("n"), sum(decValue).cast("double").as("sum_value"))
          .select(epochSec(col("w.start")).as("bucket_start"),
            col("n"), col("sum_value"))
          .orderBy(col("bucket_start").asc)
      },
      // Each event belongs to the two 10-min windows starting at
      // floor(t/300)*300 and floor(t/300)*300 - 300.
      Some("""WITH b AS (
             |  SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS bucket_start, value FROM events
             |  UNION ALL
             |  SELECT CAST(floor(epoch(ts) / 300) * 300 - 300 AS BIGINT) AS bucket_start, value FROM events)
             |SELECT bucket_start, COUNT(*) AS n,
             |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM b GROUP BY 1 ORDER BY bucket_start ASC""".stripMargin),
      "sliding event-time window (10 min / 5 min slide)"),

    // ------------------------------------------------------------------
    // Session windows: a session closes when the next event is >= gap after
    // the previous one. Oracle is the classic gaps-and-islands construction.
    GQuery(
      "q33_session_window",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n"), sum(decValue).cast("double").as("sum_value"))
          .select(col("user_id"),
            epochSec(col("w.start")).as("session_start"),
            col("n"), col("sum_value"))
          .orderBy(col("user_id").asc, col("session_start").asc)
      },
      Some("""WITH g AS (
             |  SELECT user_id, ts, value,
             |         CASE WHEN ts >= LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |                        + INTERVAL 30 MINUTE
             |              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |              THEN 1 ELSE 0 END AS brk
             |  FROM events),
             |s AS (
             |  SELECT user_id, ts, value,
             |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
             |                        ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM g)
             |SELECT user_id,
             |       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
             |       COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM s GROUP BY user_id, sid
             |ORDER BY user_id ASC, session_start ASC""".stripMargin),
      "session windows (30 min gap) vs gaps-and-islands oracle"),
  )
}
