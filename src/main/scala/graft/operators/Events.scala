package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream analytics in batch form: gap sessionization and tumbling
  * windows. `graft.streaming.EventStream` is the Structured Streaming twin
  * of the same semantics.
  *
  * Reference: the reference's enrichment APIs produce timed observation
  * streams ingested on an Airflow cadence (`dags/raw/
  * fetch_coordinates_and_weather.py`); graft treats them as first-class
  * event streams.
  *
  * Scale notes: sessionization windows are partitioned by `user_id` —
  * the shuffle is one hash exchange on the natural key and each user's
  * timeline sorts independently (no global sort). Timestamps are compared
  * in epoch milliseconds so results are engine- and timezone-portable.
  */
object Events {
  val SessionGapMs: Long = 30L * 60 * 1000

  /** q_sessionize — split each user's event timeline at >30 min gaps;
    * one row per session with count/value rollups. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .events(spark, dir)
      .select(
        col("user_id"),
        col("event_id"),
        // floor division, not truncation: `DIV` truncates toward zero,
        // which disagrees with epoch_ms for pre-1970 (negative) stamps;
        // subtracting the non-negative pmod first makes DIV exact floor
        expr("(ts - pmod(ts, 1000000)) DIV 1000000").as("ts_ms"),
        col("value"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val flagged = e
      .withColumn("prev_ts", lag(col("ts_ms"), 1).over(byUser))
      .withColumn(
        "is_new",
        when(col("prev_ts").isNull || col("ts_ms") - col("prev_ts") > SessionGapMs, 1L)
          .otherwise(0L))
      .withColumn(
        "session_seq",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts_ms")).as("session_start_ms"),
        max(col("ts_ms")).as("session_end_ms"),
        cnt.as("n_events"),
        sumd2(col("value")).as("total_value"))
  }

  val sessionizeOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM events
      |), flagged AS (
      |  SELECT user_id, event_id, ts_ms, value,
      |    CASE WHEN prev_ts IS NULL OR ts_ms - prev_ts > 1800000 THEN 1 ELSE 0 END AS is_new
      |  FROM (
      |    SELECT *, LAG(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_ts
      |    FROM e
      |  )
      |), sessions AS (
      |  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM flagged
      |)
      |SELECT user_id, session_seq,
      |  MIN(ts_ms) AS session_start_ms,
      |  MAX(ts_ms) AS session_end_ms,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM sessions
      |GROUP BY user_id, session_seq""".stripMargin

  /** q_event_windows — tumbling 1-hour windows per event type (the batch
    * twin of the streaming windowed aggregation). */
  def eventWindows(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(
        // floor-division to the hour (see sessionize note on DIV vs floor)
        (expr("(ts - pmod(ts, 3600000000000)) DIV 3600000000000") * lit(3600000L))
          .as("window_start_ms"),
        col("event_type"))
      .agg(
        cnt.as("n_events"),
        sumd2(col("value")).as("total_value"),
        meanOf(sumd2(col("value")), cnt).as("avg_value"))

  val eventWindowsOracle: String =
    """SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** q_json_extract — semi-structured property extraction from the event
    * payload JSON, rolled up per event type. JSON path evaluation is a
    * codegen'd scalar (no UDF); the single shuffle is the 5-group rollup. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("k")).cast(LongType).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        cnt.as("n"))

  val jsonExtractOracle: String =
    """SELECT event_type,
      |  CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k, COUNT(*) AS n
      |FROM (
      |  SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k
      |  FROM events
      |)
      |GROUP BY event_type""".stripMargin
}
