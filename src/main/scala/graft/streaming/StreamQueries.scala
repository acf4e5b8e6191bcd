package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Streaming surface (SURVEY.md §2.5) over the `events` fixture.
  *
  * Each operator is ONE transform function applied to either the batch
  * DataFrame (for the DuckDB oracle gate) or a Structured Streaming
  * DataFrame (exercised in StreamingSpec with file source +
  * Trigger.AvailableNow) — same code path, so the oracle checks the
  * streaming semantics too, modulo watermarking.
  *
  * Scale design: all window aggregations shuffle once on
  * (window, key); session windows use Spark's native session_window
  * merge; watermark + dropDuplicates bounds streaming state. At 100 TB/
  * day the partial-aggregation (map-side combine) before the shuffle is
  * what keeps these viable — guaranteed here by groupBy+agg shape.
  */
object StreamQueries {

  /** Tumbling 1-hour windows per event_type: count + exact value sum. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding 1-hour windows every 30 minutes (each event in 2 windows). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))

  /** Session windows: 5-minute inactivity gap per user. */
  def sessionize(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Earliest-wins dedup per event_id (streaming: dropDuplicates within
    * watermark; batch twin: deterministic row_number).
    */
  def dedupEvents(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_id")).orderBy(col("ts"), col("user_id"))
    events.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** JSON props extraction + per-type aggregate (`props` = {"k": int}). */
  def jsonPropStats(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        countDistinct(col("user_id")).as("n_users"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling_counts" -> ((s, dir) =>
      tumblingCounts(Tables(s, dir, "events"))
        .orderBy(col("window_start"), col("event_type"))),
    "stream_sliding_counts" -> ((s, dir) =>
      slidingCounts(Tables(s, dir, "events"))
        .orderBy(col("window_start"), col("event_type"))),
    "stream_session_windows" -> ((s, dir) =>
      sessionize(Tables(s, dir, "events"))
        .orderBy(col("user_id"), col("session_start"))),
    "stream_dedup_events" -> ((s, dir) =>
      dedupEvents(Tables(s, dir, "events"))
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))),
    "stream_json_props" -> ((s, dir) =>
      jsonPropStats(Tables(s, dir, "events"))
        .orderBy(col("event_type")))
  )

  val oracleSql: Map[String, String] = Map(
    "stream_tumbling_counts" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_sliding_counts" ->
      """SELECT time_bucket(INTERVAL '30 minutes', ts) - o.off AS window_start,
        |  event_type, count(*) AS n_events
        |FROM events
        |CROSS JOIN (SELECT unnest([INTERVAL '0 minutes', INTERVAL '30 minutes']) AS off) o
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_session_windows" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL '5 minutes'
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL '5 minutes' AS session_end,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
    "stream_dedup_events" ->
      """SELECT event_id, ts, user_id, event_type FROM events
        |QUALIFY row_number() OVER (PARTITION BY event_id
        |                           ORDER BY ts, user_id) = 1
        |ORDER BY event_id""".stripMargin,
    "stream_json_props" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
