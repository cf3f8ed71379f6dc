package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming analytics over ingested event streams — the continuous
  * form of the batch time-window queries (SURVEY O-T8/T9/T11).
  *
  * Watermarks bound the aggregation state: closed windows are evicted
  * once event time passes window_end + watermark, so state stays
  * proportional to (open windows × groups), not stream length — the
  * property that keeps this viable on an unbounded 100 TB/day stream.
  * The reference's analog bound is NATS ack_wait=120s + max_age=24h
  * (src/nats.rs:71, config/default.toml:27); late redeliveries there
  * surface as duplicates, here late rows are dropped (documented
  * semantic difference, SURVEY O-T11).
  */
object StreamingAgg {

  /** O-T8 streaming: tumbling hourly counts + approx uniques per type. */
  def hourlyCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("timestamp", watermark)
      // group by the window STRUCT — projecting window.start inside the
      // groupBy detaches watermark tracking and append mode is rejected
      .groupBy(window(col("timestamp"), "1 hour").as("w"), col("event_name"))
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("w.start").as("hour"), col("event_name"),
        col("n"), col("approx_users"))

  /** O-T9 streaming: sliding 6h/1h rolling activity. */
  def rollingActivity(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("timestamp", watermark)
      .groupBy(window(col("timestamp"), "6 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("n"))

  /** O-T10 streaming: gap-based session aggregation per user. */
  def gapSessions(events: DataFrame, gap: String = "30 minutes",
                  watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("timestamp", watermark)
      .groupBy(session_window(col("timestamp"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"))
}
