package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twins of the batch window queries Q37–Q40 (SURVEY.md §2C):
  * the same logical transforms over an unbounded `events`-shaped stream
  * (`ts timestamp, event_id long, user_id long, event_type string,
  * value double`), with watermarks bounding state.
  *
  * Batch/stream equivalence is asserted in EventPipelinesSpec: run the
  * stream from a MemoryStream of the fixture rows, compare with the
  * batch query on the same rows.
  *
  * 100 TB design: every operator below keys its state (window ×
  * event_type, user_id, …) so the state store partitions horizontally;
  * watermark TTL keeps per-key state bounded regardless of stream
  * length.
  */
object EventPipelines {

  /** Q37 streaming: tumbling 1h counts/sums per event_type. */
  def tumbling(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("cnt"), col("sum_value"))

  /** Q38 streaming: sliding 1h/30min counts. */
  def sliding(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("cnt"))

  /** Q39 streaming: 30-min-gap session windows per user. */
  def sessions(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("events"),
        (max(col("ts")).cast("double") - min(col("ts")).cast("double")).as("session_sec"))
      .select(col("user_id"), col("w.start").as("session_start"), col("events"), col("session_sec"))

  /** Q40 streaming: keyed dedup, watermark-bounded state. */
  def dedup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates("user_id", "event_type")

  /** Stream-stream interval join: each purchase attributed to the same
    * user's signups within the preceding `horizon` — the streaming
    * sibling of the batch as-of join (Q12). Both sides carry watermarks
    * and the join condition is time-bounded, so state for either side
    * is dropped once the watermark passes the interval: state size is
    * O(events within horizon), independent of stream length.
    */
  def purchaseAttribution(purchases: DataFrame, signups: DataFrame,
      watermark: String = "1 hour", horizon: String = "24 hours"): DataFrame = {
    val p = purchases.withWatermark("ts", watermark)
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val sg = signups.withWatermark("ts", watermark)
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"), col("ts").as("s_ts"))
    p.join(sg,
      col("user_id") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr(s"INTERVAL $horizon"))
      .select(col("purchase_id"), col("user_id"), col("signup_id"), col("p_ts"), col("s_ts"))
  }
}
